package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Dev-only order-alternating in-JVM A/B runner (the r15 protocol fix:
  * cross-process A/Bs at 2-5 s per query drown in session noise, and a
  * fixed A-then-B order inside one JVM is biased because B always runs
  * the same query warm). Usage:
  *
  *   runMain graft.AB <sfDir> <reps> <confKey>=<valA>|<valB> q1 q2 ...
  *
  * Runs each rep pair in alternating order (A,B / B,A / ...), times the
  * noop-sink write (construction + execution — ckpt chains execute at
  * construction), counts Spark jobs per run via a listener, and prints
  * per-query medians. The conf key is set on the session before each
  * variant's construction so conf-gated code paths toggle per run.
  */
object AB {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, repsS, toggle) = args.take(3)
    val queries = args.drop(3).toSeq
    val reps = repsS.toInt
    val Array(confKey, vals) = toggle.split("=", 2)
    val Array(valA, valB) = vals.split("\\|", 2)
    val unknown = queries.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.localSized("graft-ab", cpus, sfDir)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    def runOnce(name: String, v: String): (Double, Int) = {
      spark.conf.set(confKey, v)
      val preexisting = spark.sparkContext.getPersistentRDDs.keySet
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // brief settle so async job-start events land before we read
      Thread.sleep(50)
      val nj = jobs.get() - j0
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => preexisting(id) }
        .valuesIterator.foreach(_.unpersist(blocking = false))
      (sec, nj)
    }

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }

    queries.foreach { name =>
      // one unmeasured warm run per variant (codegen compile)
      runOnce(name, valA); runOnce(name, valB)
      val ta = scala.collection.mutable.ArrayBuffer[Double]()
      val tb = scala.collection.mutable.ArrayBuffer[Double]()
      var ja = 0; var jb = 0
      (0 until reps).foreach { r =>
        val order = if (r % 2 == 0) Seq(valA, valB) else Seq(valB, valA)
        order.foreach { v =>
          val (sec, nj) = runOnce(name, v)
          if (v == valA) { ta += sec; ja = nj } else { tb += sec; jb = nj }
        }
      }
      val ma = med(ta.toSeq); val mb = med(tb.toSeq)
      println(f"[ab] $name%-28s $confKey=$valA%-6s ${ma}%7.3f s ($ja jobs)  " +
        f"$confKey=$valB%-6s ${mb}%7.3f s ($jb jobs)  B/A=${mb / ma}%5.3f")
    }
    spark.stop()
  }
}
