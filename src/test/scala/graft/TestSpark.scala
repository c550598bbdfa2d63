package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test/fork gives the suites
  * their own JVM). `local[4,4]` = 4 threads, maxFailures=4 so the
  * crash-recovery spec can exercise task retry.
  */
object TestSpark {
  lazy val spark: SparkSession =
    Sessions.local("graft-test", "4,4")

  def resource(rel: String): String =
    new java.io.File(getClass.getResource(s"/$rel").toURI).getAbsolutePath

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Map `f` over `xs` on a small thread pool, preserving order —
    * the r16 suite-runtime lever (guide §2.6 applied to the tests
    * themselves): per-query plan construction and sf0.001 jobs are
    * driver-latency-bound, so the all-query sweeps (determinism,
    * plan-quality, shuffle-budget) waste most of their wall clock
    * waiting serially. Catalyst planning and job submission are
    * thread-safe on one session; any global toggles (Ckpt.disabled,
    * session conf) are set constant by the caller BEFORE the sweep.
    */
  def parMap[A, B](xs: Seq[A], threads: Int = 4)(f: A => B): Seq[B] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val fs = xs.map(x => scala.concurrent.Future(f(x)))
      fs.map(fu => scala.concurrent.Await.result(
        fu, scala.concurrent.duration.Duration.Inf))
    } finally pool.shutdown()
  }
}
