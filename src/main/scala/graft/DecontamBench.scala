package graft

import org.apache.spark.sql.functions._

/** Serving-cost probe for the index-backed semantic decontamination
  * screen — the measured retirement of q280's r14 perf-weak: the
  * FIXED eval battery (stride ∧ vec_id < 20·DecontamEvalCap, q280's
  * in-query bound) screened against a growing corpus through
  * [[queries.Retrieval.semanticDecontamFromIndexes]] over a persisted
  * [[sinks.VectorIndex]]. The claim under test: screen cost tracks
  * the BATTERY × probed-cell size, never the corpus — the broadcast
  * sides are the bounded battery, and candidates come from nprobe
  * cells of the index. Run on a base dir and `graft.ScaleProbe`
  * blow-ups; compare walls as the corpus grows under the SAME battery
  * cap.
  *
  * Prints ONE JSON line:
  * {"metric":"decontam_serve","sf":…,"corpus_vecs":N,"battery":B,
  *  "build_s":…,"screen_s":…,"rows":50}
  */
object DecontamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.localSized("graft-decontambench", cpus, sfDir)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup

    val emb = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val nVec = emb.count()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-decontambench").toString
    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val idx = s"$tmp/ivf"
    val tBuild = sec(sinks.VectorIndex.build(emb, idx, k = 16))

    val cap = 20L * queries.SimilarityQueries.DecontamEvalCap
    val evalIds = emb.select(col("vec_id"))
      .where(col("vec_id") % 20 === 0 && col("vec_id") < cap)
      .localCheckpoint()
    val excludeIds = emb.select(col("vec_id"))
      .where(col("vec_id") % 20 === 0)
      .localCheckpoint()
    val battery = evalIds.count()
    def screen(): Seq[String] = queries.Retrieval
      .semanticDecontamFromIndexes(spark, idx, evalIds, excludeIds,
        nprobe = 2)
      .collect().map(_.toString).toSeq
    val warm = screen() // codegen + listing paid outside the timer
    require(warm.nonEmpty, "screen returned no suspects")
    val laps = (1 to 3).map(_ => sec(screen()))
    val tScreen = laps.sum / laps.length

    println(f"""{"metric":"decontam_serve","sf":"$sfDir","corpus_vecs":$nVec,"battery":$battery,"build_s":$tBuild%.2f,"screen_s":$tScreen%.2f,"rows":${warm.length}}""")
    spark.stop()
  }
}
