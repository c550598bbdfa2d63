package graft

import org.apache.spark.sql.functions._

/** Growth-curve probe for the STREAMING curation close-out — the r14
  * verdict's unmeasured item: [[streaming.CorpusStreaming
  * .curationCloseoutSink]] recomputes the full q279 per micro-batch
  * (O(corpus-so-far), the documented dashboard cadence), and the new
  * [[streaming.CorpusStreaming.curationCloseoutIncrementalSink]]
  * caches the fixed-input Shapley arm, and the round-15
  * [[streaming.CorpusStreaming.curationCloseoutIndexedSink]]
  * additionally maintains the dedup arm in a persisted
  * [[sinks.ClusterIndex]] (O(batch + touched clusters) per wave).
  * This bench drives all THREE per-batch bodies over the same ingest
  * waves and reports each variant's per-wave wall time, so the growth
  * curve is a measured row instead of a scaladoc adjective.
  *
  * Measures the foreachBatch BODIES directly (closeoutBatch /
  * closeoutBatchIncremental) — the micro-batch machinery around them
  * is the same for both variants and already measured by StreamBench's
  * twins; what grows with corpus-so-far is the body.
  *
  * Sanity inside the bench: the final wave's verdict sets must be
  * IDENTICAL across variants (the spec pins the same thing per wave at
  * a smaller SF) — a fast-but-drifted variant must not print a number.
  *
  * Env knobs (the StreamBench conventions):
  *  - SPARK_GRAFT_SF_DIR      corpus dir (default /root/testdata/sf0.1)
  *  - SPARK_GRAFT_CPUS        session cores (default 32)
  *  - SPARK_GRAFT_STREAM_DOC_BATCH  docs per wave (default 500)
  *  - SPARK_GRAFT_CLOSEOUT_WAVES    ingest waves (default 8)
  *
  * Prints ONE JSON line:
  * {"metric":"closeout_growth","sf":…,"waves":N,"batch":B,
  *  "full_s":[w0,…],"incr_s":[w0,…],"idx_s":[w0,…]} — incr/idx wave 0
  * includes the one-time Shapley cache build (and, for idx, the empty
  * index init), reported in-line, not hidden.
  */
object CloseoutBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val docBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_DOC_BATCH",
      "500").toInt
    val waves = sys.env.getOrElse("SPARK_GRAFT_CLOSEOUT_WAVES",
      "8").toInt
    val spark = Sessions.local("graft-closeout-bench", cpus)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup

    // waves × batch docs in id order — the capped collect goes through
    // orderBy+limit (TakeOrdered), the StreamBench prefix discipline
    val base = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .orderBy(col("doc_id")).limit(waves * docBatch)
    val rows = base.collect()
    require(rows.length == waves * docBatch,
      s"need ${waves * docBatch} docs, corpus has ${rows.length}")
    val schema = base.schema
    def wave(i: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.slice(i * docBatch, (i + 1) * docBatch).toSeq, 4), schema)

    val tmp = java.nio.file.Files
      .createTempDirectory("graft-closeout-bench").toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Seq("full", "incr", "idx").foreach(v =>
      emb.write.parquet(s"$tmp/$v/embeddings.parquet"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val fullS = Array.ofDim[Double](waves)
    val incrS = Array.ofDim[Double](waves)
    val idxS = Array.ofDim[Double](waves)
    (0 until waves).foreach { i =>
      fullS(i) = time(streaming.CorpusStreaming.closeoutBatch(
        wave(i), i.toLong, s"$tmp/full", s"$tmp/out-full"))
      incrS(i) = time(streaming.CorpusStreaming.closeoutBatchIncremental(
        wave(i), i.toLong, s"$tmp/incr", s"$tmp/out-incr"))
      idxS(i) = time(streaming.CorpusStreaming.closeoutBatchIndexed(
        wave(i), i.toLong, s"$tmp/idx", s"$tmp/out-idx"))
    }

    // variant parity on the final wave (the cheap in-bench pin)
    val img = (d: String) => spark.read.parquet(d)
      .where(col("batch_id") === (waves - 1))
      .orderBy(col("source")).drop("batch_id")
      .collect().map(_.toString).toSeq
    val (f, n) = (img(s"$tmp/out-full"), img(s"$tmp/out-incr"))
    require(f.nonEmpty && f == n,
      s"incremental close-out drifted from the full recompute: $n vs $f")
    val x = img(s"$tmp/out-idx")
    require(x == f,
      s"indexed close-out drifted from the full recompute: $x vs $f")

    def arr(a: Array[Double]) =
      a.map(v => f"$v%.2f").mkString("[", ",", "]")
    println(s"""{"metric":"closeout_growth","sf":"$sfDir",""" +
      s""""waves":$waves,"batch":$docBatch,""" +
      s""""full_s":${arr(fullS)},"incr_s":${arr(incrS)},""" +
      s""""idx_s":${arr(idxS)}}""")
    spark.stop()
  }
}
