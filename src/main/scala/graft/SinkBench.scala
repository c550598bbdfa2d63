package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink-lifecycle benchmark: times a full build → append → probe →
  * compact chain for the persisted index sinks over
  * `SPARK_GRAFT_SF_DIR`'s documents/embeddings tables, printing ONE
  * JSON line —
  * the scale-probe companion to `graft.Bench` (which times the query
  * surface only). Run it on both a base dir and a `graft.ScaleProbe`
  * blow-up of it to measure how the index write paths scale:
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.SinkBench
  * SPARK_GRAFT_SF_DIR=/tmp/graft_scaleprobe_x10 runMain graft.SinkBench
  * }}}
  *
  * The append batch is a fixed 500-document slice re-keyed past the
  * corpus max id: append cost must track the BATCH, not the corpus, so
  * the batch is deliberately scale-invariant — at a 10× corpus a flat
  * append time is the pass criterion, not a 10× one. Probes run
  * through the public search surfaces and materialize via the noop
  * sink (the Bench discipline: count() could skip column evaluation).
  */
object SinkBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.localSized("graft-sinkbench", cpus, sfDir)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup

    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    // scale-invariant append batch: 500 docs re-keyed past the corpus
    val batch = docs.where(col("doc_id") < 500)
      .select((col("doc_id") + maxId + 1L).as("doc_id"), col("text"))
      .localCheckpoint() // pay the slice cost once, outside the timers
    val probeBatch = docs.where(col("doc_id") < 20).localCheckpoint()

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sinkbench").toString

    val text = s"$tmp/text"
    val textTimes = Seq(
      "build" -> sec(sinks.TextIndex.build(docs, text)),
      "append" -> sec(sinks.TextIndex.append(batch, text)),
      "probe" -> sec(drain(sinks.TextIndex.searchBm25(
        spark, text, Seq("the", "data", "of"), 10))),
      "compact" -> sec(sinks.TextIndex.compact(spark, text, s"$tmp/text2")))

    val span = s"$tmp/span"
    val spanTimes = Seq(
      "build" -> sec(sinks.SpanIndex.build(docs, span)),
      "append" -> sec(sinks.SpanIndex.append(batch, span)),
      "probe" -> sec(drain(sinks.SpanIndex.probe(spark, span, probeBatch))),
      "compact" -> sec(sinks.SpanIndex.compact(spark, span, s"$tmp/span2")))

    val dedup = s"$tmp/dedup"
    val dedupTimes = Seq(
      "build" -> sec(sinks.DedupIndex.build(docs, dedup)),
      "append" -> sec(sinks.DedupIndex.append(batch, dedup)),
      "probe" -> sec(drain(sinks.DedupIndex.classify(
        spark, dedup, probeBatch))),
      "compact" -> sec(sinks.DedupIndex.compact(spark, dedup,
        s"$tmp/dedup2")))

    val contam = s"$tmp/contam"
    // held-out slice as the contamination index's eval side; the probe
    // batch is the scale-invariant slice screened against it
    val held = docs.where(col("doc_id") % 20 === 0)
    val contamTimes = Seq(
      "build" -> sec(sinks.ContamIndex.build(held, contam)),
      "append" -> sec(sinks.ContamIndex.append(batch, contam)),
      "probe" -> sec(drain(sinks.ContamIndex.probe(
        spark, contam, probeBatch))),
      "compact" -> sec(sinks.ContamIndex.compact(spark, contam,
        s"$tmp/contam2")))

    val emb = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val maxVec = emb.agg(max(col("vec_id"))).head.getLong(0)
    val vecBatch = emb.where(col("vec_id") < 500)
      .select((col("vec_id") + maxVec + 1L).as("vec_id"), col("embedding"))
      .localCheckpoint()
    val vecQueries = emb.where(col("vec_id") < 10).localCheckpoint()
    val vector = s"$tmp/vector"
    val vectorTimes = Seq(
      "build" -> sec(sinks.VectorIndex.build(emb, vector, k = 16)),
      "append" -> sec(sinks.VectorIndex.append(spark, vector, vecBatch)),
      "probe" -> sec(drain(sinks.VectorIndex.search(
        spark, vector, vecQueries, nprobe = 2, topK = 3))),
      "compact" -> sec(sinks.VectorIndex.compact(spark, vector,
        s"$tmp/vector2")))

    val lm = s"$tmp/lm"
    val lmTimes = Seq(
      "build" -> sec(sinks.LmIndex.build(docs, lm)),
      "append" -> sec(sinks.LmIndex.append(batch, lm)),
      "probe" -> sec(drain(sinks.LmIndex.score(spark, lm, probeBatch))),
      "probeKn" -> sec(drain(sinks.LmIndex.scoreKn(spark, lm, probeBatch))),
      "compact" -> sec(sinks.LmIndex.compact(spark, lm, s"$tmp/lm2")))

    // cluster index: build = the full q54 clustering; append = a
    // scale-invariant 500-doc batch whose texts DUPLICATE indexed docs
    // (re-keyed copies), so the append path pays real edge discovery
    // and cluster merges, not just writes; probe = the additive
    // dedup-mass report (the close-out's arm)
    val cdocs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), col("text"))
    val cbatch = cdocs.where(col("doc_id") < 500)
      .select((col("doc_id") + maxId + 1L).as("doc_id"), col("source"),
        col("text"))
      .localCheckpoint()
    val cluster = s"$tmp/cluster"
    val clusterTimes = Seq(
      "build" -> sec(sinks.ClusterIndex.build(cdocs, cluster)),
      "append" -> sec(sinks.ClusterIndex.append(spark, cluster, cbatch)),
      "probe" -> sec(drain(sinks.ClusterIndex.report(spark, cluster))))

    def js(ts: Seq[(String, Double)]): String =
      ts.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"sink_chain_sec","sf":"$sfDir",""" +
      s""""text":${js(textTimes)},"span":${js(spanTimes)},""" +
      s""""dedup":${js(dedupTimes)},"contam":${js(contamTimes)},""" +
      s""""vector":${js(vectorTimes)},"lm":${js(lmTimes)},""" +
      s""""cluster":${js(clusterTimes)}}""")
    spark.stop()
  }
}
