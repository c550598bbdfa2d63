package graft.streaming

import graft.sinks.CorpusExport
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Streaming corpus ingest — the continuous twin of the batch pipeline
  * (q52 funnel → q22 exact dedup → q51 split → CorpusExport): documents
  * arrive as a stream, are feature-scored in the same single map pass,
  * deduplicated on content fingerprint with watermark-bounded state,
  * and each micro-batch of survivors is appended to the partitioned
  * corpus tree.
  *
  * Scale: the only stateful operator is the fingerprint dedup, keyed by
  * md5 — state shards across executors and the watermark forgets
  * fingerprints older than the horizon, so state is bounded on an
  * infinite crawl. Everything else is stateless per-row work.
  */
object CorpusStreaming {

  /** Funnel survivors of a document stream (needs an `ingest_ts`
    * timestamp column): exact-dup losers within the watermark horizon
    * are dropped first (same fingerprint rule as q22 — state, not a
    * window, because the stream has no fixed corpus to rank), then the
    * q52 quality thresholds apply, then the q51 split is attached.
    */
  def cleanStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", graft.queries.Q.fingerprint(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("fp"))
      .withColumn("ws", expr(graft.queries.TextQueries.wordsExpr))
      .withColumn("n_tokens", expr("cast(size(ws) as bigint)"))
      .withColumn("stop_ratio",
        expr("size(filter(ws, x -> x = 'the' or x = 'a')) / size(ws)"))
      .where(col("n_tokens") >= 30 && col("stop_ratio") >= 0.02)
      .withColumn("split", expr(
        """case when substring(md5(cast(concat('split|',
             cast(doc_id as string)) as binary)), 1, 2) < 'cd'
           then 'train' else 'held_out' end"""))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_tokens"), col("split"))

  /** Append each micro-batch to the hive-partitioned corpus tree via
    * the batch export sink (same layout contract as [[CorpusExport]]).
    * foreachBatch is the canonical streaming→batch-sink bridge: the
    * batch DataFrame reuses the full batch writer, and the partitioned
    * append is idempotent per (batch, file) under retries.
    */
  def exportSink(clean: DataFrame, outDir: String): DataStreamWriter[Row] =
    clean.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        CorpusExport.write(batch, outDir, mode = "append")
      }
}
