package graft.streaming

import graft.sinks.VectorIndex
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming vector ingest — embeddings arrive as a stream (crawl
  * encoder output, model telemetry) and land in a persisted
  * [[VectorIndex]] continuously, so ANN searches always see the corpus
  * up to the last committed micro-batch without any rebuild.
  *
  * Exactly-once: foreachBatch is at-least-once, so each micro-batch
  * writes through `VectorIndex.appendDelta` with the BATCH ID as the
  * generation — a replayed batch rewrites its own
  * `postings_delta/gen=<id>` subtree instead of appending a second
  * copy (the same batch-scoped-overwrite idempotency contract as
  * `CorpusStreaming.exportSink`). Searches union the delta
  * generations transparently; a periodic `VectorIndex.compact` folds
  * them back into the main cell tree.
  *
  * Scale: each micro-batch costs O(batch) — one broadcast-centroid
  * assignment against the frozen quantizer, one cell-partitioned
  * write. The quantizer never moves during ingest (re-training is a
  * rebuild, by design), so commits never touch indexed generations.
  */
object VectorStreaming {

  /** Sink a (vec_id, embedding) stream into the index at `indexDir`
    * (which must already exist — [[VectorIndex.build]] defines the
    * quantizer). Start with `.option("checkpointLocation", …).start()`.
    */
  def indexSink(emb: DataFrame, indexDir: String): DataStreamWriter[Row] =
    emb.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        VectorIndex.appendDelta(batch.sparkSession, indexDir, batch, id)
      }
}
