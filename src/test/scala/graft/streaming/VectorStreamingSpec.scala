package graft.streaming

import graft.{Tables, TestSpark}
import graft.sinks.VectorIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

// top-level: a nested case class would capture the suite as an outer
// pointer and break encoder codegen
case class StreamedVec(vec_id: Long, embedding: Array[Float])

/** Streaming embeddings must land in the persisted IVF index with the
  * batch-scoped idempotency contract, and searches after the stream
  * must be byte-identical to a one-shot batch build over the same
  * corpus — streaming ingest is an implementation detail the reader
  * can't observe.
  */
class VectorStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed batches serve the same answers as a batch build") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    // base index: first 300 ids ⊇ the Lloyd training sample, so the
    // frozen quantizer equals the full build's (the append contract)
    val out = TestSpark.tmpDir("stream-ivf")
    VectorIndex.build(emb.where(col("vec_id") < 300), out, k = 16)
    val rows = emb.where(col("vec_id") >= 300).as[StreamedVec]
      .collect().sortBy(_.vec_id)
    val (b1, b2) = rows.splitAt(rows.length / 2)

    val ms = MemoryStream[StreamedVec]
    val q = VectorStreaming.indexSink(ms.toDF(), out)
      .option("checkpointLocation", TestSpark.tmpDir("stream-ivf-ckpt"))
      .start()
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()

    // two delta generations on disk (the idempotent-replay unit)
    val gens = new java.io.File(s"$out/postings_delta").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(gens == Set("gen=0", "gen=1"))

    val full = TestSpark.tmpDir("stream-ivf-full")
    VectorIndex.build(emb, full, k = 16)
    val queries = emb.where(col("vec_id") < 10)
    val got = VectorIndex.search(spark, out, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    val want = VectorIndex.search(spark, full, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }
}
