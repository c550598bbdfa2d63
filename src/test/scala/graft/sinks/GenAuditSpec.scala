package graft.sinks

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[GenAudit]] pins: healthy appends report `complete`; each planted
  * anomaly — an orphan claim marker, a straggler-deleted relation, an
  * unclaimed streaming generation — gets exactly its documented
  * verdict, and the VectorIndex two-group rule holds (a raw append's
  * gen is complete without any pq tree).
  */
class GenAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("claims reconcile against delta trees per status rule") {
    val idx = TestSpark.tmpDir("genaudit-dedup")
    DedupIndex.build(docs.where(col("doc_id") < 100), idx)
    DedupIndex.append(docs.where(
      col("doc_id") >= 100 && col("doc_id") < 120), idx) // gen -1
    DedupIndex.append(docs.where(
      col("doc_id") >= 120 && col("doc_id") < 140), idx) // gen -2
    // streaming-style caller-assigned gen: present, never claimed
    DedupIndex.appendDelta(docs.where(
      col("doc_id") >= 140 && col("doc_id") < 150), idx, gen = 3L)
    // orphan claim: allocation that crashed before its first write
    new java.io.File(s"$idx/_gen_claims/gen=-7").createNewFile()
    // straggler-deleted partial: gen -2 loses its bands tree
    val bands2 = new java.io.File(s"$idx/bands_delta/gen=-2")
    assert(bands2.exists())
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(bands2)

    val rows = GenAudit.audit(spark, Map("DedupIndex" -> idx))
      .collect()
      .map(r => r.getLong(1) ->
        (r.getBoolean(2), r.getString(5), r.getSeq[String](4).toSet))
      .toMap
    assert(rows.keySet == Set(-7L, -2L, -1L, 3L))
    assert(rows(-1L) == ((true, "complete", Set.empty[String])))
    assert(rows(3L) == ((false, "complete", Set.empty[String])))
    assert(rows(-7L) ==
      ((true, "claim_only", Set("fingerprints", "bands"))))
    assert(rows(-2L) == ((true, "partial", Set("bands"))),
      "a straggler-deleted relation must flag the gen partial")
  }

  test("VectorIndex: a raw-only gen is complete under the group rule") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val idx = TestSpark.tmpDir("genaudit-vec")
    VectorIndex.build(e.where(col("vec_id") < 400), idx, k = 8)
    VectorIndex.append(spark, idx,
      e.where(col("vec_id") >= 400)) // gen -1, raw postings only
    val rows = GenAudit.audit(spark, Map("VectorIndex" -> idx))
      .collect().map(r => r.getLong(1) -> r.getString(5)).toMap
    assert(rows == Map(-1L -> "complete"),
      "raw append must be complete without a pq tree")
  }
}
