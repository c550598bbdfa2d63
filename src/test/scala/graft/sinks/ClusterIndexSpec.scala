package graft.sinks

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[ClusterIndex]] pins: the persisted clusters equal the full q54
  * recompute over the accumulated corpus after ANY append sequence —
  * including waves that merge previously separate clusters — and the
  * incremental report equals [[graft.queries.DedupQueries]]'
  * dedup-mass rollup row for row (shared tail, so what this tests is
  * the additive size maintenance).
  */
class ClusterIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docsAll: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.orderBy(df.columns.map(col): _*).collect().map(_.toString).toSeq

  private def assertState(idx: String, corpus: DataFrame): Unit = {
    val gotA = sortedRows(ClusterIndex.assignments(spark, idx))
    val wantA = sortedRows(
      graft.queries.DedupQueries.clusterAssignmentOf(corpus))
    assert(gotA.nonEmpty && gotA == wantA,
      "index assignments != full q54 recompute")
    val gotR = sortedRows(ClusterIndex.report(spark, idx))
    val wantR = sortedRows(
      graft.queries.DedupQueries.dedupWeightsOf(corpus))
    assert(gotR.nonEmpty && gotR == wantR,
      "index report != full dedup-mass recompute")
  }

  test("build ≡ q54 assignment + dedup-mass report") {
    val idx = TestSpark.tmpDir("clusteridx-build")
    ClusterIndex.build(docsAll, idx)
    assertState(idx, docsAll)
  }

  test("three-wave append ≡ full rebuild over the accumulated corpus") {
    val idx = TestSpark.tmpDir("clusteridx-waves")
    val w0 = docsAll.where(col("doc_id") < 170)
    val w1 = docsAll.where(col("doc_id") >= 170 && col("doc_id") < 340)
    val w2 = docsAll.where(col("doc_id") >= 340)
    ClusterIndex.build(w0, idx)
    ClusterIndex.append(spark, idx, w1)
    assertState(idx, w0.unionByName(w1))
    ClusterIndex.append(spark, idx, w2)
    assertState(idx, docsAll)
  }

  test("compact folds deltas; post-compact appends stay exact") {
    val src = TestSpark.tmpDir("clusteridx-compact-src")
    val dst = TestSpark.tmpDir("clusteridx-compact-dst")
    val w0 = docsAll.where(col("doc_id") < 200)
    val w1 = docsAll.where(col("doc_id") >= 200 && col("doc_id") < 350)
    val w2 = docsAll.where(col("doc_id") >= 350)
    ClusterIndex.build(w0, src)
    ClusterIndex.append(spark, src, w1)
    ClusterIndex.compact(spark, src, dst)
    // folded: no delta trees, identical state
    assert(!new java.io.File(s"$dst/shingles_delta").exists() &&
      !new java.io.File(s"$dst/assign_delta").exists())
    assertState(dst, w0.unionByName(w1))
    // the compacted index keeps accepting appends exactly
    ClusterIndex.append(spark, dst, w2)
    assertState(dst, docsAll)
  }

  test("plain append touches zero main-tree files (gen-delta contract)") {
    // the SinkContractSpec FILE-LEVEL invariant, applied to the
    // seventh sink: append must write only delta subtrees — a
    // main-tree rewrite would make append O(index), not O(batch)
    val idx = TestSpark.tmpDir("clusteridx-files")
    ClusterIndex.build(docsAll.where(col("doc_id") < 300), idx)
    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(idx))
        .filterNot(_.getPath.contains("_delta"))
        .filterNot(_.getPath.contains("_gen_claims"))
        .map(f => f.getPath -> (f.lastModified(), f.length())).toMap
    }
    val before = snapshot()
    ClusterIndex.append(spark, idx,
      docsAll.where(col("doc_id") >= 300))
    assert(snapshot() == before,
      "plain append must leave every main-tree file byte-untouched")
  }

  test("a bridging doc merges two indexed clusters; replay is exact") {
    import spark.implicits._
    // two 2-doc cliques indexed in separate waves, then a bridge doc
    // sharing exactly one trigram with each (1/11 = 0.091 ≥ 0.02,
    // clique-vs-clique overlap 0): the merge must relabel cluster 11's
    // members to 1, tombstone 11, and grow cluster 1 to all five docs
    val t1 = "aa bb cc dd ee ff gg hh"
    val t2 = "pp qq rr ss tt uu vv ww"
    val bridge = "aa bb cc zz yy pp qq rr"
    val wave0 = Seq((1L, "s", t1), (2L, "s", t1))
      .toDF("doc_id", "source", "text")
    val wave1 = Seq((11L, "s", t2), (12L, "s", t2),
      (31L, "s", "solitary singleton words entirely alone here now"))
      .toDF("doc_id", "source", "text")
    val wave2 = Seq((21L, "s", bridge)).toDF("doc_id", "source", "text")
    val idx = TestSpark.tmpDir("clusteridx-merge")
    ClusterIndex.build(wave0, idx)
    ClusterIndex.append(spark, idx, wave1)
    // pre-merge: two separate cliques
    val pre = ClusterIndex.assignments(spark, idx).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pre == Map(1L -> 1L, 2L -> 1L, 11L -> 11L, 12L -> 11L,
      31L -> 31L))

    ClusterIndex.append(spark, idx, wave2)
    val corpus = wave0.unionByName(wave1).unionByName(wave2)
    assertState(idx, corpus)
    val post = ClusterIndex.assignments(spark, idx).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(post == Map(1L -> 1L, 2L -> 1L, 11L -> 1L, 12L -> 1L,
      21L -> 1L, 31L -> 31L),
      "bridge must merge both cliques under the min-id label")

    // replay the merge generation (the crash-and-rerun story): every
    // read inside appendDelta excludes the gen being rewritten, so the
    // recompute sees the same prior state and the state is unchanged
    val before = sortedRows(ClusterIndex.report(spark, idx))
    ClusterIndex.appendDelta(spark, idx, wave2, gen = -2L)
    assert(sortedRows(ClusterIndex.report(spark, idx)) == before &&
      post == ClusterIndex.assignments(spark, idx).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "replaying a generation must not change the state")
  }
}
