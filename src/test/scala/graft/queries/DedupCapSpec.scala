package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q245's per-doc top-64 candidate cap, pinned on a clique LARGER than
  * the cap — the r13 weak item: the cap's recall bound used to be a
  * scaladoc sentence; now every report row carries `culled_pairs`, the
  * exact number of band-candidate pairs the cap dropped. This spec
  * proves the reported count on a fixture where the true count is
  * derivable from first principles, and that a sub-cap corpus reports
  * exactly zero (no silent culls).
  *
  * Fixture: one clique of n IDENTICAL docs (same source). Identical
  * texts ⇒ identical MinHash signatures ⇒ every ordered pair
  * (doc_a < doc_b) collides in all 4 bands and survives the Δlen ≤ 64
  * bound (Δlen = 0). So doc_a = the i-th smallest id has exactly
  * n−1−i candidates, and the cap culls Σ_i max(0, n−1−i − 64) pairs.
  */
class DedupCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cliqueText =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"

  private def fixtureDir(n: Int): String = {
    val d = TestSpark.tmpDir(s"dedup-cap-$n")
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, cliqueText)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("clique").as("source"),
        length(col("text")).cast("bigint").as("n_chars"))
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def expectedCulled(n: Int): Long =
    (0 until n).map(i => math.max(0, (n - 1 - i) - 64)).sum.toLong

  test("q245 reports the exact pair count a >64 clique culls") {
    val n = 70
    val rows = SparkEntry.queries("q245_edit_neardup")(
      spark, fixtureDir(n)).collect()
    assert(rows.nonEmpty, "clique fixture must produce report rows")
    val culled = rows.map(_.getAs[Long]("culled_pairs")).distinct
    assert(culled.toSeq == Seq(expectedCulled(n)),
      s"culled_pairs must be the exact cap cost (${expectedCulled(n)})")
    assert(expectedCulled(n) == 15L) // 5+4+3+2+1 — the model itself
    // and the cap really binds on the PRE-LIMIT candidate relation
    // (the report is LIMIT 50, where fan-out can never exceed 50 and
    // an assertion over it is vacuous): in the n-clique, doc_a = i has
    // n-1-i band candidates, so kept(i) must be exactly min(n-1-i, 64)
    val (kept, _) = DedupQueries.editRerankCandidates(
      spark, fixtureDir(n))
    val keptCounts = kept.groupBy("doc_a").count().collect()
      .map(r => r.getAs[Long]("doc_a") -> r.getAs[Long]("count")).toMap
    assert(keptCounts(0L) == 64L,
      "doc_a=0 (69 candidates) must keep exactly the 64-pair cap")
    (0 until n - 1).foreach { i =>
      assert(keptCounts(i.toLong) == math.min(n - 1 - i, 64).toLong,
        s"doc_a=$i kept ${keptCounts(i.toLong)}")
    }
  }

  test("q245 reports zero culled pairs when the cap is vacuous") {
    val rows = SparkEntry.queries("q245_edit_neardup")(
      spark, fixtureDir(10)).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("culled_pairs") == 0L),
      "a sub-cap corpus must report a zero recall cost")
  }
}
