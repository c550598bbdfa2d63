package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Parity pins for the two r16 hot-path expressions: each must equal
  * the composed formulation it replaced, row for row, on real corpus
  * data — the ShinglesSpec discipline applied to this round's changes.
  */
class R16ExprSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("sorted_intersect_count == size(array_intersect), on real gram sets") {
    // q111's verify stage: both sides are per-doc distinct gram sets;
    // the merge count requires SORTED inputs (sort_array), which is
    // exactly how q111 prepares them
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    val sets = docs.select(col("doc_id"),
        Shingles.shingles(col("text"), 3).as("g"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("g"))).as("gs"))
    val pairs = sets.alias("a").join(sets.alias("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.gs").as("ga"), col("b.gs").as("gb"))
    val cmp = pairs.select(
      SortedIntersectCount.sortedIntersectCount(col("ga"), col("gb"))
        .as("fast"),
      size(array_intersect(col("ga"), col("gb"))).cast("bigint")
        .as("ref"))
    assert(cmp.where(col("fast") =!= col("ref")).count() == 0)
    assert(cmp.where(col("fast") > 0).count() > 0,
      "fixture produced no overlapping pairs — parity vacuous")
  }

  test("sentinel_pairs == explode(transform(split(...))), row for row") {
    // q216's pair stream over sentinel-encoded corpus rows, including
    // single-token rows (no pairs) and merged tokens containing '_'
    import spark.implicits._
    val rows = Seq("<a><b><c>", "<a>", "<a_b><c><a_b>", "<x><x><x><x>")
      .toDF("s")
    val viaGen = rows.select(
      SentinelPairs.sentinelPairs(col("s")).as(Seq("w1", "w2")))
    val viaExpr = rows
      .select(expr("split(substring(s, 2, length(s) - 2), '><')").as("arr"))
      .where(expr("size(arr) >= 2"))
      .select(explode(expr(
        """transform(sequence(1, size(arr) - 1),
             i -> named_struct('w1', arr[i-1], 'w2', arr[i]))""")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    assert(viaGen.exceptAll(viaExpr).count() == 0)
    assert(viaExpr.exceptAll(viaGen).count() == 0)
    assert(viaGen.count() == 7) // 2 + 0 + 2 + 3 adjacent pairs
  }
}
