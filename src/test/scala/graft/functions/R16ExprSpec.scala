package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Parity pin for the r16 hot-path generator: it must equal the
  * composed formulation it replaced, row for row — the ShinglesSpec
  * discipline applied to this round's changes. (A second r16
  * expression, sorted_intersect_count for q111's verify stage, was
  * measured slower than size(array_intersect) at both gate and probe
  * SFs and removed with its pin — see the q111 NOTE.)
  */
class R16ExprSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

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
