package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q279 is a pure composition of three shared per-source relations —
  * these invariants pin that the composition adds nothing: each column
  * block must agree with the query that owns its definition, and the
  * verdict must be exactly the documented rule over the row's own
  * columns.
  */
class CurationCloseoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q279 recomposes q278/q262/q249 without drift; verdict is the rule") {
    val rows = graft.SparkEntry.queries("q279_curation_closeout")(
      spark, dir).collect()
    assert(rows.nonEmpty)

    // dedup block ≡ q278 (source, n_docs, uniqueness, dedup_share)
    val q278 = graft.SparkEntry.queries("q278_dedup_weights")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(5), r.getDouble(4))).toMap
    assert(rows.length == q278.size, "one row per q278 source")
    rows.foreach { r =>
      val (n, uniq, share) = q278(r.getString(0))
      assert(r.getLong(1) == n && r.getDouble(2) == uniq &&
        r.getDouble(3) == share, s"${r.getString(0)}: dedup block drift")
    }

    // mixture block ≡ q249's weight
    val q249 = graft.SparkEntry.queries("q249_doremi_mixture")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    rows.foreach { r =>
      assert(!r.isNullAt(7) && r.getDouble(7) == q249(r.getString(0)),
        s"${r.getString(0)}: doremi weight drift")
    }

    // value block: Σ per-source mass ≡ Σ q262 shap over valued docs
    // (same DECIMAL(32,9) quantization, so the sums match to 1 ulp of
    // the round-9 output grid)
    val q262 = graft.SparkEntry.queries("q262_knn_shapley")(spark, dir)
      .collect().map(r => math.rint(r.getDouble(2) * 1e9) / 1e9).sum
    val massSum = rows.filter(!_.isNullAt(5)).map(_.getDouble(5)).sum
    assert(math.abs(massSum - q262) < 1e-6,
      s"value mass $massSum != q262 total $q262")
    val valued = rows.filter(!_.isNullAt(4)).map(_.getLong(4)).sum
    assert(valued == graft.SparkEntry.queries("q262_knn_shapley")(
      spark, dir).count(), "every valued doc lands in exactly one source")

    // verdict is exactly the documented rule over the row's columns
    rows.foreach { r =>
      val want =
        if (r.getDouble(2) < 0.5) "hold_duplication"
        else if (!r.isNullAt(6) && r.getDouble(6) < 0.0) "hold_value"
        else "ship"
      assert(r.getString(8) == want,
        s"${r.getString(0)}: verdict ${r.getString(8)} != $want")
    }
  }
}
