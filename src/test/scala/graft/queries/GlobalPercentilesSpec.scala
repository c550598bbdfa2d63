package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Q.globalExactPercentiles is the library's scale-safe global
  * percentile primitive (q148, q180, q211 route through it), so its
  * contract is pinned beyond the query oracles — including the two
  * degenerate shapes that used to collapse the whole relation into one
  * rank-window task before the refinement level existed: a CONSTANT
  * column (every row in histogram bin 0) and an EXTREME OUTLIER (hi so
  * far out that ~all rows funnel into one bucket). Both must come back
  * numerically exact AND leave no unpartitioned window in the final
  * plan (the refinement re-bins by bucket-local bounds; all-tied
  * sub-buckets resolve directly with no window at all).
  */
class GlobalPercentilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val ps = Seq(0.1 -> "p10", 0.5 -> "p50", 0.9 -> "p90")

  private def run(vals: Seq[Double]) = {
    import spark.implicits._
    Q.globalExactPercentiles(vals.toDF("x"), "x", ps)
  }

  private def oracle(vals: Seq[Double]): Seq[Double] = {
    import spark.implicits._
    vals.toDF("x")
      .selectExpr(s"percentile(x, array(${ps.map(_._1).mkString(",")}))")
      .collect()(0).getSeq[Double](0)
  }

  private def check(vals: Seq[Double]): Unit = {
    val df = run(vals)
    // no data-sized single-partition window anywhere in the final
    // plan: every WindowExec must carry a non-empty partitionSpec
    // (the construction-time checkpoint jobs contain only the two
    // ≤1000-row histogram windows, bounded by construction)
    val bad = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "unpartitioned window in globalExactPercentiles")
    val row = df.collect()(0)
    assert(row.getLong(0) === vals.size.toLong)
    val got = ps.indices.map(i => row.getDouble(i + 1))
    val want = oracle(vals)
    ps.indices.foreach { i =>
      assert(math.abs(got(i) - want(i)) < 1e-9,
        s"${ps(i)._2}: got ${got(i)} want ${want(i)}")
    }
  }

  test("matches percentile() on a mixed distribution") {
    check(Seq(5.0, 1.0, 3.0, 3.0, 2.0, 5.5, 0.0, 4.5, 1.0, 2.5,
      9.9, -3.0, 0.0, 7.7, 6.1))
  }

  test("constant column: all mass in one bucket, no rank window runs") {
    check(Seq.fill(4096)(7.25))
  }

  test("extreme outlier: 1e9 funnels everything else into bin 0") {
    val vals = (1 to 5000).map(_.toDouble) :+ 1e9
    check(vals)
  }

  test("heavy ties with a spread tail") {
    val vals = Seq.fill(2000)(42.0) ++ (1 to 500).map(_ / 7.0)
    check(vals)
  }

  test("empty input: one row, n = 0, null percentiles") {
    val row = run(Seq.empty).collect()(0)
    assert(row.getLong(0) === 0L)
    ps.indices.foreach(i => assert(row.isNullAt(i + 1)))
  }
}
