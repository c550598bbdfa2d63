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

  /** Plan inspection needs AQE off: AdaptiveSparkPlanExec exposes no
    * children, so a `.collect` over the adaptive executedPlan silently
    * traverses NOTHING (it matched zero windows even when they were
    * there — the assertion was vacuous until this wrapper was added).
    */
  private def windows(vals: Seq[Double])
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try run(vals).queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def check(vals: Seq[Double]): Unit = {
    val df = run(vals)
    // no data-sized single-partition window anywhere in the final
    // plan: every WindowExec must carry a non-empty partitionSpec
    // (the construction-time checkpoint jobs contain only the
    // ≤1000-row histogram windows, bounded by construction — the
    // ckpt-noop audit pass in PlanQualitySpec covers those)
    val bad = windows(vals).filter(_.partitionSpec.isEmpty)
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

  test("second-order value cliff: level 1 alone would leave a " +
      "data-sized rank window; level 2 distributes it") {
    // Adversarial construction for the round-7 residual:
    //  - global outliers 0 and 1e12 make the level-0 bin width 1e9,
    //    funneling everything interesting into bin 0;
    //  - an IN-BIN outlier at 9e8 stretches bin 0's LOCAL range to
    //    9e8, so the level-1 sub width is 9e5 and the whole cluster
    //    (5000 DISTINCT values spread over 5.0 at 1e6) lands in ONE
    //    non-tied sub-bucket — the exact cliff that, before level 2,
    //    went to a rank window over ~all 5000 cluster rows;
    //  - level 2 re-bins that sub-bucket by the CLUSTER's own min/max
    //    (the in-bin outlier is in sub 999, excluded), so sub2 width
    //    is 0.005 and each final window partition holds ~5 rows.
    // The structural witness: the final plan's rank window partitions
    // by three keys (bin, sub, sub2) — asserted below on top of
    // check()'s no-unpartitioned-window and exact-value gates.
    val cliff = Seq(0.0, 9e8, 1e12) ++
      (1 to 5000).map(i => 1e6 + i * 0.001)
    check(cliff)
    val threeKey = windows(cliff).filter(_.partitionSpec.size == 3)
    assert(threeKey.nonEmpty,
      "expected the final rank window partitioned by (bin, sub, sub2)")
  }

  test("empty input: one row, n = 0, null percentiles") {
    val row = run(Seq.empty).collect()(0)
    assert(row.getLong(0) === 0L)
    ps.indices.foreach(i => assert(row.isNullAt(i + 1)))
  }
}
