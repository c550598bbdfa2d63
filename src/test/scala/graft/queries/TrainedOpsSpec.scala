package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-6 trained/sketched operators that the DuckDB
  * oracle cannot express as hash equality: optimization progress (q201),
  * one-sided sketch error (q202), analytic bounds (q203), and unit
  * normalization (q204). These hold at ANY scale factor — they are
  * properties of the algorithms, not of the fixture data.
  */
class TrainedOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q201: GD loss starts at ln 2 and strictly decreases") {
    val rows = graft.SparkEntry.queries("q201_logreg_quality")(spark, dir)
      .orderBy("iter").collect()
    assert(rows.length == 3)
    // weights start at 0 => p = 0.5 everywhere => loss exactly ln 2
    assert(rows(0).getDouble(1) == math.rint(math.log(2) * 1e6) / 1e6)
    val losses = rows.map(_.getDouble(1))
    assert(losses.sliding(2).forall { case Array(a, b) => b < a },
      s"loss not strictly decreasing: ${losses.mkString(", ")}")
    // the learned separator must point somewhere: not all weights zero
    val last = rows(2)
    assert((2 to 5).map(last.getDouble).exists(_ != 0.0))
  }

  test("q202: CMS estimates never underestimate; exact column is exact") {
    val rows = graft.SparkEntry.queries("q202_cms_heavy_hitters")(spark, dir)
      .collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val (exact, est, over) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(est >= exact, s"${r.getString(1)}: CMS underestimated")
      assert(over == est - exact)
    }
    // cross-check the exact counts against an independent word count
    import org.apache.spark.sql.functions._
    val wc = graft.Tables(spark, dir).documents
      .select(explode(expr(TextQueries.wordsExpr)).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(wc(r.getString(1)) == r.getLong(2), s"${r.getString(1)}"))
  }

  test("q203: sample ACF is bounded by [-1, 1] (Cauchy-Schwarz)") {
    val rows = graft.SparkEntry.queries("q203_daily_acf")(spark, dir)
      .collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val acf = r.getDouble(2)
      assert(acf >= -1.0 && acf <= 1.0, s"lag ${r.getInt(0)}: $acf")
    }
  }

  test("q204: principal loadings are unit-norm, eigenvalue positive") {
    val rows = graft.SparkEntry.queries("q204_pca_power")(spark, dir)
      .collect()
    assert(rows.length == 64)
    val norm = math.sqrt(rows.map(r => {
      val v = r.getDouble(1); v * v
    }).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"‖v‖ = $norm")
    // a covariance matrix is PSD: its Rayleigh quotient can't be < 0
    assert(rows.head.getDouble(2) > 0.0)
  }

  test("q205: communities partition the vertex set") {
    import org.apache.spark.sql.functions._
    val top = graft.SparkEntry.queries("q205_label_prop")(spark, dir)
      .collect()
    assert(top.nonEmpty && top.length <= 20)
    // sizes are positive and ranked consistently
    val sizes = top.map(_.getLong(2))
    assert(sizes.forall(_ > 0))
    assert(sizes.sliding(2).forall { case Array(a, b) => a >= b })
    // total labeled vertices across ALL communities == graph vertices
    // (each vertex gets exactly one label per round)
    val li = graft.Tables(spark, dir).lineitem
      .where(col("l_quantity") >= 40)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nVerts = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("v"))
      .unionByName(li.as("a")
        .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .select(col("b.l_partkey").as("v")))
      .distinct().count()
    assert(sizes.sum <= nVerts)
  }

  test("BPE: a degenerate superstep (no pairs left) is the identity") {
    // Every word fully merged to one symbol ⇒ zero adjacent pairs.
    // The superstep must emit ONE all-null merge row and leave the
    // vocab byte-identical — the exact semantics bpeChainDuck's
    // empty-p_i UNION-ALL branch mirrors, so both engines stay in
    // lockstep on tiny vocabs / oversized bpeIters (the r10 advice
    // divergence).
    import spark.implicits._
    val merged = Seq(("ab", 3L, "ab_"), ("cd", 1L, "cd_"))
      .toDF("word", "wf", "rep")
    val (best, v1) = PipelineQueries.bpeStep(merged, 7)
    val b = best.collect()
    assert(b.length == 1)
    assert(b(0).getInt(0) == 7)
    assert((1 to 5).forall(b(0).isNullAt), s"expected all-null merge: ${b(0)}")
    assert(v1.orderBy("word").collect().toSeq ==
      merged.orderBy("word").collect().toSeq)
    // and a NON-degenerate step on the same shape still merges: the
    // most frequent adjacent pair wins with the lexicographic tiebreak
    val live = Seq(("ab", 3L, "a b _"), ("ac", 3L, "a c _"))
      .toDF("word", "wf", "rep")
    val (best2, v2) = PipelineQueries.bpeStep(live, 1)
    val r2 = best2.collect()(0)
    assert(r2.getString(1) == "a b" && r2.getLong(5) == 3L)
    assert(v2.orderBy("word").collect().map(_.getString(2)).toSeq ==
      Seq("ab _", "a c _"))
  }
}
