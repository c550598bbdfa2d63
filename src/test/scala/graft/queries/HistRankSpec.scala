package graft.queries

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** histRank/ntileFromRank are the scale-safe substitute for global
  * row_number/NTILE in q128/q145 — their contract ("exactly the rank /
  * bucket a single-partition sort would assign") is pinned here
  * directly, beyond the two query oracles, including the edge cases a
  * production column can hit: heavy duplicates (many rows per
  * histogram bucket), a CONSTANT value column (every row lands in one
  * bucket — the degenerate single-partition fallback must still rank
  * correctly), and row counts that don't divide the bucket count.
  */
class HistRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .toDF("v", "tie")
  }

  private def ranksOf(vals: Seq[Double]): Seq[(Long, Long, Long)] =
    AnalyticQueries.histRank(df(vals), "tie")
      .select(col("tie"), col("r"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)

  private def oracle(vals: Seq[Double]): Seq[(Long, Long, Long)] =
    df(vals).withColumn("r", row_number().over(
        Window.orderBy(col("v").asc, col("tie").asc)).cast("bigint"))
      .withColumn("n", lit(vals.size.toLong))
      .select(col("tie"), col("r"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)

  test("histRank == global row_number on mixed values with duplicates") {
    val vals = Seq(5.0, 1.0, 3.0, 3.0, 3.0, 2.0, 5.0, 0.0, 4.5, 1.0,
      2.5, 2.5, 9.9, -3.0, 0.0)
    assert(ranksOf(vals) == oracle(vals))
  }

  test("histRank survives a constant value column (degenerate bucket)") {
    val vals = Seq.fill(37)(7.25)
    assert(ranksOf(vals) == oracle(vals))
  }

  test("ntileFromRank == Spark ntile for non-dividing row counts") {
    import spark.implicits._
    for (k <- Seq(3, 10); n <- Seq(7, 10, 23)) {
      val vals = (0 until n).map(i => ((i * 37) % 11).toDouble)
      val got = AnalyticQueries.histRank(df(vals), "tie")
        .withColumn("bin", expr(AnalyticQueries.ntileFromRank(k)))
        .select(col("tie"), col("bin"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sortBy(_._1)
      val want = df(vals)
        .withColumn("bin", ntile(k).over(
          Window.orderBy(col("v").asc, col("tie").asc)))
        .select(col("tie"), col("bin"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sortBy(_._1)
      assert(got == want, s"k=$k n=$n")
    }
  }
}
