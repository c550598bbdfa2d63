package graft.plans

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile
import org.scalatest.funsuite.AnyFunSuite

/** The percentile scale guard: identical answers to the holistic
  * aggregate (obtained by excluding the rule), no `Percentile` left in
  * the optimized plan, and exact null semantics.
  */
class ScaleSafePercentilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val excludeConf = "spark.sql.optimizer.excludedRules"

  private def holistic[A](body: => A): A = {
    spark.conf.set(excludeConf, ScaleSafePercentiles.getClass.getName
      .stripSuffix("$"))
    try body finally spark.conf.unset(excludeConf)
  }

  private def hasPercentile(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[Percentile])))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet[org.apache.spark.sql.Row].map(_.toSeq.map {
      case d: Double => math.round(d * 1e9) / 1e9
      case x => x
    })

  test("grouped percentiles match the holistic plan and drop the buffer") {
    val sql = """SELECT l_returnflag,
                   percentile(l_quantity, 0.5D) AS p50,
                   percentile(l_quantity, 0.95D) AS p95,
                   percentile(l_extendedprice, 0.25D) AS price_p25
                 FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`
                 GROUP BY l_returnflag"""
    val rewritten = spark.sql(sql)
    assert(!hasPercentile(rewritten), "rule must remove the holistic agg")
    assert(rewritten.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window]))
    val expected = holistic {
      val df = spark.sql(sql)
      assert(hasPercentile(df), "exclusion must restore the holistic agg")
      rows(df)
    }
    assert(rows(rewritten) == expected)
  }

  test("global aggregate (no GROUP BY) matches") {
    val sql = """SELECT percentile(l_tax, 0.5D) AS p50
                 FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`"""
    val rewritten = spark.sql(sql)
    assert(!hasPercentile(rewritten))
    assert(rows(rewritten) == holistic(rows(spark.sql(sql))))
  }

  test("null values are skipped; all-null groups yield null") {
    import spark.implicits._
    Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", null), ("a", 3.0), ("a", 2.0),
      ("b", null), ("b", null),
      ("c", 7.0))
      .toDF("k", "x").createOrReplaceTempView("pctl_nulls")
    val sql = """SELECT k, percentile(x, 0.5D) AS p50 FROM pctl_nulls
                 GROUP BY k"""
    val rewritten = spark.sql(sql)
    assert(!hasPercentile(rewritten))
    assert(rows(rewritten) ==
      Set(Seq("a", 2.0), Seq("b", null), Seq("c", 7.0)))
    assert(rows(rewritten) == holistic(rows(spark.sql(sql))))
  }

  test("q61/q65 (driver inventory) plan through the rewrite, not the buffer") {
    Seq("q61_quality_quantile_filter", "q65_interevent_gaps").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      assert(!hasPercentile(df), s"$q's percentile() must be rewritten")
      assert(df.count() > 0)
    }
  }

  test("mixed aggregates and post-agg expressions rewrite with parity") {
    val sql = """SELECT l_returnflag,
                   round(percentile(l_quantity, 0.5D), 2) AS p50_r,
                   sum(l_quantity) AS s, count(*) AS n
                 FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`
                 GROUP BY l_returnflag"""
    val rewritten = spark.sql(sql)
    assert(!hasPercentile(rewritten),
      "count/sum must ride along; round(percentile) must substitute")
    assert(rows(rewritten) == holistic(rows(spark.sql(sql))))
  }

  test("out-of-scope shapes keep the holistic aggregate") {
    // array of fractions → bail out
    val arr = spark.sql(
      """SELECT percentile(l_quantity, array(0.5D, 0.9D)) AS ps
         FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`""")
    assert(hasPercentile(arr))
    // DISTINCT percentile → bail out (different semantics)
    val dist = spark.sql(
      """SELECT percentile(DISTINCT l_quantity, 0.5D) AS p50
         FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`""")
    assert(hasPercentile(dist))
    // order-sensitive ride-along (first) → bail out: the rewrite
    // re-sorts rows, which would silently change first()'s answer
    val ordered = spark.sql(
      """SELECT l_returnflag, first(l_shipdate) AS f,
           percentile(l_quantity, 0.5D) AS p50
         FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`
         GROUP BY l_returnflag""")
    assert(hasPercentile(ordered))
    // all still answer correctly
    assert(arr.count() == 1 && dist.count() == 1 && ordered.count() > 0)
  }
}
