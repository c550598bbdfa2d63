package graft.queries

import graft.TestSpark
import graft.functions.Fnv1a
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale techniques validated for equivalence: key salting (the standard
  * hot-key mitigation — pre-aggregate on (key, salt), then merge) and
  * sketch error bounds vs exact answers.
  */
class SkewAndSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("salted two-stage aggregation == direct aggregation on skewed keys") {
    // hotkey.txt: one word repeated 2000x — worst-case key skew.
    val text = scala.io.Source.fromFile(
      TestSpark.resource("edge/hotkey.txt"), "UTF-8").mkString
    import spark.implicits._
    val words = spark.sparkContext
      .parallelize(text.split("[^\\p{L}]+").toIndexedSeq.filter(_.nonEmpty), 8)
      .toDF("word")

    val direct = words.groupBy(col("word")).count()

    val salted = words
      // salt from the row id: spreads one hot key over 8 partial groups
      .withColumn("salt", Fnv1a.fnv1a(
        concat(col("word"), monotonically_increasing_id())) % 8)
      .groupBy(col("word"), col("salt")).agg(count(lit(1)).as("c"))
      .groupBy(col("word")).agg(sum(col("c")).as("count"))

    assert(salted.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("sketch aggregates stay within error bounds of exact answers") {
    // q32 now computes the bound check IN-QUERY (ok_* flags must be 1);
    // this spec asserts the flags and independently recomputes the exact
    // yardsticks the query claims to compare against.
    val rows = graft.SparkEntry.queries("q32_sketches")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      assert(r.getInt(2) == 1, s"$flag HLL outside 5% of exact")
      assert(r.getInt(4) == 1, s"$flag approx median outside 5% of exact")
    }
    // The yardstick must be the genuinely HOLISTIC percentile: the shared
    // session registers GraftExtensions, so without the exclusion
    // ScaleSafePercentiles would rewrite this into the same sort-based
    // plan the query uses and the comparison would test nothing.
    val excludeConf = "spark.sql.optimizer.excludedRules"
    val ruleName = graft.plans.ScaleSafePercentiles.getClass.getName
      .stripSuffix("$")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    spark.conf.set(excludeConf, ruleName)
    val exact =
      try {
        val df = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("d"),
            expr("percentile(l_extendedprice, 0.5)").as("m"))
        assert(df.queryExecution.optimizedPlan.exists(_.expressions.exists(
          _.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.aggregate.Percentile]))),
          "yardstick must keep the holistic Percentile aggregate")
        df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
          .toMap
      } finally spark.conf.unset(excludeConf)
    rows.foreach { r =>
      val (ed, em) = exact(r.getString(0))
      assert(r.getLong(1) == ed, s"${r.getString(0)} exact_parts mismatch")
      assert(math.abs(r.getDouble(3) - math.rint(em * 1e6) / 1e6) < 1e-6,
        s"${r.getString(0)} sort-based exact median != holistic percentile")
    }
  }

  test("q74 approx_top_k flags hold in-suite, not just at the oracle gate") {
    // the DuckDB oracle hard-codes ok_est = 1 (the sketch is
    // engine-specific), so this spec is what actually fails fast if a
    // Spark upgrade or data change pushes the estimate outside 5%
    val rows = graft.SparkEntry.queries("q74_heavy_hitters")(spark, dir)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getInt(3) == 1,
        s"approx_top_k estimate for '${r.getString(1)}' outside 5% of exact")
    }
  }
}
