package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime row-level filtering: when a selective dimension filters a
  * large fact join, Spark can inject a bloom filter (or semi-join) built
  * from the dim side into the fact scan — at 100 TB this prunes shuffle
  * input by orders of magnitude without any manual pre-join.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("selective dim join injects a runtime bloom filter into the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_totalprice") > 490000) // ~selective dim side
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilter") ||
        optimized.contains("might_contain"),
        s"expected a runtime bloom filter in:\n$optimized")

      // correctness unchanged vs no runtime filter
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == plain)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("user-facing bloom_filter_agg/might_contain: no false negatives, " +
    "low FPP at the sized capacity") {
    import spark.implicits._
    (0L until 2000L).toDF("k").createOrReplaceTempView("bloom_keys")
    // every inserted key MUST hit (bloom filters cannot false-negative);
    // disjoint probes [100000, 102000) should almost all miss at
    // 64k-capacity / 1 Mbit sizing (q77's parameters)
    val row = spark.sql("""
      WITH b AS (SELECT bloom_filter_agg(xxhash64(k),
                          CAST(65536 AS BIGINT), CAST(1048576 AS BIGINT))
                   AS bf
                 FROM bloom_keys)
      SELECT sum(CASE WHEN might_contain((SELECT bf FROM b), xxhash64(k))
                      THEN 1 ELSE 0 END) AS hits,
             sum(CASE WHEN might_contain((SELECT bf FROM b),
                                         xxhash64(k + CAST(100000 AS BIGINT)))
                      THEN 1 ELSE 0 END) AS fp
      FROM bloom_keys""").head()
    assert(row.getLong(0) == 2000L, "bloom filter dropped an inserted key")
    assert(row.getLong(1) < 100L,
      s"false-positive count ${row.getLong(1)} out of 2000 disjoint probes")
  }
}
