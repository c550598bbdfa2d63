package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning — the mechanism that makes 100 TB tables readable:
  * data laid out as dir-per-partition-value, with filters on the
  * partition column eliminating whole directories at planning time
  * (PartitionFilters in the scan, zero data files touched for pruned
  * partitions).
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("filters on the partition column prune directories at the scan") {
    val out = TestSpark.tmpDir("orders-by-year")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)

    val pruned = spark.read.parquet(out)
      .filter(col("o_year") === 1997)
      .select(col("o_orderkey"))
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.partitionFilters.nonEmpty,
      "partition filter must reach the scan")
    // the pruned listing must contain exactly the 1997 partition
    val seen = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.values.getInt(0)).toSet
    assert(seen == Set(1997), s"pruned listing saw partitions $seen")

    // and the result matches an unpartitioned filter
    val expected = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("driver contract: entry() answers with rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
    // every declared query has a runnable fn; oracles reference declared
    // queries only
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
