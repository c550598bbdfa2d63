package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustered parquet layout — multi-dimensional data
  * skipping for scans that filter on EITHER (or both) of two keys.
  *
  * A single-column sort gives tight parquet min/max stats on that
  * column only: a filter on the second key reads every file. Bit-
  * interleaving the two keys and sorting by the interleaved value keeps
  * every file's bounding box small in BOTH dimensions, so file- and
  * row-group-level stats prune scans on either predicate — the layout
  * trick Delta/Iceberg expose as OPTIMIZE ZORDER BY, reproduced here as
  * a plain sort expression + bounded-size parquet write. At 100 TB the
  * sort is Spark's external range sort on the z-value and everything
  * else is the ordinary writer path (no driver participation).
  */
object ZOrder {

  /** Morton code of two non-negative longs: bit i of `x` lands at
    * position 2i, bit i of `y` at 2i+1. `(x & (1<<i)) << i` IS the
    * x-bit already weighted by 2^(2i) — no per-bit extraction to 0/1
    * needed, so the whole code is a sum of 2*bits codegen'd shift/mask
    * terms.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(x.cast("bigint").bitwiseAND(lit(1L << i)), i) +
        shiftleft(y.cast("bigint").bitwiseAND(lit(1L << i)), i + 1)
    }.reduce(_ + _)

  /** Write `df` z-order-clustered on (xCol, yCol).
    *
    * Raw values interleave badly when the two keys have different bit
    * widths — the wider key's high bits monopolize the Morton code and
    * the layout degenerates to a single-key sort. So (exactly like the
    * table formats' OPTIMIZE ZORDER) both keys are first NORMALIZED to
    * a balanced 8-bit bucket rank via min/max scaling (exact integer
    * arithmetic; the bounds ride in as a broadcast 1-row aggregate),
    * and the buckets interleave. Min/max scaling assumes roughly
    * uniform keys; a skewed key would want a range-bucket (ntile) rank
    * instead — same interleave, different rank function.
    */
  def write(df: DataFrame, outDir: String, xCol: String, yCol: String,
      maxRecordsPerFile: Int): Unit = {
    val b = df.agg(
      min(col(xCol)).cast("bigint").as("__xlo"),
      max(col(xCol)).cast("bigint").as("__xhi"),
      min(col(yCol)).cast("bigint").as("__ylo"),
      max(col(yCol)).cast("bigint").as("__yhi"))
    // floor of the exact rational (delta * 256) / span: both operands
    // stay well under 2^53 for any realistic key after the lo shift, so
    // the double division floors exactly; result is always in [0, 255]
    def bucket(c: Column, lo: Column, hi: Column): Column =
      floor((c.cast("bigint") - lo) * 256 / (hi - lo + 1)).cast("bigint")
    df.crossJoin(broadcast(b))
      .withColumn("__z", zValue(
        bucket(col(xCol), col("__xlo"), col("__xhi")),
        bucket(col(yCol), col("__ylo"), col("__yhi")), bits = 8))
      // range-partition + in-partition sort on the z-value = a global
      // z-order across files; drop the helper columns at the writer
      .repartitionByRange(col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__xlo", "__xhi", "__ylo", "__yhi")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .mode("overwrite")
      .parquet(outDir)
  }

  /** Per-file bounding boxes of the two keys, read back from the
    * written layout — the receipt data skipping operates on.
    */
  def fileBoxes(spark: org.apache.spark.sql.SparkSession, dir: String,
      xCol: String, yCol: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"),
        count(lit(1)).as("rows"))
}
