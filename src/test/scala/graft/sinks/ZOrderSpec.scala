package graft.sinks

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The z-order layout must actually buy two-dimensional data skipping:
  * compared to a single-key sort of the same data into the same file
  * count, a filter on the OTHER key must touch strictly fewer files.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("zValue interleaves bits (known values)") {
    import spark.implicits._
    // z(0b101, 0b011) = x bits at even positions, y at odd:
    // x=5 -> 1_0_1 at 4,2,0... positions 4,0 set => 10001; y=3 ->
    // bits 0,1 at positions 1,3 => 01010; z = 0b011011 = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .head().getLong(0)
    assert(got == 27L)
    // order-sensitivity: z(3,5) != z(5,3)
    val swapped = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .head().getLong(0)
    assert(swapped == 39L)
  }

  test("z-order layout prunes on BOTH keys; single-key sort does not") {
    val li = graft.Tables(spark, dir).lineitem
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val n = li.count()
    // 64 files over the 256x256 bucket grid → each file's z-range is a
    // ~32x32 region: ~1/8 of the range per dimension per file
    val perFile = math.max(1, (n / 64).toInt)

    val zDir = "/tmp/graft-zorder/z"
    val sDir = "/tmp/graft-zorder/s"
    ZOrder.write(li, zDir, "l_partkey", "l_suppkey", perFile)
    // the single-key baseline: same data, same shard bound, sorted by
    // partkey only
    li.repartitionByRange(col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.option("maxRecordsPerFile", perFile.toLong)
      .mode("overwrite").parquet(sDir)

    def boxes(d: String) =
      ZOrder.fileBoxes(spark, d, "l_partkey", "l_suppkey").collect()
    val zb = boxes(zDir)
    val sb = boxes(sDir)

    // a filter on the NON-sort key: suppkey in the bottom quarter of
    // its range. Files whose [y_min, y_max] misses the band are skipped
    // via footer stats.
    val (yLo, yHi) = {
      val r = li.agg(min(col("l_suppkey")), max(col("l_suppkey"))).head()
      val lo = r.getLong(0); val hi = r.getLong(1)
      (lo, lo + (hi - lo) / 4)
    }
    def touched(bs: Array[org.apache.spark.sql.Row]) =
      bs.count(r => r.getAs[Long]("y_min") <= yHi &&
        r.getAs[Long]("y_max") >= yLo)
    val zTouched = touched(zb)
    val sTouched = touched(sb)
    assert(sTouched == sb.length,
      "partkey-sorted layout should have no suppkey locality at all")
    assert(zTouched <= zb.length / 2,
      s"z-order must skip at least half the files on a suppkey band " +
        s"($zTouched of ${zb.length} touched)")
    // and the z-layout still prunes on partkey too (both dimensions
    // cluster): average normalized partkey span per file stays well
    // under the full range
    val (xLo, xHi) = {
      val r = li.agg(min(col("l_partkey")), max(col("l_partkey"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val zSpan = zb.map(r => (r.getAs[Long]("x_max") - r.getAs[Long]("x_min"))
      .toDouble / math.max(1L, xHi - xLo)).sum / zb.length
    assert(zSpan < 0.75,
      f"z-order per-file partkey span too wide ($zSpan%.2f of range)")
  }
}
