package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). Schemas are introspected from the
  * files themselves — never hard-coded — per FIXTURES.md §B.
  *
  * Scale notes: each table is a single parquet file locally, but every
  * reader below goes through `spark.read.parquet`, so on a real cluster
  * the same call reads a partitioned directory; filters and projections
  * push down to the scan either way.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** events.ts has been generated with different parquet encodings across
    * testdata regenerations; normalize every known one to a microsecond
    * TIMESTAMP (with timezone) so downstream `unix_micros`/window queries
    * analyze regardless of which file is on disk:
    *  - TIMESTAMP(NANOS): read as a raw nanos long (via
    *    spark.sql.legacy.parquet.nanosAsLong=true, set by [[Sessions]]);
    *    truncate to micros — the same narrowing DuckDB applies.
    *  - timestamp[us] (TIMESTAMP_NTZ): session TZ is pinned UTC in
    *    [[Sessions]], so a cast to TimestampType is lossless and matches
    *    DuckDB's reading of the same file.
    */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

/** One declared query: the Spark formulation plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same
  * parquet files. Column names/aliases MUST match between the two —
  * the driver's comparator sorts columns by name before hashing.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
