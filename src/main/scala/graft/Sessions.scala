package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession configuration for Verify/Bench/tests.
  *
  * Scale posture: shuffle partitions sized to local cores (the cluster
  * equivalent is 2-3x total executor cores), AQE on so skewed shuffles
  * and undersized partitions re-plan at runtime, and nanosecond parquet
  * timestamps admitted as longs (normalized in [[Tables.events]]).
  */
object Sessions {
  def local(appName: String, cores: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
