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
  /** `master` accepts the bare core count ("8") or a full local spec
    * ("4,4" for maxFailures); shuffle partitions default to the core
    * count.
    */
  def local(appName: String, master: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$master]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", master.takeWhile(_ != ','))
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
