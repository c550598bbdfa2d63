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
    * count. `SPARK_GRAFT_SHUFFLE_PARTITIONS` overrides the partition
    * count alone — the knob a scale probe needs when the DATA grows
    * but the box doesn't (at 100× rows, 32 partitions give each task
    * 100× the aggregation state and the fixed heap OOMs; on a real
    * cluster partitions scale with data, so the probe must be allowed
    * to as well). AQE coalesces small partitions back at runtime, so
    * oversizing is safe at every SF.
    */
  def local(appName: String, master: String): SparkSession = {
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      master.takeWhile(_ != ','))
    val spark = SparkSession.builder()
      .master(s"local[$master]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", parts)
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
