package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test/fork gives the suites
  * their own JVM). `local[4,4]` = 4 threads, maxFailures=4 so the
  * crash-recovery spec can exercise task retry.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4,4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def resource(rel: String): String =
    new java.io.File(getClass.getResource(s"/$rel").toURI).getAbsolutePath

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
