package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test/fork gives the suites
  * their own JVM). `local[4,4]` = 4 threads, maxFailures=4 so the
  * crash-recovery spec can exercise task retry.
  */
object TestSpark {
  lazy val spark: SparkSession =
    Sessions.local("graft-test", "4,4")

  def resource(rel: String): String =
    new java.io.File(getClass.getResource(s"/$rel").toURI).getAbsolutePath

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
