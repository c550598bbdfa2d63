package graft

import org.apache.spark.sql.functions._

/** CLI drive for the streaming module: stages the events table as
  * parquet files, streams them back through hourlyCounts with a
  * watermark, and prints the finalized windows.
  *
  * usage: runMain graft.StreamDemo <sfDir> [maxFilesPerTrigger]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val perTrigger = args.lift(1).getOrElse("2")
    val spark = Sessions.local("graft-stream-demo", "8")
    import spark.implicits._

    // Stage the (nanos-normalized) events table as one file per DATE
    // (not day-of-month — that interleaves across month boundaries) with
    // ascending names AND mtimes, so the file stream consumes them in
    // event-time order and the watermark advances like a live feed
    // (FileStreamSource offers no ordering guarantee otherwise — with
    // jumbled arrival, earlier days land behind the watermark and are
    // dropped as late, which the first cut of this demo demonstrated).
    // One pass: partitionBy(date) writes every day at once, then the
    // part files are renamed into the flat staging dir in date order.
    val staging = java.nio.file.Files
      .createTempDirectory("events-stream").toString
    val ev = Tables(spark, sfDir).events
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val tmp = java.nio.file.Files.createTempDirectory("ev-days")
    ev.withColumn("d", to_date($"ts"))
      .repartition($"d").sortWithinPartitions($"ts")
      .write.mode("overwrite").partitionBy("d").parquet(tmp.toString)
    val dayDirs = new java.io.File(tmp.toString).listFiles()
      .filter(_.getName.startsWith("d=")).sortBy(_.getName)
    dayDirs.zipWithIndex.foreach { case (dir, i) =>
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (part, j) =>
          val dst = java.nio.file.Paths.get(staging,
            f"day-$i%03d-$j%02d.parquet")
          java.nio.file.Files.move(part.toPath, dst)
          dst.toFile.setLastModified(1000000000000L + (i * 100L + j) * 60000L)
        }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)

    val schema = spark.read.parquet(staging).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", perTrigger)
      .parquet(staging)

    val q = streaming.EventsStreaming.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val out = spark.table("hourly")
    println(s"FINALIZED_WINDOWS ${out.count()}")
    // self-verify: append mode emits exactly the windows whose END the
    // final watermark (max event time - 2h) has passed — restate that
    // in batch and compare
    val evb = Tables(spark, sfDir).events
    val maxTs = evb.agg(max($"ts")).head.getTimestamp(0)
    val predicted = evb
      .groupBy(date_trunc("hour", $"ts").as("h"), $"event_type").count()
      .where(col("h") + expr("INTERVAL 1 HOUR") <=
        lit(maxTs) - expr("INTERVAL 2 HOURS"))
      .count()
    val matched = predicted == out.count()
    println(s"PREDICTED_FINALIZED $predicted " +
      (if (matched) "MATCH" else "MISMATCH"))
    out.orderBy($"hour_ts", $"event_type").show(8, truncate = false)
    spark.stop()
    // enforceable check, same exit-code contract as ExecutorCrashDemo:
    // a MISMATCH must fail any automated gate, not just print
    if (!matched) sys.exit(1)
  }
}
