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

    // Stage the (nanos-normalized) events table as one file per day with
    // ascending names AND mtimes, so the file stream consumes them in
    // event-time order and the watermark advances like a live feed
    // (FileStreamSource offers no ordering guarantee otherwise — with
    // jumbled arrival, earlier days land behind the watermark and are
    // dropped as late, which the first cut of this demo demonstrated).
    val staging = java.nio.file.Files
      .createTempDirectory("events-stream").toString
    val ev = Tables(spark, sfDir).events
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val days = ev.select(dayofmonth($"ts").as("d")).distinct()
      .orderBy($"d").as[Int].collect()
    days.zipWithIndex.foreach { case (d, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("ev-day").toString
      ev.filter(dayofmonth($"ts") === d).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(staging, f"day-$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      dst.toFile.setLastModified(1000000000000L + i * 60000L)
    }

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
    out.orderBy($"hour_ts", $"event_type").show(8, truncate = false)
    spark.stop()
  }
}
