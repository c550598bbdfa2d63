package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import graft.streaming.EventsStreaming.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourly windowed counts finalize via watermark; late data dropped") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = EventsStreaming.hourlyCounts(ms.toDF())
      .writeStream.format("memory").queryName("hc")
      .outputMode("append").start()
    try {
      // hour-0 events
      ms.addData(
        Event(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:40:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 00:50:00"), 1, "view", 3.0))
      q.processAllAvailable()
      assert(spark.table("hc").count() == 0,
        "append-mode window must not emit before watermark passes")

      // advance event time to hour 5 (watermark = max - 2h = 03:xx)
      ms.addData(Event(4, ts("2024-01-01 05:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      ms.addData(Event(5, ts("2024-01-01 05:01:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hc")
        .selectExpr("cast(hour_ts as string)", "event_type", "n_events")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00", "click", 2L),
        ("2024-01-01 00:00:00", "view", 1L)))

      // late event inside the finalized hour-0 window → dropped
      ms.addData(Event(6, ts("2024-01-01 00:59:00"), 9, "click", 9.0))
      q.processAllAvailable()
      assert(spark.table("hc").count() == rows.size,
        "late data beyond watermark must be dropped")
    } finally q.stop()
  }

  test("stream-stream interval join pairs errors with in-window clicks") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val q = EventsStreaming.errorsNearClicks(
        errors.toDF(), clicks.toDF(), windowSeconds = 3600)
      .writeStream.format("memory").queryName("enc")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(10, ts("2024-01-01 09:00:00"), 1, "click", 0), // in window
        Event(11, ts("2024-01-01 07:30:00"), 1, "click", 0), // too old
        Event(12, ts("2024-01-01 09:30:00"), 2, "click", 0)) // other user
      errors.addData(Event(20, ts("2024-01-01 09:45:00"), 1, "error", 0))
      q.processAllAvailable()
      val got = spark.table("enc")
        .select("error_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((20L, 10L)),
        "only the same-user in-window click may join")

      // a later click for the same user arrives after the error: outside
      // the ≤ error_ts bound, must not join
      clicks.addData(Event(13, ts("2024-01-01 09:50:00"), 1, "click", 0))
      q.processAllAvailable()
      assert(spark.table("enc").count() == 1)
    } finally q.stop()
  }

  test("streaming dedup emits first occurrence only, across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = EventsStreaming.dedupeStream(ms.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      val e1 = Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0)
      val e2 = Event(2, ts("2024-01-01 00:01:00"), 1, "view", 2.0)
      ms.addData(e1, e2, e1) // in-batch duplicate
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
      ms.addData(e2) // cross-batch duplicate
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2,
        "cross-batch duplicate must be suppressed by state")
      // redelivery with the SAME id but a refreshed ts (producer retry)
      ms.addData(e2.copy(ts = ts("2024-01-01 00:01:30")))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2,
        "same-id redelivery with a new ts must also be suppressed")
      ms.addData(Event(3, ts("2024-01-01 00:02:00"), 2, "click", 3.0))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 3)
    } finally q.stop()
  }

  test("streaming attribution matches batch q105 on the real events table") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // the full table, time-ordered (the replay/backfill contract the
    // operator documents), split into 3 micro-batches
    val all = graft.Tables(spark, dir).events
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val ms = MemoryStream[Event]
    val q = EventsStreaming.attribute(ms.toDS())
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("attr")
        .groupBy(org.apache.spark.sql.functions.date_format($"ts", "yyyy-MM-dd").as("day"))
        .agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_purchases"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.when($"attributed", 1).otherwise(0))
            .cast("bigint").as("n_attributed"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val batch = graft.SparkEntry.queries("q105_attribution")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(streamed == batch,
        "streaming attribution diverged from the batch window formulation")
    } finally q.stop()
  }

  test("stateful sessionization closes sessions across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = EventsStreaming.sessionize(ms.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      ms.addData(
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 0),
        Event(2, ts("2024-01-01 00:10:00"), 1, "click", 0),
        Event(3, ts("2024-01-01 00:00:00"), 2, "view", 0))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0, "no session closed yet")

      // user 1 comes back 110 minutes later → closes first session
      ms.addData(Event(4, ts("2024-01-01 02:00:00"), 1, "click", 0))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[Session].collect()
      assert(sessions.toSeq == Seq(
        Session(1, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 2)))

      // within-gap event extends the open session, closes nothing
      ms.addData(Event(5, ts("2024-01-01 02:05:00"), 1, "click", 0))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 1)
    } finally q.stop()
  }

  test("streaming chat render matches batch q234 on closed conversations") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    // the batch q234 rows include every user's final STILL-OPEN
    // session (batch sees the corpus end; the stream cannot know a
    // conversation is over) — parity holds on the closed ones, i.e.
    // everything but each user's max session_idx
    val batch = graft.SparkEntry.queries("q234_chat_render")(spark, dir)
    val lastIdx = batch.groupBy(col("user_id").as("u"))
      .agg(max(col("session_idx")).as("mi"))
    val expected = batch.join(lastIdx,
        col("user_id") === col("u") && col("session_idx") === col("mi"),
        "left_anti")
      .collect().map(_.toString).toSet

    val all = graft.Tables(spark, dir).events
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val ms = MemoryStream[Event]
    val q = EventsStreaming.chatRender(ms.toDS())
      .writeStream.format("memory").queryName("conv")
      .outputMode("append").start()
    try {
      // time-ordered arrival across several micro-batches — the
      // replay/backfill contract under which parity is exact
      all.grouped(math.max(1, all.length / 4 + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("conv")
        .select("user_id", "session_idx", "n_turns", "n_user_turns",
          "n_asst_turns", "n_loss_chars", "n_mask_chars", "render_fp")
        .collect().map(_.toString).toSet
      assert(got == expected,
        s"closed-conversation mismatch: ${got.size} streamed vs " +
          s"${expected.size} batch; sample diff: " +
          (got diff expected).take(2).mkString(" | "))
      assert(got.nonEmpty, "fixture must actually close conversations")
    } finally q.stop()
  }

  test("streaming PSI drift matches the batch restatement on real events") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val batchEvents = graft.Tables(spark, dir).events
    val ref = EventsStreaming.referenceHistogram(batchEvents)
    val refRows = ref.collect()
    assert(refRows.length == 10 &&
      math.abs(refRows.map(_.getDouble(3)).sum - 1.0) < 1e-9,
      "reference shares must cover all 10 bins and sum to 1")

    val all = batchEvents
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val ms = MemoryStream[Event]
    val q = EventsStreaming.psiDrift(ms.toDF(), ref)
      .writeStream.format("memory").queryName("psi")
      .outputMode("append").start()
    try {
      all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // sentinel far past the data finalizes every real day window
      val maxTs = all.map(_.ts.getTime).max
      ms.addData(Event(-1, new Timestamp(maxTs + 10L * 86400000L),
        0, "click", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("psi")
        .select($"day_ts", $"bin", $"n_wb").collect()
        .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2))).toSet
      // batch restatement: same binning, same day windows, full data
      val bounds = ref.select($"mn", $"mx").distinct()
      val expected = batchEvents.where($"value".isNotNull)
        .crossJoin(broadcast(bounds))
        .select(date_trunc("day", $"ts").as("day_ts"), expr(
          "cast(least(9L, floor((value - mn) * 10.0D / " +
            "nullif(mx - mn, 0.0D))) as int)").as("bin"))
        .where($"bin".isNotNull)
        .groupBy($"day_ts", $"bin").agg(count(lit(1)).as("n_wb"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2))).toSet
      assert(streamed == expected,
        "finalized streaming counts diverged from the batch binning")

      // the finisher yields one PSI row per day, all finite
      val psi = EventsStreaming.psiOf(spark.table("psi"), ref).collect()
      assert(psi.length == expected.map(_._1).size)
      assert(psi.forall(r => !r.getDouble(1).isNaN))
    } finally q.stop()
  }
}
