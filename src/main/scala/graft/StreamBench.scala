package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The streamed-document feed row ([[StreamBench]]'s corpus twins).
  * Top-level: a nested case class would capture the bench object as an
  * outer pointer and break encoder codegen.
  */
final case class BenchDoc(doc_id: Long, text: String, lang: String,
    source: String, ingest_ts: java.sql.Timestamp)

/** Streaming-twin scale probe — the §8.5.1 companion that measures
  * what the batch probes cannot: MICRO-BATCH latency and STATE-STORE
  * size of the stateful streaming operators as the corpus behind the
  * stream grows. Feeds `SPARK_GRAFT_SF_DIR`'s documents/events tables
  * through MemoryStream in FIXED-SIZE micro-batches (the batch is the
  * scale-invariant unit — a 10× corpus means 10× more batches, and the
  * pass criterion is per-batch latency and state FLAT or
  * model-explained, never O(corpus)):
  *
  *  - `clean`   — [[streaming.CorpusStreaming.cleanStream]]: the
  *    watermarked fingerprint dedup. Docs get a synthetic event time
  *    advancing 1 s/doc, so the 1 h watermark horizon holds ≤ 3600
  *    fingerprints AT ANY CORPUS SIZE — state must stay flat while
  *    batches multiply (state = O(arrival rate × horizon), the claim).
  *  - `text_sink` — [[streaming.CorpusStreaming.textIndexSink]]: the
  *    gen-scoped index ingest chain; per-batch cost must track the
  *    batch (the SinkBench appendDelta story, measured on the real
  *    foreachBatch path).
  *  - `hourly`  — [[streaming.EventsStreaming.hourlyCounts]]: windowed
  *    agg; state = open windows × event types (2 h watermark over
  *    1 h windows → a handful of windows), flat at any corpus.
  *  - `sessions` — [[streaming.EventsStreaming.sessionize]]: custom
  *    flatMapGroupsWithState; state = one open session per user seen —
  *    O(users), and the ScaleProbe events fixture grows users N×, so
  *    state rows are EXPECTED to grow with the fixture while per-batch
  *    latency stays O(batch): the reported numbers separate the two.
  *
  * Prints ONE JSON line:
  * {"metric":"streambench","sf":…,"twins":{name:{"batches":…,
  * "rows":…,"mean_ms":…,"max_ms":…,"state_rows":…,"state_mb":…}}}
  * Run on a base dir and a `graft.ScaleProbe` blow-up; compare.
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val docBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_DOC_BATCH",
      "500").toInt
    val evBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_EV_BATCH",
      "10000").toInt
    // Probe-prefix cap: per-batch latency is batch-local and the clean
    // twin's state bound is the watermark horizon (both prefix-
    // independent claims), so a few-hundred-batch PREFIX of a 100×
    // feed measures the same thing as the full drive without 10k
    // processAllAvailable round-trips. State-row numbers are reported
    // for the prefix actually fed (the sessions twin's O(users-seen)
    // growth is visible either way — ScaleProbe interleaves the copies
    // over one calendar window, so a ts-ordered prefix samples every
    // copy's users). Unset = drive the whole feed.
    val maxBatches = sys.env.get("SPARK_GRAFT_STREAM_MAX_BATCHES")
      .map(_.toInt)
    // State-store provider override — the RocksDB point
    // (org.apache.spark.sql.execution.streaming.state
    // .RocksDBStateStoreProvider) prices state OFF-heap: state_mb then
    // reports the native store's footprint, not JVM-object overhead.
    val provider = sys.env.get("SPARK_GRAFT_STREAM_STATE_PROVIDER")
    // Plain core-count session, NOT localSized: a streaming job's
    // shuffle/state partitioning must track the ARRIVAL RATE (the
    // fixed micro-batch), not corpus-on-disk bytes — the r13 100×
    // run with the data-derived 126-partition floor kept state rows
    // exactly flat but inflated per-batch latency ~2.5× in pure
    // per-partition state-store overhead (250 batches × 126 store
    // instances for 500-row batches). The derived floor is the BATCH
    // aggregation guardrail; streams size to the batch.
    val spark = Sessions.local("graft-streambench", cpus)
    provider.foreach(p =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup

    // ---- feeds, collected ONCE and sliced into fixed-size batches ----
    // docs: event time advances 1 s per doc in id order, so the 1 h
    // watermark horizon is a fixed 3600-doc window at any corpus size
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // capped collects go through orderBy+limit (TakeOrdered — never a
    // full-corpus driver collect when a prefix is all the probe feeds)
    def capped(df: DataFrame, batchSize: Int): DataFrame =
      maxBatches.map(m => df.limit(m * batchSize)).getOrElse(df)
    val docRows = capped(Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .orderBy(col("doc_id")), docBatch).collect()
      .zipWithIndex.map { case (r, i) =>
        BenchDoc(r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), new java.sql.Timestamp(base + i * 1000L))
      }
    val evRows = capped(Tables(spark, sfDir).events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy(col("ts"), col("event_id")), evBatch).collect()
      .map(r => streaming.EventsStreaming.Event(r.getLong(0),
        r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))

    // ---- per-twin measurement -------------------------------------
    final case class Twin(name: String, batches: Int, rows: Long,
        meanMs: Double, maxMs: Double, stateRows: Long, stateMb: Double)

    def measure[A](name: String, feed: Array[A],
        batchSize: Int)(start: MemoryStream[A] => StreamingQuery)(
        implicit enc: org.apache.spark.sql.Encoder[A]): Twin = {
      val ms = MemoryStream[A]
      val q = start(ms)
      val durs = Seq.newBuilder[Double]
      var stateRows = 0L
      var stateMb = 0.0
      var n = 0
      try {
        feed.grouped(batchSize).foreach { slice =>
          ms.addData(slice.toSeq)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          durs += (System.nanoTime() - t0) / 1e6
          n += 1
        }
        Option(q.lastProgress).foreach { p =>
          val ops = p.stateOperators
          if (ops != null && ops.nonEmpty) {
            stateRows = ops.map(_.numRowsTotal).sum
            stateMb = ops.map(_.memoryUsedBytes).sum / 1e6
          }
        }
      } finally q.stop()
      val ds = durs.result()
      // batch 0 pays codegen/state-store init: report the steady tail
      val steady = if (ds.length > 1) ds.tail else ds
      Twin(name, n, feed.length.toLong,
        steady.sum / steady.length, steady.max, stateRows, stateMb)
    }

    def noopSink(df: DataFrame, mode: String, ckpt: String) =
      df.writeStream.outputMode(mode)
        .option("checkpointLocation", ckpt)
        .format("noop").start()

    val tmp = java.nio.file.Files
      .createTempDirectory("graft-streambench").toString

    val twins = Seq(
      measure[BenchDoc]("clean", docRows, docBatch) { ms =>
        noopSink(streaming.CorpusStreaming.cleanStream(ms.toDF()),
          "append", s"$tmp/ckpt-clean")
      },
      measure[BenchDoc]("text_sink", docRows, docBatch) { ms =>
        streaming.CorpusStreaming.textIndexSink(
            ms.toDF().select(col("doc_id"), col("text")),
            s"$tmp/text-index")
          .option("checkpointLocation", s"$tmp/ckpt-text").start()
      },
      measure[streaming.EventsStreaming.Event]("hourly", evRows, evBatch) {
        ms =>
          noopSink(streaming.EventsStreaming.hourlyCounts(ms.toDF()),
            "append", s"$tmp/ckpt-hourly")
      },
      measure[streaming.EventsStreaming.Event]("sessions", evRows, evBatch) {
        ms =>
          noopSink(streaming.EventsStreaming.sessionize(ms.toDS()).toDF(),
            "append", s"$tmp/ckpt-sessions")
      })

    val js = twins.map(t =>
      s""""${t.name}":{"batches":${t.batches},"rows":${t.rows},""" +
        f""""mean_ms":${t.meanMs}%.1f,"max_ms":${t.maxMs}%.1f,""" +
        f""""state_rows":${t.stateRows},"state_mb":${t.stateMb}%.2f}""")
      .mkString(",")
    // sanity floor so a silently-empty feed can't masquerade as "fast"
    require(twins.forall(_.rows > 0), "empty feed")
    val prov = provider.map(_.split('.').last).getOrElse("HDFSBackedStateStoreProvider")
    println(s"""{"metric":"streambench","sf":"$sfDir",""" +
      s""""state_provider":"$prov","twins":{$js}}""")
    spark.stop()
  }
}
