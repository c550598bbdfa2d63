package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over events-shaped data.
  *
  * The reference is strictly batch (hard map→reduce barrier,
  * `/root/reference/mr/master.go:222-228`) — this module is an engine
  * extension (SURVEY.md §1.6): the same aggregations the batch layer runs
  * (q13 hourly windows, q16 sessionization) expressed as incremental
  * streaming queries with watermarks and keyed state.
  *
  * Scale: both queries shuffle once on their keys; state is per-key and
  * bounded (window finalization via watermark; one open session per
  * user), so a 1000-executor cluster partitions state horizontally with
  * no driver involvement.
  */
object EventsStreaming {

  final case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long)

  /** Tumbling 1-hour windowed counts — the streaming twin of
    * q13_events_hourly. Append mode + watermark: a window only emits
    * once the watermark passes its end; events later than the watermark
    * are dropped.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join: each error joined to clicks by the
    * same user within the preceding `windowSeconds`. Both sides carry
    * watermarks so the join state is bounded: a buffered click can be
    * dropped once the error-side watermark passes click_ts +
    * windowSeconds. The streaming twin of q29's as-of join (1:N within
    * the interval rather than latest-only — latest-only needs the q29
    * batch shape or a downstream max aggregation).
    */
  def errorsNearClicks(
      errors: DataFrame,
      clicks: DataFrame,
      windowSeconds: Long = 3600): DataFrame = {
    val e = errors.withWatermark("ts", "2 hours")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("error_ts"))
    val c = clicks.withWatermark("ts", "2 hours")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    e.join(c,
      col("user_id") === col("c_user") &&
      col("click_ts") <= col("error_ts") &&
      col("click_ts") >= col("error_ts") - expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("error_id"), col("user_id"), col("error_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Streaming exact dedup — the streaming twin of q22: keeps the first
    * occurrence per id, with state bounded by the watermark (ids older
    * than the watermark are forgotten, so state doesn't grow without
    * bound on an infinite stream). dropDuplicatesWithinWatermark gives
    * per-id dedup with bounded state — plain dropDuplicates(id :+ ts)
    * would leak redelivered events whose retry carries a fresh ts.
    */
  def dedupeStream(
      events: DataFrame,
      idCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Gap-based sessionization — the streaming twin of q16_sessionize —
    * via flatMapGroupsWithState: per-user state holds the open session;
    * an event further than `gapSeconds` from the last one closes it.
    * Only closed sessions are emitted (append semantics); the open
    * session stays in state across triggers.
    */
  final case class Attribution(
      user_id: Long,
      ts: java.sql.Timestamp,
      attributed: Boolean)

  /** Streaming twin of q105_attribution: each purchase attributes to the
    * same user's most recent PRECEDING click within `horizonSeconds`.
    * State per user is ONE long (the latest click's exact microseconds),
    * so state size is O(users) regardless of event volume. Events are
    * processed in (ts, event_id) order inside each micro-batch, matching
    * the batch window's ordering; parity with q105 holds exactly when
    * batches arrive time-ordered (the replay/backfill case — out-of-order
    * delivery needs the batch formulation or a watermark-delayed
    * emission). Timestamps compare as exact microsecond longs, exactly
    * like the batch query's unix_micros test.
    */
  def attribute(
      events: Dataset[Event],
      horizonSeconds: Long = 86400): Dataset[Attribution] = {
    import events.sparkSession.implicits._

    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000

    def fold(
        userId: Long,
        it: Iterator[Event],
        state: GroupState[Long]): Iterator[Attribution] = {
      val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var lastClick: Long = state.getOption.getOrElse(Long.MinValue)
      val out = Seq.newBuilder[Attribution]
      sorted.foreach { e =>
        if (e.event_type == "purchase")
          out += Attribution(userId, e.ts,
            lastClick != Long.MinValue &&
              micros(e.ts) - lastClick <= horizonSeconds * 1000000L)
        if (e.event_type == "click") lastClick = micros(e.ts)
      }
      if (lastClick != Long.MinValue) state.update(lastClick)
      out.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fold)
  }

  /** q117's bin rule, shared verbatim by the reference builder and the
    * stream side so the two can never bin differently.
    */
  private val binExpr =
    "cast(least(9L, floor((value - mn) * 10.0D / nullif(mx - mn, 0.0D))) as int)"

  /** Static reference histogram for [[psiDrift]] — the "training
    * snapshot" a production drift monitor pins: 10 equi-width bins over
    * the reference values (q117's binning), each row carrying the
    * bounds so the stream side bins identically, with +1-smoothed
    * shares so empty reference bins still carry mass. 10 rows total.
    */
  def referenceHistogram(reference: DataFrame): DataFrame = {
    val vals = reference.where(col("value").isNotNull).select(col("value"))
    val bounds = vals.agg(min(col("value")).as("mn"),
      max(col("value")).as("mx"))
    val counts = vals.crossJoin(broadcast(bounds))
      .select(expr(binExpr).as("bin"))
      .where(col("bin").isNotNull)
      .groupBy(col("bin")).agg(count(lit(1)).as("n_b"))
    val tot = counts.agg(sum(col("n_b")).as("n"))
    val bins = reference.sparkSession.range(1)
      .select(explode(sequence(lit(0), lit(9))).as("bin"))
    bins.join(counts, Seq("bin"), "left").na.fill(0L, Seq("n_b"))
      .crossJoin(broadcast(bounds)).crossJoin(broadcast(tot))
      .select(col("bin"), col("mn"), col("mx"),
        expr("(cast(n_b as double) + 1.0D) / (n + 10.0D)").as("q_share"))
  }

  /** Streaming twin of q117_psi_drift: finalized per-(1-day window,
    * bin) counts of the value stream, binned against the STATIC
    * reference bounds. The reference is a 10-row broadcast joined on a
    * constant key (stream-static equi-join — legal in append mode,
    * unlike a stream-side aggregate over history); the only stateful
    * op is one watermarked windowed count keyed by (window, bin), so
    * state is O(open windows × 10) at any stream rate. A window's
    * counts emit once the watermark passes its end; [[psiOf]] collapses
    * finalized counts into the per-window PSI.
    */
  def psiDrift(
      events: DataFrame,
      ref: DataFrame,
      watermark: String = "2 hours"): DataFrame = {
    val bounds = ref.select(col("mn"), col("mx")).distinct()
      .withColumn("k", lit(1))
    events.withWatermark("ts", watermark)
      .where(col("value").isNotNull)
      .withColumn("k", lit(1))
      .join(broadcast(bounds), "k")
      .select(col("ts"), expr(binExpr).as("bin"))
      .where(col("bin").isNotNull)
      .groupBy(window(col("ts"), "1 day"), col("bin"))
      .agg(count(lit(1)).as("n_wb"))
      .select(col("window.start").as("day_ts"), col("bin"), col("n_wb"))
  }

  /** Batch finisher over [[psiDrift]]'s finalized counts: q117's exact
    * PSI formula — (p−q)·ln(p/q) with +1 smoothing — against the
    * reference shares. Runs on the append sink (or in foreachBatch);
    * the full 0..9 spine comes from the reference, so stream-empty
    * bins still contribute their smoothed term.
    */
  def psiOf(finalized: DataFrame, ref: DataFrame): DataFrame = {
    // distinct names on the grid side: the left-join back onto
    // `finalized` is a self-join (wtot derives from it), and shared
    // attribute ids would make the join condition ambiguous
    val wtot = finalized.groupBy(col("day_ts").as("w_day"))
      .agg(sum(col("n_wb")).as("n_w"))
    wtot.crossJoin(broadcast(ref.select(col("bin").as("s_bin"),
        col("q_share"))))
      .join(finalized,
        col("w_day") === col("day_ts") && col("s_bin") === col("bin"),
        "left")
      .na.fill(0L, Seq("n_wb"))
      .groupBy(col("w_day"))
      .agg(round(sum(expr(
        """((cast(n_wb as double) + 1.0D) / (n_w + 10.0D) - q_share) *
           ln(((cast(n_wb as double) + 1.0D) / (n_w + 10.0D)) / q_share)""")),
        6).as("psi"))
      .select(col("w_day").as("day_ts"), col("psi"))
  }

  final case class ConvRender(
      user_id: Long,
      session_idx: Long,
      n_turns: Long,
      n_user_turns: Long,
      n_asst_turns: Long,
      n_loss_chars: Long,
      n_mask_chars: Long,
      render_fp: String)

  /** [[chatRender]]'s keyed state: the ONE open conversation per user
    * (top-level so the product encoder derives — a method-local type
    * has no TypeTag).
    */
  final case class OpenConv(
      idx: Long,
      endMicros: Long,
      transcript: String,
      nTurns: Long,
      nUser: Long,
      nAsst: Long,
      nLoss: Long,
      nMask: Long)

  /** Streaming twin of q234_chat_render: conversations assemble in
    * per-user state as events arrive (same 30-min gap rule as
    * [[sessionize]]/q16, same "role: type" template and md5-of-
    * transcript contract as q234 — the role rule `event_id % 2` and
    * the template are restated here in Scala, spec-pinned against the
    * batch SQL so they cannot drift), and each CLOSED conversation
    * emits one row with its turn mix, loss/mask character accounting,
    * and the rendered transcript's fingerprint. The open conversation
    * stays in state; session_idx counts closed-then-current sessions
    * per user exactly like q234's cumulative new-session sum.
    *
    * State per user is ONE open conversation — the transcript string
    * plus six longs — i.e. bounded by conversation length (the gap
    * rule closes it), not by stream length; the only shuffle keys on
    * user_id. Within a micro-batch events process in (ts, event_id)
    * order, so time-ordered arrival (the replay/backfill case)
    * reproduces the batch q234 rows exactly — CorpusStreamingSpec's
    * sibling spec (StreamingSpec) pins the handoff across batches.
    */
  def chatRender(
      events: Dataset[Event],
      gapSeconds: Long = 1800): Dataset[ConvRender] = {
    import events.sparkSession.implicits._

    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString

    def close(userId: Long, st: OpenConv): ConvRender =
      ConvRender(userId, st.idx, st.nTurns, st.nUser, st.nAsst,
        st.nLoss, st.nMask, md5hex(st.transcript))

    def fresh(idx: Long, t: Long, line: String, asst: Boolean): OpenConv =
      OpenConv(idx, t, line, 1L,
        if (asst) 0L else 1L, if (asst) 1L else 0L,
        if (asst) line.length.toLong else 0L,
        if (asst) 0L else line.length.toLong)

    def fold(userId: Long, it: Iterator[Event],
        state: GroupState[OpenConv]): Iterator[ConvRender] = {
      val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var open: Option[OpenConv] = state.getOption
      val closed = Seq.newBuilder[ConvRender]
      sorted.foreach { e =>
        val t = micros(e.ts)
        val role = if (e.event_id % 2 == 0) "user" else "assistant"
        val line = role + ": " + e.event_type
        val asst = role == "assistant"
        open = open match {
          case Some(st) if t - st.endMicros <= gapSeconds * 1000000L =>
            Some(OpenConv(st.idx, t, st.transcript + "\n" + line,
              st.nTurns + 1,
              st.nUser + (if (asst) 0 else 1),
              st.nAsst + (if (asst) 1 else 0),
              st.nLoss + (if (asst) line.length else 0),
              st.nMask + (if (asst) 0 else line.length)))
          case Some(st) =>
            closed += close(userId, st)
            Some(fresh(st.idx + 1, t, line, asst))
          case None =>
            Some(fresh(1L, t, line, asst))
        }
      }
      open.foreach(state.update)
      closed.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fold)
  }

  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._

    final case class Open(start: Long, end: Long, n: Long)

    def fold(
        userId: Long,
        it: Iterator[Event],
        state: GroupState[(Long, Long, Long)]): Iterator[Session] = {
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var open: Option[(Long, Long, Long)] = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open = open match {
          case Some((s0, e0, n)) if t - e0 <= gapSeconds * 1000 =>
            Some((s0, math.max(e0, t), n + 1))
          case Some((s0, e0, n)) =>
            closed += Session(userId, new java.sql.Timestamp(s0),
              new java.sql.Timestamp(e0), n)
            Some((t, t, 1L))
          case None => Some((t, t, 1L))
        }
      }
      open.foreach(state.update)
      closed.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fold)
  }
}
