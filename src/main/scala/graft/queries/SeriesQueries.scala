package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Ckpt._

/** Time-series operators over `events`/`lineitem`: calendar-spine
  * gap-fill with forward-fill, robust (median/MAD) outlier flagging, and
  * truncated-EWMA smoothing.
  *
  * All three follow the suite's scale rules: aggregations are
  * partial-agg-friendly, every window is partitioned by the series key
  * (never a global sort), and the tiny derived relations (calendar
  * bounds, per-group medians) are broadcast back instead of collected
  * driver-side.
  */
object SeriesQueries {

  /** q99's truncated-EWMA weights a*(1-a)^j for a = 0.3 as EXACT decimal
    * strings (0.3 * 0.7^j has j+1 decimal digits, exactly representable
    * in BigDecimal). Both engines parse the same literal into the same
    * nearest-double, so every term — and therefore the left-to-right sum
    * — is bit-identical cross-engine; computing pow(0.7, j) at runtime
    * instead lets a 1-ulp libm difference flip a round-half boundary
    * (observed: one row in 7494 at sf0.01).
    */
  private val ewmaWeights: IndexedSeq[String] = (0 until 10).map(j =>
    (BigDecimal("0.3") * BigDecimal("0.7").pow(j)).bigDecimal.toPlainString)

  val defs: Seq[QDef] = Seq(
    // ------------------------------------------------------------------
    // q95: calendar gap-fill + forward-fill — the canonical time-series
    // densification operator (metrics dashboards, feature windows over
    // sparse signals). A deterministically thinned daily series
    // (event_id % 37) is re-densified against a calendar spine built
    // IN-PLAN from the observed min/max day (sequence + explode over a
    // broadcast 1-row bounds aggregate — no driver collect), then
    // forward-filled with last(ignoreNulls) over a per-series window.
    // At 100 TB the spine is |series| x |days| (tiny vs the fact table)
    // and the fill window is partitioned by series key, so state per
    // task is one series' days.
    QDef(
      "q95_gap_fill",
      (s, dir) => {
        val sparse = Tables(s, dir).events
          .where(col("event_id") % 37 === 0)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(round(sum(col("value")), 6).as("v"))
        val bounds = sparse.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        val spine = sparse.select(col("event_type")).distinct()
          .crossJoin(broadcast(bounds))
          .select(col("event_type"),
            explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
        val fill = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(sparse, Seq("event_type", "day"), "left")
          .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(fill))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("v_filled"),
            when(col("v").isNull, 1).otherwise(0).as("was_gap"))
      },
      Some("""
        WITH sparse AS (
          SELECT event_type, CAST(ts AS DATE) AS day, round(SUM(value), 6) AS v
          FROM events WHERE event_id % 37 = 0 GROUP BY 1, 2),
        bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM sparse),
        spine AS (
          SELECT t.event_type, CAST(d.day AS DATE) AS day
          FROM (SELECT DISTINCT event_type FROM sparse) t, bounds b,
               LATERAL (SELECT unnest(generate_series(b.lo, b.hi,
                                INTERVAL 1 DAY)) AS day) d),
        filled AS (
          SELECT s.event_type, s.day, sp.v,
                 last_value(sp.v IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
          FROM spine s LEFT JOIN sparse sp
            ON s.event_type = sp.event_type AND s.day = sp.day)
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day, v_filled,
               CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_gap
        FROM filled
      """)),

    // ------------------------------------------------------------------
    // q98: robust outlier detection via median/MAD — the
    // contamination-resistant alternative to mean/stddev z-scores
    // (one corrupt batch can shift a mean arbitrarily; the median
    // moves only past 50% contamination). Both medians go through
    // `percentile(...)`, which the ScaleSafePercentiles rule rewrites
    // into the bounded sort-based plan, so no holistic per-group buffer
    // exists at any scale; the per-group medians (|event_type| rows)
    // broadcast back onto the fact rows. Threshold: |x - med| >
    // 3 * 1.4826 * MAD (1.4826 = consistency constant vs sigma for
    // normal data); both sides round at 9 before comparing so a 1-ulp
    // quantile-interpolation difference between engines cannot flip a
    // boundary row.
    QDef(
      "q98_mad_outliers",
      (s, dir) => {
        val ev = Tables(s, dir).events.select(col("event_type"), col("value"))
        val med = ev.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("med"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = dev.groupBy(col("event_type"))
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        dev.join(broadcast(mad), "event_type")
          .groupBy(col("event_type"))
          .agg(
            round(max(col("med")), 6).as("med"),
            round(max(col("mad")), 6).as("mad"),
            sum(when(round(col("adev"), 9) >
                round(lit(3.0) * lit(1.4826) * col("mad"), 9), 1)
              .otherwise(0)).cast("bigint").as("n_outliers"),
            count(lit(1)).as("n"))
      },
      Some("""
        WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                     FROM events GROUP BY 1),
        dev AS (SELECT e.event_type, e.value, m.med,
                       abs(e.value - m.med) AS adev
                FROM events e JOIN med m ON e.event_type = m.event_type),
        mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
                FROM dev GROUP BY 1)
        SELECT d.event_type, round(MAX(d.med), 6) AS med,
               round(MAX(m.mad), 6) AS mad,
               CAST(SUM(CASE WHEN round(d.adev, 9) >
                    round(3.0 * 1.4826 * m.mad, 9) THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_outliers,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM dev d JOIN mad m ON d.event_type = m.event_type
        GROUP BY d.event_type
      """)),

    // ------------------------------------------------------------------
    // q99: truncated-EWMA smoothing of daily revenue per returnflag.
    // The EWMA recurrence y_t = a*x_t + (1-a)*y_{t-1} is inherently
    // sequential; the 10-term truncation y_t ~= a * sum_{j<10}
    // (1-a)^j * x_{t-j} makes it a bounded window computation (relative
    // error (1-a)^10 ~= 2.8%, constant and deterministic) that both
    // engines express identically as a lag() chain — no unbounded
    // running state, no pow() of an unbounded row number (which would
    // overflow doubles on long series). Window is partitioned by the
    // series key; day strings sort chronologically (yyyy-MM-dd).
    QDef(
      "q99_ewma",
      (s, dir) => {
        val daily = Tables(s, dir).lineitem
          .groupBy(col("l_returnflag"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
          .agg(Q.dsum(col("l_extendedprice")).as("rev"))
        val w = Window.partitionBy(col("l_returnflag")).orderBy(col("day"))
        val terms = (0 until 10).map(j =>
          coalesce(lag(col("rev"), j).over(w), lit(0.0)) *
            lit(java.lang.Double.parseDouble(ewmaWeights(j))))
        daily.withColumn("ewma", round(terms.reduce(_ + _), 6))
      },
      Some {
        val terms = (0 until 10)
          .map(j => s"COALESCE(lag(rev, $j) OVER w, 0) * " +
            s"CAST('${ewmaWeights(j)}' AS DOUBLE)")
          .mkString(" + ")
        s"""
        WITH daily AS (
          SELECT l_returnflag,
                 strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev
          FROM lineitem GROUP BY 1, 2)
        SELECT l_returnflag, day, rev, round($terms, 6) AS ewma
        FROM daily
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY day)
        """
      }),

    // ------------------------------------------------------------------
    // q102: islands detection / SCD2 compaction — collapse each user's
    // consecutive same-tier event runs into validity intervals
    // [from_ts, to_ts], the same operator that compacts a
    // slowly-changing-dimension change stream into versioned rows. The
    // gaps-and-islands trick (difference of two row_numbers is constant
    // exactly within a run) turns an inherently sequential scan into
    // two per-user windows + one aggregation — all partitioned by
    // user, nothing global. Ties on ts break by event_id so the
    // numbering is total in both engines.
    QDef(
      "q102_tier_islands",
      (s, dir) => {
        val ev = Tables(s, dir).events
          .select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") / 50).cast("bigint").as("tier"))
        val byU = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val byUT = Window.partitionBy(col("user_id"), col("tier"))
          .orderBy(col("ts"), col("event_id"))
        ev.withColumn("grp",
            row_number().over(byU) - row_number().over(byUT))
          .groupBy(col("user_id"), col("tier"), col("grp"))
          .agg(
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("from_ts"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("to_ts"),
            count(lit(1)).as("n_events"))
          .where(col("n_events") >= 3)
          .drop("grp")
      },
      Some("""
        WITH ev AS (SELECT user_id, ts, event_id,
                           CAST(FLOOR(value / 50) AS BIGINT) AS tier
                    FROM events),
        r AS (SELECT user_id, ts, event_id, tier,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) -
                     ROW_NUMBER() OVER (PARTITION BY user_id, tier
                       ORDER BY ts, event_id) AS grp
              FROM ev)
        SELECT user_id, tier,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS from_ts,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS to_ts,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM r GROUP BY user_id, tier, grp
        HAVING COUNT(*) >= 3
      """)),

    // ------------------------------------------------------------------
    // q103: rolling 7-day distinct active users. Exact sliding-window
    // distinct counts don't compose from daily distincts (users repeat),
    // and a day-range theta-join is a nested loop; instead each
    // (day, user) pair EXPLODES into the <= 7 target days it
    // contributes to (a pure scan-side Generate), clipped at the
    // corpus max day (broadcast 1-row aggregate), and the answer is a
    // plain distinct count keyed by target day — partial-agg friendly,
    // sharded by day at scale.
    QDef(
      "q103_rolling_dau",
      (s, dir) => {
        val du = Tables(s, dir).events
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val mx = du.agg(max(col("day")).as("mxd"))
        du.crossJoin(broadcast(mx))
          .select(col("user_id"), explode(
            expr("sequence(day, least(date_add(day, 6), mxd))")).as("tday"))
          .groupBy(date_format(col("tday"), "yyyy-MM-dd").as("day"))
          .agg(countDistinct(col("user_id")).as("rolling_7d_users"))
      },
      Some("""
        WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                    FROM events),
        mx AS (SELECT MAX(day) AS mxd FROM du),
        contrib AS (SELECT CAST(u.t AS DATE) AS tday, du.user_id
                    FROM du, mx,
                    LATERAL (SELECT unnest(generate_series(du.day,
                      LEAST(du.day + INTERVAL 6 DAY, mx.mxd),
                      INTERVAL 1 DAY)) AS t) u)
        SELECT strftime(tday, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS rolling_7d_users
        FROM contrib GROUP BY tday
      """)),

    // ------------------------------------------------------------------
    // q105: last-touch attribution — each purchase attributes to the
    // same user's most recent PRECEDING click within 24h. The running
    // "last click" is an ignoreNulls last() over the per-user ordered
    // window (frame ends at 1 PRECEDING so a click never attributes to
    // itself at equal timestamps); the 24h test compares exact
    // microsecond longs (unix_micros vs epoch_us — both truncate the
    // source nanos identically), never float seconds. One user-keyed
    // window + one day-keyed aggregation; no self-join, no as-of range
    // scan.
    QDef(
      "q105_attribution",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables(s, dir).events
          .withColumn("last_click",
            last(when(col("event_type") === "click", col("ts")),
              ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(when(col("last_click").isNotNull &&
                unix_micros(col("ts")) - unix_micros(col("last_click")) <=
                  86400000000L, 1).otherwise(0))
              .cast("bigint").as("n_attributed"))
      },
      Some("""
        WITH w AS (
          SELECT user_id, ts, event_type,
                 last_value(CASE WHEN event_type = 'click' THEN ts END
                   IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS last_click
          FROM events)
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CASE WHEN last_click IS NOT NULL
                    AND epoch_us(ts) - epoch_us(last_click) <= 86400000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed
        FROM w WHERE event_type = 'purchase'
        GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q106: rolling 7-day users via MERGEABLE HLL sketch algebra — the
    // scale path for q103. q103 explodes (day, user) PAIRS to target
    // days (data-sized: 7x the distinct-pair relation); here each day
    // collapses to ONE ~KB sketch first, and only sketches explode
    // (7 rows/day regardless of user count) before hll_union_agg
    // merges each window — the union of per-partition sketches is the
    // sketch of the union, so the plan is exact-shuffle-minimal at any
    // scale. Engine-specific estimates can't hash-match an oracle, so
    // the q32/q74 pattern applies: the query emits the EXACT rolling
    // count plus an in-query error-bound flag (HLL default error
    // ~1.6% << the 5% gate), and the oracle restates the exact count
    // with a literal pass flag.
    QDef(
      "q106_rolling_hll",
      (s, dir) => {
        val ev = Tables(s, dir).events
          .select(to_date(col("ts")).as("day"), col("user_id"))
        val mx = ev.agg(max(col("day")).as("mxd"))
        val spread = "sequence(day, least(date_add(day, 6), mxd))"
        val est = ev.groupBy(col("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
          .crossJoin(broadcast(mx))
          .select(explode(expr(spread)).as("tday"), col("sk"))
          .groupBy(col("tday"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        val exact = ev.distinct()
          .crossJoin(broadcast(mx))
          .select(col("user_id"), explode(expr(spread)).as("tday"))
          .groupBy(col("tday"))
          .agg(countDistinct(col("user_id")).as("rolling_7d_users"))
        est.join(exact, "tday")
          .select(date_format(col("tday"), "yyyy-MM-dd").as("day"),
            col("rolling_7d_users"),
            when(abs(col("est") - col("rolling_7d_users")) /
              col("rolling_7d_users") <= 0.05, 1).otherwise(0).as("ok_est"))
      },
      Some("""
        WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                    FROM events),
        mx AS (SELECT MAX(day) AS mxd FROM du),
        contrib AS (SELECT CAST(u.t AS DATE) AS tday, du.user_id
                    FROM du, mx,
                    LATERAL (SELECT unnest(generate_series(du.day,
                      LEAST(du.day + INTERVAL 6 DAY, mx.mxd),
                      INTERVAL 1 DAY)) AS t) u)
        SELECT strftime(tday, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS rolling_7d_users,
               1 AS ok_est
        FROM contrib GROUP BY tday
      """)),

    // ------------------------------------------------------------------
    // q110: ORDERED funnel with per-step time windows — the product-
    // analytics operator q52's document funnel is not: each user must
    // view, then click within 6h OF THAT FIRST VIEW, then purchase
    // within 6h of that click, strictly in sequence. Three cascading
    // (filter → join on user → min) stages: every join is co-keyed on
    // user_id (the natural shard key) and each stage's relation only
    // shrinks, so the cascade is three cheap shuffles at any scale.
    // Step times compare as exact microsecond longs.
    QDef(
      "q110_ordered_funnel",
      (s, dir) => {
        val ev = Tables(s, dir).events
          .select(col("user_id"), col("event_type"), col("ts"))
        val hours6 = 21600000000L
        val v = ev.where(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("vt"))
        val c = ev.where(col("event_type") === "click").join(v, "user_id")
          .where(col("ts") > col("vt") &&
            unix_micros(col("ts")) - unix_micros(col("vt")) <= hours6)
          .groupBy(col("user_id")).agg(min(col("ts")).as("ct"))
        val p = ev.where(col("event_type") === "purchase").join(c, "user_id")
          .where(col("ts") > col("ct") &&
            unix_micros(col("ts")) - unix_micros(col("ct")) <= hours6)
          .groupBy(col("user_id")).agg(min(col("ts")).as("pt"))
        def stage(df: org.apache.spark.sql.DataFrame, n: Int) =
          df.agg(count(lit(1)).as("n_users"))
            .select(lit(n).as("stage"), col("n_users"))
        stage(v, 1).unionByName(stage(c, 2)).unionByName(stage(p, 3))
      },
      Some("""
        WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events
                   WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, MIN(e.ts) AS ct FROM events e
              JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts > v.vt
                AND epoch_us(e.ts) - epoch_us(v.vt) <= 21600000000
              GROUP BY 1),
        p AS (SELECT e.user_id, MIN(e.ts) AS pt FROM events e
              JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.ct
                AND epoch_us(e.ts) - epoch_us(c.ct) <= 21600000000
              GROUP BY 1)
        SELECT 1 AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
        UNION ALL SELECT 2, CAST(COUNT(*) AS BIGINT) FROM c
        UNION ALL SELECT 3, CAST(COUNT(*) AS BIGINT) FROM p
      """)),

    // ------------------------------------------------------------------
    // q114: sketch SET ALGEBRA — audience-overlap matrix between event
    // types via HLL inclusion-exclusion: |A∩B| ≈ est(A) + est(B) −
    // est(A∪B), where est(A∪B) comes from the scalar hll_union of two
    // PRE-AGGREGATED per-type sketches. The pair stage touches only 5
    // KB-sized sketch rows (one per type), never the user stream — at
    // 100 TB the per-type sketches are the only thing that crosses the
    // wire, and any pair/rollup algebra runs on the driver-sized sketch
    // table. The exact overlap (the oracle-checked answer) is a user-
    // keyed self-join — co-partitioned on the same key the distinct
    // already shuffled on. q32/q74/q106 flag pattern: the estimate is
    // verified IN-QUERY against the exact count, so the driver's hash
    // gate enforces the sketch's accuracy contract (±5%).
    QDef(
      "q114_sketch_overlap",
      (s, dir) => {
        val ut = Tables(s, dir).events
          .select(col("event_type").as("t"), col("user_id").as("u"))
          .distinct()
        val sk = ut.groupBy(col("t"))
          .agg(hll_sketch_agg(col("u")).as("sk"))
        val a = sk.select(col("t").as("type_a"), col("sk").as("ska"))
        val b = sk.select(col("t").as("type_b"), col("sk").as("skb"))
        val est = a.join(b, col("type_a") < col("type_b"))
          .select(col("type_a"), col("type_b"),
            (hll_sketch_estimate(col("ska")) +
              hll_sketch_estimate(col("skb")) -
              hll_sketch_estimate(hll_union(col("ska"), col("skb"))))
              .as("est"))
        val exact = ut.as("x")
          .join(ut.as("y"),
            col("x.u") === col("y.u") && col("x.t") < col("y.t"))
          .groupBy(col("x.t").as("type_a"), col("y.t").as("type_b"))
          .agg(count(lit(1)).as("overlap"))
        exact.join(est, Seq("type_a", "type_b"))
          .select(col("type_a"), col("type_b"), col("overlap"),
            when(abs(col("est") - col("overlap")) <=
              lit(0.05) * col("overlap"), 1).otherwise(0).as("ok_est"))
      },
      Some("""
        WITH ut AS (SELECT DISTINCT event_type AS t, user_id AS u
                    FROM events)
        SELECT x.t AS type_a, y.t AS type_b,
               CAST(COUNT(*) AS BIGINT) AS overlap, 1 AS ok_est
        FROM ut x JOIN ut y ON x.u = y.u AND x.t < y.t
        GROUP BY 1, 2
      """)),

    // ------------------------------------------------------------------
    // q117: PSI drift monitor — weekly Population Stability Index of the
    // event `value` distribution against the whole-history distribution,
    // the standard ML-ops check for "did this feature's distribution
    // move?". Bins are 10 EQUI-WIDTH buckets from a broadcast 1-row
    // min/max (q104's histogram pattern) — not quantiles: fixed edges
    // are how production PSI pins a reference snapshot, and they keep
    // the whole query partial-agg + broadcast (no global sort at any
    // scale; the weekly×bin grid is weeks×10 rows). Laplace +1
    // smoothing keeps empty cells finite. q112's parity recipe: exact
    // integer counts cast to DOUBLE before any arithmetic (bare decimal
    // literals are the q23 bug class), identical IEEE expressions both
    // engines, round the ln-sum at 6.
    QDef(
      "q117_psi_drift",
      (s, dir) => {
        val ev = Tables(s, dir).events
          .where(col("value").isNotNull)
          .select(date_trunc("week", col("ts")).as("wk"), col("value"))
        val bounds = ev.agg(min(col("value")).as("mn"),
          max(col("value")).as("mx"))
        val binned = ev.crossJoin(broadcast(bounds))
          .select(col("wk"), expr(
            """cast(least(9L, floor((value - mn) * 10.0D /
                 nullif(mx - mn, 0.0D))) as int)""").as("bin"))
          .where(col("bin").isNotNull)
        val wb = binned.groupBy(col("wk"), col("bin"))
          .agg(count(lit(1)).as("n_wb"))
        val wtot = wb.groupBy(col("wk")).agg(sum(col("n_wb")).as("n_w"))
        val btot = wb.groupBy(col("bin")).agg(sum(col("n_wb")).as("n_b"))
        val tot = wb.agg(sum(col("n_wb")).as("n"))
        val bins = wtot.sparkSession.range(1)
          .select(explode(sequence(lit(0), lit(9))).as("bin"))
        wtot.crossJoin(broadcast(bins))
          .join(wb, Seq("wk", "bin"), "left").na.fill(0L, Seq("n_wb"))
          .join(broadcast(btot), Seq("bin"), "left").na.fill(0L, Seq("n_b"))
          .crossJoin(broadcast(tot))
          .groupBy(col("wk"))
          .agg(max(col("n_w")).as("n_events"),
            round(sum(expr(
              """((cast(n_wb as double) + 1.0D) / (n_w + 10.0D) -
                  (cast(n_b as double) + 1.0D) / (n + 10.0D)) *
                 ln(((cast(n_wb as double) + 1.0D) / (n_w + 10.0D)) /
                    ((cast(n_b as double) + 1.0D) / (n + 10.0D)))""")),
              6).as("psi"))
          .select(date_format(col("wk"), "yyyy-MM-dd").as("week"),
            col("n_events"), col("psi"))
      },
      Some("""
        WITH ev AS (SELECT date_trunc('week', ts) AS wk, value
                    FROM events WHERE value IS NOT NULL),
        b AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM ev),
        binned AS (SELECT wk,
                     CAST(LEAST(9, FLOOR((value - mn) * 10.0 /
                       nullif(mx - mn, 0.0))) AS INTEGER) AS bin
                   FROM ev, b
                   WHERE FLOOR((value - mn) * 10.0 /
                     nullif(mx - mn, 0.0)) IS NOT NULL),
        wb AS (SELECT wk, bin, CAST(COUNT(*) AS BIGINT) AS n_wb
               FROM binned GROUP BY 1, 2),
        wtot AS (SELECT wk, CAST(SUM(n_wb) AS BIGINT) AS n_w
                 FROM wb GROUP BY 1),
        btot AS (SELECT bin, CAST(SUM(n_wb) AS BIGINT) AS n_b
                 FROM wb GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_wb) AS BIGINT) AS n FROM wb),
        grid AS (SELECT wt.wk, wt.n_w, bi.bin
                 FROM wtot wt CROSS JOIN
                      (SELECT unnest(range(0, 10)) AS bin) bi),
        j AS (SELECT g.wk, g.n_w, g.bin,
                     COALESCE(wb.n_wb, 0) AS n_wb,
                     COALESCE(bt.n_b, 0) AS n_b
              FROM grid g
              LEFT JOIN wb ON wb.wk = g.wk AND wb.bin = g.bin
              LEFT JOIN btot bt ON bt.bin = g.bin)
        SELECT strftime(j.wk, '%Y-%m-%d') AS week,
               MAX(j.n_w) AS n_events,
               round(SUM(((CAST(n_wb AS DOUBLE) + 1.0) / (n_w + 10.0) -
                          (CAST(n_b AS DOUBLE) + 1.0) / (t.n + 10.0)) *
                     ln(((CAST(n_wb AS DOUBLE) + 1.0) / (n_w + 10.0)) /
                        ((CAST(n_b AS DOUBLE) + 1.0) / (t.n + 10.0)))),
                     6) AS psi
        FROM j, tot t
        GROUP BY j.wk
      """)),

    // ------------------------------------------------------------------
    // q129: pointwise mutual information over per-user event-type
    // pairs — the association mining behind co-occurrence embeddings
    // (word2vec-style PMI matrices) and market-basket lift. The
    // user×type incidence relation is deduped once (one shuffle on
    // user_id, the scale key), checkpointed, then self-joined on
    // user_id to count pair supports — with only T event types the
    // pair space is T², tiny, while the join itself stays co-
    // partitioned on user_id with no skew amplification. Marginals
    // ride the same incidence relation and broadcast back. PMI's
    // ln() consumes exact integer-count ratios — identical IEEE
    // inputs in both engines — so round-at-6 is decisive.
    QDef(
      "q129_pmi_pairs",
      (s, dir) => {
        val inc = Tables(s, dir).events
          .select(col("user_id"), col("event_type")).distinct()
          .ckpt() // feeds pair join, marginals, and N
        val nUsers = inc.select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n"))
        val marg = inc.groupBy(col("event_type")).agg(count(lit(1)).as("m"))
        val pairs = inc.as("a")
          .join(inc.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("et_a"),
            col("b.event_type").as("et_b"))
          .agg(count(lit(1)).as("c_ab"))
        pairs
          .join(broadcast(marg.select(col("event_type").as("et_a"),
            col("m").as("c_a"))), "et_a")
          .join(broadcast(marg.select(col("event_type").as("et_b"),
            col("m").as("c_b"))), "et_b")
          .crossJoin(broadcast(nUsers))
          .select(col("et_a"), col("et_b"), col("c_ab"), col("c_a"),
            col("c_b"),
            round(log(col("c_ab").cast("double") * col("n") /
              (col("c_a").cast("double") * col("c_b"))), 6).as("pmi"))
      },
      Some("""
        WITH inc AS (SELECT DISTINCT user_id, event_type FROM events),
        n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM inc),
        marg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m
                 FROM inc GROUP BY 1),
        pairs AS (SELECT a.event_type AS et_a, b.event_type AS et_b,
                         CAST(COUNT(*) AS BIGINT) AS c_ab
                  FROM inc a JOIN inc b ON a.user_id = b.user_id
                   AND a.event_type < b.event_type
                  GROUP BY 1, 2)
        SELECT et_a, et_b, c_ab, ma.m AS c_a, mb.m AS c_b,
               ROUND(LN(CAST(c_ab AS DOUBLE) * n.n
                        / (CAST(ma.m AS DOUBLE) * mb.m)), 6) AS pmi
        FROM pairs
        JOIN marg ma ON ma.event_type = et_a
        JOIN marg mb ON mb.event_type = et_b, n
      """)),

    // ------------------------------------------------------------------
    // q130: A/B experiment readout — per-cohort two-proportion z-test
    // on conversion (any purchase), with a deterministic hash
    // assignment (user_id parity = arm, user_id mod 5 = cohort) so
    // both engines derive identical arms with no stored assignment
    // table. Everything up to the test statistic is exact integers
    // computed in ONE partial-aggregable pass over a per-user
    // conversion relation (itself one shuffle on user_id); the z
    // formula (pooled-variance) is the same IEEE expression tree in
    // both engines over those integers, rounded at 6. This is the
    // exact shape of a 10^10-user experiment scorecard: no windows,
    // no joins wider than the per-user rollup.
    QDef(
      "q130_ab_ztest",
      (s, dir) => {
        val users = Tables(s, dir).events
          .groupBy(col("user_id"))
          // "converted" = any big-ticket purchase; a bare any-purchase
          // flag is degenerate here (every user buys → pooled p = 1 and
          // the z denominator collapses to 0)
          .agg(max(when(col("event_type") === "purchase" &&
            col("value") > 180.0d, 1L).otherwise(0L))
            .as("converted"))
          .select(col("user_id") % 5 as "cohort",
            (col("user_id") % 2).as("arm"), col("converted"))
        users.groupBy(col("cohort"))
          .agg(
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0, col("converted")).otherwise(0L))
              .as("c0"),
            sum(when(col("arm") === 1, col("converted")).otherwise(0L))
              .as("c1"))
          .select(col("cohort"), col("n0"), col("n1"), col("c0"), col("c1"),
            round(col("c0").cast("double") / col("n0"), 6).as("p0"),
            round(col("c1").cast("double") / col("n1"), 6).as("p1"),
            // nullif: a degenerate cohort (pooled p of 0 or 1) pins z
            // to NULL in both engines instead of ANSI-erroring here
            // and inf-ing in DuckDB
            round((col("c1").cast("double") / col("n1") -
              col("c0").cast("double") / col("n0")) /
              nullif(sqrt(((col("c0") + col("c1")).cast("double") /
                (col("n0") + col("n1"))) *
                (lit(1.0d) - (col("c0") + col("c1")).cast("double") /
                  (col("n0") + col("n1"))) *
                (lit(1.0d) / col("n0") + lit(1.0d) / col("n1"))),
                lit(0.0d)), 6)
              .as("z"))
      },
      Some("""
        WITH u AS (SELECT user_id,
                          CAST(MAX(CASE WHEN event_type = 'purchase'
                                    AND value > 180
                               THEN 1 ELSE 0 END) AS BIGINT) AS converted
                   FROM events GROUP BY 1),
        g AS (SELECT user_id % 5 AS cohort, user_id % 2 AS arm, converted
              FROM u),
        agg AS (SELECT cohort,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
                 CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                   AS BIGINT) AS c0,
                 CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                   AS BIGINT) AS c1
                FROM g GROUP BY 1)
        SELECT cohort, n0, n1, c0, c1,
               ROUND(CAST(c0 AS DOUBLE) / n0, 6) AS p0,
               ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS p1,
               ROUND((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                     / nullif(SQRT((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                            * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                            * (1.0 / n0 + 1.0 / n1)), 0), 6) AS z
        FROM agg
      """)),

    // ------------------------------------------------------------------
    // q131: sweep-line interval concurrency — peak simultaneous
    // "sessions" per hour, where each event holds a resource for
    // `value` seconds. The textbook algorithm is a GLOBAL running sum
    // over +1/-1 deltas, which on a cluster is a single-partition
    // sort; the engine instead runs the distributed two-phase prefix
    // sum (q96's bucket trick, applied to time): (1) per-hour net
    // deltas — a tiny partial-aggregable relation — get cumulative
    // offsets via a window over hundreds of rows; (2) the within-hour
    // running sum is a window PARTITIONED BY hour, so the heavy sort
    // shards on the time bucket. Offset + within-sum reconstructs the
    // exact global sweep. Tie order (t, delta, eid) is total and makes
    // a zero-length hold never count as concurrent (its -1 sorts
    // first). All arithmetic is integer — hash-exact by construction.
    QDef(
      "q131_concurrency",
      (s, dir) => {
        val iv = Tables(s, dir).events
          .select(col("event_id").as("eid"), col("ts").as("st"),
            // floor, not a bare int cast: DuckDB rounds double→int
            // casts while Spark truncates — FLOOR agrees everywhere
            expr("timestampadd(SECOND, cast(floor(value) as int), ts)")
              .as("en"))
        val deltas = iv.select(col("st").as("t"), lit(1).as("delta"),
          col("eid"))
          .unionByName(iv.select(col("en").as("t"), lit(-1).as("delta"),
            col("eid")))
          .withColumn("bucket", date_trunc("hour", col("t")))
          .ckpt() // feeds the bucket-net agg AND the sweep
        val prevBuckets = Q.bounded.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = deltas.groupBy(col("bucket"))
          .agg(sum(col("delta")).as("net"))
          .withColumn("off", coalesce(sum(col("net")).over(prevBuckets),
            lit(0L)))
          .select(col("bucket"), col("off"))
        val wIn = Window.partitionBy(col("bucket"))
          .orderBy(col("t"), col("delta"), col("eid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        deltas.join(broadcast(offsets), "bucket")
          .withColumn("conc", col("off") + sum(col("delta")).over(wIn))
          .groupBy(col("bucket"))
          .agg(max(col("conc")).as("max_conc"),
            count(lit(1)).as("n_deltas"))
          .select(date_format(col("bucket"), "yyyy-MM-dd HH:00").as("hour"),
            col("max_conc"), col("n_deltas"))
      },
      Some("""
        WITH iv AS (SELECT event_id AS eid, ts AS st,
                           ts + CAST(FLOOR(value) AS INTEGER)
                             * INTERVAL 1 SECOND AS en
                    FROM events),
        d AS (SELECT st AS t, 1 AS delta, eid FROM iv
              UNION ALL SELECT en, -1, eid FROM iv),
        r AS (SELECT date_trunc('hour', t) AS bucket,
                     SUM(delta) OVER (ORDER BY t, delta, eid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS conc
              FROM d)
        SELECT strftime(bucket, '%Y-%m-%d %H:00') AS hour,
               CAST(MAX(conc) AS BIGINT) AS max_conc,
               CAST(COUNT(*) AS BIGINT) AS n_deltas
        FROM r GROUP BY bucket
      """)),

    // ------------------------------------------------------------------
    // q136: seasonal profile decomposition — the additive
    // profile-plus-residual split behind every traffic anomaly
    // detector: per (day, hour-of-day) counts, an hour-of-day profile
    // (mean across days), and the residual envelope (min/max deviation
    // from profile). Two partial-aggregable passes — the second over
    // the already-tiny daily grid — plus a broadcast profile join;
    // nothing here sorts or shuffles the raw stream more than once on
    // the (day, hod) key it would shard by at 10^12 events. Counts are
    // exact; profile and residual are single divisions/subtractions of
    // exact integers — the same IEEE expressions both engines, round 6.
    QDef(
      "q136_seasonal_profile",
      (s, dir) => {
        val grid = Tables(s, dir).events
          .groupBy(date_trunc("day", col("ts")).as("d"),
            hour(col("ts")).as("hod"))
          .agg(count(lit(1)).as("n"))
          .ckpt() // feeds the profile agg AND the residuals
        val prof = grid.groupBy(col("hod"))
          .agg((sum(col("n")).cast("double") / count(lit(1))).as("avg_raw"),
            count(lit(1)).as("n_days"))
        grid.join(broadcast(prof), "hod")
          .withColumn("resid", col("n").cast("double") - col("avg_raw"))
          .groupBy(col("hod"), col("n_days"), col("avg_raw"))
          .agg(round(max(col("resid")), 6).as("max_resid"),
            round(min(col("resid")), 6).as("min_resid"))
          .select(col("hod"), col("n_days"), round(col("avg_raw"), 6)
            .as("avg_n"), col("max_resid"), col("min_resid"))
      },
      Some("""
        WITH grid AS (SELECT date_trunc('day', ts) AS d,
                             CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hod,
                             CAST(COUNT(*) AS BIGINT) AS n
                      FROM events GROUP BY 1, 2),
        prof AS (SELECT hod,
                        CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_raw,
                        CAST(COUNT(*) AS BIGINT) AS n_days
                 FROM grid GROUP BY 1)
        SELECT g.hod, p.n_days, ROUND(p.avg_raw, 6) AS avg_n,
               ROUND(MAX(CAST(g.n AS DOUBLE) - p.avg_raw), 6) AS max_resid,
               ROUND(MIN(CAST(g.n AS DOUBLE) - p.avg_raw), 6) AS min_resid
        FROM grid g JOIN prof p ON p.hod = g.hod
        GROUP BY g.hod, p.n_days, p.avg_raw
      """)),

    // ------------------------------------------------------------------
    // q137: point-in-time trailing-window features — the feature-store
    // backfill shape: for every purchase, the user's activity profile
    // over the PRECEDING 7 days (event count, click count, exact spend),
    // with zero self-joins: one shuffle on user_id and a RANGE frame
    // over epoch seconds computes every trailing aggregate in a single
    // sorted pass — the plan shape that holds when the event stream is
    // 10^12 rows (contrast with the events×events interval join, which
    // explodes). The [-7d, -1s] frame is value-based, so same-second
    // peers are excluded identically in both engines no matter how
    // ties shuffle; spend accumulates in DECIMAL (order-exact), counts
    // are integers — the whole row is hash-exact.
    QDef(
      "q137_trailing_features",
      (s, dir) => {
        val ev = Tables(s, dir).events
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("unix_micros(ts) div 1000000").as("tsec"),
            col("value"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
          .rangeBetween(-7L * 86400L, -1L)
        ev.withColumn("cnt_7d", count(lit(1)).over(w))
          .withColumn("clicks_7d",
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .over(w))
          .withColumn("spend_7d",
            sum(when(col("event_type") === "purchase",
              col("value").cast(DecimalType(18, 2)))).over(w))
          .where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("cnt_7d"),
            col("clicks_7d"),
            coalesce(col("spend_7d").cast("double"), lit(0.0d))
              .as("spend_7d"))
      },
      Some("""
        WITH ev AS (SELECT event_id, user_id, event_type,
                           epoch_us(ts) // 1000000 AS tsec,
                           CAST(value AS DECIMAL(18,2)) AS v
                    FROM events),
        f AS (SELECT event_id, user_id, event_type,
                CAST(COUNT(*) OVER w AS BIGINT) AS cnt_7d,
                CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  OVER w AS BIGINT) AS clicks_7d,
                SUM(CASE WHEN event_type = 'purchase' THEN v END) OVER w
                  AS spend_7d
              FROM ev
              WINDOW w AS (PARTITION BY user_id ORDER BY tsec
                RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING))
        SELECT event_id, user_id, cnt_7d, clicks_7d,
               COALESCE(CAST(spend_7d AS DOUBLE), 0.0) AS spend_7d
        FROM f WHERE event_type = 'purchase'
      """)),

    // ------------------------------------------------------------------
    // q141: leakage-safe churn label generation — the supervised-
    // learning front door: split the stream at an IN-PLAN cutoff
    // (max ts − 14 days, a broadcast one-row aggregate — no wall
    // clock, no driver collect), compute features STRICTLY BEFORE the
    // cutoff (event/purchase counts, exact decimal spend, distinct
    // active days) and the churn label (zero activity at-or-after it)
    // from disjoint time ranges, so no feature can see the label
    // window. One pass over events with conditional aggregation — the
    // cutoff predicate splits inside the aggregate, not via two scans.
    // Users whose activity is entirely post-cutoff yield NULL-free
    // zero features and label 0 in both engines.
    QDef(
      "q141_churn_labels",
      (s, dir) => {
        val ev = Tables(s, dir).events
        val bounds = ev.agg(
          expr("timestampadd(DAY, -14, max(ts))").as("cutoff"))
        ev.crossJoin(broadcast(bounds))
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("ts") < col("cutoff"), 1L).otherwise(0L))
              .as("n_events"),
            sum(when(col("ts") < col("cutoff") &&
              col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_purchases"),
            coalesce(sum(when(col("ts") < col("cutoff") &&
              col("event_type") === "purchase",
              col("value").cast(DecimalType(18, 2)))),
              lit(0).cast(DecimalType(18, 2))).cast("double").as("spend"),
            countDistinct(when(col("ts") < col("cutoff"),
              date_trunc("day", col("ts")))).as("days_active"),
            max(when(col("ts") >= col("cutoff"), 1L).otherwise(0L))
              .as("active_after"))
          .select(col("user_id"), col("n_events"), col("n_purchases"),
            col("spend"), col("days_active"),
            (lit(1L) - col("active_after")).as("churned"))
      },
      Some("""
        WITH b AS (SELECT MAX(ts) - INTERVAL 14 DAY AS cutoff FROM events),
        u AS (SELECT user_id,
                CAST(SUM(CASE WHEN ts < cutoff THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_events,
                CAST(SUM(CASE WHEN ts < cutoff AND event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                CAST(COALESCE(SUM(CASE WHEN ts < cutoff
                         AND event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2)) END),
                       0) AS DOUBLE) AS spend,
                CAST(COUNT(DISTINCT CASE WHEN ts < cutoff
                         THEN date_trunc('day', ts) END) AS BIGINT)
                  AS days_active,
                CAST(MAX(CASE WHEN ts >= cutoff THEN 1 ELSE 0 END)
                  AS BIGINT) AS active_after
              FROM events, b GROUP BY 1)
        SELECT user_id, n_events, n_purchases, spend, days_active,
               1 - active_after AS churned
        FROM u
      """)),

    // ------------------------------------------------------------------
    // q143: frequent-prefix path mining — each user's first five event
    // types as an ordered path string, counted across users (the
    // clickstream-motif report behind onboarding-funnel analysis).
    // The path is assembled ARRAY-LOCALLY: one per-user aggregation
    // collects (ts, event_id, type) structs, array_sort orders them by
    // the total (ts, event_id) key inside the row, and a slice+
    // concat_ws builds the prefix — no per-user window pass, no
    // second shuffle; the only exchanges are the user rollup and the
    // tiny path-count agg. (collect_list order is shuffle-dependent;
    // array_sort on the struct makes the result order-independent,
    // which is what makes this plan legal at all.) Top-15 by count
    // with full tiebreak via sort+limit (TakeOrderedAndProject, O(k)
    // per partition — never a global row_number over the users-sized
    // path-count table), rk assigned over the 15 survivors (the q185
    // shape); all integers and strings.
    QDef(
      "q143_path_mining",
      (s, dir) => {
        val paths = Tables(s, dir).events
          .groupBy(col("user_id"))
          .agg(concat_ws(">", expr(
            """slice(transform(
                 array_sort(collect_list(struct(ts, event_id, event_type))),
                 s -> s.event_type), 1, 5)""")).as("path"))
        paths.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path").asc)
          .limit(15)
          .withColumn("rk", row_number().over(Q.bounded.orderBy(
            col("n_users").desc, col("path").asc)))
          .select(col("rk"), col("path"), col("n_users"))
      },
      Some("""
        WITH p AS (SELECT user_id,
                     array_to_string(
                       (list(event_type ORDER BY ts, event_id))[1:5], '>')
                       AS path
                   FROM events GROUP BY 1),
        c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
              FROM p GROUP BY 1)
        SELECT CAST(rk AS INTEGER) AS rk, path, n_users
        FROM (SELECT path, n_users,
                     ROW_NUMBER() OVER (ORDER BY n_users DESC, path ASC)
                       AS rk
              FROM c) t
        WHERE rk <= 15
      """)),

    // ------------------------------------------------------------------
    // q148: time-to-convert distribution — per-user signup→first-
    // purchase lag, summarized as p50/p90 via Q.globalExactPercentiles
    // (the q180 two-phase histogram selection: bounded histogram cum +
    // within-bucket ranks — no single-task sort or rank window over
    // the users-sized lag table even at 10^9 converting users). The
    // first-purchase-after-signup lookup is one conditional rollup per
    // side co-partitioned on user_id — no events×events join: min(
    // signup ts) per user joins back onto that user's purchases with a
    // plain >= filter before the min. Lags are exact integer seconds;
    // the two quantile interpolations are the only floats, emitted at
    // round 6 (the q34 idiom).
    QDef(
      "q148_conversion_lag",
      (s, dir) => {
        val ev = Tables(s, dir).events
        val signups = ev.where(col("event_type") === "signup")
          .groupBy(col("user_id"))
          .agg(min(expr("unix_micros(ts) div 1000000")).as("s0"))
        val conv = ev.where(col("event_type") === "purchase")
          .select(col("user_id"),
            expr("unix_micros(ts) div 1000000").as("pt"))
          .join(signups, "user_id")
          .where(col("pt") >= col("s0"))
          .groupBy(col("user_id"))
          .agg((min(col("pt")) - first(col("s0"))).as("lag_s"))
        val nAll = signups.agg(count(lit(1)).as("n_signup"))
        Q.globalExactPercentiles(conv, "lag_s",
            Seq(0.5 -> "p50_raw", 0.9 -> "p90_raw"))
          .crossJoin(broadcast(nAll))
          .select(col("n_signup"), col("n").as("n_converted"),
            round(col("p50_raw"), 6).as("p50_s"),
            round(col("p90_raw"), 6).as("p90_s"))
      },
      Some("""
        WITH s AS (SELECT user_id, MIN(epoch_us(ts) // 1000000) AS s0
                   FROM events WHERE event_type = 'signup' GROUP BY 1),
        c AS (SELECT e.user_id,
                     MIN(epoch_us(e.ts) // 1000000) - MIN(s.s0) AS lag_s
              FROM events e JOIN s ON s.user_id = e.user_id
              WHERE e.event_type = 'purchase'
                AND epoch_us(e.ts) // 1000000 >= s.s0
              GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_signup FROM s)
        SELECT n_signup,
               CAST(COUNT(*) AS BIGINT) AS n_converted,
               ROUND(quantile_cont(lag_s, 0.5), 6) AS p50_s,
               ROUND(quantile_cont(lag_s, 0.9), 6) AS p90_s
        FROM c, n GROUP BY n_signup
      """)),

    // ------------------------------------------------------------------
    // q151: telemetry burst dedup — collapse rapid-fire duplicates
    // (same user, same event type, < 5 s after the previous raw
    // event), the ingest-side debounce every telemetry pipeline runs
    // before counting anything. One lag() over the (user_id,
    // event_type) partition decides keep/drop — exact integer
    // microsecond arithmetic, no self-join, no state beyond one row —
    // and the audit rollup reports kept/dropped/drop-rate per type.
    // This is the batch restatement of the streaming dedup the
    // extension's watermarked dedup performs; at 10^12 events it is
    // one shuffle on the (user, type) key.
    QDef(
      "q151_burst_dedup",
      (s, dir) => {
        val byKey = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("tus"), col("event_id"))
        Tables(s, dir).events
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("tus"), col("event_id"))
          .withColumn("prev", lag(col("tus"), 1).over(byKey))
          .withColumn("kept", when(col("prev").isNull ||
            col("tus") - col("prev") >= 5000000L, 1L).otherwise(0L))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_total"),
            sum(col("kept")).as("n_kept"),
            sum(lit(1L) - col("kept")).as("n_dropped"))
          .withColumn("drop_rate",
            round((col("n_total") - col("n_kept")).cast("double") /
              col("n_total"), 6))
      },
      Some("""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus,
                          event_id,
                          LAG(epoch_us(ts), 1) OVER (
                            PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts), event_id) AS prev
                   FROM events),
        k AS (SELECT event_type,
                     CASE WHEN prev IS NULL OR tus - prev >= 5000000
                          THEN 1 ELSE 0 END AS kept
              FROM e)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(kept) AS BIGINT) AS n_kept,
               CAST(SUM(1 - kept) AS BIGINT) AS n_dropped,
               ROUND(CAST(COUNT(*) - SUM(kept) AS DOUBLE) / COUNT(*), 6)
                 AS drop_rate
        FROM k GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q157: chi-square test of independence — is event type independent
    // of hour-of-day? The contingency table is one partial-aggregable
    // count over (type, hod); expected counts and cell contributions
    // compute from the broadcast marginals — row totals, column totals,
    // and the grand total all derive from the SAME observed relation,
    // so the statistic is self-consistent by construction. Per-type
    // rollup emits the chi² contribution and cell count (df = cells−1
    // per row under fixed columns). Observed/marginals are exact
    // integers; e = rt·ct/N and (o−e)²/e are the same IEEE expressions
    // in both engines, cell-rounded at 9 and sum-rounded at 6.
    QDef(
      "q157_chi_square",
      (s, dir) => {
        val obs = Tables(s, dir).events
          .groupBy(col("event_type"), hour(col("ts")).as("hod"))
          .agg(count(lit(1)).as("o"))
          .ckpt() // feeds marginals AND the cell pass
        val rowT = obs.groupBy(col("event_type"))
          .agg(sum(col("o")).as("rt"))
        val colT = obs.groupBy(col("hod")).agg(sum(col("o")).as("ct"))
        val nn = obs.agg(sum(col("o")).as("nn"))
        obs.join(broadcast(rowT), "event_type")
          .join(broadcast(colT), "hod")
          .crossJoin(broadcast(nn))
          .withColumn("e", col("rt").cast("double") * col("ct") / col("nn"))
          .withColumn("cell", round((col("o") - col("e")) *
            (col("o") - col("e")) / col("e"), 9))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_cells"),
            max(col("rt")).as("n_events"),
            round(sum(col("cell")), 6).as("chi2"))
      },
      Some("""
        WITH obs AS (SELECT event_type,
                       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hod,
                       CAST(COUNT(*) AS BIGINT) AS o
                     FROM events GROUP BY 1, 2),
        rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt
               FROM obs GROUP BY 1),
        ct AS (SELECT hod, CAST(SUM(o) AS BIGINT) AS ct
               FROM obs GROUP BY 1),
        n AS (SELECT CAST(SUM(o) AS BIGINT) AS nn FROM obs),
        cells AS (SELECT obs.event_type,
                    ROUND((obs.o - CAST(rt.rt AS DOUBLE) * ct.ct / n.nn)
                          * (obs.o - CAST(rt.rt AS DOUBLE) * ct.ct / n.nn)
                          / (CAST(rt.rt AS DOUBLE) * ct.ct / n.nn), 9)
                      AS cell,
                    rt.rt
                  FROM obs
                  JOIN rt ON rt.event_type = obs.event_type
                  JOIN ct ON ct.hod = obs.hod, n)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(MAX(rt) AS BIGINT) AS n_events,
               ROUND(SUM(cell), 6) AS chi2
        FROM cells GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q159: point-biserial feature screening — which activity features
    // correlate with the label "no big-ticket purchase in the label
    // window" (q130's conversion event, q141's cutoff split — a bare
    // any-activity churn label is degenerate here: nobody fully
    // lapses, so its variance is 0 and r is undefined)? Each
    // user's (n_events, n_purchases, days_active) unpivots via stack()
    // into (feature, x, y) rows, and one moment pass per feature
    // computes r = (nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) — q126's
    // closed form with a binary y. EVERY moment is an exact integer
    // (features and label are counts/flags), so only the final r is
    // IEEE — the same expression tree in both engines, round 6. Two
    // partial-aggregable passes (user rollup, then 3-row moments);
    // the unpivot is array-local.
    QDef(
      "q159_feature_screen",
      (s, dir) => {
        val ev = Tables(s, dir).events
        val bounds = ev.agg(
          expr("timestampadd(DAY, -14, max(ts))").as("cutoff"))
        val users = ev.crossJoin(broadcast(bounds))
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("ts") < col("cutoff"), 1L).otherwise(0L))
              .as("n_events"),
            sum(when(col("ts") < col("cutoff") &&
              col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_purchases"),
            countDistinct(when(col("ts") < col("cutoff"),
              date_trunc("day", col("ts")))).as("days_active"),
            (lit(1L) - max(when(col("ts") >= col("cutoff") &&
              col("event_type") === "purchase" && col("value") > 180.0d,
              1L).otherwise(0L))).as("y"))
        users.select(col("y"), expr(
          """stack(3, 'n_events', n_events, 'n_purchases', n_purchases,
                      'days_active', days_active)""")
          .as(Seq("feature", "x")))
          .groupBy(col("feature"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("feature"), col("n"),
            round((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              nullif(sqrt(((col("n") * col("sxx") - col("sx") * col("sx"))
                * (col("n") * col("syy") - col("sy") * col("sy")))
                .cast("double")), lit(0.0d)), 6).as("r_pb"))
      },
      Some("""
        WITH b AS (SELECT MAX(ts) - INTERVAL 14 DAY AS cutoff FROM events),
        u AS (SELECT user_id,
                CAST(SUM(CASE WHEN ts < cutoff THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_events,
                CAST(SUM(CASE WHEN ts < cutoff AND event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                CAST(COUNT(DISTINCT CASE WHEN ts < cutoff
                         THEN date_trunc('day', ts) END) AS BIGINT)
                  AS days_active,
                1 - CAST(MAX(CASE WHEN ts >= cutoff
                         AND event_type = 'purchase' AND value > 180
                         THEN 1 ELSE 0 END) AS BIGINT) AS y
              FROM events, b GROUP BY 1),
        l AS (SELECT y, f.feature, f.x
              FROM u, LATERAL (VALUES ('n_events', n_events),
                                      ('n_purchases', n_purchases),
                                      ('days_active', days_active))
                        AS f(feature, x)),
        m AS (SELECT feature, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * y) AS BIGINT) AS sxy,
                     CAST(SUM(x * x) AS BIGINT) AS sxx,
                     CAST(SUM(y * y) AS BIGINT) AS syy
              FROM l GROUP BY 1)
        SELECT feature, n,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / nullif(SQRT(CAST((n * sxx - sx * sx)
                                 * (n * syy - sy * sy) AS DOUBLE)), 0), 6)
                 AS r_pb
        FROM m
      """)),

    // ------------------------------------------------------------------
    // q163: co-arrival burst detection — minutes in which a single
    // user fired 2+ events (bot/retry signatures; at this stream's
    // density sub-second co-arrival never happens, so the minute is
    // the telling grain). One partial-aggregable count on the (user,
    // minute) key — the natural shard key; no windows, no self-joins —
    // then a per-user rollup of burst minutes, max burst size, and
    // events inside bursts, ranked by burstiness. Top-20 via
    // sort+limit (TakeOrderedAndProject, O(k) per partition — never a
    // global row_number over the users-sized rollup), rk assigned
    // over the 20 survivors (the q185 shape). All integer.
    QDef(
      "q163_burst_arrivals",
      (s, dir) => {
        val secs = Tables(s, dir).events
          .groupBy(col("user_id"),
            expr("unix_micros(ts) div 60000000").as("tmin"))
          .agg(count(lit(1)).as("n"))
        secs.where(col("n") >= 2)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("burst_mins"),
            max(col("n")).as("max_burst"),
            sum(col("n")).as("events_in_bursts"))
          .orderBy(col("events_in_bursts").desc, col("user_id").asc)
          .limit(20)
          .withColumn("rk", row_number().over(Q.bounded.orderBy(
            col("events_in_bursts").desc, col("user_id").asc)))
      },
      Some("""
        WITH s AS (SELECT user_id, epoch_us(ts) // 60000000 AS tmin,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
        b AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS burst_mins,
                     CAST(MAX(n) AS BIGINT) AS max_burst,
                     CAST(SUM(n) AS BIGINT) AS events_in_bursts
              FROM s WHERE n >= 2 GROUP BY 1)
        SELECT user_id, burst_mins, max_burst, events_in_bursts,
               CAST(rk AS INTEGER) AS rk
        FROM (SELECT user_id, burst_mins, max_burst, events_in_bursts,
                     ROW_NUMBER() OVER (ORDER BY events_in_bursts DESC,
                       user_id ASC) AS rk
              FROM b) t
        WHERE rk <= 20
      """)),

    // ------------------------------------------------------------------
    // q168: CUSUM level-shift detection on daily event volume — the
    // streaming-health monitor shape (did a source start over-emitting?).
    // The textbook recursion S_t = max(0, S_{t-1} + x_t − k) is not a
    // window function, but it has a closed form over prefix sums:
    // S_t = P_t − min(0, min_{j≤t} P_j) with P the running sum of
    // deviations — two cumulative windows per series key, no recursion,
    // no driver loop. Every deviation is EXACT integer arithmetic
    // (dev = 10·n_days·n − 11·sum_n, i.e. count minus 1.1× the mean,
    // scaled by 10·n_days to clear both divisions), so the prefix sums
    // are order-exact bigints and the only float is the final
    // normalization. Per-series stats ride in via a broadcast join of a
    // tiny aggregate (q136 pattern); everything shuffles once on
    // event_type.
    QDef(
      "q168_cusum_shift",
      (s, dir) => {
        val daily = Tables(s, dir).events
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"))
        val stats = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"), sum(col("n")).as("sum_n"))
        val cum = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.join(broadcast(stats), "event_type")
          .withColumn("dev",
            lit(10L) * col("n_days") * col("n") - lit(11L) * col("sum_n"))
          .withColumn("p", sum(col("dev")).over(cum))
          .withColumn("s",
            col("p") - least(min(col("p")).over(cum), lit(0L)))
          .groupBy(col("event_type"), col("n_days"), col("sum_n"))
          .agg(
            sum(when(col("s") > lit(5L) * col("sum_n"), 1L).otherwise(0L))
              .as("n_flagged"),
            min(when(col("s") > lit(5L) * col("sum_n"), col("day")))
              .as("first_flag_day"),
            round(max(col("s")).cast("double")
              / (lit(10.0d) * col("sum_n").cast("double")), 9)
              .as("max_ratio"))
      },
      Some("""
        WITH daily AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
        st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                      CAST(SUM(n) AS BIGINT) AS sum_n
               FROM daily GROUP BY 1),
        dev AS (SELECT d.event_type, day, n, n_days, sum_n,
                       10 * n_days * n - 11 * sum_n AS dv
                FROM daily d JOIN st USING (event_type)),
        pre AS (SELECT *, SUM(dv) OVER (PARTITION BY event_type
                  ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS p
                FROM dev),
        cu AS (SELECT *, p - LEAST(MIN(p) OVER (PARTITION BY event_type
                 ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW), 0) AS s
               FROM pre)
        SELECT event_type, n_days, sum_n,
               CAST(SUM(CASE WHEN s > 5 * sum_n THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_flagged,
               MIN(CASE WHEN s > 5 * sum_n THEN day END) AS first_flag_day,
               ROUND(CAST(MAX(s) AS DOUBLE)
                     / (10.0 * CAST(sum_n AS DOUBLE)), 9) AS max_ratio
        FROM cu GROUP BY 1, 2, 3
      """)),

    // ------------------------------------------------------------------
    // q181: Kaplan-Meier survival curve for time-to-first-error per
    // user — the censoring-aware reliability estimator (naive "fraction
    // errored by hour t" is biased: users whose observation window ends
    // before t haven't had t hours to fail). A user's clock starts at
    // their first event; the EVENT is their first 'error'
    // (t = whole hours to it, d = 1), and a user with no error is
    // right-CENSORED at their last observed event. At each event time:
    // S(t) = prod_{t'<=t} (1 - d/n_at_risk), computed as exp(cum-sum of
    // ln terms). Scale shape: the per-user span is one
    // partial-aggregable pass (the error-arm min rides the same
    // aggregate via a conditional min — no second scan or join);
    // everything after runs on the per-DURATION table, bounded by the
    // hour range (like q96's bucket table), so the global window orders
    // hundreds of rows, never users. The user total rides in as a
    // ONE-row broadcast (q37 pattern). Determinism: d and n_at_risk are
    // exact integers, each ln term is rounded at 9 (the q101
    // per-iteration discipline), the cum-sum order is the duration
    // order in both engines, and a d = n_at_risk tail (S hits exactly
    // 0) is handled by a sticky integer flag instead of letting ln(0)
    // produce -inf.
    QDef(
      "q181_kaplan_meier",
      (s, dir) => {
        val ev = Tables(s, dir).events
        val spans = ev.groupBy(col("user_id"))
          .agg(min(unix_micros(col("ts"))).as("t0"),
            max(unix_micros(col("ts"))).as("tl"),
            min(when(col("event_type") === "error",
              unix_micros(col("ts")))).as("te"))
        val users = spans.select(
          expr("(coalesce(te, tl) - t0) div 3600000000")
            .cast("bigint").as("t"),
          when(col("te").isNotNull, 1L).otherwise(0L).as("churn"))
        val byT = users.groupBy(col("t"))
          .agg(sum(col("churn")).cast("bigint").as("d"),
            sum(lit(1L) - col("churn")).cast("bigint").as("c"))
        val nTot = users.agg(count(lit(1)).as("n_total"))
        val prev = Q.bounded.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val cum = Q.bounded.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byT.crossJoin(broadcast(nTot))
          .withColumn("at_risk", col("n_total")
            - coalesce(sum(col("d") + col("c")).over(prev), lit(0L)))
          .withColumn("term", when(col("d") > 0 && col("d") < col("at_risk"),
            expr("round(ln(1.0d - cast(d as double)" +
              " / cast(at_risk as double)), 9)")).otherwise(lit(0.0d)))
          .withColumn("zf",
            when(col("d") === col("at_risk"), 1L).otherwise(0L))
          .withColumn("lsum", sum(col("term")).over(cum))
          .withColumn("zflag", max(col("zf")).over(cum))
          .where(col("d") > 0)
          .select(col("t").as("t_hours"), col("at_risk"),
            col("d").as("n_events"),
            when(col("zflag") === 1L, lit(0.0d))
              .otherwise(round(exp(col("lsum")), 6)).as("survival"))
      },
      Some("""
        WITH spans AS (SELECT user_id, MIN(epoch_us(ts)) AS t0,
                              MAX(epoch_us(ts)) AS tl,
                              MIN(CASE WHEN event_type = 'error'
                                  THEN epoch_us(ts) END) AS te
                       FROM events GROUP BY 1),
        users AS (SELECT CAST((COALESCE(te, tl) - t0) // 3600000000
                           AS BIGINT) AS t,
                         CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END
                           AS churn
                  FROM spans),
        byt AS (SELECT t, CAST(SUM(churn) AS BIGINT) AS d,
                       CAST(SUM(1 - churn) AS BIGINT) AS c
                FROM users GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM users),
        r AS (SELECT t, d, n_total - COALESCE(CAST(SUM(d + c) OVER
                 (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING) AS BIGINT), 0) AS at_risk
              FROM byt, n),
        trm AS (SELECT *,
                  CASE WHEN d > 0 AND d < at_risk
                       THEN ROUND(LN(1.0 - CAST(d AS DOUBLE) / at_risk), 9)
                       ELSE CAST(0.0 AS DOUBLE) END AS term,
                  CASE WHEN d = at_risk THEN 1 ELSE 0 END AS zf
                FROM r),
        cu AS (SELECT *, SUM(term) OVER (ORDER BY t ROWS BETWEEN
                 UNBOUNDED PRECEDING AND CURRENT ROW) AS lsum,
               MAX(zf) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS zflag
               FROM trm)
        SELECT t AS t_hours, at_risk, d AS n_events,
               CASE WHEN zflag = 1 THEN CAST(0.0 AS DOUBLE)
                    ELSE ROUND(EXP(lsum), 6) END AS survival
        FROM cu WHERE d > 0
      """)),

    // ------------------------------------------------------------------
    // q191: Poisson-bootstrap confidence interval for mean event value —
    // the distributed bootstrap: classical resampling draws n rows WITH
    // replacement per replicate (a global shuffle per replicate, B
    // passes over the data); the Poisson approximation gives each row
    // an independent Poisson(1) multiplicity per replicate instead,
    // which is ONE scan with a bounded B-way fan-out and map-side
    // partial aggregation — the only formulation that survives 100 TB.
    // (Multinomial(n, 1/n) → Poisson(1) as n → ∞; at n ≥ 1000 the
    // approximation error is far below the CI's own Monte-Carlo noise.)
    //
    // Determinism, cross-engine AND cross-partitioning: the Poisson
    // draw is the inverse CDF applied to the q81 md5 uniform
    // ((k + 0.5)/2²⁴, an exact rational) with the cumulative Poisson(1)
    // thresholds spelled as identical 17-digit literals in both
    // engines (both parse correctly rounded); replicate sums are exact
    // DECIMAL (weight ≤ 8 × two-decimal value stays scale-2); the
    // 2.5/97.5 percentiles interpolate over the SORTED 16-row replicate
    // array in closed form — no window, no RNG state, no seed.
    QDef(
      "q191_bootstrap_ci",
      (s, dir) => {
        val poissonInv = """
          case when u < 0.36787944117144233d then 0
               when u < 0.7357588823428847d then 1
               when u < 0.9196986029286058d then 2
               when u < 0.9810118431238463d then 3
               when u < 0.9963401531726563d then 4
               when u < 0.9994058151824183d then 5
               when u < 0.999916758850712d then 6
               when u < 0.9999897508033253d then 7
               else 8 end"""
        val ev = Tables(s, dir).events
          .where(col("value").isNotNull)
          .select(col("event_id"), col("value"))
          .ckpt() // feeds the point estimate AND replicates
        val means = ev
          .select(col("event_id"), col("value"),
            explode(expr("sequence(0, 15)")).as("b"))
          .withColumn("u", expr(
            """(cast(conv(substring(md5(cast(concat('boot|',
                 cast(b as string), '|', cast(event_id as string))
                 as binary)), 1, 6), 16, 10) as bigint) + 0.5d)
               / 16777216.0d"""))
          .withColumn("w", expr(poissonInv))
          .groupBy(col("b"))
          .agg((Q.dsum(col("w") * col("value")) /
            sum(col("w")).cast("double")).as("m"))
        val point = ev.agg(
          count(lit(1)).as("n"),
          (Q.dsum(col("value")) / count(lit(1))).as("mean_raw"))
        means.agg(expr("sort_array(collect_list(m))").as("ms"))
          .crossJoin(broadcast(point))
          .select(col("n"), round(col("mean_raw"), 6).as("mean_value"),
            round(expr("""element_at(ms, 1) + 0.375d *
              (element_at(ms, 2) - element_at(ms, 1))"""), 6).as("ci_lo"),
            round(expr("""element_at(ms, 15) + 0.625d *
              (element_at(ms, 16) - element_at(ms, 15))"""), 6)
              .as("ci_hi"))
      },
      Some("""
        WITH ev AS (SELECT event_id, value FROM events
                    WHERE value IS NOT NULL),
        rep AS (SELECT b, value,
                       (('0x' || substring(md5('boot|'
                          || CAST(b AS VARCHAR) || '|'
                          || CAST(event_id AS VARCHAR)), 1, 6))::BIGINT
                        + 0.5) / 16777216.0 AS u
                FROM ev, (SELECT unnest(range(0, 16)) AS b) bs),
        wt AS (SELECT b, value,
                      CASE WHEN u < 0.36787944117144233 THEN 0
                           WHEN u < 0.7357588823428847 THEN 1
                           WHEN u < 0.9196986029286058 THEN 2
                           WHEN u < 0.9810118431238463 THEN 3
                           WHEN u < 0.9963401531726563 THEN 4
                           WHEN u < 0.9994058151824183 THEN 5
                           WHEN u < 0.999916758850712 THEN 6
                           WHEN u < 0.9999897508033253 THEN 7
                           ELSE 8 END AS w
               FROM rep),
        means AS (SELECT b,
                         CAST(SUM(CAST(w * value AS DECIMAL(18, 2)))
                              AS DOUBLE)
                         / CAST(SUM(w) AS DOUBLE) AS m
                  FROM wt GROUP BY b),
        ms AS (SELECT list_sort(list(m)) AS ms FROM means),
        pt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE)
                      / COUNT(*) AS mean_raw
               FROM ev)
        SELECT n, ROUND(mean_raw, 6) AS mean_value,
               ROUND(ms[1] + 0.375 * (ms[2] - ms[1]), 6) AS ci_lo,
               ROUND(ms[15] + 0.625 * (ms[16] - ms[15]), 6) AS ci_hi
        FROM ms, pt
      """)),

    // ------------------------------------------------------------------
    // q195: winsorized robust scaling — the standard numeric-feature
    // cleanup before model training: clip each event type's value at
    // its own p05/p95 (heavy tails dominate means and gradients;
    // winsorizing bounds them without dropping rows), report clip
    // counts and the mean before/after. The per-group percentiles run
    // THROUGH the ScaleSafePercentiles rewrite (q61's oracle-gated
    // path — rank window per group, no holistic buffer at any scale);
    // cutoffs round at 6 BEFORE use (both engines interpolate the same
    // value to an ulp) and broadcast back; clipped sums are exact
    // DECIMAL(18,6) — values are 2-decimal, cutoffs 6-decimal, so the
    // winsorized mean is bit-identical regardless of fold order.
    QDef(
      "q195_winsorize",
      (s, dir) => {
        val ev = Tables(s, dir).events
          .where(col("value").isNotNull)
          .select(col("event_type"), col("value"))
          .ckpt() // feeds the cutoffs AND the clip pass
        val cuts = ev.groupBy(col("event_type"))
          .agg(round(expr("percentile(value, 0.05d)"), 6).as("lo"),
            round(expr("percentile(value, 0.95d)"), 6).as("hi"))
        ev.join(broadcast(cuts), "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") < col("lo"), 1L).otherwise(0L))
              .as("n_lo"),
            sum(when(col("value") > col("hi"), 1L).otherwise(0L))
              .as("n_hi"),
            min(col("lo")).as("p05_r"), min(col("hi")).as("p95_r"),
            round(Q.dsum(col("value")) / count(lit(1)), 6)
              .as("mean_raw_r"),
            round(sum(expr(
              "cast(least(greatest(value, lo), hi) as decimal(18, 6))"))
              .cast("double") / count(lit(1)), 6).as("mean_wins_r"))
      },
      Some("""
        WITH ev AS (SELECT event_type, value FROM events
                    WHERE value IS NOT NULL),
        cuts AS (SELECT event_type,
                        ROUND(quantile_cont(value, 0.05), 6) AS lo,
                        ROUND(quantile_cont(value, 0.95), 6) AS hi
                 FROM ev GROUP BY 1)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_lo,
               CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hi,
               MIN(lo) AS p05_r, MIN(hi) AS p95_r,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_raw_r,
               ROUND(CAST(SUM(CAST(LEAST(GREATEST(value, lo), hi)
                                   AS DECIMAL(18, 6))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_wins_r
        FROM ev JOIN cuts USING (event_type)
        GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q196: Mann-Kendall trend test — the nonparametric "is this metric
    // actually trending" monitor (no normality or linearity assumption;
    // the standard for telemetry/KPI series): per event type, S =
    // Σ_{i<j} sign(n_j − n_i) over the DAILY count series, tie-corrected
    // variance, z-score with the ±1 continuity correction, and a
    // two-sided 5% trend verdict.
    //
    // Scale: everything after the daily rollup operates on the
    // day-grain series — bounded by the CALENDAR, not the corpus (a
    // decade is 3 650 rows/type; the pair join is |days|²/2 per type,
    // millions of rows, trivially). S and the ×18-scaled variance are
    // EXACT integers (the only doubles are the final z division,
    // rounded at 6), so tie-handling can't drift an ulp across engines.
    QDef(
      "q196_trend_test",
      (s, dir) => {
        val daily = Tables(s, dir).events
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"))
          .ckpt() // feeds pairs (both sides), ties, n_days
        val pairs = daily.alias("a").join(daily.alias("b"),
            col("a.event_type") === col("b.event_type") &&
            col("a.day") < col("b.day"))
          .groupBy(col("a.event_type").as("event_type"))
          .agg(sum(when(col("b.n") > col("a.n"), 1L)
            .when(col("b.n") < col("a.n"), -1L)
            .otherwise(0L)).as("s_stat"))
        val nd = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"))
        val ties = daily.groupBy(col("event_type"), col("n"))
          .agg(count(lit(1)).as("t"))
          .groupBy(col("event_type"))
          .agg(sum(col("t") * (col("t") - 1) *
            (lit(2L) * col("t") + 5)).as("tie18"))
        nd.join(ties, "event_type").join(pairs, "event_type")
          .withColumn("var18",
            col("n_days") * (col("n_days") - 1) *
              (lit(2L) * col("n_days") + 5) - col("tie18"))
          .withColumn("z_r", round(
            (when(col("s_stat") > 0, col("s_stat") - 1)
              .when(col("s_stat") < 0, col("s_stat") + 1)
              .otherwise(0L)).cast("double")
            / sqrt(expr("cast(nullif(var18, 0) as double)") / 18.0d), 6))
          .select(col("event_type"), col("n_days"), col("s_stat"),
            col("var18"), coalesce(col("z_r"), lit(0.0d)).as("z_r"),
            expr("""case when z_r > 1.959964 then 'inc'
                         when z_r < -1.959964 then 'dec'
                         else 'none' end""").as("trend"))
      },
      Some("""
        WITH daily AS (SELECT event_type,
                              strftime(ts, '%Y-%m-%d') AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
        pairs AS (SELECT a.event_type,
                         CAST(SUM(CASE WHEN b.n > a.n THEN 1
                                       WHEN b.n < a.n THEN -1
                                       ELSE 0 END) AS BIGINT) AS s_stat
                  FROM daily a JOIN daily b
                    ON a.event_type = b.event_type AND a.day < b.day
                  GROUP BY 1),
        nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
               FROM daily GROUP BY 1),
        ties AS (SELECT event_type,
                        CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                          AS tie18
                 FROM (SELECT event_type, n,
                              CAST(COUNT(*) AS BIGINT) AS t
                       FROM daily GROUP BY 1, 2) g
                 GROUP BY 1),
        j AS (SELECT nd.event_type, nd.n_days, s_stat,
                     nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
                       - tie18 AS var18
              FROM nd JOIN ties USING (event_type)
              JOIN pairs USING (event_type)),
        z AS (SELECT *,
                     ROUND(CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
                                     WHEN s_stat < 0 THEN s_stat + 1
                                     ELSE 0 END AS DOUBLE)
                           / SQRT(CAST(NULLIF(var18, 0) AS DOUBLE)
                                  / 18.0), 6) AS z_r
              FROM j)
        SELECT event_type, n_days, s_stat, CAST(var18 AS BIGINT) AS var18,
               COALESCE(z_r, 0.0) AS z_r,
               CASE WHEN z_r > 1.959964 THEN 'inc'
                    WHEN z_r < -1.959964 THEN 'dec'
                    ELSE 'none' END AS trend
        FROM z
      """)),

    // ------------------------------------------------------------------
    // q197: Benjamini-Hochberg FDR-corrected feature screen — the
    // multiple-testing step q159's raw correlations stop short of:
    // screening hundreds of candidate features with per-test p < 0.05
    // ships ~5% junk features by construction; BH controls the FALSE
    // DISCOVERY RATE instead (reject the largest k with p_(k) ≤ k·q/m).
    // Per feature: a Welch two-sample z between converters and
    // non-converters, built entirely from exact integer moment sums
    // (x are event counts, y ∈ {0,1} — sums, cross-sums, and squares
    // are all BIGINTs, so the derived doubles are single fixed
    // expression trees, bit-identical cross-engine); the two-sided p
    // comes from the Abramowitz–Stegun 26.2.17 normal-tail polynomial
    // with e0-notation literals (both engines parse those as DOUBLE —
    // no decimal-literal drift), rounded at 9 before ranking.
    //
    // Scale: one user rollup (user-keyed agg), one |features|-bounded
    // moment aggregate; the BH rank runs over the |features|-row table
    // and the max-rejected-rank attaches via a one-row crossJoin (the
    // q37 pattern) — nothing data-sized past the first aggregate.
    QDef(
      "q197_fdr_screen",
      (s, dir) => {
        val ev = Tables(s, dir).events
        val bounds = ev.agg(
          expr("timestampadd(DAY, -14, max(ts))").as("cutoff"))
        val users = ev.crossJoin(broadcast(bounds))
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("ts") < col("cutoff"), 1L).otherwise(0L))
              .as("n_events"),
            sum(when(col("ts") < col("cutoff") &&
              col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_purchases"),
            countDistinct(when(col("ts") < col("cutoff"),
              date_trunc("day", col("ts")))).as("days_active"),
            max(when(col("ts") >= col("cutoff") &&
              col("event_type") === "purchase" && col("value") > 180.0d,
              1L).otherwise(0L)).as("y"))
        val m = users.select(col("y"), expr(
            """stack(3, 'n_events', n_events, 'n_purchases', n_purchases,
                        'days_active', days_active)""")
            .as(Seq("feature", "x")))
          .groupBy(col("feature"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("n1"),
            sum(col("x")).as("sx"), sum(col("x") * col("y")).as("s1x"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("x") * col("y")).as("s1xx"))
        val scored = m.select(col("feature"), col("n"), col("n1"),
            expr("""round(
              (cast(s1x as double) / n1
                 - cast(sx - s1x as double) / (n - n1))
              / sqrt(
                  ((cast(s1xx as double)
                     - cast(s1x as double) * s1x / n1) / (n1 - 1)) / n1
                + ((cast(sxx - s1xx as double)
                     - cast(sx - s1x as double) * (sx - s1x) / (n - n1))
                    / (n - n1 - 1)) / (n - n1)), 9)""").as("z9"))
          .withColumn("az", abs(col("z9")))
          .withColumn("tt", expr("1e0 / (1e0 + 0.2316419e0 * az)"))
          .withColumn("p9", expr(
            """round(2e0 * (exp(0e0 - az * az / 2e0)
                 / 2.5066282746310002e0)
               * (0.319381530e0 * tt
                  - 0.356563782e0 * tt * tt
                  + 1.781477937e0 * tt * tt * tt
                  - 1.821255978e0 * tt * tt * tt * tt
                  + 1.330274429e0 * tt * tt * tt * tt * tt), 9)"""))
          // |features| = 3 rows from here on: both windows run over the
          // FIXED stack of feature literals — bounded by construction,
          // reviewed into globalWindowBudget (NOT hidden behind a
          // checkpoint, so the gate sees them)
          .withColumn("rk", row_number().over(Q.bounded.orderBy(
            col("p9").asc, col("feature").asc)))
          .withColumn("k_star", coalesce(max(when(
            col("p9") * lit(30L) <= col("rk"), col("rk")))
            .over(Q.bounded), lit(0)))
        scored
          .select(col("feature"), col("n"), col("n1"),
            col("z9").as("z_r"), col("p9").as("p_r"), col("rk"),
            round(col("rk").cast("double") / lit(30.0d), 9)
              .as("bh_cutoff_r"),
            (col("rk") <= col("k_star")).cast("int").as("significant"))
      },
      Some("""
        WITH b AS (SELECT MAX(ts) - INTERVAL 14 DAY AS cutoff FROM events),
        u AS (SELECT user_id,
                CAST(SUM(CASE WHEN ts < cutoff THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_events,
                CAST(SUM(CASE WHEN ts < cutoff AND event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                CAST(COUNT(DISTINCT CASE WHEN ts < cutoff
                         THEN date_trunc('day', ts) END) AS BIGINT)
                  AS days_active,
                CAST(MAX(CASE WHEN ts >= cutoff
                         AND event_type = 'purchase' AND value > 180
                         THEN 1 ELSE 0 END) AS BIGINT) AS y
              FROM events, b GROUP BY 1),
        l AS (SELECT y, f.feature, f.x
              FROM u, LATERAL (VALUES ('n_events', n_events),
                                      ('n_purchases', n_purchases),
                                      ('days_active', days_active))
                        AS f(feature, x)),
        m AS (SELECT feature, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(y) AS BIGINT) AS n1,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(x * y) AS BIGINT) AS s1x,
                     CAST(SUM(x * x) AS BIGINT) AS sxx,
                     CAST(SUM(x * x * y) AS BIGINT) AS s1xx
              FROM l GROUP BY 1),
        sc AS (SELECT feature, n, n1,
                      ROUND(
                        (CAST(s1x AS DOUBLE) / n1
                           - CAST(sx - s1x AS DOUBLE) / (n - n1))
                        / SQRT(
                            ((CAST(s1xx AS DOUBLE)
                               - CAST(s1x AS DOUBLE) * s1x / n1)
                              / (n1 - 1)) / n1
                          + ((CAST(sxx - s1xx AS DOUBLE)
                               - CAST(sx - s1x AS DOUBLE) * (sx - s1x)
                                 / (n - n1))
                              / (n - n1 - 1)) / (n - n1)), 9) AS z9
               FROM m),
        pp AS (SELECT feature, n, n1, z9, abs(z9) AS az,
                      1e0 / (1e0 + 0.2316419e0 * abs(z9)) AS tt
               FROM sc),
        pv AS (SELECT feature, n, n1, z9,
                      ROUND(2e0 * (EXP(0e0 - az * az / 2e0)
                          / 2.5066282746310002e0)
                        * (0.319381530e0 * tt
                           - 0.356563782e0 * tt * tt
                           + 1.781477937e0 * tt * tt * tt
                           - 1.821255978e0 * tt * tt * tt * tt
                           + 1.330274429e0 * tt * tt * tt * tt * tt), 9)
                        AS p9
               FROM pp),
        rk AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p9 ASC,
                 feature ASC) AS INTEGER) AS rk FROM pv),
        ks AS (SELECT COALESCE(MAX(CASE WHEN p9 * 30 <= rk
                                   THEN rk END), 0) AS k_star FROM rk)
        SELECT feature, n, n1, z9 AS z_r, p9 AS p_r, rk,
               ROUND(CAST(rk AS DOUBLE) / 30.0, 9) AS bh_cutoff_r,
               CAST(CASE WHEN rk <= k_star THEN 1 ELSE 0 END AS INT)
                 AS significant
        FROM rk, ks
      """)),

    // ------------------------------------------------------------------
    // q203: autocorrelation function of the daily event-count series at
    // lags 1..7 — the standard seasonality probe (a weekly cycle shows
    // as a spike at lag 7) that decides window sizes for the rolling
    // metrics (q103) and gives q196's trend test its periodicity
    // caveat. r_k = Σ(x_t − x̄)(x_{t+k} − x̄) / Σ(x_t − x̄)², the
    // sample ACF with the standard full-series mean/denominator.
    //
    // Determinism: the mean is canonicalized at 9 (the one value whose
    // float summation order differs across engines); each deviation is
    // then an EXACT IEEE subtraction from that round-9 mean (the
    // deviations themselves are not rounded), their products sum over
    // ≤365 terms with ~1e-13 summation-order slack, and the round-6 on
    // the final ratio absorbs it.
    //
    // Scale: the daily rollup is the only data-sized pass (keyed agg).
    // The day series grows with TIME, not corpus size (365 rows/year),
    // so the lag join — an equi-join on day+k produced by a 7-way
    // explode — and the one-row mean crossJoin(broadcast) stay tiny at
    // any SF. No windows at all, so nothing for the global-window gate.
    QDef(
      "q203_daily_acf",
      (s, dir) => {
        val daily = Tables(s, dir).events
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"))
          .ckpt() // feeds mean, denominator, both join sides
        val m = daily.agg(round(avg(col("n")), 9).as("m"))
        val dev = daily.crossJoin(broadcast(m))
          .select(col("day"), (col("n").cast("double") - col("m")).as("dv"))
          .ckpt() // feeds denominator + both lag-join sides
        val den = dev.agg(sum(col("dv") * col("dv")).as("den"))
        val lagged = dev
          .withColumn("k", explode(expr("sequence(1, 7)")))
          .withColumn("day2",
            expr("date_format(date_add(to_date(day), k), 'yyyy-MM-dd')"))
          .join(dev.select(col("day").as("day2"), col("dv").as("dv2")),
            "day2")
        lagged.groupBy(col("k").cast("int").as("lag"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("dv") * col("dv2")).as("num"))
          .crossJoin(broadcast(den))
          .select(col("lag"), col("n_pairs"),
            round(col("num") / col("den"), 6).as("acf_r"))
          .orderBy(col("lag"))
      },
      Some("""
        WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
        m AS (SELECT ROUND(AVG(n), 9) AS m FROM daily),
        dev AS (SELECT day, CAST(n AS DOUBLE) - m.m AS dv
                FROM daily, m),
        den AS (SELECT SUM(dv * dv) AS den FROM dev),
        pr AS (SELECT k.k,
                      CAST(COUNT(*) AS BIGINT) AS n_pairs,
                      SUM(a.dv * b.dv) AS num
               FROM dev a
               CROSS JOIN range(1, 8) k(k)
               JOIN dev b ON b.day = strftime(
                 CAST(a.day AS DATE) + CAST(k.k AS INTEGER), '%Y-%m-%d')
               GROUP BY 1)
        SELECT CAST(k AS INTEGER) AS lag, n_pairs,
               ROUND(num / den.den, 6) AS acf_r
        FROM pr, den ORDER BY lag
      """)),

    // ------------------------------------------------------------------
    // q211: Theil-Sen robust slope of the daily event-count series —
    // the ESTIMATOR companion to q196's Mann-Kendall TEST (the classic
    // pairing: MK says whether a monotone trend exists, Theil-Sen says
    // how steep it is, both immune to the outlier days that wreck an
    // OLS fit). slope = median over all day pairs of (n_b − n_a) /
    // (days between) — per-pair slopes are exact-rational divisions
    // rounded at 9, the median goes through Q.globalExactPercentiles
    // (two-phase histogram selection, quantile_cont semantics) and
    // rounds at 6.
    //
    // Scale: the day rollup is the only data-sized pass; the pair
    // self-join is CALENDAR²-bounded (365 days/year → ~66k pairs/year
    // — grows with time, not corpus), and the median runs through the
    // histogram path, so even a 100-year horizon (~660M pairs) never
    // sorts more than one sub-bucket per task — no global-window
    // budget entry needed.
    QDef(
      "q211_theil_sen",
      (s, dir) => {
        val daily = Tables(s, dir).events
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"))
          .ckpt() // feeds both pair sides
        // nullif divisor: the a.day < b.day condition guarantees
        // datediff >= 1 on every SURVIVING pair, but downstream
        // null-filters (globalExactPercentiles' isNotNull) push into
        // the join condition and may evaluate the division on the
        // diagonal (datediff = 0) BEFORE the < conjunct prunes it —
        // an ANSI divide-by-zero error without the guard
        val slopes = daily.as("a")
          .join(daily.as("b"), col("a.day") < col("b.day"))
          .select(round(
            (col("b.n") - col("a.n")).cast("double")
              / expr("""cast(nullif(datediff(to_date(b.day),
                   to_date(a.day)), 0) as double)"""),
            9).as("slope"))
        Q.globalExactPercentiles(slopes, "slope", Seq(0.5 -> "sen"))
          .select(col("n").as("n_pairs"),
            round(col("sen"), 6).as("sen_slope_r"))
          .crossJoin(broadcast(
            daily.agg(count(lit(1)).as("n_days"))))
          .select(col("n_days"), col("n_pairs"), col("sen_slope_r"))
      },
      Some("""
        WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
        sl AS (SELECT ROUND(
                 CAST(b.n - a.n AS DOUBLE)
                 / CAST(CAST(b.day AS DATE) - CAST(a.day AS DATE)
                        AS DOUBLE), 9) AS slope
               FROM daily a JOIN daily b ON a.day < b.day)
        SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(quantile_cont(slope, 0.5), 6) AS sen_slope_r
        FROM sl
      """))
  )
}
