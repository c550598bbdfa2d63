package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Order-aware join operators Spark has no dedicated node for: as-of
  * join and banded range join — composed from existing operators per the
  * custom-operator preference order (compose > custom Expression > custom
  * SparkPlan), since the semantics are fully expressible with one
  * shuffle each.
  */
object OrderedQueries {

  val defs: Seq[QDef] = Seq(
    // ------------------------------------------------------------------
    // q29: AS-OF JOIN — for each error event, the most recent click by
    // the same user at-or-before it. Implemented as a single pass: one
    // shuffle on user_id, running "last click" via an ignoreNulls
    // last_value window — no self-join, no row explosion; this is the
    // merge-scan shape an AsofJoinExec would produce, and at 100 TB it
    // stays one shuffle + sort regardless of click:error ratio.
    // (DuckDB validates via its native ASOF JOIN.)
    QDef(
      "q29_asof_join",
      (s, dir) => {
        val ev = Tables(s, dir).events
          .filter(col("event_type").isin("click", "error"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("last_click",
            last(when(col("event_type") === "click",
              struct(col("ts").as("cts"), col("event_id").as("cid"))),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "error" &&
            col("last_click").isNotNull)
          .select(
            col("event_id").as("error_id"),
            col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("error_ts"),
            col("last_click.cid").as("click_id"),
            ((unix_micros(col("ts").cast("timestamp")) -
              unix_micros(col("last_click.cts").cast("timestamp")))
              / 1000000.0).as("gap_seconds"))
      },
      Some("""
        SELECT e.event_id AS error_id, e.user_id,
               strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
               c.event_id AS click_id,
               (epoch_us(e.ts) - epoch_us(c.ts)) / 1000000.0 AS gap_seconds
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id AND e.ts >= c.ts
      """)),

    // ------------------------------------------------------------------
    // q109: the SAME as-of semantics as q29, but through the NATIVE
    // whole-operator path — graft.plans.AsofJoinExec (custom
    // LogicalPlan + SparkStrategy + merge-scan SparkPlan, injected via
    // GraftExtensions). Per-task probe state is ONE buffered right row
    // (the window form materializes a running struct per row); the only
    // shuffles are the two key co-partitions. The time key is the
    // STRUCT (ts, event_id) — struct ordering is positional, so tie
    // resolution is total and identical to q29's (ts, event_id) window
    // ordering at ANY time span (a packed micros*2^20+id long would
    // overflow past ~100 days) — and the DuckDB oracle is therefore
    // the same ASOF JOIN as q29's.
    QDef(
      "q109_asof_native",
      (s, dir) => {
        val t = Tables(s, dir)
        val tkey = struct(col("ts"), col("event_id"))
        val errors = t.events.where(col("event_type") === "error")
          .select(col("event_id").as("error_id"), col("user_id"),
            col("ts").as("ets"), tkey.as("et"))
        val clicks = Tables(s, dir).events // fresh plan: distinct attr ids
          .where(col("event_type") === "click")
          .select(col("event_id").as("click_id"),
            col("user_id").as("cuser"), col("ts").as("cts"),
            tkey.as("ct"))
        graft.plans.Asof
          .join(errors, clicks, "user_id", "cuser", "et", "ct")
          .select(col("error_id"), col("user_id"),
            date_format(col("ets"), "yyyy-MM-dd HH:mm:ss").as("error_ts"),
            col("click_id"),
            ((unix_micros(col("ets")) - unix_micros(col("cts")))
              / 1000000.0).as("gap_seconds"))
      },
      Some("""
        SELECT e.event_id AS error_id, e.user_id,
               strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
               c.event_id AS click_id,
               (epoch_us(e.ts) - epoch_us(c.ts)) / 1000000.0 AS gap_seconds
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id AND e.ts >= c.ts
      """)),

    // ------------------------------------------------------------------
    // q30: banded RANGE (theta) join — orders against a tiny literal
    // tier table on BETWEEN bounds. The tier side broadcasts, so the
    // non-equi predicate never forces a shuffle of orders.
    QDef(
      "q30_range_join",
      (s, dir) => {
        val s2 = s
        import s2.implicits._
        val tiers = Seq(
          ("T1_budget", 0.0, 50000.0),
          ("T2_mid", 50000.0, 150000.0),
          ("T3_high", 150000.0, 300000.0),
          ("T4_premium", 300000.0, 1000000.0))
          .toDF("tier", "lo", "hi")
        Tables(s, dir).orders
          .join(broadcast(tiers),
            col("o_totalprice") >= col("lo") &&
            col("o_totalprice") < col("hi"))
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_orders"),
            Q.dsum(col("o_totalprice")).as("sum_price"))
      },
      Some("""
        SELECT tier, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        JOIN (VALUES ('T1_budget', 0.0, 50000.0),
                     ('T2_mid', 50000.0, 150000.0),
                     ('T3_high', 150000.0, 300000.0),
                     ('T4_premium', 300000.0, 1000000.0)) AS t(tier, lo, hi)
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY tier
      """)),

    // ------------------------------------------------------------------
    // q123: SCD2 POINT-IN-TIME lookup — the "which dimension version was
    // valid when the fact happened" join every versioned-dimension
    // warehouse runs. The dimension is built in-plan from the change
    // stream (a row whenever a user's value tier CHANGES — q102's tier,
    // detected with one lag window); the lookup is the native
    // AsofJoinExec (q109's operator, second consumer): latest change
    // at-or-before each purchase, struct (ts, event_id) time key for
    // total tie order — a purchase that is itself a change row matches
    // itself, exactly like the oracle's <= rule. Both inputs shuffle
    // once on user_id; no BETWEEN explosion, no validity-interval
    // materialization. Output aggregates to per-tier purchase stats.
    QDef(
      "q123_scd2_lookup",
      (s, dir) => {
        val byU = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val changes = Tables(s, dir).events
          .select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") / 50).cast("bigint").as("tier"))
          .withColumn("prev", lag(col("tier"), 1).over(byU))
          .where(col("prev").isNull || col("prev") =!= col("tier"))
          .select(col("user_id").as("duser"),
            struct(col("ts"), col("event_id")).as("dt"), col("tier"))
        val purchases = Tables(s, dir).events
          .where(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            struct(col("ts"), col("event_id")).as("pt"))
        graft.plans.Asof
          .join(purchases, changes, "user_id", "duser", "pt", "dt")
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_purchases"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some("""
        WITH ev AS (SELECT user_id, ts, event_id,
                           CAST(FLOOR(value / 50) AS BIGINT) AS tier
                    FROM events),
        ch AS (SELECT user_id, ts, event_id, tier
               FROM (SELECT user_id, ts, event_id, tier,
                            LAG(tier) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
                     FROM ev) t
               WHERE prev IS NULL OR prev <> tier),
        pt AS (SELECT event_id AS purchase_id, user_id, ts
               FROM events WHERE event_type = 'purchase'),
        j AS (SELECT p.purchase_id, p.user_id, c.tier,
                     ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                       ORDER BY c.ts DESC, c.event_id DESC) AS rn
              FROM pt p JOIN ch c ON c.user_id = p.user_id
               AND (c.ts < p.ts OR (c.ts = p.ts
                    AND c.event_id <= p.purchase_id)))
        SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM j WHERE rn = 1 GROUP BY tier
      """)),

    // ------------------------------------------------------------------
    // q133: spatial radius join via grid bucketing — the distributed
    // "find everything within r km" primitive. Points are derived
    // deterministically from keys (a 20°×20° region, lat/lon ∈
    // [-10, 10), exact integer modular arithmetic, so both engines
    // agree to the bit — a dense-enough cloud that the radius join is
    // non-trivial at every SF). The oracle is the all-pairs haversine
    // theta join; the engine never runs it: each supplier explodes
    // into its 3×3 neighborhood of 1°×1° grid cells, the join is a
    // pure EQUI-join on the cell id — the shard key at planetary
    // scale (add antimeridian wrap when the domain touches ±180°) —
    // and the haversine runs only on co-cell candidates. Correct
    // because r = 50 km is under the minimum cell width in range
    // (109 km at 10° lat), so any within-r pair shares a cell or
    // touches adjacent ones. Distances
    // are ranked/filtered at round-9 and emitted at round-6 (the
    // suite's cut-vs-ulp rule for libm trig).
    QDef(
      "q133_spatial_join",
      (s, dir) => {
        val cust = Tables(s, dir).customer.select(col("c_custkey"),
          expr("cast((cast(c_custkey as bigint) * 7919) % 2000 as double)" +
            " / 100.0D - 10.0D").as("lat_c"),
          expr("cast((cast(c_custkey as bigint) * 104729) % 2000" +
            " as double) / 100.0D - 10.0D").as("lon_c"))
          .withColumn("cl", floor(col("lat_c")).cast("int"))
          .withColumn("cg", floor(col("lon_c")).cast("int"))
        val supp = Tables(s, dir).supplier.select(col("s_suppkey"),
          expr("cast((cast(s_suppkey as bigint) * 7919 + 4999) % 2000" +
            " as double) / 100.0D - 10.0D").as("lat_s"),
          expr("cast((cast(s_suppkey as bigint) * 104729 + 911) % 2000" +
            " as double) / 100.0D - 10.0D").as("lon_s"))
          .withColumn("dl", explode(expr("array(-1, 0, 1)")))
          .withColumn("dg", explode(expr("array(-1, 0, 1)")))
          .select(col("s_suppkey"), col("lat_s"), col("lon_s"),
            (floor(col("lat_s")).cast("int") + col("dl")).as("cl"),
            (floor(col("lon_s")).cast("int") + col("dg")).as("cg"))
        val dist =
          "round(2.0D * 6371.0D * asin(sqrt(" +
            "sin(radians((lat_c - lat_s) / 2)) *" +
            " sin(radians((lat_c - lat_s) / 2)) +" +
            " cos(radians(lat_s)) * cos(radians(lat_c)) *" +
            " sin(radians((lon_c - lon_s) / 2)) *" +
            " sin(radians((lon_c - lon_s) / 2)))), 9)"
        supp.join(cust, Seq("cl", "cg"))
          .withColumn("d_km", expr(dist))
          .where(col("d_km") < 50.0d)
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_within"),
            round(min(col("d_km")), 6).as("min_km"))
      },
      Some("""
        WITH c AS (SELECT c_custkey,
                     CAST((CAST(c_custkey AS BIGINT) * 7919) % 2000
                       AS DOUBLE) / 100.0 - 10.0 AS lat_c,
                     CAST((CAST(c_custkey AS BIGINT) * 104729) % 2000
                       AS DOUBLE) / 100.0 - 10.0 AS lon_c
                   FROM customer),
        s AS (SELECT s_suppkey,
                     CAST((CAST(s_suppkey AS BIGINT) * 7919 + 4999) % 2000
                       AS DOUBLE) / 100.0 - 10.0 AS lat_s,
                     CAST((CAST(s_suppkey AS BIGINT) * 104729 + 911) % 2000
                       AS DOUBLE) / 100.0 - 10.0 AS lon_s
                   FROM supplier),
        d AS (SELECT s_suppkey,
                     ROUND(2.0 * 6371.0 * ASIN(SQRT(
                       SIN(RADIANS((lat_c - lat_s) / 2))
                         * SIN(RADIANS((lat_c - lat_s) / 2))
                       + COS(RADIANS(lat_s)) * COS(RADIANS(lat_c))
                         * SIN(RADIANS((lon_c - lon_s) / 2))
                         * SIN(RADIANS((lon_c - lon_s) / 2)))), 9) AS d_km
              FROM s, c)
        SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_within,
               ROUND(MIN(d_km), 6) AS min_km
        FROM d WHERE d_km < 50.0
        GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q153: weekly snapshot materialization (time travel) — rebuild
    // "state as of each week end" for every user: per-event running
    // state (event count + current value tier) attaches to the stream
    // in one window pass, then the NATIVE AsofJoinExec (q109/q123's
    // operator, third consumer) probes it with a GENERATED spine —
    // weekly instants derived in-plan from the observed time bounds,
    // crossed with the user universe. Probe time key struct(snap_ts,
    // Long.MaxValue) makes every event at-or-before the instant
    // eligible, ties impossible by construction. This is the snapshot-
    // fact-table build pattern: no validity intervals materialized, no
    // BETWEEN join — both sides shuffle once on user_id. The oracle is
    // DuckDB's own ASOF JOIN against the same generated spine.
    QDef(
      "q153_weekly_snapshots",
      (s, dir) => {
        val ev = Tables(s, dir).events
        val byU = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val stated = ev
          .withColumn("run_cnt", count(lit(1)).over(
            byU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("user_id").as("suser"),
            struct(col("ts"), col("event_id")).as("st"),
            col("run_cnt"),
            floor(col("value") / 50).cast("bigint").as("tier"))
        val bounds = ev.agg(
          date_trunc("day", min(col("ts"))).as("t0"),
          max(col("ts")).as("t1"))
        val spine = ev.select(col("user_id")).distinct()
          .crossJoin(broadcast(bounds))
          .select(col("user_id"),
            explode(expr("sequence(t0 + interval 7 days, t1," +
              " interval 7 days)")).as("snap_ts"))
          .select(col("user_id"), col("snap_ts"),
            struct(col("snap_ts").as("ts"),
              lit(Long.MaxValue).as("event_id")).as("pt"))
        graft.plans.Asof
          .join(spine, stated, "user_id", "suser", "pt", "st")
          .groupBy(date_format(col("snap_ts"), "yyyy-MM-dd").as("snap"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("run_cnt")).as("total_events"),
            round(avg(col("tier")), 6).as("avg_tier"))
      },
      Some("""
        WITH b AS (SELECT date_trunc('day', MIN(ts)) AS t0, MAX(ts) AS t1
                   FROM events),
        spine AS (SELECT u.user_id, s.snap_ts
                  FROM (SELECT DISTINCT user_id FROM events) u, b,
                  LATERAL (SELECT unnest(generate_series(
                             b.t0 + INTERVAL 7 DAY, b.t1,
                             INTERVAL 7 DAY)) AS snap_ts) s),
        stated AS (SELECT user_id, ts, event_id,
                     CAST(COUNT(*) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS run_cnt,
                     CAST(FLOOR(value / 50) AS BIGINT) AS tier
                   FROM events)
        SELECT strftime(p.snap_ts, '%Y-%m-%d') AS snap,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(e.run_cnt) AS BIGINT) AS total_events,
               ROUND(AVG(e.tier), 6) AS avg_tier
        FROM spine p
        ASOF JOIN stated e
          ON p.user_id = e.user_id AND p.snap_ts >= e.ts
        GROUP BY 1
      """))
  )
}
