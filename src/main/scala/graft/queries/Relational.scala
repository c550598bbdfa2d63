package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Core relational operator inventory over the TPC-H-ish test tables
  * (SURVEY.md §2.5: scans, projection, filter, joins incl. semi/anti,
  * aggregation incl. distinct + rollup, windows, sort/limit/top-k,
  * set ops, scalar functions).
  *
  * Determinism contract with the DuckDB oracle:
  *  - money sums go through DECIMAL(18,2/4) per row, are summed exactly,
  *    then cast back to DOUBLE — immune to floating-point ordering and
  *    schema-stable across engines;
  *  - averages are exact-decimal sums divided by exact counts in double;
  *  - timestamps in output are formatted to strings;
  *  - every LIMIT carries a total-order ORDER BY tiebreak.
  *
  * Scale notes (100 TB): every query is fully declarative DataFrame API —
  * filters/projections push to the parquet scan, aggregates get map-side
  * partial aggregation, FIXED-size dims (region 5 rows / nation 25 rows)
  * carry explicit broadcast hints while SF-scaling dims (part, supplier,
  * customer) are planner-chosen joins — auto-broadcast while they fit,
  * shuffle joins at warehouse scale — and AQE re-plans skewed shuffles.
  * No collect(), no driver loops.
  */
object Relational {

  private def dsum(c: Column, scale: Int = 2): Column = Q.dsum(c, scale)

  val defs: Seq[QDef] = Seq(
    // ------------------------------------------------------------------
    // q1: TPC-H Q1-style pricing summary — full-scan agg with partial
    // aggregation; the grouping key cardinality is tiny (3x2) so the
    // shuffle after map-side combine is a few rows per partition.
    QDef(
      "q1_pricing_summary",
      (s, dir) => {
        val li = Tables(s, dir).lineitem
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
              .as("sum_disc_price"),
            // extendedprice(2dp) * (1-disc)(2dp) * (1+tax)(2dp) has exactly
            // 6 decimal digits, so a scale-6 cast is exact in both engines
            // (scale 4 would round a true ...x5 halfway digit, where Spark
            // HALF_UP and DuckDB disagree).
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * (lit(1) + col("l_tax")), 6).as("sum_charge"),
            (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            (dsum(col("l_discount"), 4) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
          CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
      """)),

    // ------------------------------------------------------------------
    // q2: TPC-H Q6-style selective scan — all three predicates and the
    // two-column projection must reach the parquet reader (PushedFilters).
    QDef(
      "q2_forecast_revenue",
      (s, dir) => {
        val li = Tables(s, dir).lineitem
        li.filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
            col("l_discount").between(0.02, 0.06) &&
            col("l_quantity") < 24)
          .agg(dsum(col("l_extendedprice") * col("l_discount"), 4)
            .as("revenue"))
      },
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24
      """)),

    // ------------------------------------------------------------------
    // q3: TPC-H Q3-style 3-way join + agg. customer is small relative to
    // lineitem → Catalyst broadcasts it; the orders⋈lineitem join
    // shuffles on orderkey, which is also the grouping key, so the
    // aggregation reuses the join's partitioning (one shuffle, not two).
    QDef(
      "q3_shipping_priority",
      (s, dir) => {
        val t = Tables(s, dir)
        val cut = lit("1997-06-15").cast("timestamp_ntz")
        t.customer.filter(col("c_mktsegment") === "BUILDING")
          .join(t.orders, col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") < cut)
          .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") > cut)
          .groupBy(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_orderpriority"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("revenue"))
      },
      Some("""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND o_orderkey = l_orderkey
          AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1997-06-15 00:00:00'
        GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
      """)),

    // ------------------------------------------------------------------
    // q4: star-schema dim rollup — region and nation are tiny and
    // explicitly broadcast; no shuffle bigger than the supplier table.
    QDef(
      "q4_supplier_by_region",
      (s, dir) => {
        val t = Tables(s, dir)
        t.supplier
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_suppliers"),
            dsum(col("s_acctbal")).as("sum_bal"),
            (dsum(col("s_acctbal")) / count(lit(1))).as("avg_bal"))
      },
      Some("""
        SELECT r_name, n_name, COUNT(*) AS n_suppliers,
          CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
          CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
      """)),

    // ------------------------------------------------------------------
    // q5: left-semi join (EXISTS) — no row multiplication, the probe side
    // streams; at scale the orders side is pre-aggregated by the semi
    // join itself (no distinct needed).
    QDef(
      "q5_big_spenders",
      (s, dir) => {
        val t = Tables(s, dir)
        val big = t.orders.filter(col("o_totalprice") > 450000)
        t.customer
          .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      """)),

    // ------------------------------------------------------------------
    // q6: left-anti join (NOT EXISTS).
    QDef(
      "q6_customers_without_big_orders",
      (s, dir) => {
        val t = Tables(s, dir)
        val big = t.orders.filter(col("o_totalprice") > 450000)
        t.customer
          .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      """)),

    // ------------------------------------------------------------------
    // q7: window function — top-3 orders per customer by price, with a
    // full tiebreak (orderkey) so ROW_NUMBER is deterministic. One
    // shuffle on the partition key.
    QDef(
      "q7_top_orders_per_customer",
      (s, dir) => {
        val o = Tables(s, dir).orders
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("rk"))
      },
      Some(Q.topOrdersOracle)),

    // ------------------------------------------------------------------
    // q8: global top-k — Spark plans TakeOrderedAndProject (per-partition
    // heap + driver merge of k rows), not a full sort; total order via
    // (orderkey, linenumber) tiebreak.
    QDef(
      "q8_top100_lineitems",
      (s, dir) => {
        val li = Tables(s, dir).lineitem
        li.select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc)
          .limit(100)
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 100
      """)),

    // ------------------------------------------------------------------
    // q9: set operations — INTERSECT and EXCEPT over derived key sets,
    // tagged and unioned into one result.
    QDef(
      "q9_setops",
      (s, dir) => {
        val t = Tables(s, dir)
        val spenders = t.orders.filter(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("custkey")).distinct()
        val building = t.customer.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        spenders.intersect(building).withColumn("tag", lit("both"))
          .unionByName(
            spenders.except(building).withColumn("tag", lit("spender_only")))
          .select(col("tag"), col("custkey"))
      },
      Some("""
        SELECT 'both' AS tag, custkey FROM (
          SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
          INTERSECT
          SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        UNION ALL
        SELECT 'spender_only' AS tag, custkey FROM (
          SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
          EXCEPT
          SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      """)),

    // ------------------------------------------------------------------
    // q10: multiple distinct aggregates — Catalyst expands to a single
    // pass with grouping-id rather than N self-joins.
    QDef(
      "q10_distinct_counts",
      (s, dir) => {
        val li = Tables(s, dir).lineitem
        li.groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows"))
      },
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
      """)),

    // ------------------------------------------------------------------
    // q11: ROLLUP hierarchy totals; NULL grouping slots normalized to
    // 'ALL' so both engines hash identically.
    QDef(
      "q11_rollup_suppliers",
      (s, dir) => {
        val t = Tables(s, dir)
        t.supplier
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_suppliers"),
            dsum(col("s_acctbal")).as("sum_bal"))
          .select(
            coalesce(col("r_name"), lit("ALL")).as("region_name"),
            coalesce(col("n_name"), lit("ALL")).as("nation_name"),
            col("n_suppliers"), col("sum_bal"))
      },
      Some("""
        SELECT COALESCE(r_name, 'ALL') AS region_name,
               COALESCE(n_name, 'ALL') AS nation_name,
               COUNT(*) AS n_suppliers,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
      """)),

    // ------------------------------------------------------------------
    // q12: scalar function surface — date parts, string ops, math — all
    // codegen'd builtins, no UDFs.
    QDef(
      "q12_scalar_functions",
      (s, dir) => {
        val o = Tables(s, dir).orders
        o.filter(col("o_orderkey") % 100 === 0)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            month(col("o_orderdate")).cast("int").as("o_month"),
            date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"),
            upper(substring(col("o_orderpriority"), 3, 20)).as("prio_name"),
            length(col("o_orderpriority")).cast("int").as("prio_len"),
            concat_ws("#", col("o_orderstatus"), col("o_orderpriority"))
              .as("status_prio"),
            round(sqrt(col("o_totalprice")), 6).as("sqrt_price"),
            floor(col("o_totalprice") / 1000).as("price_bucket"),
            abs(col("o_totalprice") - 250000).as("dist_from_mid"))
      },
      Some("""
        SELECT o_orderkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS o_month,
               strftime(o_orderdate, '%Y-%m') AS o_ym,
               UPPER(SUBSTRING(o_orderpriority, 3, 20)) AS prio_name,
               CAST(LENGTH(o_orderpriority) AS INTEGER) AS prio_len,
               CONCAT_WS('#', o_orderstatus, o_orderpriority) AS status_prio,
               ROUND(SQRT(o_totalprice), 6) AS sqrt_price,
               CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_bucket,
               ABS(o_totalprice - 250000) AS dist_from_mid
        FROM orders
        WHERE o_orderkey % 100 = 0
      """)),

    // ------------------------------------------------------------------
    // q13: time-bucketed event aggregation (the batch shape of the
    // streaming tumbling-window query in graft.streaming).
    QDef(
      "q13_events_hourly",
      (s, dir) => {
        val ev = Tables(s, dir).events
        ev.groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
              .as("hour_ts"),
            col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            dsum(col("value")).as("sum_value"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
      """)),

    // ------------------------------------------------------------------
    // q14: semi-structured props extraction (regexp over the JSON-ish
    // string column; pattern identical under Java regex and RE2).
    QDef(
      "q14_props_extract",
      (s, dir) => {
        val ev = Tables(s, dir).events
        ev.select(col("event_type"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
              .as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"),
            max(col("k")).as("max_k"),
            count(lit(1)).as("n"))
      },
      Some("""
        SELECT event_type,
               CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k, COUNT(*) AS n
        FROM (SELECT event_type,
                     CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
              FROM events) t
        GROUP BY event_type
      """)),

    // ------------------------------------------------------------------
    // q15: conditional aggregation (pivot shape) — one pass, no joins.
    QDef(
      "q15_status_pivot",
      (s, dir) => {
        val o = Tables(s, dir).orders
        o.groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
            sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
            sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"),
            dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))
              .otherwise(0)).as("sum_f_price"))
      },
      Some("""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
               CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS sum_f_price
        FROM orders
        GROUP BY o_orderpriority
      """)),

    // ------------------------------------------------------------------
    // q16: sessionization via window lag — 30-min inactivity gap starts a
    // new session; counts sessions and events per user. Single shuffle on
    // user_id shared by the window and the final aggregation.
    QDef(
      "q16_sessionize",
      (s, dir) => {
        val ev = Tables(s, dir).events
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc,
          col("event_id").asc)
        ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              (unix_micros(col("ts").cast("timestamp")) -
                unix_micros(col("prev_ts").cast("timestamp"))) / 1e6 > 1800,
              1).otherwise(0))
          .groupBy(col("user_id"))
          .agg(sum(col("new_session")).as("n_sessions"),
            count(lit(1)).as("n_events"))
      },
      Some("""
        SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        FROM (SELECT user_id,
                     CASE WHEN prev_ts IS NULL
                               OR EPOCH(ts) - EPOCH(prev_ts) > 1800
                          THEN 1 ELSE 0 END AS new_session
              FROM (SELECT user_id, ts, event_id,
                           LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts ASC, event_id ASC) AS prev_ts
                    FROM events) t1) t2
        GROUP BY user_id
      """)),

    // ------------------------------------------------------------------
    // q31: CUBE — all 2^2 grouping combinations in one pass (expand +
    // single shuffle), NULL slots normalized for hashing.
    QDef(
      "q31_cube_lineitem",
      (s, dir) => {
        Tables(s, dir).lineitem
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("n_rows"), col("sum_qty"))
      },
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS flag,
               COALESCE(l_linestatus, 'ALL') AS status,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
      """)),

    // ------------------------------------------------------------------
    // q32: sketch aggregates — HLL distinct and approximate quantiles.
    // The raw approximations are engine-specific by construction, so a
    // value-level DuckDB oracle is impossible; instead the query emits
    // the EXACT answers plus in-query error-bound flags
    // (|approx-exact|/exact < 5%), whose exact restatement IS
    // DuckDB-expressible (flags must be 1) — turning the round-1
    // rows-only check into a full hash check that still verifies the
    // sketches. The exact median comes from the same scale-safe
    // sort-based path as q34, not a holistic buffer.
    QDef(
      "q32_sketches",
      (s, dir) => {
        val li = Tables(s, dir).lineitem
        // countDistinct kept SEPARATE from the sketch aggregates: mixing
        // a distinct agg with non-distinct aggs plans an Expand (every
        // input row duplicated per aggregate family) — observed 4.9 s vs
        // 0.9 + 0.6 s split at sf0.1. The rejoin is 3 rows.
        val dist = li
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_parts"))
        val approx = li
          .groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey")).as("approx_parts"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
              .as("approx_median"))
        val exact = Q.exactPercentiles(li, "l_returnflag",
          "l_extendedprice", Seq(0.5 -> "exact_median"))
        dist.join(approx, "l_returnflag").join(exact, "l_returnflag")
          .select(col("l_returnflag"),
            col("exact_parts"),
            (abs(col("approx_parts") - col("exact_parts")) /
              col("exact_parts") < 0.05).cast("int").as("ok_distinct"),
            round(col("exact_median"), 6).as("median_price"),
            (abs(col("approx_median") - col("exact_median")) /
              col("exact_median") < 0.05).cast("int").as("ok_median"))
      },
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               1 AS ok_distinct,
               ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
               1 AS ok_median
        FROM lineitem
        GROUP BY l_returnflag
      """)),

    // ------------------------------------------------------------------
    // q63: TPC-H Q21 shape (suppliers who kept orders waiting) adapted
    // to this schema: in finished multi-supplier orders, count per
    // supplier the orders where THEY shipped late (> 60 days after the
    // order date) and no other supplier did — a semi-join AND an
    // anti-join against the same derived relation, the hardest classic
    // join tree in the TPC-H set.
    //
    // The classic formulation is a semi-join AND an anti-join against a
    // derived `late` relation — which Spark (no CTE materialization)
    // would compute twice, scanning lineitem three times. Instead the
    // whole EXISTS/NOT-EXISTS pair collapses into one two-level
    // aggregation: per (orderkey, suppkey) fold lineitems to one row
    // with a was-late flag, then per orderkey count suppliers and late
    // suppliers — "sole late supplier" is exactly n_late = 1 AND
    // n_supp >= 2, and MIN over the late flag recovers who it was.
    //
    // Scale: one scan of lineitem, one join keyed on l_orderkey (the
    // natural co-partition key), two partial-agg-friendly aggregations
    // (no countDistinct Expand), and the 100-row supplier dim
    // broadcasts explicitly.
    QDef(
      "q63_sole_late_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        val perSupp = t.lineitem
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(t.orders.where(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max((col("l_shipdate") > date_add(col("o_orderdate"), 60))
            .cast("int")).as("was_late"))
        val perOrder = perSupp
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_supp"),
            sum(col("was_late")).as("n_late"),
            min(when(col("was_late") === 1, col("l_suppkey"))).as("l_suppkey"))
          .where(col("n_late") === 1 && col("n_supp") >= 2)
        // supplier GROWS with SF (10k rows per SF unit): no broadcast
        // hint — auto-broadcast while it fits, shuffle join at scale
        perOrder
          .join(t.supplier
            .select(col("s_suppkey"), col("s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name").asc)
          .limit(20)
      },
      Some("""
        WITH late AS (
          SELECT DISTINCT l.l_orderkey, l.l_suppkey
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderstatus = 'F'
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
        sole AS (
          SELECT l1.l_orderkey, l1.l_suppkey
          FROM late l1
          WHERE EXISTS (SELECT 1 FROM lineitem l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM late l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey))
        SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM sole JOIN supplier s ON s.s_suppkey = sole.l_suppkey
        GROUP BY 1, 2
        ORDER BY numwait DESC, s_name ASC
        LIMIT 20
      """)),

    // ------------------------------------------------------------------
    // q84: UNPIVOT — wide per-flag metrics rotated into long
    // (key, metric, value) form via `stack`, the shape metric stores and
    // plotting layers ingest. The rotation is a zero-shuffle projection
    // over the (tiny) aggregated relation: stack() is a Generate, so the
    // plan is scan → partial/final agg → generate, and would stay exactly
    // that at 100 TB (the explode multiplies rows only AFTER the
    // aggregation has collapsed them). Metric casts mirror q1's proven
    // exact-decimal-sum-as-double rule.
    QDef(
      "q84_unpivot_metrics",
      (s, dir) => {
        Tables(s, dir).lineitem
          .groupBy(col("l_returnflag"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            (dsum(col("l_discount"), 4) / count(lit(1))).as("avg_disc"))
          .selectExpr("l_returnflag",
            """stack(3,
                 'sum_qty', sum_qty,
                 'sum_base_price', sum_base_price,
                 'avg_disc', avg_disc) as (metric, value)""")
      },
      Some("""
        WITH m AS (
          SELECT l_returnflag,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
            CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM m
        UNION ALL
        SELECT l_returnflag, 'sum_base_price', sum_base_price FROM m
        UNION ALL
        SELECT l_returnflag, 'avg_disc', avg_disc FROM m
      """)),

    // ------------------------------------------------------------------
    // q87: product-profit by nation and year — the TPC-H Q9 shape: a
    // fact scan joined to THREE dimensions (part with a name predicate,
    // supplier, nation), then a two-key rollup of a derived money
    // expression. The join-order stress test of the suite: Catalyst
    // must push the p_name filter into the part scan, broadcast all
    // three dims (each orders of magnitude smaller than lineitem even
    // at 100 TB — part/supplier grow with SF but stay <1% of the fact),
    // and leave exactly ONE shuffle: the final partial-agg exchange on
    // (nation, year). Profit = revenue minus retail cost; each term is
    // a product of two 2-decimal factors, so DECIMAL scale 4 keeps the
    // sum exact (the suite-wide 2k rule).
    QDef(
      "q87_profit_by_nation",
      (s, dir) => {
        val t = Tables(s, dir)
        // part/supplier GROW with SF: no broadcast hints (nation keeps
        // its hint — fixed 25 rows at any scale)
        t.lineitem
          .join(t.part
              .where(col("p_name").contains("red"))
              .select(col("p_partkey"), col("p_retailprice")),
            col("l_partkey") === col("p_partkey"))
          .join(t.supplier
              .select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t.nation
              .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("l_shipdate")).as("o_year"))
          .agg(
            dsum(expr("l_extendedprice * (1 - l_discount)"), 4)
              .as("revenue"),
            dsum(expr("p_retailprice * l_quantity"), 4).as("retail_cost"),
            count(lit(1)).as("n_items"))
      },
      Some("""
        SELECT n_name AS nation,
               CAST(year(l_shipdate) AS INTEGER) AS o_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               CAST(SUM(CAST(p_retailprice * l_quantity
                             AS DECIMAL(18,4))) AS DOUBLE) AS retail_cost,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
      """)),

    // ------------------------------------------------------------------
    // q88: data-quality audit — declarative constraint validation
    // (deequ/Great-Expectations shape). All six rules — five per-column
    // range/null checks plus a referential-integrity check — are
    // sum(case) counters over ONE pass of the fact: the orphan rule
    // rides the same scan by LEFT-joining orders on the natural key and
    // counting null probes, so no separate anti-join job exists. The
    // one counter row is rotated into (check_name, n_violations) rows
    // by the q84 stack pattern — a Generate AFTER the aggregation.
    // At 100 TB: scan → co-keyed left join → partial/final agg (one
    // row) → generate; every rule added costs one counter, never a
    // new pass.
    QDef(
      "q88_dq_audit",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .join(t.orders.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_outer")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("l_quantity") <= 0 || col("l_quantity") > 100, 1L)
              .otherwise(0L)).as("qty_range"),
            sum(when(col("l_discount") < 0 || col("l_discount") > 0.5, 1L)
              .otherwise(0L)).as("disc_range"),
            sum(when(col("l_tax") < 0, 1L).otherwise(0L)).as("tax_neg"),
            sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))
              .as("shipdate_null"),
            sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L))
              .as("price_nonpos"),
            sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
              .as("orderkey_orphan"))
          .selectExpr(
            """stack(6,
                 'qty_range', qty_range,
                 'disc_range', disc_range,
                 'tax_neg', tax_neg,
                 'shipdate_null', shipdate_null,
                 'price_nonpos', price_nonpos,
                 'orderkey_orphan', orderkey_orphan)
               as (check_name, n_violations)""",
            "n_rows")
          .select(col("check_name"), col("n_violations"), col("n_rows"),
            when(col("n_violations") === 0, 1).otherwise(0).as("ok"))
      },
      Some("""
        WITH c AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(SUM(CASE WHEN l_quantity <= 0 OR l_quantity > 100
                          THEN 1 ELSE 0 END) AS BIGINT) AS qty_range,
            CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.5
                          THEN 1 ELSE 0 END) AS BIGINT) AS disc_range,
            CAST(SUM(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS tax_neg,
            CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS shipdate_null,
            CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS price_nonpos,
            CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS orderkey_orphan
          FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey),
        rules AS (
          SELECT 'qty_range' AS check_name, qty_range AS n_violations,
                 n_rows FROM c
          UNION ALL SELECT 'disc_range', disc_range, n_rows FROM c
          UNION ALL SELECT 'tax_neg', tax_neg, n_rows FROM c
          UNION ALL SELECT 'shipdate_null', shipdate_null, n_rows FROM c
          UNION ALL SELECT 'price_nonpos', price_nonpos, n_rows FROM c
          UNION ALL SELECT 'orderkey_orphan', orderkey_orphan, n_rows
            FROM c)
        SELECT check_name, n_violations, n_rows,
               CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS ok
        FROM rules
      """)),

    // ------------------------------------------------------------------
    // q165: small-quantity revenue by brand (TPC-H Q17 shape) — revenue
    // locked up in lineitems ordering less than half the part's average
    // quantity. The per-part average is an aggregate of lineitem keyed
    // by l_partkey, so the decorrelated join back is CO-PARTITIONED:
    // one l_partkey shuffle feeds both the agg and the join at any
    // scale; `part` is the broadcast dim. avg = exact decimal sum /
    // exact count in double, so the 0.5x cut compares identically in
    // both engines.
    QDef(
      "q165_small_qty_revenue",
      (s, dir) => {
        val t = Tables(s, dir)
        val li = t.lineitem
        val avgq = li.groupBy(col("l_partkey"))
          .agg((dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
        li.join(avgq, "l_partkey")
          .where(col("l_quantity") < lit(0.5) * col("avg_qty"))
          // part grows with SF: planner-chosen join, no forced broadcast
          .join(t.part, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(dsum(col("l_extendedprice")).as("small_qty_revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""
        WITH a AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_qty
          FROM lineitem GROUP BY 1)
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS small_qty_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN a USING (l_partkey)
        JOIN part ON l_partkey = p_partkey
        WHERE l_quantity < 0.5 * avg_qty
        GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q166: large-volume orders (TPC-H Q18 shape) — orders whose total
    // quantity exceeds 300, with their customer. The HAVING-style cut
    // runs on the l_orderkey aggregate BEFORE any join, so only the
    // ~1% surviving orders join onward (semi-reduction first, the Q18
    // plan you want at 100 TB); orders→aggregate is co-keyed on the
    // order key, the customer join shuffles only the survivors, and the
    // top-100 is a TakeOrderedAndProject with a total-order tiebreak.
    QDef(
      "q166_large_volume_orders",
      (s, dir) => {
        val t = Tables(s, dir)
        val big = t.lineitem.groupBy(col("l_orderkey"))
          .agg(dsum(col("l_quantity")).as("sum_qty"))
          .where(col("sum_qty") > 300.0d)
        big.join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(col("sum_qty").desc, col("o_orderkey").asc)
          .limit(100)
      },
      Some("""
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_date,
               o_totalprice, sum_qty
        FROM (SELECT l_orderkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_qty
              FROM lineitem GROUP BY 1) b
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE sum_qty > 300.0
        ORDER BY sum_qty DESC, o_orderkey ASC
        LIMIT 100
      """)),

    // ------------------------------------------------------------------
    // q167: dormant high-balance customers (TPC-H Q22 shape) — per
    // market segment, customers whose balance beats the positive-balance
    // average but who never placed a big-ticket (> $400k) order. The
    // global average is a ONE-ROW aggregate broadcast into the scan
    // (crossJoin(broadcast(...)), no driver collect); the "never" is a
    // left-anti join keyed on the customer key, with the $400k filter
    // pushed into the orders scan so the anti side ships only
    // big-ticket orders.
    QDef(
      "q167_dormant_customers",
      (s, dir) => {
        val t = Tables(s, dir)
        val avgbal = t.customer.where(col("c_acctbal") > 0.0d)
          .agg((dsum(col("c_acctbal")) / count(lit(1))).as("ab"))
        t.customer.crossJoin(broadcast(avgbal))
          .where(col("c_acctbal") > col("ab"))
          .join(t.orders.where(col("o_totalprice") > 400000.0d)
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("numcust"),
            dsum(col("c_acctbal")).as("totacctbal"))
      },
      Some("""
        WITH ab AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS ab
          FROM customer WHERE c_acctbal > 0.0)
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS totacctbal
        FROM customer, ab
        WHERE c_acctbal > ab
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c_custkey
                            AND o.o_totalprice > 400000.0)
        GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q175: disjunctive-predicate pricing (TPC-H Q19 shape) — revenue
    // under three OR'd brand/size/quantity clauses. The point is the
    // OPTIMIZER test: the common conjuncts (p_size >= 1, quantity
    // bounds) must still reach the scans as pushed filters even though
    // the brand-specific arms are disjunctive, and the join stays a
    // hash equi-join on partkey — never a nested-loop over the OR
    // (planner-chosen broadcast vs shuffle; part grows with SF).
    QDef(
      "q175_disjunctive_pricing",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .join(t.part, col("l_partkey") === col("p_partkey"))
          .where(
            (col("p_brand") === "Brand#12" &&
              col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#23" &&
              col("p_size").between(1, 30) &&
              col("l_quantity").between(10, 35)) ||
            (col("p_brand") === "Brand#34" &&
              col("p_size").between(1, 50) &&
              col("l_quantity").between(20, 50)))
          .groupBy(col("p_brand"))
          .agg(
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
              .as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
               AND l_quantity BETWEEN 10 AND 35)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50
               AND l_quantity BETWEEN 20 AND 50)
        GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q176: returned-item reporting (TPC-H Q10 shape) — which customers
    // returned the most revenue in 1997H1. The returnflag filter pushes
    // to the lineitem scan; lineitem→orders is the co-keyed fact join
    // (both sides hash by order key); the per-customer aggregate then
    // joins customer and the broadcast nation dim; top-20 is a
    // TakeOrderedAndProject with the custkey tiebreak.
    QDef(
      "q176_returned_items",
      (s, dir) => {
        val t = Tables(s, dir)
        val rev = t.lineitem.where(col("l_returnflag") === "R")
          .join(t.orders.where(
              col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
              col("o_orderdate") < lit("1997-07-01").cast("timestamp_ntz")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("revenue"))
        rev.join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"),
            col("c_acctbal"), col("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      },
      Some("""
        SELECT c_custkey, c_name, n_name, c_acctbal, revenue
        FROM (SELECT o_custkey,
                     CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))) AS DOUBLE) AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE l_returnflag = 'R'
                AND o_orderdate >= TIMESTAMP '1997-01-01'
                AND o_orderdate < TIMESTAMP '1997-07-01'
              GROUP BY 1) r
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
      """)),

    // ------------------------------------------------------------------
    // q177: local-supplier volume (TPC-H Q5 shape) — revenue from
    // lineitems where the customer and the supplier sit in the SAME
    // nation, per nation of one region. The nation/region dims broadcast
    // into both sides; the customer-side and supplier-side nationkeys
    // meet in an equi-condition, so the whole query is hash joins on
    // the fact keys plus one tiny dim chain — no theta join anywhere.
    QDef(
      "q177_local_supplier_volume",
      (s, dir) => {
        val t = Tables(s, dir)
        val asiaNations = t.nation
          .join(broadcast(t.region.where(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          // supplier grows with SF: planner-chosen join, no forced hint
          .join(t.supplier.select(col("s_suppkey"),
              col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(asiaNations),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q183: salted skew join — the MITIGATION for what q140's skew
    // audit diagnoses: when a shuffle join's build side has hot keys,
    // hash(l_suppkey) sends every matching fact row to one task.
    // Salting splits each hot key's rows across 8 sub-partitions: the
    // fact side derives salt = l_orderkey % 8 (deterministic, already
    // in hand — no rand(), so the plan is replayable and the oracle
    // exact), the dim side explodes ×8 so every (suppkey, salt) pair
    // exists, and the join key becomes (suppkey, salt) — same rows,
    // 8× the parallelism on the hottest key. The shuffle_hash hint
    // pins the shuffle-join path this technique exists for (a
    // broadcastable dim wouldn't need salting; at warehouse scale the
    // dim side is NOT broadcastable, which is the scenario modeled).
    // The per-nation rollup re-aggregates across salts, proving the
    // salt never leaks into results: the oracle is the PLAIN join.
    QDef(
      "q183_salted_join",
      (s, dir) => {
        val t = Tables(s, dir)
        val li = t.lineitem
          .select(col("l_suppkey"), col("l_orderkey"),
            col("l_extendedprice").cast(DecimalType(18, 2)).as("rev"))
          .withColumn("salt", pmod(col("l_orderkey"), lit(8)).cast("int"))
        val sup = t.supplier
          .select(col("s_suppkey"), col("s_nationkey"))
          .withColumn("salt", explode(expr("sequence(0, 7)")))
        li.join(sup.hint("shuffle_hash"),
            col("l_suppkey") === col("s_suppkey") &&
              li("salt") === sup("salt"))
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("rev")).cast("double").as("revenue"))
      },
      Some("""
        SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY 1
      """))
  )
}
