package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Ckpt._

/** Analytic extensions: exact quantiles, window frames, date arithmetic,
  * and TF-IDF — rounding out the §2.5 "engine extension" categories.
  */
object AnalyticQueries {

  /** BM25 scored relation (doc_id, score_raw, n_terms) for the fixed
    * 3-term query — q132's core, shared with q171's hybrid fusion so
    * the lexical ranker can never drift between the two. See q132's
    * comment for the plan-shape rationale.
    */
  private[queries] def bm25Scored(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val toks = Tables(s, dir).documents
      .select(col("doc_id"), explode(expr(TextQueries.wordsExpr))
        .as("word"))
      .ckpt() // feeds dl/totals AND tf/df
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val totals = dl.agg(count(lit(1)).as("nn"),
      sum(col("dl")).as("toktot"))
    val tf = toks.where(col("word").isin("spark", "window", "merge"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    // scoring math lives in Q.bm25Aggregate, shared with the persisted
    // TextIndex so the two rankers cannot drift
    Q.bm25Aggregate(tf, df, dl, totals)
  }

  /** DuckDB CTE chain ending in `sc(doc_id, score_raw, n_terms)` — the
    * restatement of [[bm25Scored]], shared by the q132 and q171 oracles.
    */
  private[queries] val bm25ScoredDuck: String = s"""
        toks AS (SELECT doc_id,
                        unnest(${TextQueries.wordsExprDuck}) AS word
                 FROM documents),
        dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
               FROM toks GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                       CAST(SUM(dl) AS BIGINT) AS toktot FROM dl),
        tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
               FROM toks WHERE word IN ('spark', 'window', 'merge')
               GROUP BY 1, 2),
        df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df
               FROM tf GROUP BY 1),
        sc AS (SELECT t.doc_id,
                      SUM(LN(1.0 + (CAST(nn AS DOUBLE) - f.df + 0.5)
                             / (CAST(f.df AS DOUBLE) + 0.5))
                          * (CAST(t.tf AS DOUBLE) * 2.2)
                          / (CAST(t.tf AS DOUBLE) + 1.2
                             * (0.25 + 0.75 * CAST(d.dl AS DOUBLE)
                                / (CAST(toktot AS DOUBLE) / nn))))
                        AS score_raw,
                      CAST(COUNT(*) AS BIGINT) AS n_terms
               FROM tf t JOIN df f ON f.word = t.word
               JOIN dl d ON d.doc_id = t.doc_id, tot
               GROUP BY 1)"""

  /** Exact global rank over the total order (`v` asc, `tie` asc)
    * WITHOUT a global sort — the q180 two-phase histogram rank: bin
    * each row into 1000 equi-width buckets from a broadcast one-row
    * min/max, cumulate the ≤1000-row histogram (the only global
    * window), then rank WITHIN each bucket (partitioned window) and
    * add the bucket's cumulative offset. No task ever sorts more than
    * one bucket, so the plan survives a fact-table input at 100 TB
    * where a single-partition NTILE/row_number sort cannot.
    *
    * Input df must carry numeric `v` and a tiebreaking column `tie`
    * making the order total; output keeps every input column and adds
    * `r` (1-based bigint global rank) and `n` (total row count) —
    * exactly what the NTILE bucket formula needs.
    */
  private[queries] def histRank(df: org.apache.spark.sql.DataFrame,
      tie: String): org.apache.spark.sql.DataFrame = {
    val b = df.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n"))
      .ckpt() // one-row bounds: feeds binning AND rank math
    val binned = df.crossJoin(broadcast(b))
      .withColumn("hb", least(lit(999),
        floor((col("v") - col("lo"))
          / nullif((col("hi") - col("lo")) / 1000.0d, lit(0.0d)))
          .cast("int")))
      .na.fill(0, Seq("hb"))
      .ckpt() // feeds the histogram AND the rank pass
    val cume = binned.groupBy(col("hb")).agg(count(lit(1)).as("c"))
      .withColumn("cume0", coalesce(
        sum(col("c")).over(Q.bounded.orderBy(col("hb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("hb"), col("cume0"))
    binned.join(broadcast(cume), "hb")
      .withColumn("r", col("cume0") + row_number().over(
        Window.partitionBy(col("hb"))
          .orderBy(col("v").asc, col(tie).asc)))
      .drop("hb", "lo", "hi", "cume0")
  }

  /** SQL expression assigning NTILE(`k`)'s bucket from the exact global
    * rank `r` out of `n` rows, in pure integer arithmetic: the first
    * (n mod k) buckets hold (n div k)+1 rows, the rest (n div k).
    */
  private[queries] def ntileFromRank(k: Int): String =
    s"""cast(case when r <= (n div $k + 1) * (n % $k)
        then (r + n div $k) div (n div $k + 1)
        else n % $k + (r - (n div $k + 1) * (n % $k)
                       + n div $k - 1) div (n div $k)
        end as int)"""

  val defs: Seq[QDef] = Seq(
    // ------------------------------------------------------------------
    // q34: exact interpolated percentiles (sort-based, not sketches —
    // q32 covers the approximate path). round(…,6): the linear
    // interpolation step differs across engines by ulps.
    //
    // Formulated via Q.exactPercentiles (external window sort + rank
    // interpolation), NOT the holistic `percentile` aggregate: holistic
    // buffers every group value in one buffer — an OOM at 100 TB. Two
    // value columns → two sorts, but both reuse the single hash exchange
    // on l_returnflag; the final 3-row join is broadcast.
    QDef(
      "q34_percentiles",
      (s, dir) => {
        val li = Tables(s, dir).lineitem
        val pe = Q.exactPercentiles(li, "l_returnflag", "l_extendedprice",
          Seq(0.5 -> "p50", 0.9 -> "p90"))
        val pq = Q.exactPercentiles(li, "l_returnflag", "l_quantity",
          Seq(0.25 -> "q1_qty"))
        pe.join(pq, "l_returnflag")
          .select(col("l_returnflag"),
            round(col("p50"), 6).as("p50"),
            round(col("p90"), 6).as("p90"),
            round(col("q1_qty"), 6).as("q1_qty"))
      },
      Some("""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
               ROUND(quantile_cont(l_quantity, 0.25), 6) AS q1_qty
        FROM lineitem
        GROUP BY l_returnflag
      """)),

    // ------------------------------------------------------------------
    // q35: window frame surface — running totals (exact decimal),
    // bounded moving average, ntile, percent_rank — one shuffle on
    // user_id serves all four.
    QDef(
      "q35_window_frames",
      (s, dir) => {
        val byTime = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val run = byTime.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val recent = byTime.rowsBetween(-2, 0)
        val dec = col("value").cast(DecimalType(18, 2))
        Tables(s, dir).events
          .filter(col("user_id") < 20)
          .select(
            col("event_id"), col("user_id"),
            sum(dec).over(run).cast("double").as("running_value"),
            (sum(dec).over(recent).cast("double") /
              count(lit(1)).over(recent)).as("moving_avg3"),
            ntile(4).over(byTime).as("quartile"),
            round(percent_rank().over(byTime), 9).as("pct_rank"))
      },
      Some("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER run AS DOUBLE) AS running_value,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER recent AS DOUBLE)
                 / COUNT(*) OVER recent AS moving_avg3,
               CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
               ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank
        FROM events
        WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
               run AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               recent AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      """)),

    // ------------------------------------------------------------------
    // q36: date/time arithmetic. Cross-engine traps handled: DuckDB's
    // date_diff takes (part, start, end) — reversed vs Spark's
    // datediff(end, start); DuckDB dayofweek is 0=Sunday vs Spark's
    // 1=Sunday (strftime('%w') == dayofweek(x)-1).
    QDef(
      "q36_date_arith",
      (s, dir) => {
        Tables(s, dir).orders
          .filter(col("o_orderkey") % 50 === 0)
          .select(
            col("o_orderkey"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
              .cast("bigint").as("days_since_epoch95"),
            date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd")
              .as("plus_3_months"),
            date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
              .as("month_end"),
            (dayofweek(col("o_orderdate")) - 1).cast("int").as("dow"),
            quarter(col("o_orderdate")).cast("int").as("qtr"),
            weekofyear(col("o_orderdate")).cast("int").as("iso_week"))
      },
      Some("""
        SELECT o_orderkey,
               CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
                 AS days_since_epoch95,
               strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3_months,
               strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
               CAST(strftime(o_orderdate, '%w') AS INTEGER) AS dow,
               CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS qtr,
               CAST(EXTRACT(WEEK FROM o_orderdate) AS INTEGER) AS iso_week
        FROM orders
        WHERE o_orderkey % 50 = 0
      """)),

    // ------------------------------------------------------------------
    // q37: TF-IDF top-3 terms per document. Ranking uses the ROUNDED
    // score (libm log differs across engines by ulps) with a word
    // tiebreak, so ranks agree cross-engine. Two shuffles: tf group and
    // df group (broadcast back).
    QDef(
      "q37_tfidf",
      (s, dir) => {
        val docs = Tables(s, dir).documents
        val tokens = docs.select(col("doc_id"),
          explode(expr(TextQueries.wordsExpr)).as("word"))
        val tf = tokens.groupBy(col("doc_id"), col("word"))
          .agg(count(lit(1)).as("tf"))
        val df = tokens.select(col("doc_id"), col("word")).distinct()
          .groupBy(col("word")).agg(count(lit(1)).as("df"))
        // Corpus size as a broadcast one-row aggregate, not docs.count():
        // count() is a separate driver-side job (an extra scan of
        // `documents` before the main DAG even starts); the crossJoin of a
        // broadcast single row lets Catalyst plan everything as one DAG.
        val nDf = docs.agg(count(lit(1)).cast("double").as("n_docs"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score_r").desc, col("word").asc)
        // df is VOCAB-sized (grows with the corpus): no broadcast hint —
        // the planner broadcasts it while it fits and falls back to the
        // co-keyed word join at warehouse scale, where forcing a
        // multi-GB broadcast would be the bug
        tf.join(df, "word")
          .crossJoin(broadcast(nDf))
          .withColumn("score_r",
            round(col("tf") * log(col("n_docs") / col("df")), 9))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("word"), col("tf"),
            col("df"), col("score_r"))
      },
      Some(s"""
        WITH tokens AS (
          SELECT doc_id, unnest(${TextQueries.wordsExprDuck}) AS word
          FROM documents),
        tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tokens GROUP BY 1, 2),
        df AS (SELECT word, COUNT(*) AS df
               FROM (SELECT DISTINCT doc_id, word FROM tokens) GROUP BY 1),
        n AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.word, tf.tf, df.df,
                 ROUND(tf.tf * ln(n.n / df.df), 9) AS score_r
          FROM tf JOIN df USING (word), n),
        ranked AS (
          SELECT doc_id, word, tf, df, score_r,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score_r DESC, word ASC) AS rk
          FROM scored)
        SELECT doc_id, CAST(rk AS INTEGER) AS rk, word, tf, df, score_r
        FROM ranked WHERE rk <= 3
      """)),

    // ------------------------------------------------------------------
    // q38: fuzzy string matching — edit-distance near-pairs of part
    // names, blocked by brand so the self-join is per-block. Exact
    // integer distances, identical across engines.
    QDef(
      "q38_fuzzy_part_names",
      (s, dir) => {
        val p = Tables(s, dir).part
          .filter(col("p_size") <= 10)
          .select(col("p_partkey"), col("p_brand"), col("p_name"))
        val a = p.alias("a")
        val b = p.alias("b")
        a.join(b,
            col("a.p_brand") === col("b.p_brand") &&
            col("a.p_partkey") < col("b.p_partkey"))
          .select(col("a.p_partkey").as("key_a"),
            col("b.p_partkey").as("key_b"),
            levenshtein(col("a.p_name"), col("b.p_name")).cast("bigint")
              .as("dist"))
          .filter(col("dist") <= 5)
          .orderBy(col("dist").asc, col("key_a").asc, col("key_b").asc)
          .limit(100)
      },
      Some("""
        SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM (SELECT * FROM part WHERE p_size <= 10) a
        JOIN (SELECT * FROM part WHERE p_size <= 10) b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 5
        ORDER BY dist ASC, key_a ASC, key_b ASC
        LIMIT 100
      """)),

    // ------------------------------------------------------------------
    // q39: per-group top-k via the bounded TopK Aggregator registered
    // with functions.udaf — same semantics (and oracle) as q7's window
    // formulation, but with a k-bounded buffer and MAP-SIDE PARTIAL
    // MERGE instead of a full per-group sort: at most k rows per group
    // per partition reach the shuffle, the shape that survives
    // million-row groups. (The typed groupByKey(...).agg path plans NO
    // partial aggregate — raw rows would shuffle — hence the udaf route;
    // verified via the physical plan: partial_topk before the exchange.)
    QDef(
      "q39_topk_aggregate",
      (s, dir) => {
        implicit val bufEnc: org.apache.spark.sql.Encoder[Seq[(Long, Double)]] =
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
        val topk = udaf(
          graft.functions.TopK[(Long, Double)](3, _._2, _._1))
        Tables(s, dir).orders
          .groupBy(col("o_custkey"))
          .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
          .select(col("o_custkey"),
            posexplode(col("top")).as(Seq("pos", "row")))
          .select(col("o_custkey"),
            col("row._1").as("o_orderkey"),
            col("row._2").as("o_totalprice"),
            (col("pos") + 1).cast("int").as("rk"))
      },
      Some(Q.topOrdersOracle)),

    // ------------------------------------------------------------------
    // q40: FULL OUTER join null semantics — daily order counts vs daily
    // event counts; the date domains are disjoint (1995-2001 vs 2024) so
    // both null sides are exercised; keys and measures coalesced so the
    // output is null-free and hash-stable.
    QDef(
      "q40_full_outer_calendar",
      (s, dir) => {
        val t = Tables(s, dir)
        val od = t.orders
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_orders"))
        val ed = t.events
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_events"))
        od.join(ed, Seq("day"), "full_outer")
          .select(col("day"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("n_events"), lit(0L)).as("n_events"))
      },
      Some("""
        SELECT COALESCE(o.day, e.day) AS day,
               COALESCE(o.n_orders, 0) AS n_orders,
               COALESCE(e.n_events, 0) AS n_events
        FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, COUNT(*) AS n_orders
              FROM orders GROUP BY 1) o
        FULL OUTER JOIN
             (SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events
              FROM events GROUP BY 1) e
          USING (day)
      """)),

    // ------------------------------------------------------------------
    // q41: array/collection function surface over embeddings — slice,
    // sort, contains, element access, size — all codegen'd builtins.
    QDef(
      "q41_array_functions",
      (s, dir) => {
        Tables(s, dir).embeddings
          .filter(col("vec_id") < 50)
          .select(
            col("vec_id"),
            expr("cast(size(embedding) as bigint)").as("dim"),
            round(expr("cast(element_at(embedding, 1) as double)"), 6)
              .as("first_val"),
            round(expr("cast(array_max(embedding) as double)"), 6)
              .as("max_val"),
            round(expr("cast(array_min(slice(embedding, 1, 8)) as double)"), 6)
              .as("min_first8"),
            expr("cast(size(filter(embedding, x -> x > 0)) as bigint)")
              .as("n_positive"),
            col("label"))
      },
      Some("""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
               ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
               ROUND(CAST(list_min(embedding[1:8]) AS DOUBLE), 6) AS min_first8,
               CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
               label
        FROM embeddings
        WHERE vec_id < 50
      """)),

    // ------------------------------------------------------------------
    // q44: correlated scalar subquery — orders more than twice their
    // customer's average. Exercises Catalyst's subquery decorrelation
    // (planned as an aggregate + join, not a per-row re-scan). The inner
    // average uses the exact-decimal pattern so the comparison threshold
    // is bit-identical across engines.
    QDef(
      "q44_correlated_subquery",
      (s, dir) => {
        Tables(s, dir).orders.createOrReplaceTempView("orders")
        s.sql("""
          SELECT o_orderkey, o_custkey, o_totalprice
          FROM orders o
          WHERE o_totalprice > 2 * (
            SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """)
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (
          SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*)
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      """)),

    // ------------------------------------------------------------------
    // q45: real JSON parsing of the props column (q14 is the regexp
    // fallback; this is the typed path — from_json with an explicit
    // schema, which at scale beats schema inference and stays codegen'd).
    QDef(
      "q45_json_parse",
      (s, dir) => {
        Tables(s, dir).events
          .select(col("event_type"),
            from_json(col("props"),
              org.apache.spark.sql.types.StructType.fromDDL("k INT"))
              .getField("k").as("k"))
          .groupBy(col("event_type"))
          .agg(count(col("k")).as("n_parsed"),
            sum(col("k").cast("long")).as("sum_k"),
            min(col("k")).cast("int").as("min_k"),
            max(col("k")).cast("int").as("max_k"))
      },
      Some("""
        SELECT event_type,
               COUNT(k) AS n_parsed,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(MIN(k) AS INTEGER) AS min_k,
               CAST(MAX(k) AS INTEGER) AS max_k
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
              FROM events) t
        GROUP BY event_type
      """)),

    // ------------------------------------------------------------------
    // q46: explicit GROUPING SETS with grouping() markers — arbitrary
    // aggregation lattices beyond rollup/cube's fixed shapes (q11/q31),
    // still one expand + one shuffle.
    QDef(
      "q46_grouping_sets",
      (s, dir) => {
        Tables(s, dir).orders.createOrReplaceTempView("orders")
        s.sql("""
          SELECT COALESCE(o_orderstatus, 'ALL') AS status,
                 COALESCE(o_orderpriority, 'ALL') AS priority,
                 CAST(grouping(o_orderstatus) AS INT) AS g_status,
                 CAST(grouping(o_orderpriority) AS INT) AS g_priority,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          FROM orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                  (o_orderstatus, o_orderpriority))
        """)
      },
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
               CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
      """)),

    // ------------------------------------------------------------------
    // q47: temporal interval self-join — for each error event, how many
    // same-user events (any type) occurred within the preceding 5
    // minutes. Time-bucket blocking makes the join a pure EQUI join:
    // the probe side carries its 5-minute bucket, the error side
    // explodes to (bucket, bucket−1) — a 5-minute look-back can only
    // span those two — and the exact time predicate filters residually.
    // Each qualifying pair matches on exactly one bucket (the other
    // event has ONE bucket), so no dedup is needed. At 100 TB the
    // (user, bucket) key is the shuffle key and the per-key scan is
    // bounded by the bucket width, not the user's history.
    QDef(
      "q47_interval_overlap",
      (s, dir) => {
        val bucket = (c: org.apache.spark.sql.Column) =>
          floor(unix_micros(c) / lit(300L * 1000 * 1000))
        val ev = Tables(s, dir).events
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"), col("user_id"),
            col("ts").as("ets"))
          .withColumn("bkt", explode(array(bucket(col("ets")),
            bucket(col("ets")) - 1)))
        val all = ev.select(col("event_id").as("oid"),
          col("user_id").as("ouser"), col("ts").as("ots"))
          .withColumn("bkt", bucket(col("ots")))
        err.alias("e").join(all.alias("o"),
            col("user_id") === col("ouser") &&
            col("e.bkt") === col("o.bkt") &&
            col("oid") =!= col("error_id") &&
            col("ots") <= col("ets") &&
            col("ots") >= col("ets") - expr("INTERVAL 5 MINUTES"))
          .groupBy(col("error_id"), col("user_id"))
          .agg(count(lit(1)).as("n_nearby"))
      },
      Some("""
        SELECT e.event_id AS error_id, e.user_id, COUNT(*) AS n_nearby
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        JOIN events o
          ON o.user_id = e.user_id
         AND o.event_id <> e.event_id
         AND o.ts <= e.ts
         AND o.ts >= e.ts - INTERVAL 5 MINUTE
        GROUP BY e.event_id, e.user_id
      """)),

    // ------------------------------------------------------------------
    // q50: native session windows — session_window(ts, gap) assigns each
    // event to a gap-delimited session whose end is lastEvent + gap;
    // the same operator drives streaming sessionization without custom
    // state. Oracle: the lag/cumsum reconstruction (split when the gap
    // is >= 30min, matching session_window's "merge while < end").
    QDef(
      "q50_session_windows",
      (s, dir) => {
        Tables(s, dir).events
          .groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("event_type")).as("n_types"))
          .select(col("user_id"),
            date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("session_start"),
            date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("session_end"),
            col("n_events"), col("n_types"))
      },
      Some("""
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               strftime(MAX(ts) + INTERVAL 30 MINUTE,
                        '%Y-%m-%d %H:%M:%S.%f') AS session_end,
               COUNT(*) AS n_events,
               COUNT(DISTINCT event_type) AS n_types
        FROM (
          SELECT user_id, ts, event_type,
                 SUM(CASE WHEN prev_ts IS NULL
                            OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
          FROM (SELECT user_id, ts, event_id, event_type,
                       LAG(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_ts
                FROM events) t1) t2
        GROUP BY user_id, session_id
      """)),

    // ------------------------------------------------------------------
    // q61: per-language quality-quantile filter — keep documents at or
    // above their language's p25 of a lexical-diversity score. The
    // aggregation deliberately calls Spark's own `percentile(...)`: the
    // ScaleSafePercentiles optimizer rule rewrites it into the bounded
    // window plan (ScaleSafePercentilesSpec asserts no holistic
    // Percentile survives here), and THIS oracle puts that rewrite
    // under the driver's DuckDB hash gate. Both quality and the cut are
    // rounded to 9 digits before comparing — the two engines'
    // interpolation formulas can differ by 1 ulp, and the cut equals a
    // real data point whenever the rank position is integral.
    QDef(
      "q61_quality_quantile_filter",
      (s, dir) => {
        val scored = Tables(s, dir).documents
          .withColumn("ws", expr(TextQueries.wordsExpr))
          .select(col("doc_id"), col("lang"),
            // nullif: Spark's non-ANSI x/0 is NULL, DuckDB's IEEE double
            // division is NaN — pin an empty-token doc to NULL in both
            // (NULL quality drops the row from percentile AND the filter,
            // identically in both engines).
            expr("cast(size(array_distinct(ws)) as double) / nullif(size(ws), 0)")
              .as("quality"))
        val cuts = scored.groupBy(col("lang"))
          .agg(expr("percentile(quality, 0.25D)").as("p25"))
        scored.join(cuts, Seq("lang"))
          .where(round(col("quality"), 9) >= round(col("p25"), 9))
          .select(col("doc_id"), col("lang"),
            round(col("quality"), 6).as("quality_r"),
            round(col("p25"), 6).as("p25_r"))
      },
      Some(s"""
        WITH scored AS (
          SELECT doc_id, lang,
                 CAST(len(list_distinct(ws)) AS DOUBLE)
                   / nullif(len(ws), 0) AS quality
          FROM (SELECT doc_id, lang, ${TextQueries.wordsExprDuck} AS ws
                FROM documents) t),
        cuts AS (SELECT lang, quantile_cont(quality, 0.25) AS p25
                 FROM scored GROUP BY lang)
        SELECT doc_id, s.lang,
               ROUND(quality, 6) AS quality_r, ROUND(p25, 6) AS p25_r
        FROM scored s JOIN cuts USING (lang)
        WHERE ROUND(quality, 9) >= ROUND(p25, 9)
      """)),

    // ------------------------------------------------------------------
    // q64: cross-metric correlation — pairwise Pearson correlation of
    // the per-type hourly value series (which business metrics move
    // together). The hourly sums go through dsum (exact decimal) so
    // corr's INPUTS are bit-identical across engines; corr itself
    // accumulates co-moments in engine-specific order, so the output is
    // rounded to 6 digits. Self-join keyed by the hour bucket — at
    // scale the series tables are tiny relative to events, and the
    // expensive part (the hourly rollup) is one partial-agg pass.
    QDef(
      "q64_metric_correlation",
      (s, dir) => {
        val hourly = Tables(s, dir).events
          .groupBy(date_trunc("hour", col("ts")).as("hour_ts"),
            col("event_type"))
          .agg(Q.dsum(col("value")).as("v"))
        val a = hourly.alias("a")
        val b = hourly.alias("b")
        a.join(b,
            col("a.hour_ts") === col("b.hour_ts") &&
            col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(corr(col("a.v"), col("b.v")).as("c"),
            stddev_samp(col("a.v")).as("sa"),
            stddev_samp(col("b.v")).as("sb"),
            count(lit(1)).as("n_hours"))
          // single-point or zero-variance series: Spark's corr yields
          // NaN where DuckDB yields NULL — normalize both to NULL so
          // the oracle can't diverge on a degenerate pair at some SF
          .select(col("type_a"), col("type_b"),
            expr("""case when n_hours < 2 or sa = 0D or sb = 0D
                    then cast(null as double) else round(c, 6) end""")
              .as("corr_r"),
            col("n_hours"))
      },
      Some("""
        WITH hourly AS (
          SELECT date_trunc('hour', ts) AS hour_ts, event_type,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
          FROM events GROUP BY 1, 2)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CASE WHEN COUNT(*) < 2 OR stddev_samp(a.v) = 0
                      OR stddev_samp(b.v) = 0
                    THEN CAST(NULL AS DOUBLE)
                    ELSE ROUND(corr(a.v, b.v), 6) END AS corr_r,
               COUNT(*) AS n_hours
        FROM hourly a JOIN hourly b
          ON a.hour_ts = b.hour_ts AND a.event_type < b.event_type
        GROUP BY 1, 2
      """)),

    // ------------------------------------------------------------------
    // q65: inter-event gap percentiles — per event type, the median/p90
    // seconds between a user's consecutive events of that type (the
    // cadence metric behind rate limiting and bot detection). A lag
    // window per (user, type) feeds percentile() — which the
    // ScaleSafePercentiles rule plans as the bounded sort shape, so
    // this stacks window → rewritten percentile in one query. Gaps are
    // exact micros/1e6 doubles (identical across engines); only the
    // interpolated percentile needs the 6-digit output round.
    QDef(
      "q65_interevent_gaps",
      (s, dir) => {
        val gaps = Tables(s, dir).events
          .withColumn("gap_s", expr("cast(unix_micros(ts) as double)")
            .minus(expr(
              "cast(unix_micros(lag(ts, 1) over (partition by user_id, event_type order by ts asc, event_id asc)) as double)"))
            ./(lit(1e6)))
          .where(col("gap_s").isNotNull)
        gaps.groupBy(col("event_type"))
          .agg(count(col("gap_s")).as("n_gaps"),
            round(expr("percentile(gap_s, 0.5D)"), 6).as("p50_s"),
            round(expr("percentile(gap_s, 0.9D)"), 6).as("p90_s"))
      },
      Some("""
        WITH gaps AS (
          SELECT event_type,
                 CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts ASC, event_id ASC)) AS DOUBLE) / 1e6
                   AS gap_s
          FROM events)
        SELECT event_type, CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
               ROUND(quantile_cont(gap_s, 0.5), 6) AS p50_s,
               ROUND(quantile_cont(gap_s, 0.9), 6) AS p90_s
        FROM gaps WHERE gap_s IS NOT NULL
        GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q66: behavioral transition matrix — P(next event type | current)
    // per user sequence, the first-order Markov model behind journey
    // analysis and anomaly scoring. One lead window per user, one
    // aggregation, one row-normalizing window over the 5×5 result.
    // Probabilities are exact integer ratios, so both engines compute
    // identical doubles.
    QDef(
      "q66_event_transitions",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val byFrom = Window.partitionBy(col("from_type"))
        Tables(s, dir).events
          .withColumn("nxt", lead(col("event_type"), 1).over(byUser))
          .where(col("nxt").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("nxt").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p",
            round(col("n").cast("double") / sum(col("n")).over(byFrom), 6))
      },
      Some("""
        WITH seq AS (
          SELECT user_id, event_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC) AS nxt
          FROM events)
        SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS n,
               ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY event_type), 6) AS p
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY 1, 2
      """)),

    // ------------------------------------------------------------------
    // q78: column profiler — the ANALYZE-TABLE pass every ingest runs
    // before planning a pipeline: per column, non-null count, EXACT
    // distinct count, min and max, as one long-format relation.
    //
    // Deliberately NOT one multi-distinct aggregate: that plans an
    // Expand (×7) whose first level groups by every profiled column at
    // once — min(string) buffers force SortAggregate, so the engine
    // sorts N×7 wide rows (measured 4 s at sf0.1; and at 100 TB the
    // Expand re-materializes the whole table seven times). Instead each
    // COUNT(DISTINCT) is its own single-column aggregate — columnar
    // scans prune to exactly that column, so the seven parallel passes
    // together read each byte once, every distinct is a 2-level HASH
    // aggregate, and the no-distinct count/min/max pass streams without
    // sorting. The seven one-row results crossJoin (trivial) and stack.
    // min/max stringify through engine-stable formats only (bigint
    // verbatim, doubles rounded into DECIMAL(18,2), timestamps
    // date_format'ed — the suite's timestamp rule), so the long schema
    // stays uniform without repr divergence.
    QDef(
      "q78_profile",
      (s, dir) => {
        val str = (e: String) => s"cast($e as string)"
        val dec = (e: String) => s"cast(cast($e as decimal(18,2)) as string)"
        val ts = (e: String) => s"date_format($e, 'yyyy-MM-dd HH:mm:ss')"
        val cols = Seq(
          "o_orderkey" -> str, "o_custkey" -> str,
          "o_orderstatus" -> str, "o_totalprice" -> dec,
          "o_orderdate" -> ts, "o_orderpriority" -> str)
        val t = Tables(s, dir).orders
        val base = t.groupBy().agg(
          expr(s"cast(count(${cols.head._1}) as bigint)").as("c0"),
          cols.zipWithIndex.flatMap { case ((c, fmt), i) =>
            (if (i == 0) Nil
             else Seq(expr(s"cast(count($c) as bigint)").as(s"c$i"))) ++
              Seq(expr(fmt(s"min($c)")).as(s"mn$i"),
                expr(fmt(s"max($c)")).as(s"mx$i"))
          }: _*)
        val one = cols.zipWithIndex.foldLeft(base) { case (acc, ((c, _), i)) =>
          acc.crossJoin(
            t.groupBy().agg(expr(s"cast(count(distinct $c) as bigint)")
              .as(s"d$i")))
        }
        val stacked = cols.zipWithIndex
          .map { case ((c, _), i) => s"'$c', c$i, d$i, mn$i, mx$i" }
          .mkString(", ")
        one.selectExpr(
          s"""stack(${cols.size}, $stacked)
              as (column_name, n_nonnull, n_distinct, min_s, max_s)""")
      },
      Some("""
        WITH a AS (SELECT
          CAST(COUNT(o_orderkey) AS BIGINT) AS c1,
          CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS d1,
          CAST(MIN(o_orderkey) AS VARCHAR) AS mn1,
          CAST(MAX(o_orderkey) AS VARCHAR) AS mx1,
          CAST(COUNT(o_custkey) AS BIGINT) AS c2,
          CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d2,
          CAST(MIN(o_custkey) AS VARCHAR) AS mn2,
          CAST(MAX(o_custkey) AS VARCHAR) AS mx2,
          CAST(COUNT(o_orderstatus) AS BIGINT) AS c3,
          CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS d3,
          CAST(MIN(o_orderstatus) AS VARCHAR) AS mn3,
          CAST(MAX(o_orderstatus) AS VARCHAR) AS mx3,
          CAST(COUNT(o_totalprice) AS BIGINT) AS c4,
          CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS d4,
          CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn4,
          CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx4,
          CAST(COUNT(o_orderdate) AS BIGINT) AS c5,
          CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS d5,
          strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn5,
          strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx5,
          CAST(COUNT(o_orderpriority) AS BIGINT) AS c6,
          CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS d6,
          CAST(MIN(o_orderpriority) AS VARCHAR) AS mn6,
          CAST(MAX(o_orderpriority) AS VARCHAR) AS mx6
          FROM orders)
        SELECT 'o_orderkey' AS column_name, c1 AS n_nonnull,
               d1 AS n_distinct, mn1 AS min_s, mx1 AS max_s FROM a
        UNION ALL SELECT 'o_custkey', c2, d2, mn2, mx2 FROM a
        UNION ALL SELECT 'o_orderstatus', c3, d3, mn3, mx3 FROM a
        UNION ALL SELECT 'o_totalprice', c4, d4, mn4, mx4 FROM a
        UNION ALL SELECT 'o_orderdate', c5, d5, mn5, mx5 FROM a
        UNION ALL SELECT 'o_orderpriority', c6, d6, mn6, mx6 FROM a
      """)),

    // ------------------------------------------------------------------
    // q86: sequence-model training examples — slide a 3-event context
    // window over each user's event stream and count (context → next
    // event) pairs, i.e. the 4-gram statistics a next-event predictor
    // trains on. The context is built by collect_list over an explicit
    // ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING frame (order pinned by
    // (ts, event_id), so the list content is deterministic) and joined
    // to a '>' path string so both engines hash the same value shape.
    //
    // Scale: one hash exchange on user_id for the window, then a
    // partial-agg-friendly groupBy on (context, label) whose cardinality
    // is bounded by |event_type|^4, and a TakeOrdered(100) — no
    // per-user skew risk beyond the window itself (a power-user's events
    // still stream through one sort spill, never an in-memory array of
    // the whole corpus).
    QDef(
      "q86_event_context_examples",
      (s, dir) => {
        val byTs = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-3, -1)
        Tables(s, dir).events
          .withColumn("ctx", collect_list(col("event_type")).over(byTs))
          .where(size(col("ctx")) === 3)
          .select(concat_ws(">", col("ctx")).as("context"),
            col("event_type").as("label"))
          .groupBy(col("context"), col("label"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("context").asc, col("label").asc)
          .limit(100)
      },
      Some("""
        WITH seq AS (
          SELECT event_type,
                 list(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS ctx
          FROM events)
        SELECT array_to_string(ctx, '>') AS context, event_type AS label,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq
        WHERE len(ctx) = 3
        GROUP BY context, label
        ORDER BY n DESC, context ASC, label ASC
        LIMIT 100
      """)),

    // ------------------------------------------------------------------
    // q89: weekly retention cohorts — the classic growth-analytics
    // matrix: users bucketed by their FIRST active week, then counted
    // distinct per (cohort week, weeks-since-cohort offset). Two
    // shuffles that share a key: the per-user min-week aggregation and
    // the events↔cohort join both hash on user_id (Catalyst reuses the
    // partitioning, so the join adds no exchange on the aggregated
    // side), then one partial-agg-friendly distinct count on the tiny
    // (cohort, offset) grid. Weeks are date_trunc boundaries (Monday in
    // both engines); the offset is exact integer day arithmetic.
    QDef(
      "q89_retention_cohorts",
      (s, dir) => {
        val ev = Tables(s, dir).events
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        val cohorts = ev.groupBy(col("user_id"))
          .agg(min(col("wk")).as("cohort_wk"))
        ev.join(cohorts, "user_id")
          .groupBy(col("cohort_wk"),
            expr("cast(datediff(wk, cohort_wk) div 7 as int)")
              .as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .select(date_format(col("cohort_wk"), "yyyy-MM-dd")
              .as("cohort_week"),
            col("week_offset"), col("n_users"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        cohorts AS (
          SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id)
        SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
               CAST(date_diff('day', cohort_wk, wk) // 7 AS INTEGER)
                 AS week_offset,
               CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_users
        FROM ev JOIN cohorts ON ev.user_id = cohorts.user_id
        GROUP BY cohort_wk, week_offset
      """)),

    // ------------------------------------------------------------------
    // q90: argmax per group — max_by/arg_max, the "which row holds the
    // group's maximum" aggregate that replaces a window + filter with
    // ONE partial-agg pass (max_by merges like any min/max, so the
    // map side already discards non-winners — at 100 TB this is an
    // exchange of one row per group, vs the window formulation's full
    // sort). Determinism: arg_max ties are engine-arbitrary, so the
    // ordering key is (value, event_id) packed into one BIGINT —
    // value is 2-decimal money (exact in cents), event_id the unique
    // tiebreak. Both engines compute the identical key, so the winner
    // is unique and the oracle can hash-match.
    QDef(
      "q90_argmax_events",
      (s, dir) => {
        val packed = expr(
          "cast(round(value * 100) as bigint) * 1000000000000L + event_id")
        Tables(s, dir).events
          .groupBy(col("event_type"),
            date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
              .as("day"))
          .agg(
            max_by(col("user_id"), packed).as("top_user"),
            max_by(col("event_id"), packed).as("top_event"),
            max(col("value")).as("max_value"),
            count(lit(1)).as("n_events"))
      },
      Some("""
        SELECT event_type,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               arg_max(user_id,
                 CAST(round(value * 100) AS BIGINT) * 1000000000000
                   + event_id) AS top_user,
               arg_max(event_id,
                 CAST(round(value * 100) AS BIGINT) * 1000000000000
                   + event_id) AS top_event,
               MAX(value) AS max_value,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1, 2
      """)),

    // ------------------------------------------------------------------
    // q104: equi-width histogram of order totals with IN-PLAN bin
    // bounds: min/max arrive as a broadcast 1-row aggregate (the q37
    // corpus-size pattern), the bucket index is a pure scan-side map,
    // and the histogram itself is a 20-group partial-agg — two passes
    // over the data, zero driver participation, the shape a profiler
    // uses at any scale. Bucket arithmetic is identical IEEE double
    // ops on identical inputs in both engines (no libm), so the floor
    // is exact cross-engine; the top value clamps into the last bucket.
    QDef(
      "q104_histogram",
      (s, dir) => {
        val o = Tables(s, dir).orders.select(col("o_totalprice"))
        val b = o.agg(min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        o.crossJoin(broadcast(b))
          .select(least(floor((col("o_totalprice") - col("lo")) /
              (col("hi") - col("lo")) * 20).cast("bigint"), lit(19L))
            .as("bucket"), col("lo"), col("hi"))
          .groupBy(col("bucket"), col("lo"), col("hi"))
          .agg(count(lit(1)).as("n"))
          .select(col("bucket"),
            round(col("lo") + (col("hi") - col("lo")) * col("bucket") / 20, 6)
              .as("bucket_lo"),
            col("n"))
      },
      Some("""
        WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
                   FROM orders),
        h AS (SELECT LEAST(CAST(FLOOR((o_totalprice - b.lo) /
                       (b.hi - b.lo) * 20) AS BIGINT), 19) AS bucket,
                     b.lo, b.hi
              FROM orders, b)
        SELECT bucket, round(lo + (hi - lo) * bucket / 20, 6) AS bucket_lo,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM h GROUP BY bucket, lo, hi
      """)),

    // ------------------------------------------------------------------
    // q122: the full ranking-function surface in one partitioned window
    // — row_number / rank / dense_rank / percent_rank / cume_dist /
    // ntile share ONE WindowExec pass (one ordering, one frame scan).
    // The ORDER BY ends in the unique (orderkey, linenumber) pair, so
    // ranks are total and percent_rank's (rank−1)/(n−1) is the same
    // exact division in both engines (round-at-9 absorbs nothing — it's
    // belt-and-braces). Partitioned by supplier: no global sort; the
    // post-window rn filter bounds output without breaking the
    // full-partition statistics percent_rank/cume_dist need.
    QDef(
      "q122_rank_functions",
      (s, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc)
        Tables(s, dir).lineitem
          .where(col("l_suppkey") < 50)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"))
          .withColumn("rn", row_number().over(w))
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .withColumn("pr", round(percent_rank().over(w), 9))
          .withColumn("cd", round(cume_dist().over(w), 9))
          .withColumn("tile", ntile(4).over(w))
          .where(col("rn") <= 8)
          .drop("l_extendedprice")
      },
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(rn AS INTEGER) AS rn, CAST(rnk AS INTEGER) AS rnk,
               CAST(drnk AS INTEGER) AS drnk, pr, cd,
               CAST(tile AS INTEGER) AS tile
        FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
                ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
                DENSE_RANK() OVER w AS drnk,
                ROUND(PERCENT_RANK() OVER w, 9) AS pr,
                ROUND(CUME_DIST() OVER w, 9) AS cd,
                NTILE(4) OVER w AS tile
              FROM lineitem WHERE l_suppkey < 50
              WINDOW w AS (PARTITION BY l_suppkey
                ORDER BY l_extendedprice DESC, l_orderkey ASC,
                         l_linenumber ASC)) t
        WHERE rn <= 8
      """)),

    // ------------------------------------------------------------------
    // q124: incremental-maintenance AUDIT — the mergeable-state algebra
    // behind every warehouse incremental rollup, made explicit and
    // driver-gated: per-status states (count / exact-decimal sum / min
    // / max) computed over two date halves of `orders`, merged with
    // the aggregate-specific combine (＋, ＋, least, greatest), and
    // compared IN-QUERY against the direct full recompute. Every
    // combine is exact arithmetic (counts, DECIMAL(18,2) sums, double
    // min/max compare — no accumulation), so the flags are
    // deterministic; a broken merge (double-count, missed half, wrong
    // combine) fails the hash gate. The full-outer status join keeps
    // a status that appears in only one half honest.
    QDef(
      "q124_state_merge",
      (s, dir) => {
        val o = Tables(s, dir).orders
        val cutoff = lit("1998-01-01").cast("timestamp")
        def state(df: org.apache.spark.sql.DataFrame, sfx: String) =
          df.groupBy(col("o_orderstatus").as("status"))
            .agg(count(lit(1)).as(s"cnt_$sfx"),
              sum(col("o_totalprice").cast(DecimalType(18, 2)))
                .as(s"s_$sfx"),
              min(col("o_totalprice")).as(s"mn_$sfx"),
              max(col("o_totalprice")).as(s"mx_$sfx"))
        val a = state(o.where(col("o_orderdate") < cutoff), "a")
        val b = state(o.where(col("o_orderdate") >= cutoff), "b")
        val direct = state(o, "d")
        val merged = a.join(b, Seq("status"), "full_outer")
          .select(col("status"),
            (coalesce(col("cnt_a"), lit(0L)) +
              coalesce(col("cnt_b"), lit(0L))).as("cnt_m"),
            (coalesce(col("s_a"), lit(0).cast(DecimalType(18, 2))) +
              coalesce(col("s_b"), lit(0).cast(DecimalType(18, 2))))
              .as("s_m"),
            least(col("mn_a"), col("mn_b")).as("mn_m"),
            greatest(col("mx_a"), col("mx_b")).as("mx_m"))
        direct.join(merged, Seq("status"))
          .select(col("status"), col("cnt_d").as("cnt"),
            col("s_d").cast("double").as("total"),
            col("mn_d").as("mn"), col("mx_d").as("mx"),
            when(col("cnt_m") === col("cnt_d"), 1).otherwise(0)
              .as("ok_cnt"),
            when(col("s_m") === col("s_d"), 1).otherwise(0).as("ok_sum"),
            when(col("mn_m") === col("mn_d"), 1).otherwise(0).as("ok_min"),
            when(col("mx_m") === col("mx_d"), 1).otherwise(0).as("ok_max"))
      },
      Some("""
        SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total,
               MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx,
               1 AS ok_cnt, 1 AS ok_sum, 1 AS ok_min, 1 AS ok_max
        FROM orders GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q126: per-group closed-form OLS (price ~ quantity per return
    // flag) — distributed linear regression as pure partial-aggregable
    // moment sums, the pattern every scale-out ML-on-SQL system uses:
    // one map-side-combinable pass collects (n, Σx, Σy, Σxy, Σx²,
    // Σy²), the slope/intercept/correlation fall out of the normal
    // equations on the 3-row result. Determinism across engines is the
    // whole trick: the inputs are exact 2-decimal values, so every
    // moment is accumulated in DECIMAL (exact, order-independent —
    // products of two 2-decimal values are exact 4-decimal values) and
    // only the final closed-form arithmetic runs in double, as the
    // SAME IEEE expression tree in both engines, rounded at 6.
    QDef(
      "q126_ols_by_group",
      (s, dir) => {
        val li = Tables(s, dir).lineitem
          .select(col("l_returnflag"),
            col("l_quantity").cast(DecimalType(18, 2)).as("x"),
            col("l_extendedprice").cast(DecimalType(18, 2)).as("y"))
        li.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum((col("x") * col("y")).cast(DecimalType(38, 4))).as("sxy"),
            sum((col("x") * col("x")).cast(DecimalType(38, 4))).as("sxx"),
            sum((col("y") * col("y")).cast(DecimalType(38, 4))).as("syy"))
          .select(col("l_returnflag"), col("n"),
            round((col("n") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              (col("n") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")), 6)
              .as("slope"),
            round((col("sy").cast("double") -
              ((col("n") * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")) /
                (col("n") * col("sxx").cast("double") -
                  col("sx").cast("double") * col("sx").cast("double"))) *
                col("sx").cast("double")) / col("n"), 6).as("intercept"),
            round((col("n") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              sqrt((col("n") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
                (col("n") * col("syy").cast("double") -
                  col("sy").cast("double") * col("sy").cast("double"))), 6)
              .as("corr_xy"))
      },
      Some("""
        WITH m AS (
          SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sy,
                 CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))
                   AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))
                   AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))
                   AS DECIMAL(38,4))) AS DOUBLE) AS syy
          FROM lineitem GROUP BY 1)
        SELECT l_returnflag, n,
               ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
               ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                     / n, 6) AS intercept,
               ROUND((n * sxy - sx * sy)
                     / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                 AS corr_xy
        FROM m
      """)),

    // ------------------------------------------------------------------
    // q128: weight-of-evidence decile binning — the classic credit-/
    // quality-scoring feature transform, and the supervised cousin of
    // q104's histogram: decile-bin orders by price (a TOTAL order —
    // the o_orderkey tiebreak makes the bin assignment identical in
    // both engines), label 'F' orders as bad, and emit per-bin
    // WOE = ln(good%/bad%) plus the bin's information-value
    // contribution. The decile assignment is the q180 two-phase
    // histogram rank, NOT a global NTILE sort (which moves the whole
    // fact table to one task): phase 1 bins each order into 1000
    // equi-width price buckets from a broadcast one-row min/max and
    // cumulates the ≤1000-row histogram (the only global window);
    // phase 2 ranks WITHIN each bucket (partitioned window) and adds
    // the bucket's cumulative offset — an exact global rank with no
    // task sorting more than one bucket. The NTILE(10) bucket-size
    // formula then maps rank→decile in exact integer arithmetic.
    // ln() runs on exact integer-count ratios — identical IEEE input
    // in both engines — so round-at-6 absorbs any libm ulp (the
    // q112/q117 recipe).
    QDef(
      "q128_woe_binning",
      (s, dir) => {
        val o = Tables(s, dir).orders.select(
          col("o_totalprice").as("v"), col("o_orderkey"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("bad"))
        val per = histRank(o, "o_orderkey")
          .withColumn("bin", expr(ntileFromRank(10)))
          .groupBy(col("bin"))
          .agg(sum(lit(1L) - col("bad")).as("good_n"),
            sum(col("bad")).as("bad_n"))
        val tot = per.agg(sum(col("good_n")).as("g"), sum(col("bad_n")).as("b"))
        per.crossJoin(broadcast(tot))
          .select(col("bin"), col("good_n"), col("bad_n"),
            round(log((col("good_n").cast("double") / col("g")) /
              (col("bad_n").cast("double") / col("b"))), 6).as("woe"),
            round((col("good_n").cast("double") / col("g") -
              col("bad_n").cast("double") / col("b")) *
              log((col("good_n").cast("double") / col("g")) /
                (col("bad_n").cast("double") / col("b"))), 6).as("iv_part"))
      },
      Some("""
        WITH b AS (
          SELECT CAST(NTILE(10) OVER (ORDER BY o_totalprice ASC,
                   o_orderkey ASC) AS INTEGER) AS bin,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
          FROM orders),
        per AS (SELECT bin, CAST(SUM(1 - bad) AS BIGINT) AS good_n,
                       CAST(SUM(bad) AS BIGINT) AS bad_n
                FROM b GROUP BY 1),
        tot AS (SELECT CAST(SUM(good_n) AS BIGINT) AS g,
                       CAST(SUM(bad_n) AS BIGINT) AS b FROM per)
        SELECT bin, good_n, bad_n,
               ROUND(LN((CAST(good_n AS DOUBLE) / g)
                        / (CAST(bad_n AS DOUBLE) / b)), 6) AS woe,
               ROUND((CAST(good_n AS DOUBLE) / g - CAST(bad_n AS DOUBLE) / b)
                     * LN((CAST(good_n AS DOUBLE) / g)
                          / (CAST(bad_n AS DOUBLE) / b)), 6) AS iv_part
        FROM per, tot
      """)),

    // ------------------------------------------------------------------
    // q132: BM25 retrieval scoring (k1=1.2, b=0.75, Robertson +1 idf)
    // for a fixed 3-term query — the ranking function a corpus search
    // layer needs beyond q37's tf-idf, with per-document length
    // normalization against the corpus mean. Every statistic is a
    // partial-aggregable integer count; the token stream is scanned
    // ONCE (checkpointed) and feeds doc lengths, totals, tf, and df.
    // The tf relation is pre-filtered to the query terms BEFORE any
    // shuffle, so the heavy groupBys move only matching postings —
    // the inverted-index access path, not a corpus-wide join. df and
    // the one-row corpus totals broadcast; dl joins co-keyed on
    // doc_id. The float score is one IEEE expression over exact
    // integers (q112/q117 recipe): ranked at round-9, emitted at
    // round-6, doc_id tiebreak. Top-15 via sort+limit
    // (TakeOrderedAndProject, O(k) per partition) with rk assigned
    // over the 15 survivors — never a global row_number over every
    // scored document (the q185 shape).
    QDef(
      "q132_bm25",
      (s, dir) => Q.bm25TopK(bm25Scored(s, dir), 15),
      Some(s"""
        WITH $bm25ScoredDuck
        SELECT CAST(rk AS INTEGER) AS rk, doc_id, n_terms,
               ROUND(score_raw, 6) AS score
        FROM (SELECT doc_id, n_terms, score_raw,
                     ROW_NUMBER() OVER (ORDER BY ROUND(score_raw, 9) DESC,
                       doc_id ASC) AS rk
              FROM sc) t
        WHERE rk <= 15
      """)),

    // ------------------------------------------------------------------
    // q138: leave-one-out target encoding — the leakage-safe
    // categorical encoder: each order's priority is encoded as the
    // mean total price of all OTHER orders sharing that priority,
    // (S_g − x_i) / (n_g − 1). The group sums accumulate in
    // DECIMAL(18,2) — exact, order-independent — and broadcast back
    // (|priorities| rows), so the per-row encode is a map-side
    // subtraction: one partial-aggregable pass + one broadcast join,
    // nothing resembling the per-row correlated subquery the textbook
    // definition implies. Output is a deterministic key-sampled slice
    // (orderkey % 997 = 0) so rows stay bounded while S/n still cover
    // the full table; the single division runs on exact decimal-
    // difference inputs, rounded at 6.
    QDef(
      "q138_target_encoding",
      (s, dir) => {
        val o = Tables(s, dir).orders
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice").cast(DecimalType(18, 2)).as("x"))
        val g = o.groupBy(col("o_orderpriority"))
          .agg(sum(col("x")).as("sg"), count(lit(1)).as("ng"))
        o.join(broadcast(g), "o_orderpriority")
          .where(col("o_orderkey") % 997 === 0)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("x").cast("double").as("price"),
            col("ng"),
            round((col("sg") - col("x")).cast("double") /
              (col("ng") - lit(1L)), 6).as("loo_mean"))
      },
      Some("""
        WITH o AS (SELECT o_orderkey, o_orderpriority,
                          CAST(o_totalprice AS DECIMAL(18,2)) AS x
                   FROM orders),
        g AS (SELECT o_orderpriority,
                     SUM(x) AS sg, CAST(COUNT(*) AS BIGINT) AS ng
              FROM o GROUP BY 1)
        SELECT o_orderkey, o.o_orderpriority,
               CAST(x AS DOUBLE) AS price, ng,
               ROUND(CAST(sg - x AS DOUBLE) / (ng - 1), 6) AS loo_mean
        FROM o JOIN g ON g.o_orderpriority = o.o_orderpriority
        WHERE o_orderkey % 997 = 0
      """)),

    // ------------------------------------------------------------------
    // q140: join-key skew audit — the diagnostic a 100 TB operator
    // runs BEFORE choosing a join strategy: per-key frequencies of
    // lineitem.l_suppkey, top-key share, and the Gini coefficient of
    // the key distribution (the salting decision input). The heavy
    // pass is one partial-aggregable count; everything after —
    // including the Gini rank window — runs on the |distinct keys|
    // relation, which is already bounded (keys, not rows). Gini uses
    // the exact rank identity G = 2·Σ(i·cᵢ)/(n·Σc) − (n+1)/n over
    // counts sorted ascending: all integer sums, one final IEEE
    // division per engine, round 6.
    QDef(
      "q140_skew_audit",
      (s, dir) => {
        val freq = Tables(s, dir).lineitem
          .groupBy(col("l_suppkey")).agg(count(lit(1)).as("c"))
        // dim-bounded: distinct join keys, not fact rows
        val ranked = freq.withColumn("i", row_number().over(
          Q.bounded.orderBy(col("c").asc, col("l_suppkey").asc)))
        ranked.agg(
          count(lit(1)).as("n_keys"),
          sum(col("c")).as("n_rows"),
          max(col("c")).as("max_c"),
          max(struct(col("c"), col("l_suppkey"))).getField("l_suppkey")
            .as("top_key"),
          sum(col("i").cast("long") * col("c")).as("ic"))
          .select(col("n_keys"), col("n_rows"), col("top_key"),
            round(col("max_c").cast("double") / col("n_rows"), 6)
              .as("top_share"),
            round(lit(2.0d) * col("ic") /
              (col("n_keys").cast("double") * col("n_rows")) -
              (col("n_keys") + lit(1L)).cast("double") / col("n_keys"), 6)
              .as("gini"))
      },
      Some("""
        WITH freq AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS c
                      FROM lineitem GROUP BY 1),
        ranked AS (SELECT l_suppkey, c,
                          ROW_NUMBER() OVER (ORDER BY c ASC, l_suppkey ASC)
                            AS i
                   FROM freq),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                       CAST(SUM(c) AS BIGINT) AS n_rows,
                       CAST(MAX(c) AS BIGINT) AS max_c,
                       (MAX({'c': c, 'k': l_suppkey})).k AS top_key,
                       CAST(SUM(i * c) AS BIGINT) AS ic
                FROM ranked)
        SELECT n_keys, n_rows, top_key,
               ROUND(CAST(max_c AS DOUBLE) / n_rows, 6) AS top_share,
               ROUND(2.0 * ic / (CAST(n_keys AS DOUBLE) * n_rows)
                     - CAST(n_keys + 1 AS DOUBLE) / n_keys, 6) AS gini
        FROM agg
      """)),

    // ------------------------------------------------------------------
    // q145: range-partition split planning — the exact version of what
    // RangePartitioner samples for: 32 balanced split points of the
    // (o_totalprice, o_orderkey) sort key, each with its row count and
    // upper boundary. Bucket assignment follows NTILE's contract
    // (equal sizes, remainder to the leading buckets) but is computed
    // from the q180 two-phase histogram rank ([[histRank]]) — no task
    // ever sorts more than one of the 1000 price buckets, where a
    // global NTILE sort would move every order to one task. The
    // per-bucket rollup is partial-aggregable; boundaries are exact
    // 2-decimal doubles; counts are integers.
    QDef(
      "q145_range_splits",
      (s, dir) => {
        val o = Tables(s, dir).orders
          .select(col("o_totalprice").as("v"), col("o_orderkey"))
        histRank(o, "o_orderkey")
          .withColumn("bucket", expr(ntileFromRank(32)))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            max(col("v")).as("hi_price"),
            max(col("o_orderkey")).as("hi_key"))
      },
      Some("""
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
               MAX(o_totalprice) AS hi_price, MAX(o_orderkey) AS hi_key
        FROM (SELECT o_totalprice, o_orderkey,
                     CAST(NTILE(32) OVER (ORDER BY o_totalprice ASC,
                       o_orderkey ASC) AS INTEGER) AS bucket
              FROM orders) t
        GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q147: week-over-week growth — period-over-period comparison, the
    // reporting primitive behind every growth dashboard: weekly
    // revenue per customer nation (orders ⋈ broadcast-able customer
    // dimension is deliberately exercised as a shuffle join on
    // custkey — the dimension is NOT small at warehouse scale), then
    // one lag() over the tiny (nation × week) rollup. Revenue
    // accumulates in DECIMAL (exact, order-free); growth divides two
    // exact decimals cast to double, nullif-guarded for the first
    // week, round 6. date_trunc('week') is ISO-Monday in both
    // engines.
    QDef(
      "q147_wow_growth",
      (s, dir) => {
        val t = Tables(s, dir)
        val weekly = t.orders
          .join(t.customer.select(col("c_custkey").as("o_custkey"),
            col("c_nationkey")), "o_custkey")
          .groupBy(col("c_nationkey"),
            date_trunc("week", col("o_orderdate")).as("wk"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .as("rev"))
        val byNation = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("wk"))
        weekly
          .withColumn("prev", lag(col("rev"), 1).over(byNation))
          .select(col("c_nationkey"),
            date_format(col("wk"), "yyyy-MM-dd").as("week"),
            col("rev").cast("double").as("rev"),
            round((col("rev") - col("prev")).cast("double") /
              nullif(col("prev").cast("double"), lit(0.0d)), 6)
              .as("wow_growth"))
      },
      Some("""
        WITH w AS (SELECT c_nationkey, date_trunc('week', o_orderdate)
                     AS wk,
                     SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
                   FROM orders JOIN customer ON c_custkey = o_custkey
                   GROUP BY 1, 2),
        g AS (SELECT c_nationkey, wk, rev,
                     LAG(rev, 1) OVER (PARTITION BY c_nationkey
                       ORDER BY wk) AS prev
              FROM w)
        SELECT c_nationkey, strftime(wk, '%Y-%m-%d') AS week,
               CAST(rev AS DOUBLE) AS rev,
               ROUND(CAST(rev - prev AS DOUBLE)
                     / nullif(CAST(prev AS DOUBLE), 0), 6) AS wow_growth
        FROM g
      """)),

    // ------------------------------------------------------------------
    // q152: exact weighted median — the quantity-weighted median price
    // per return flag, the weighted quantile neither engine has as a
    // builtin. Formulation: cumulative weight along the (price,
    // orderkey, linenumber) total order within each flag partition,
    // then min price whose cumulative weight reaches half the
    // partition total. Everything is INTEGER: weights become exact
    // cents (round(q·100)), the half-total test is 2·cumw ≥ tot
    // (no division), so the answer is bit-exact with zero float
    // anywhere. Both windows (cumsum + partition total) share one
    // flag-partitioned sort; the final rollup is partial-aggregable.
    // At 100 TB the same plan holds — the sort shards on the flag,
    // and a two-phase bucket prefix sum (q131's trick) would drop the
    // per-flag sort if flags were few and huge.
    QDef(
      "q152_weighted_median",
      (s, dir) => {
        val li = Tables(s, dir).lineitem
          .select(col("l_returnflag"), col("l_extendedprice"),
            round(col("l_quantity") * 100).cast("bigint").as("w"),
            col("l_orderkey"), col("l_linenumber"))
        val ord = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc,
            col("l_linenumber").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val all = Window.partitionBy(col("l_returnflag"))
        li.withColumn("cumw", sum(col("w")).over(ord))
          .withColumn("tot", sum(col("w")).over(all))
          .groupBy(col("l_returnflag"))
          .agg(max(col("tot")).as("total_w"),
            min(when(lit(2L) * col("cumw") >= col("tot"),
              col("l_extendedprice"))).as("w_median"))
      },
      Some("""
        WITH li AS (SELECT l_returnflag, l_extendedprice,
                      CAST(ROUND(l_quantity * 100) AS BIGINT) AS w,
                      l_orderkey, l_linenumber
                    FROM lineitem),
        c AS (SELECT l_returnflag, l_extendedprice,
                SUM(w) OVER (PARTITION BY l_returnflag
                  ORDER BY l_extendedprice ASC, l_orderkey ASC,
                           l_linenumber ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cumw,
                SUM(w) OVER (PARTITION BY l_returnflag) AS tot
              FROM li)
        SELECT l_returnflag, CAST(MAX(tot) AS BIGINT) AS total_w,
               MIN(CASE WHEN 2 * cumw >= tot THEN l_extendedprice END)
                 AS w_median
        FROM c GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q160: Benford first-digit audit — the fraud/synthetic-data
    // screen: the leading-digit distribution of order totals against
    // Benford's log₁₀(1+1/d) expectation. The digit extracts EXACTLY
    // via string-of-integer-part (no log10 at runtime — a libm log of
    // the value itself could mis-digit a boundary case; the expected
    // probabilities are 9-decimal literals both engines parse to the
    // same doubles, the q99 exact-literal recipe). One partial-
    // aggregable count + a broadcast total; shares and deviations are
    // single IEEE ops, round 6.
    QDef(
      "q160_benford_audit",
      (s, dir) => {
        val digits = Tables(s, dir).orders
          .select(expr(
            "substring(cast(cast(floor(o_totalprice) as bigint) as string)," +
              " 1, 1)").as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        val tot = digits.agg(sum(col("n")).as("nn"))
        val expected =
          """CASE digit WHEN '1' THEN 0.301029996D WHEN '2' THEN 0.176091259D
             WHEN '3' THEN 0.124938737D WHEN '4' THEN 0.096910013D
             WHEN '5' THEN 0.079181246D WHEN '6' THEN 0.066946790D
             WHEN '7' THEN 0.057991947D WHEN '8' THEN 0.051152522D
             ELSE 0.045757491D END"""
        digits.crossJoin(broadcast(tot))
          .withColumn("expected", expr(expected))
          .select(col("digit"), col("n"),
            round(col("n").cast("double") / col("nn"), 6).as("share"),
            col("expected"),
            round(col("n").cast("double") / col("nn") - col("expected"), 6)
              .as("deviation"))
      },
      Some("""
        WITH d AS (SELECT substring(CAST(CAST(FLOOR(o_totalprice)
                     AS BIGINT) AS VARCHAR), 1, 1) AS digit,
                     CAST(COUNT(*) AS BIGINT) AS n
                   FROM orders GROUP BY 1),
        t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM d)
        SELECT digit, n,
               ROUND(CAST(n AS DOUBLE) / nn, 6) AS share,
               CASE digit WHEN '1' THEN CAST(0.301029996 AS DOUBLE)
                 WHEN '2' THEN 0.176091259 WHEN '3' THEN 0.124938737
                 WHEN '4' THEN 0.096910013 WHEN '5' THEN 0.079181246
                 WHEN '6' THEN 0.066946790 WHEN '7' THEN 0.057991947
                 WHEN '8' THEN 0.051152522 ELSE 0.045757491 END
                 AS expected,
               ROUND(CAST(n AS DOUBLE) / nn
                     - CASE digit WHEN '1' THEN CAST(0.301029996 AS DOUBLE)
                         WHEN '2' THEN 0.176091259
                         WHEN '3' THEN 0.124938737
                         WHEN '4' THEN 0.096910013
                         WHEN '5' THEN 0.079181246
                         WHEN '6' THEN 0.066946790
                         WHEN '7' THEN 0.057991947
                         WHEN '8' THEN 0.051152522
                         ELSE 0.045757491 END, 6) AS deviation
        FROM d, t
      """)),

    // ------------------------------------------------------------------
    // q161: maximum drawdown — the peak-to-trough loss metric, over
    // daily revenue per return flag: running peak via a cumulative max
    // window (DECIMAL — exact, order-free), drawdown = (peak − v)/peak
    // rounded at 9 per day, then the per-flag max. The daily rollup is
    // partial-aggregable; both windows and the final agg share the
    // flag partitioning (one exchange). The only floats are the
    // per-day division and the final round — same IEEE both engines.
    QDef(
      "q161_max_drawdown",
      (s, dir) => {
        val daily = Tables(s, dir).lineitem
          .groupBy(col("l_returnflag"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .as("rev"))
        val runPeak = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("peak", max(col("rev")).over(runPeak))
          .withColumn("dd", round((col("peak") - col("rev")).cast("double")
            / col("peak").cast("double"), 9))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_days"),
            round(max(col("dd")), 6).as("max_drawdown"),
            max(col("peak")).cast("double").as("peak_rev"))
      },
      Some("""
        WITH daily AS (SELECT l_returnflag,
                         strftime(l_shipdate, '%Y-%m-%d') AS day,
                         SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                           AS rev
                       FROM lineitem GROUP BY 1, 2),
        p AS (SELECT l_returnflag, rev,
                     MAX(rev) OVER (PARTITION BY l_returnflag
                       ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS peak
              FROM daily)
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(MAX(ROUND(CAST(peak - rev AS DOUBLE)
                               / CAST(peak AS DOUBLE), 9)), 6)
                 AS max_drawdown,
               CAST(MAX(peak) AS DOUBLE) AS peak_rev
        FROM p GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q164: autocorrelation (ACF at lags 1 and 7) of daily revenue per
    // return flag — the seasonality diagnostic feeding q136's profile
    // choice. Pairs (day, day−k) come from a self-join of the TINY
    // daily rollup on the exact date offset (never the fact table);
    // every moment accumulates in DECIMAL — products of two exact
    // 2-decimal sums are exact 4-decimal values — so r is one IEEE
    // expression over exact inputs (q126's recipe), nullif-guarded,
    // round 6.
    QDef(
      "q164_autocorrelation",
      (s, dir) => {
        val daily = Tables(s, dir).lineitem
          .groupBy(col("l_returnflag"), to_date(col("l_shipdate")).as("d"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .as("rev"))
          .ckpt() // both sides of both lag joins
        val lagged = daily.select(col("l_returnflag"), col("d"),
          col("rev").as("prev"))
        def acf(k: Int) = daily.as("c")
          .join(lagged.as("p"),
            col("c.l_returnflag") === col("p.l_returnflag") &&
              col("c.d") === expr(s"p.d + interval $k days"))
          .groupBy(col("c.l_returnflag").as("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("c.rev")).as("sx"), sum(col("p.prev")).as("sy"),
            sum((col("c.rev") * col("p.prev")).cast(DecimalType(38, 4)))
              .as("sxy"),
            sum((col("c.rev") * col("c.rev")).cast(DecimalType(38, 4)))
              .as("sxx"),
            sum((col("p.prev") * col("p.prev")).cast(DecimalType(38, 4)))
              .as("syy"))
          .select(col("l_returnflag"), lit(k).as("lag_d"), col("n"),
            round((col("n") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              nullif(sqrt((col("n") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
                (col("n") * col("syy").cast("double") -
                  col("sy").cast("double") * col("sy").cast("double"))),
                lit(0.0d)), 6).as("acf"))
        acf(1).unionByName(acf(7))
      },
      Some("""
        WITH daily AS (SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
                         SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                           AS rev
                       FROM lineitem GROUP BY 1, 2),
        m AS (SELECT c.l_returnflag, k.lag_d,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(c.rev) AS DOUBLE) AS sx,
                     CAST(SUM(p.rev) AS DOUBLE) AS sy,
                     CAST(SUM(CAST(c.rev * p.rev AS DECIMAL(38,4)))
                       AS DOUBLE) AS sxy,
                     CAST(SUM(CAST(c.rev * c.rev AS DECIMAL(38,4)))
                       AS DOUBLE) AS sxx,
                     CAST(SUM(CAST(p.rev * p.rev AS DECIMAL(38,4)))
                       AS DOUBLE) AS syy
              FROM (VALUES (1), (7)) k(lag_d),
                   daily c JOIN daily p
                ON c.l_returnflag = p.l_returnflag
               AND c.d = p.d + lag_d * INTERVAL 1 DAY
              GROUP BY 1, 2)
        SELECT l_returnflag, CAST(lag_d AS INTEGER) AS lag_d, n,
               ROUND((n * sxy - sx * sy)
                     / nullif(SQRT((n * sxx - sx * sx)
                                   * (n * syy - sy * sy)), 0), 6) AS acf
        FROM m
      """)),

    // ------------------------------------------------------------------
    // q180: GLOBAL exact percentiles by 2-phase histogram selection —
    // the order-statistic technique q34's per-group window sort cannot
    // give you when there is no group key: a global sort of the fact
    // table is the one plan that never survives 100 TB. The machinery
    // lives in Q.globalExactPercentiles (generalized from this query;
    // q148 shares it): phase 1 bins every value into 1000 equi-width
    // buckets from a broadcast one-row min/max (q104's pattern) and
    // cumulates the ≤1000-row histogram (the only global window);
    // phase 2 locates each target rank's bucket, semi-joins the fact
    // scan down to just those buckets (~0.1% of rows), and ranks
    // WITHIN the bucket — no task ever sorts more than one bucket.
    // The interpolated result equals quantile_cont at round-6 (q34's
    // established contract); ranks and bucket arithmetic are
    // driver-free, everything rides broadcast one-row/6-row relations.
    QDef(
      "q180_global_percentiles",
      (s, dir) => {
        val li = Tables(s, dir).lineitem
        val wide = Q.globalExactPercentiles(li, "l_extendedprice",
          Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"))
        // unpivot the one wide row into the (pct, value_r) long shape
        wide.select(explode(array(Seq("p50", "p90", "p99").map { nm =>
            struct(lit(nm).as("pct"), round(col(nm), 6).as("value_r"))
          }: _*)).as("t"))
          .select(col("t.pct").as("pct"), col("t.value_r").as("value_r"))
      },
      Some("""
        SELECT 'p50' AS pct,
               ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS value_r
        FROM lineitem
        UNION ALL
        SELECT 'p90', ROUND(quantile_cont(l_extendedprice, 0.9), 6)
        FROM lineitem
        UNION ALL
        SELECT 'p99', ROUND(quantile_cont(l_extendedprice, 0.99), 6)
        FROM lineitem
      """)),

    // ------------------------------------------------------------------
    // q186: Welch's unequal-variance t-test — do urgent-priority orders
    // have a different mean value than the rest? The experiment-analysis
    // primitive for continuous metrics (q130's z-test covers
    // proportions). ONE partial-aggregable pass computes both arms'
    // exact decimal moments (n, sum, sum-of-squares — the q126
    // discipline: order-independent bigint/decimal partials, doubles
    // only in the final closed form), so there is no join at all; the
    // Welch t statistic and Satterthwaite df come out of the one-row
    // aggregate. Identical arithmetic text on both sides keeps the
    // double expression bit-aligned; round at 6.
    QDef(
      "q186_welch_ttest",
      (s, dir) => {
        val o = Tables(s, dir).orders.select(
          (col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH").as("hi"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("x"))
        val m = o.agg(
          sum(when(col("hi"), 1L).otherwise(0L)).cast("bigint").as("n1"),
          sum(when(!col("hi"), 1L).otherwise(0L)).cast("bigint").as("n2"),
          sum(when(col("hi"), col("x"))).as("s1d"),
          sum(when(!col("hi"), col("x"))).as("s2d"),
          sum(when(col("hi"), (col("x") * col("x"))
            .cast(DecimalType(38, 4)))).as("ss1d"),
          sum(when(!col("hi"), (col("x") * col("x"))
            .cast(DecimalType(38, 4)))).as("ss2d"))
        m.selectExpr(
            "n1", "n2",
            "cast(s1d as double) as s1", "cast(s2d as double) as s2",
            "cast(ss1d as double) as ss1", "cast(ss2d as double) as ss2")
          .selectExpr(
            "n1", "n2",
            "s1 / n1 as m1", "s2 / n2 as m2",
            "(ss1 - s1 * s1 / n1) / nullif(n1 - 1, 0) / n1 as se1",
            "(ss2 - s2 * s2 / n2) / nullif(n2 - 1, 0) / n2 as se2")
          .selectExpr(
            "n1", "n2",
            "round(m1, 6) as mean_hi", "round(m2, 6) as mean_lo",
            "round((m1 - m2) / sqrt(se1 + se2), 6) as t_stat",
            "round((se1 + se2) * (se1 + se2) / " +
              "(se1 * se1 / nullif(n1 - 1, 0)" +
              " + se2 * se2 / nullif(n2 - 1, 0)), 6) as df",
            "cast(abs((m1 - m2) / sqrt(se1 + se2)) > 1.96d as boolean)" +
              " as significant")
      },
      Some("""
        WITH m AS (
          SELECT CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN NOT hi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2,
                 CAST(SUM(CASE WHEN hi THEN x END) AS DOUBLE) AS s1,
                 CAST(SUM(CASE WHEN NOT hi THEN x END) AS DOUBLE) AS s2,
                 CAST(SUM(CASE WHEN hi THEN CAST(x * x AS DECIMAL(38,4))
                   END) AS DOUBLE) AS ss1,
                 CAST(SUM(CASE WHEN NOT hi
                   THEN CAST(x * x AS DECIMAL(38,4)) END) AS DOUBLE) AS ss2
          FROM (SELECT o_orderpriority IN ('1-URGENT', '2-HIGH') AS hi,
                       CAST(o_totalprice AS DECIMAL(18,2)) AS x
                FROM orders)),
        d AS (SELECT n1, n2, s1 / n1 AS m1, s2 / n2 AS m2,
                     (ss1 - s1 * s1 / n1) / NULLIF(n1 - 1, 0) / n1 AS se1,
                     (ss2 - s2 * s2 / n2) / NULLIF(n2 - 1, 0) / n2 AS se2
              FROM m)
        SELECT n1, n2,
               ROUND(m1, 6) AS mean_hi, ROUND(m2, 6) AS mean_lo,
               ROUND((m1 - m2) / SQRT(se1 + se2), 6) AS t_stat,
               ROUND((se1 + se2) * (se1 + se2)
                 / (se1 * se1 / NULLIF(n1 - 1, 0)
                    + se2 * se2 / NULLIF(n2 - 1, 0)), 6) AS df,
               ABS((m1 - m2) / SQRT(se1 + se2)) > 1.96 AS significant
        FROM d
      """)),

    // ------------------------------------------------------------------
    // q261: k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    // et al. 2006) — the privacy gate a governed training corpus runs
    // before release: group customers by their quasi-identifier tuple
    // (nation, market segment, account-balance bucket) and report, for
    // each candidate k, how many equivalence classes and rows fall
    // below the k-anonymity bar, plus the corpus-wide minimum class
    // size and minimum l-diversity of the sensitive attribute (exact
    // account balance within a class — a bucket that maps to one
    // distinct balance re-identifies even when k is satisfied).
    //
    // Scale: ONE quasi-identifier aggregation over the table (partial
    // agg map-side); the per-k report is a conditional-sum WIDE ROW
    // off the class relation (q229's discipline — the class relation
    // is QI-cardinality-bounded, never the corpus), unpivoted by a
    // 4-row stack with the totals riding a 1-row broadcast. All
    // integers except one rounded division.
    QDef(
      "q261_k_anonymity",
      (s, dir) => {
        val classes = Tables(s, dir).customer
          .groupBy(col("c_nationkey"), col("c_mktsegment"),
            expr("cast(floor(c_acctbal / 1000.0d) as bigint)")
              .as("bal_bucket"))
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("c_acctbal")).as("l"))
          .ckpt() // QI-bounded; feeds the wide row AND the totals
        val tot = classes.agg(sum(col("cnt")).as("n_total"),
          min(col("cnt")).as("min_class_size"),
          min(col("l")).as("min_l_diversity"))
        val ks = Seq(2, 5, 10, 20)
        val wide = classes.agg(
          ks.flatMap(k => Seq(
            sum(when(col("cnt") < k, 1L).otherwise(0L)).as(s"c$k"),
            sum(when(col("cnt") < k, col("cnt")).otherwise(0L))
              .as(s"r$k"))).head,
          ks.flatMap(k => Seq(
            sum(when(col("cnt") < k, 1L).otherwise(0L)).as(s"c$k"),
            sum(when(col("cnt") < k, col("cnt")).otherwise(0L))
              .as(s"r$k"))).tail: _*)
        wide.selectExpr(s"""stack(4, ${ks.map(k =>
            s"${k}L, c$k, r$k").mkString(", ")})
            as (k, n_classes_below, n_rows_below)""")
          .crossJoin(broadcast(tot))
          .select(col("k"), col("n_classes_below"), col("n_rows_below"),
            expr("round(cast(n_rows_below as double) / n_total, 6)")
              .as("pct_rows_below_r"),
            col("min_class_size"), col("min_l_diversity"))
          .orderBy(col("k"))
      },
      Some("""
        WITH cl AS (SELECT c_nationkey, c_mktsegment,
                      CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)
                        AS bal_bucket,
                      CAST(COUNT(*) AS BIGINT) AS cnt,
                      CAST(COUNT(DISTINCT c_acctbal) AS BIGINT) AS l
                    FROM customer GROUP BY 1, 2, 3),
        t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
                     MIN(cnt) AS min_class_size,
                     MIN(l) AS min_l_diversity
              FROM cl),
        x AS (SELECT kk.k,
                CAST(SUM(CASE WHEN cnt < kk.k THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_classes_below,
                CAST(SUM(CASE WHEN cnt < kk.k THEN cnt ELSE 0 END)
                  AS BIGINT) AS n_rows_below
              FROM cl, (SELECT unnest([2, 5, 10, 20]::BIGINT[]) AS k) kk
              GROUP BY 1)
        SELECT x.k, x.n_classes_below, x.n_rows_below,
               ROUND(CAST(x.n_rows_below AS DOUBLE) / t.n_total, 6)
                 AS pct_rows_below_r,
               t.min_class_size, t.min_l_diversity
        FROM x, t
        ORDER BY x.k
      """))
  )
}
