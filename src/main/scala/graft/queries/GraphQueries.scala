package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Beyond-flat-relational analytics: dominance frontiers (skyline) and
  * graph structure (degree-oriented triangle counting) — both expressed
  * as shuffles on derived keys so the plans shard at 100 TB, with the
  * naive O(n^2)/O(sum d^2) formulations reserved for the DuckDB oracle
  * where n is small.
  */
object GraphQueries {

  val defs: Seq[QDef] = Seq(
    // ------------------------------------------------------------------
    // q96: 2-D skyline (Pareto frontier) over part: minimize
    // p_retailprice, maximize p_size. The oracle is the textbook
    // NOT EXISTS dominance test (O(n^2), fine for DuckDB at gate SF);
    // the engine plan is the distributed two-phase sweep:
    //   1. bucket prices ($100 ranges) and take max(size) per bucket —
    //      a partial-agg shuffle producing a tiny bucket table;
    //   2. running max over strictly-lower buckets (a window over the
    //      ~hundreds-row bucket table) broadcast back as each bucket's
    //      cross-bucket threshold;
    //   3. within each bucket, a bucket-partitioned RANGE window
    //      computes the max size among strictly cheaper rows.
    // A row is on the frontier iff its size beats every strictly
    // cheaper row (cross-bucket threshold + in-bucket window) and no
    // equal-priced row has a larger size. No global sort ever happens
    // on the fact table — the only full-relation ordering lives on the
    // bucket aggregate.
    // Prices are exact 2-decimal values, so round(price*100) is an
    // order-preserving exact integer key (a bare cast would truncate
    // 900.1*100 = 90009.999... to 90009).
    QDef(
      "q96_skyline",
      (s, dir) => {
        val p = Tables(s, dir).part
          .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
          .withColumn("cents", round(col("p_retailprice") * 100).cast("bigint"))
          .withColumn("bucket", (col("cents") / lit(10000L)).cast("bigint"))
        val bmax = p.groupBy(col("bucket")).agg(max(col("p_size")).as("bsize"))
        // tiny relation: one row per $100 price bucket
        val prevBuckets = Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val bthr = bmax
          .withColumn("prev_max", max(col("bsize")).over(prevBuckets))
          .select(col("bucket"), col("prev_max"))
        val cheaperInBucket = Window.partitionBy(col("bucket"))
          .orderBy(col("cents")).rangeBetween(Window.unboundedPreceding, -1)
        // same partitioning + ordering as cheaperInBucket, so both
        // windows share one exchange and one sort; the RANGE (0, 0)
        // frame is exactly the equal-price peer group.
        val samePrice = Window.partitionBy(col("bucket"))
          .orderBy(col("cents"))
          .rangeBetween(Window.currentRow, Window.currentRow)
        p.join(broadcast(bthr), Seq("bucket"), "left")
          .withColumn("in_max", max(col("p_size")).over(cheaperInBucket))
          .withColumn("eq_max", max(col("p_size")).over(samePrice))
          .withColumn("strict_max",
            greatest(coalesce(col("in_max"), lit(Int.MinValue)),
              coalesce(col("prev_max"), lit(Int.MinValue))))
          .where(col("p_size") > col("strict_max") &&
            col("p_size") === col("eq_max"))
          .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      },
      Some("""
        SELECT p_partkey, p_retailprice, p_size FROM part p
        WHERE NOT EXISTS (
          SELECT 1 FROM part q
          WHERE q.p_retailprice <= p.p_retailprice
            AND q.p_size >= p.p_size
            AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      """)),

    // ------------------------------------------------------------------
    // q100: degree-oriented triangle counting on the part co-occurrence
    // graph (edge = two parts shipped in the same order, thinned to
    // high-quantity lines). The orientation trick is THE scale move:
    // pointing every edge from its lower-(degree, id) endpoint to the
    // higher one makes each triangle countable from exactly one wedge
    // (centered at its minimum-(degree, id) vertex) and bounds wedge
    // generation by sum(out_deg^2) with out_deg <= sqrt(2m) — the
    // classic bound that keeps hub vertices from exploding the join.
    // Wedges close against the canonical edge set by equi-join on the
    // (x, y) pair — the shard key at scale. All four summary numbers
    // are 1-row aggregates cross-joined in-plan (no driver .count()).
    QDef(
      "q100_triangles",
      (s, dir) => {
        val li = Tables(s, dir).lineitem
          .where(col("l_quantity") >= 40)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        // canonical undirected edges x < y; localCheckpoint: feeds the
        // degree count, the orientation join, and the wedge-closing
        // join — a 100 TB pass would persist the edge list anyway.
        val edges = li.as("a")
          .join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("x"), col("b.l_partkey").as("y"))
          .distinct()
          .localCheckpoint()
        val deg = edges.select(col("x").as("v"))
          .unionByName(edges.select(col("y").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("d"))
          .localCheckpoint()
        val oriented = edges
          .join(deg.select(col("v").as("x"), col("d").as("dx")), "x")
          .join(deg.select(col("v").as("y"), col("d").as("dy")), "y")
          .select(
            when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")),
              col("x")).otherwise(col("y")).as("s"),
            when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")),
              col("y")).otherwise(col("x")).as("t"))
          // feeds both sides of the wedge self-join
          .localCheckpoint()
        val wedges = oriented.as("o1")
          .join(oriented.as("o2"),
            col("o1.s") === col("o2.s") && col("o1.t") < col("o2.t"))
          .select(least(col("o1.t"), col("o2.t")).as("x"),
            greatest(col("o1.t"), col("o2.t")).as("y"))
        val nTri = wedges.join(edges, Seq("x", "y"))
          .agg(count(lit(1)).as("n_triangles"))
        val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
        val nEdges = edges.agg(count(lit(1)).as("n_edges"))
        val nWedges = deg.agg(sum(expr("(d * (d - 1)) div 2")).as("n_wedges"))
        nNodes.crossJoin(nEdges).crossJoin(nTri).crossJoin(nWedges)
          .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
            round(lit(3.0) * col("n_triangles") /
              nullif(col("n_wedges"), lit(0L)), 6).as("clustering"))
      },
      Some("""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_quantity >= 40),
        edges AS (SELECT a.l_partkey AS x, b.l_partkey AS y
                  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
                  GROUP BY 1, 2),
        deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d
                FROM (SELECT x AS v FROM edges
                      UNION ALL SELECT y FROM edges) u GROUP BY 1),
        o AS (SELECT CASE WHEN (dx.d, e.x) < (dy.d, e.y)
                          THEN e.x ELSE e.y END AS s,
                     CASE WHEN (dx.d, e.x) < (dy.d, e.y)
                          THEN e.y ELSE e.x END AS t
              FROM edges e JOIN deg dx ON dx.v = e.x
                           JOIN deg dy ON dy.v = e.y),
        wedge AS (SELECT LEAST(o1.t, o2.t) AS x, GREATEST(o1.t, o2.t) AS y
                  FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t),
        tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
                FROM wedge w JOIN edges e ON e.x = w.x AND e.y = w.y),
        wd AS (SELECT SUM(d * (d - 1) // 2) AS n_wedges FROM deg)
        SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
               CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
               (SELECT n_triangles FROM tri) AS n_triangles,
               round(3.0 * (SELECT n_triangles FROM tri) /
                     nullif((SELECT n_wedges FROM wd), 0), 6) AS clustering
      """))
  )
}
