package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Ckpt._

/** Distributed connected components via alternating large-star /
  * small-star contraction (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC 2014).
  *
  * Naive min-label propagation needs O(diameter) rounds — the sf0.1
  * similarity graph already has a diameter-12 component, and diameter
  * grows with corpus size, so per-hop propagation is the wrong shape at
  * 100 TB. Star contraction converges in O(log² n) rounds regardless of
  * diameter; every step is one shuffle keyed by node id (a window
  * minimum over the neighborhood), exactly the partitioning a
  * 1000-executor cluster wants.
  *
  * The driver loop is control-plane only (same pattern as GraphX
  * Pregel). Per-round cost is two jobs: two full ls∘ss alternations
  * fuse into a single checkpointed action, a cheap scan computes the
  * convergence fingerprint (count, Σu, Σv), and the exact fixpoint test
  * (symmetric difference empty — a fingerprint alone could
  * false-converge and poison the labels) is only paid on rounds whose
  * fingerprint repeats.
  */
object ConnectedComponents {

  /** Large-star: every node connects its strictly-larger neighbors to
    * the minimum of its closed neighborhood. Emitted edges (v, m) keep
    * v > u >= m, so no self-loops can appear. Output is a bag, not a
    * set — duplicate edges never change a window MIN, so dedup is
    * deferred to the end of the fused round (≤4× growth per round).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val und = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    und
      .withColumn("m",
        least(min(col("v")).over(Window.partitionBy(col("u"))), col("u")))
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star: orient edges high→low; every node connects itself and
    * its smaller neighbors to the minimum of those neighbors. The
    * (m, m) self-loop the explode emits for v = m is filtered out.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .withColumn("m", min(col("v")).over(Window.partitionBy(col("u"))))
      .select(explode(array(
        struct(col("v").as("u"), col("m").as("v")),
        struct(col("u").as("u"), col("m").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .where(col("u") =!= col("v"))
  }

  private def round(e: DataFrame): DataFrame =
    smallStar(largeStar(smallStar(largeStar(e)))).distinct()
  // (4 fused alternations per round was measured SLOWER at sf0.1 —
  // 4.3 s vs 3.3 s: the deeper per-action plan costs more than the
  // saved checkpoint round. Two alternations is the sweet spot.)

  /** @param edges two columns `u`, `v` of numeric node ids (undirected,
    *               any orientation); both are cast to LONG, so the
    *               result schema is (u LONG, v LONG) on every path
    * @return one row `(u, v)` per NON-ROOT node: u = node, v = the
    *         minimum node id of u's component. Component minima (roots)
    *         and isolated nodes do not appear on the u side. The result
    *         is cached (it is both the loop fixpoint and what callers
    *         re-execute downstream plans against).
    */
  def run(edges: DataFrame,
      smallGraphEdges: Long = 1000 * 1000): DataFrame = {
    // Node ids normalize to LONG up front so BOTH paths below emit the
    // same (u, v): LongType schema regardless of edge count — a
    // path-dependent schema from one utility would be a trap for any
    // caller that pins a schema or crosses the threshold as data grows.
    //
    // localCheckpoint (not persist): each round references its input ~4×,
    // so without RDD-level lineage truncation the analyzed plan grows
    // 4^rounds and PLANNING, not execution, dominates (observed 21 s at
    // sf0.1 with persist vs ~2 s with checkpoint truncation).
    var e = edges.select(col("u").cast("long"), col("v").cast("long"))
      .where(col("u") =!= col("v")).distinct().ckpt()
    val nEdges = e.count()
    if (nEdges == 0) return e
    // Small-graph endgame (the standard hybrid in distributed CC):
    // star contraction shrinks the surviving graph geometrically, so the
    // closing rounds always run on a graph that fits one task — at which
    // point O(log²) more Catalyst plans are pure planning/job overhead
    // (measured ~2 s for a 1.5k-edge graph at sf0.1, ALL of it
    // control-plane). Below the threshold, fold the edge list into one
    // partition and run exact min-label union-find in a single narrow
    // mapPartitions job: same answer (min-union keeps every root the
    // component minimum), deterministic for any edge order, one job.
    // Sizing is bounded by the NODE map, not the edge bytes: 1M edges
    // can touch 2M distinct nodes, and the LongMap's two long arrays at
    // the next power-of-two capacity are ~64 MB (transiently more while
    // rehashing) — comfortably inside a task's working memory, an order
    // under the ~1 GB where a single narrow task would become the OOM
    // risk. Larger graphs take the shuffled star-contraction loop below
    // (tests pin smallGraphEdges = 0 to exercise it at any size).
    if (nEdges <= smallGraphEdges) {
      val spark = e.sparkSession
      import spark.implicits._
      return e.as[(Long, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          val parent = new scala.collection.mutable.LongMap[Long]()
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
            var c = x
            while (parent.getOrElse(c, c) != r) {
              val nx = parent(c); parent.update(c, r); c = nx
            }
            r
          }
          it.foreach { case (u, v) =>
            val ru = find(u); val rv = find(v)
            if (ru != rv) parent.update(math.max(ru, rv), math.min(ru, rv))
          }
          // snapshot keys first: find() path-compresses (mutates) and
          // LongMap iteration is not mutation-safe
          val nodes = parent.keysIterator.toArray
          nodes.iterator.map(n => (n, find(n))).filter(p => p._1 != p._2)
        }
        .toDF("u", "v")
        .ckpt()
    }
    var fp: Option[Seq[Any]] = None
    var converged = false
    var rounds = 0
    // 25 fused rounds (50 alternations) is a safety rail only: O(log² n)
    // bounds real convergence far below it (sf0.1 hits the fixpoint in 2
    // fused rounds; the 3rd detects it). At test SFs the ~15 tiny
    // control-plane jobs dominate q54's wall time — at production SF the
    // per-round shuffles dominate and the job overhead amortizes.
    while (!converged && rounds < 25) {
      // lazy checkpoint: the fingerprint aggregation below is the action
      // that materializes the round, so checkpoint + fingerprint cost
      // ONE job per round instead of two (at test SF the loop is pure
      // job overhead, so this is a 3-job saving; at scale it halves the
      // control-plane passes over each round's edge set).
      val next = round(e).ckpt(eager = false)
      val nfp = Some(next.agg(count(lit(1)), sum(col("u")), sum(col("v")))
        .head.toSeq)
      converged = fp == nfp &&
        next.except(e).union(e.except(next)).isEmpty
      e = next
      fp = nfp
      rounds += 1
    }
    require(converged, s"star contraction did not converge in $rounds rounds")
    e
  }
}
