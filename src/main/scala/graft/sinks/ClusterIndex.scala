package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Ckpt._
import graft.queries.DedupQueries

/** Persisted near-dup CLUSTER index — q54's star-contraction clusters
  * (and q278/q279's dedup-mass rollup on top of them) maintained
  * incrementally, so a continuous ingest updates cluster structure in
  * O(batch + touched clusters) instead of re-clustering the corpus
  * each wave (the round-14 close-out gap: the streaming dashboard's
  * uniqueness arm was its one O(corpus-so-far) recompute).
  *
  * Layout (main trees + the uniform gen-scoped delta contract):
  * {{{
  *   <dir>/shingles/  (source, shingle, doc_id, n)   pair discovery
  *   <dir>/assign/    (doc_id, cluster_id)           non-root members
  *   <dir>/clusters/  (cluster_id, source, csz)      ADDITIVE sizes
  *   <dir>/srcstats/  (source, n_docs)               ADDITIVE counts
  *   <dir>/docs/      (doc_id, source)               indexed-id spine
  * }}}
  *
  * Exactness: the edge rule is the SHARED q54 definition
  * ([[DedupQueries.jaccardPairsOf]]'s shingle rows, within-source
  * pairs, exact trigram Jaccard ≥ 0.02) and labels are min-doc-id
  * connected components, so after any append sequence the index state
  * equals the full q54 recompute over the accumulated corpus
  * (ClusterIndexSpec pins assignments AND the report row-for-row,
  * including a wave that merges two previously separate clusters).
  * The union-find argument: a doc's shingle set never changes, so the
  * accumulated pair set is exactly the union of per-wave new-pair
  * sets (pairs with ≥1 endpoint in the wave's batch), and components
  * of a union of edge sets can be folded in incrementally by
  * contracting each wave's edges over the current labels — existing
  * labels are component minima, so the min over a merged contracted
  * component IS the min doc_id of the full merged component.
  *
  * Incremental merge per batch (one claimed generation):
  *  1. batch shingle rows join the persisted postings (and themselves)
  *     on (source, shingle) — every NEW pair has a batch endpoint, so
  *     this discovers exactly the pair-set increment; cost is
  *     O(batch × shingle-collision fanout), never corpus².
  *  2. edge endpoints map to current cluster labels (id-pruned fetch;
  *     a doc's CURRENT row is the one whose cluster is live — label
  *     reuse is impossible because labels are component minima and a
  *     dead label's doc now lives in a smaller-id component, so no
  *     generation ordering is needed).
  *  3. connected components over the CONTRACTED edge set (bounded by
  *     the wave's edges, not the corpus) yield the new labels.
  *  4. rewrites: relabel rows for members of absorbed clusters only,
  *     additive size rows (+new members, ±absorbed masses, absorbed
  *     labels tombstoned to zero), batch shingle postings, per-source
  *     counts.
  *
  * Replay safety (the uniform [[IndexSink.appendDelta]] contract):
  * unlike the other sinks' deltas, this one is state-DEPENDENT, so a
  * replayed generation must not read its own earlier half-write —
  * every read inside [[appendDelta]] EXCLUDES the generation being
  * written, making the delta a pure function of (prior state, batch)
  * and the gen-subtree overwrite idempotent.
  *
  * Scale posture: shingle postings are the only corpus-sized relation
  * touched per append, and the join is keyed by (source, shingle) —
  * the natural bucketing key; assign/clusters fetches are bounded id
  * sets pushed down as IN filters when small (the TextIndex battery
  * discipline; join fallback above [[PruneCap]]). The report is an
  * additive rollup over the |non-singleton clusters| relation — the
  * per-source tail is the SHARED [[DedupQueries.dedupWeightsTail]].
  */
object ClusterIndex {

  /** Above this many ids a pruned fetch switches from a collected
    * `IN` filter (parquet row-group pushdown) to a broadcast join —
    * an IN list this long costs more in plan size than it saves in
    * skipped row groups.
    */
  private val PruneCap = 10000

  // per-doc set size from the generator, not a count() window — the
  // window paid a full Exchange+Sort of the shingle relation before
  // every build/append (guide §2.4; same switch as jaccardPairsOf)
  private def shinglesWithN(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      graft.functions.Shingles.shinglesWithCount(col("text"), 3)
        .as(Seq("shingle", "n")))

  /** Index a (doc_id, source, text) corpus from scratch: clusters via
    * the SHARED q54 assignment, postings range-clustered by shingle
    * (file-level pushdown for probe terms), assignments clustered by
    * cluster id (the member fetch on merges).
    */
  def build(docs0: DataFrame, outDir: String): Unit = {
    val docs = docs0.select(col("doc_id"), col("source"), col("text"))
      .ckpt() // feeds shingles, assignment, sizes, counts
    val full = DedupQueries.clusterAssignmentOf(docs)
      .ckpt() // (doc_id, cluster_id) over ALL docs, singletons = self
    shinglesWithN(docs)
      .repartitionByRange(col("shingle"))
      .sortWithinPartitions(col("shingle"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$outDir/shingles")
    full.where(col("doc_id") =!= col("cluster_id"))
      .repartitionByRange(col("cluster_id"))
      .sortWithinPartitions(col("cluster_id"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$outDir/assign")
    docs.select(col("doc_id"), col("source"))
      .join(full, Seq("doc_id"))
      .groupBy(col("cluster_id"), col("source"))
      .agg(count(lit(1)).as("csz"))
      .where(col("csz") >= 2)
      .write.mode("overwrite").parquet(s"$outDir/clusters")
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$outDir/srcstats")
    docs.select(col("doc_id"), col("source"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(s"$outDir/docs")
  }

  /** Create EMPTY main trees (schema-bearing zero-row parquet) so a
    * streaming caller can route EVERY micro-batch — including the
    * first — through [[appendDelta]] with its batch id as the gen:
    * a first-batch [[build]] would not be replay-idempotent (the
    * retry would have to know to append instead), whereas gen-scoped
    * deltas over an empty base rewrite themselves exactly. No-op when
    * the index already exists.
    */
  def init(spark: SparkSession, outDir: String): Unit = {
    import org.apache.spark.sql.types._
    if (DeltaIO.exists(spark, s"$outDir/srcstats/_SUCCESS")) return
    def empty(schema: StructType): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    empty(StructType(Seq(StructField("source", StringType),
      StructField("shingle", StringType),
      StructField("doc_id", LongType), StructField("n", LongType))))
      .write.mode("overwrite").parquet(s"$outDir/shingles")
    empty(StructType(Seq(StructField("doc_id", LongType),
      StructField("cluster_id", LongType))))
      .write.mode("overwrite").parquet(s"$outDir/assign")
    empty(StructType(Seq(StructField("cluster_id", LongType),
      StructField("source", StringType), StructField("csz", LongType))))
      .write.mode("overwrite").parquet(s"$outDir/clusters")
    empty(StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType))))
      .write.mode("overwrite").parquet(s"$outDir/docs")
    empty(StructType(Seq(StructField("source", StringType),
      StructField("n_docs", LongType))))
      .write.mode("overwrite").parquet(s"$outDir/srcstats")
  }

  /** Incrementally merge a batch of NEW (doc_id, source, text) docs —
    * ids must not already be indexed (the [[DedupIndex.append]]
    * accepted-batch contract). O(batch + touched clusters).
    */
  def append(spark: SparkSession, indexDir: String, batch: DataFrame,
      claim: Option[ClaimPrimitive] = None): Unit =
    appendDelta(spark, indexDir, batch,
      DeltaIO.nextPlainGen(spark, indexDir,
        Seq("shingles", "assign", "clusters", "srcstats", "docs"),
        claim))

  /** Replay-safe gen-scoped [[append]]: all reads exclude generation
    * `gen`, so re-running a failed generation recomputes the same
    * delta from the same prior state and the overwrite heals it.
    */
  def appendDelta(spark: SparkSession, indexDir: String,
      batch: DataFrame, gen: Long): Unit = {
    val b = batch.select(col("doc_id"), col("source"), col("text"))
      .ckpt()
    val bsh = shinglesWithN(b).ckpt()
    val edges = appendEdges(spark, indexDir, bsh, Some(gen)).ckpt()

    val eps = edges.select(col("u").as("doc_id"))
      .union(edges.select(col("v").as("doc_id")))
      .distinct().ckpt()
    val lk = liveAssignments(spark, indexDir, eps, Some(gen)).ckpt()
    val cE = edges
      .join(lk.select(col("doc_id").as("u"),
        col("cluster_id").as("cu")), Seq("u"), "left")
      .join(lk.select(col("doc_id").as("v"),
        col("cluster_id").as("cv")), Seq("v"), "left")
      .select(coalesce(col("cu"), col("u")).as("u"),
        coalesce(col("cv"), col("v")).as("v"), col("source"))
      .where(col("u") =!= col("v"))
      .ckpt()

    val nodes = cE.select(col("u").as("node"), col("source"))
      .union(cE.select(col("v").as("node"), col("source")))
      .distinct().ckpt()
    val cc = graft.core.ConnectedComponents.run(
      cE.select(col("u"), col("v")))
    val labels = nodes
      .join(cc.select(col("u").as("node"), col("v").as("lbl")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("lbl"), col("node")).as("lbl"),
        col("source"))
      .ckpt()

    // current sizes of the contracted nodes that are live clusters
    // (absent ⇒ the node is a bare doc: a batch doc or an existing
    // singleton — either way it contributes 1 new member)
    val sz = labels
      .join(liveSizes(spark, indexDir,
          labels.select(col("node")).distinct(), Some(gen))
          .select(col("cluster_id").as("node"), col("csz")),
        Seq("node"), "left")
      .ckpt()

    val changed = sz
      .where(col("csz").isNotNull && col("lbl") =!= col("node"))
      .select(col("node").as("cluster_id"), col("lbl"), col("csz"),
        col("source"))
      .ckpt() // absorbed live clusters: bounded by the wave's edges
    val memberRelabels = keyFiltered(
        readRel(spark, indexDir, "assign",
          Seq("doc_id", "cluster_id"), Some(gen)),
        "cluster_id", changed.select(col("cluster_id")))
      .join(broadcast(changed.select(col("cluster_id"), col("lbl"))),
        Seq("cluster_id"))
      .select(col("doc_id"), col("lbl").as("cluster_id"))
    val nodeRows = labels.where(col("lbl") =!= col("node"))
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
    val assignDelta = memberRelabels.unionByName(nodeRows)

    val moves = changed.select(explode(array(
        struct(col("cluster_id"), (-col("csz")).as("d")),
        struct(col("lbl").as("cluster_id"), col("csz").as("d"))))
          .as("e"), col("source"))
      .select(col("e.cluster_id"), col("source"), col("e.d"))
    val bareAdds = sz.where(col("csz").isNull)
      .select(col("lbl").as("cluster_id"), col("source"),
        lit(1L).as("d"))
    val clustersDelta = moves.unionByName(bareAdds)
      .groupBy(col("cluster_id"), col("source"))
      .agg(sum(col("d")).as("csz"))

    DeltaIO.writeGen(
      bsh.select(col("source"), col("shingle"), col("doc_id"), col("n")),
      indexDir, "shingles", gen)
    DeltaIO.writeGen(assignDelta.coalesce(1), indexDir, "assign", gen)
    DeltaIO.writeGen(clustersDelta.coalesce(1), indexDir, "clusters",
      gen)
    DeltaIO.writeGen(
      b.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .coalesce(1),
      indexDir, "srcstats", gen)
    DeltaIO.writeGen(b.select(col("doc_id"), col("source")).coalesce(1),
      indexDir, "docs", gen)
  }

  /** The wave's NEW pair set as (u, v, source) edges: batch×index
    * plus batch×batch, the q54 pair rule restated asymmetrically —
    * exposed for the plan gates ([[SinkPlans]]) with the batch's
    * shingle relation precomputed.
    */
  /** [[appendEdges]] from raw batch docs — the plan-gate entry point
    * ([[SinkPlans]]): the same edge-discovery plan [[appendDelta]]
    * executes, without the delta writes.
    */
  private[sinks] def appendEdgesPlan(spark: SparkSession,
      indexDir: String, batch: DataFrame): DataFrame =
    appendEdges(spark, indexDir,
      shinglesWithN(batch.select(col("doc_id"), col("source"),
        col("text"))).ckpt(),
      None)

  private[sinks] def appendEdges(spark: SparkSession, indexDir: String,
      bsh: DataFrame, excludeGen: Option[Long]): DataFrame = {
    val idx = readRel(spark, indexDir, "shingles",
      Seq("source", "shingle", "doc_id", "n"), excludeGen)
    def pairs(a: DataFrame, bb: DataFrame, ordered: Boolean) = {
      val cond = col("a.source") === col("b.source") &&
        col("a.shingle") === col("b.shingle") &&
        (if (ordered) col("a.doc_id") < col("b.doc_id") else lit(true))
      a.alias("a").join(bb.alias("b"), cond)
        .groupBy(col("a.doc_id").as("u"), col("b.doc_id").as("v"),
          col("a.n").as("n_a"), col("b.n").as("n_b"),
          col("a.source").as("source"))
        .agg(count(lit(1)).as("common"))
        .select(col("u"), col("v"), col("source"),
          expr("common / (n_a + n_b - common)").as("jaccard"))
    }
    pairs(idx, bsh, ordered = false)
      .unionByName(pairs(bsh, bsh, ordered = true))
      .where(col("jaccard") >= 0.02)
      .select(col("u"), col("v"), col("source"))
  }

  /** Current (doc_id, cluster_id) for a bounded id set: fetched rows
    * keep only those whose cluster is LIVE — a doc's stale rows all
    * reference absorbed (zero-mass) labels, so liveness IS currency
    * and no generation ordering is needed (see the object scaladoc).
    */
  private def liveAssignments(spark: SparkSession, indexDir: String,
      ids: DataFrame, excludeGen: Option[Long]): DataFrame = {
    val rows = keyFiltered(
      readRel(spark, indexDir, "assign", Seq("doc_id", "cluster_id"),
        excludeGen),
      "doc_id", ids)
    rows.join(
      liveSizes(spark, indexDir,
        rows.select(col("cluster_id")).distinct(), excludeGen)
        .select(col("cluster_id")),
      Seq("cluster_id"), "left_semi")
      .select(col("doc_id"), col("cluster_id"))
  }

  /** Net (cluster_id, csz > 0) over the additive size rows, pruned to
    * a bounded cluster-id set.
    */
  private def liveSizes(spark: SparkSession, indexDir: String,
      clusterIds: DataFrame, excludeGen: Option[Long]): DataFrame =
    keyFiltered(
      readRel(spark, indexDir, "clusters",
        Seq("cluster_id", "source", "csz"), excludeGen),
      "cluster_id", clusterIds)
      .groupBy(col("cluster_id"))
      .agg(sum(col("csz")).as("csz"))
      .where(col("csz") > 0)

  /** Full (doc_id, cluster_id) view ≡ q54's assignment over the
    * accumulated corpus (singletons = self): live rows plus the
    * self-coalesce over every indexed doc id — the audit/export
    * surface, one corpus-sized join.
    */
  def assignments(spark: SparkSession, indexDir: String): DataFrame = {
    val live = readRel(spark, indexDir, "clusters",
        Seq("cluster_id", "source", "csz"), None)
      .groupBy(col("cluster_id")).agg(sum(col("csz")).as("csz"))
      .where(col("csz") > 0)
      .select(col("cluster_id"))
    val current = readRel(spark, indexDir, "assign",
        Seq("doc_id", "cluster_id"), None)
      .join(live, Seq("cluster_id"), "left_semi")
    readRel(spark, indexDir, "docs", Seq("doc_id", "source"), None)
      .select(col("doc_id"))
      .join(current, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** q278's dedup-mass report from the maintained aggregates — the
    * [[DedupQueries.dedupWeights]] contract (source, n_docs,
    * effective_mass_r, raw_share_r, dedup_share_r, uniqueness_r)
    * WITHOUT re-clustering: per-source effective mass is
    * Σ_clusters csz · round(1/csz, 12) + (n_docs − Σ csz) · 1 (each
    * singleton's weight is exactly 1), algebraically identical to the
    * per-doc sum, with the shared tail doing the share arithmetic.
    * Cost: one pass over the |non-singleton clusters| relation plus
    * the |sources| rollup — O(clusters), never O(corpus).
    */
  def report(spark: SparkSession, indexDir: String): DataFrame = {
    val cl = readRel(spark, indexDir, "clusters",
        Seq("cluster_id", "source", "csz"), None)
      .groupBy(col("cluster_id"), col("source"))
      .agg(sum(col("csz")).as("csz"))
      .where(col("csz") > 0)
    val perSrc = cl.select(col("source"), col("csz"),
        (col("csz").cast("decimal(20,0)") *
          expr("cast(round(1.0d / csz, 12) as decimal(32, 12))"))
          .as("effc"))
      .groupBy(col("source"))
      .agg(sum(col("effc")).as("eff_c"),
        sum(col("csz")).as("n_clustered"))
    val agg = readRel(spark, indexDir, "srcstats",
        Seq("source", "n_docs"), None)
      .groupBy(col("source")).agg(sum(col("n_docs")).as("n_docs"))
      .join(perSrc, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        (coalesce(col("eff_c"), lit(0).cast("decimal(38,12)")) +
          (col("n_docs") - coalesce(col("n_clustered"), lit(0L)))
            .cast("decimal(38,12)")).as("eff"))
    DedupQueries.dedupWeightsTail(agg)
  }

  /** Fold the accumulated delta generations into fresh main trees at
    * `dstDir` (the other sinks' compact contract): shingle postings
    * re-clustered by shingle, CURRENT assignments only (stale rows —
    * those referencing absorbed clusters — dropped, so the one-live-
    * row-per-doc invariant is re-established at zero delta depth),
    * cluster sizes NETTED (tombstoned ids disappear), counts summed.
    * Readers of `dstDir` see identical assignments/report
    * (ClusterIndexSpec pins both); append continues from gen -1.
    * Run it when the gen listing itself is the cost — the same
    * O(#appends) trigger as every other sink's compact.
    */
  def compact(spark: SparkSession, srcDir: String,
      dstDir: String): Unit = {
    val live = readRel(spark, srcDir, "clusters",
        Seq("cluster_id", "source", "csz"), None)
      .groupBy(col("cluster_id"), col("source"))
      .agg(sum(col("csz")).as("csz"))
      .where(col("csz") > 0)
      .ckpt() // feeds the netted tree AND the assignment currency check
    readRel(spark, srcDir, "shingles",
        Seq("source", "shingle", "doc_id", "n"), None)
      .repartitionByRange(col("shingle"))
      .sortWithinPartitions(col("shingle"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$dstDir/shingles")
    readRel(spark, srcDir, "assign", Seq("doc_id", "cluster_id"), None)
      .join(live.select(col("cluster_id")), Seq("cluster_id"),
        "left_semi")
      .repartitionByRange(col("cluster_id"))
      .sortWithinPartitions(col("cluster_id"), col("doc_id"))
      .select(col("doc_id"), col("cluster_id"))
      .write.mode("overwrite").parquet(s"$dstDir/assign")
    live.write.mode("overwrite").parquet(s"$dstDir/clusters")
    readRel(spark, srcDir, "srcstats", Seq("source", "n_docs"), None)
      .groupBy(col("source")).agg(sum(col("n_docs")).as("n_docs"))
      .write.mode("overwrite").parquet(s"$dstDir/srcstats")
    readRel(spark, srcDir, "docs", Seq("doc_id", "source"), None)
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(s"$dstDir/docs")
  }

  // ------------------------------------------------------------------

  /** Main tree + delta generations for `rel`, optionally EXCLUDING one
    * generation (the replay-safety read inside [[appendDelta]]).
    */
  private[sinks] def readRel(spark: SparkSession, dir: String,
      rel: String, cols: Seq[String],
      excludeGen: Option[Long]): DataFrame = {
    val main = spark.read.parquet(s"$dir/$rel").select(cols.map(col): _*)
    val delta = s"$dir/${rel}_delta"
    if (!DeltaIO.exists(spark, delta)) main
    else {
      val d0 = spark.read.parquet(delta)
      val d = excludeGen.map(g => d0.where(col("gen") =!= g))
        .getOrElse(d0)
      main.unionByName(d.select(cols.map(col): _*))
    }
  }

  /** Membership fetch on `key`: a collected IN filter below
    * [[PruneCap]] ids (parquet min/max row-group pushdown on the
    * key-sorted trees), a broadcast join above it. `ids` must be a
    * bounded one-column LONG relation.
    */
  private def keyFiltered(rel: DataFrame, key: String,
      ids: DataFrame): DataFrame = {
    val head = ids.limit(PruneCap + 1).collect().map(_.getLong(0))
    if (head.length <= PruneCap) rel.where(col(key).isin(head: _*))
    else rel.join(
      broadcast(ids.toDF(key).distinct()), Seq(key))
  }
}
