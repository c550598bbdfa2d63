package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Ckpt._

/** Persisted IVF (inverted-file) vector index — q48's in-query index as
  * a durable LIBRARY artifact: build once, write the coarse quantizer
  * and the cell-partitioned postings to parquet, then serve any number
  * of query batches without touching the raw corpus again.
  *
  * Layout:
  * {{{
  *   <dir>/centroids/            (cent_id, cv)  — k rows, broadcastable
  *   <dir>/postings/cell=<c>/    (vec_id, v)    — hive-partitioned
  * }}}
  *
  * Scale shape: `search` joins the tiny (qid, cell) probe relation into
  * the postings on the PARTITION column, so the probed cells are the
  * only ones read (static pruning when the probe side folds, dynamic
  * partition pruning when it doesn't) — the nprobe-cells-of-N access
  * path an IVF index exists for. Each cell splits further across
  * parquet files via `maxRecordsPerFile`, so a hot cell still scans in
  * parallel. All similarity math runs through the codegen'd
  * `dot_product` over vectors normalized once at BUILD time — queries
  * pay one normalization of the query batch, never of the corpus.
  *
  * The default quantizer (first-k data-point anchors) and every
  * tiebreak match q48 exactly; VectorIndexSpec pins byte-for-byte
  * parity between a search over the persisted index and the in-query
  * q48 plan, so the two formulations cannot drift. TRAINED spherical
  * k-means (`build(trainIters = …)` → `SimilarityQueries.ivfCentroids`,
  * the q188-pinned Lloyd chain) is the opt-in for corpora with real
  * cluster structure — on this repo's unstructured synthetic corpus it
  * measurably lowers fixed-nprobe recall, so it is not the default
  * (numbers in ivfRanked's scaladoc). Either way the quantizer derives
  * only from the fixed training sample (`vec_id < IvfSampleCap`), so
  * any build whose corpus contains that sample produces the identical
  * quantizer — which is what makes [[append]]-then-search ≡ rebuild
  * provable rather than approximate.
  */
object VectorIndex {

  /** Unit-normalized double vectors from a raw (vec_id, embedding)
    * relation — the same native `l2_normalize` q48's `vectors` helper
    * applies (the spec's parity gate keeps them in sync).
    */
  private[sinks] def normalized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("l2_normalize(embedding)").as("v"))

  /** Nearest-centroid cell assignment (sim desc, cent_id asc tiebreak —
    * q48's rule), shared by [[build]]/[[append]]/[[buildPq]]/
    * [[appendPq]] so the assignment rule has ONE definition.
    */
  private[sinks] def assignCells(e: DataFrame, cents: DataFrame): DataFrame = {
    val byVec = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("cent_id").asc)
    e.join(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cent_id"),
        expr("dot_product(v, cv)").as("sim"))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cent_id").as("cell"))
  }

  /** Build the index: quantizer selection, then nearest-centroid
    * assignment (sim desc, cent_id asc tiebreak — q48's rule) and a
    * cell-partitioned postings write. `maxRecordsPerFile` bounds each
    * file so a skewed cell still yields parallel scan splits.
    *
    * `trainIters = 0` (default) uses the first-k data-point anchors —
    * q48's quantizer, the measured winner on unstructured corpora.
    * `trainIters > 0` runs that many deterministic Lloyd iterations
    * over the bounded training sample (`ivfCentroids`, the q188-pinned
    * math) — opt in for corpora with real cluster structure. Both
    * train/seed from the fixed sample, so any corpus containing the
    * sample yields the identical quantizer and [[append]] stays exact.
    *
    * Fails fast if the corpus can't seed k centroids (vec_ids 0..k-1
    * absent → a degenerate or empty quantizer that would silently skew
    * every cell — a mismatched corpus must not build).
    */
  def build(emb: DataFrame, outDir: String, k: Int,
      maxRecordsPerFile: Int = 1 << 20, trainIters: Int = 0): Unit = {
    val e = normalized(emb)
    val cents = graft.queries.SimilarityQueries.ivfCentroids(
      e, k, iters = trainIters)
    require(cents.count() == k,
      s"quantizer needs seed vec_ids 0..${k - 1} present in the corpus")
    cents.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/centroids")
    assignCells(e, cents)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("cell")
      .parquet(s"$outDir/postings")
  }

  /** Incrementally index a new batch of vectors against the EXISTING
    * quantizer: assign each to its nearest persisted centroid (same
    * tiebreak as build) and append to the cell partitions — O(batch),
    * no corpus rescan, centroids untouched. This is the ingest path at
    * scale; VectorIndexSpec pins append-then-search byte-for-byte to a
    * full rebuild over the union. (Quantizer drift — re-training
    * centroids as the distribution moves — is a rebuild, by design:
    * reassignment invalidates every cell.)
    */
  def append(spark: SparkSession, indexDir: String,
      emb: DataFrame, maxRecordsPerFile: Int = 1 << 20,
      claim: Option[ClaimPrimitive] = None): Unit =
    // Routed through the gen-scoped delta tree (negative-gen namespace
    // — DeltaIO.nextPlainGen) instead of parquet mode-append on the
    // main cell-partitioned tree: the mode-append commit lists +
    // schema-infers the WHOLE main tree (multiplied by the cell
    // partition dirs), a constant factor that grows with the corpus —
    // the exact class the r9 10× SinkBench flagged on DedupIndex. The
    // gen= write touches only its own subtree: O(batch) at any size.
    appendDelta(spark, indexDir, emb,
      DeltaIO.nextPlainGen(spark, indexDir, Seq("postings"), claim),
      maxRecordsPerFile)

  private def fsExists(spark: SparkSession, p: String): Boolean =
    DeltaIO.exists(spark, p)

  /** Gen-scoped delta ingest — the replay-safe form of [[append]] for
    * at-least-once callers (Structured Streaming's foreachBatch):
    * the batch's cell assignments land under their own
    * `postings_delta/gen=<gen>/cell=<c>/` subtree with mode Overwrite,
    * so replaying a micro-batch REWRITES its own generation instead of
    * duplicating rows — the commit is idempotent per gen (the
    * CorpusStreaming `batch=<id>` pattern applied to the index). Reads
    * union the delta tree transparently ([[readPostings]]); a
    * [[compact]] folds deltas back into the main tree. Same frozen
    * quantizer and O(batch) cost as [[append]].
    */
  def appendDelta(spark: SparkSession, indexDir: String, emb: DataFrame,
      gen: Long, maxRecordsPerFile: Int = 1 << 20): Unit = {
    val cents = spark.read.parquet(s"$indexDir/centroids")
    assignCells(normalized(emb), cents)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("cell")
      .parquet(s"$indexDir/postings_delta/gen=$gen")
  }

  /** The raw postings relation: the main tree plus, when present, every
    * `postings_delta` generation (the gen partition column is dropped —
    * readers see one (vec_id, v, cell) relation either way).
    */
  private[graft] def readPostings(spark: SparkSession,
      indexDir: String): DataFrame = {
    val main = spark.read.parquet(s"$indexDir/postings")
    if (fsExists(spark, s"$indexDir/postings_delta"))
      main.unionByName(
        spark.read.parquet(s"$indexDir/postings_delta")
          .select(col("vec_id"), col("v"), col("cell")))
    else main
  }

  /** The indexed vectors themselves, (vec_id, v) with v the stored
    * UNIT-normalized form — the candidate-vector fetch downstream
    * re-rankers (MMR, truncated Shapley re-scoring) join [[search]]
    * results back to, so a candidate's payload comes from the index
    * rather than a second corpus scan. Join on vec_id; parquet
    * min/max stats prune non-matching files for small id sets.
    */
  def storedVectors(spark: SparkSession, indexDir: String): DataFrame =
    readPostings(spark, indexDir).select(col("vec_id"), col("v"))

  /** Probe the persisted index: rank centroids per query, take the top
    * `nprobe` cells, scan ONLY those postings partitions, exact-score
    * the candidates, and return the top `topK` neighbors per query as
    * (qid, neighbor_id, rk, cos_r) — q48's output contract (self-match
    * excluded, round-6 cosines, neighbor_id tiebreak).
    */
  def search(spark: SparkSession, indexDir: String, queries: DataFrame,
      nprobe: Int, topK: Int): DataFrame =
    searchOn(spark.read.parquet(s"$indexDir/centroids"),
      readPostings(spark, indexDir), queries, nprobe, topK)

  /** [[search]] over pre-resolved index relations — the warm serving
    * form: a prepared handle (`Retrieval.prepareServing`) reads the
    * k-row centroid relation once (cached) and resolves the postings
    * tree's file index once, so per-query cost is the nprobe
    * cell-pruned scan plus the top-k tail, not a centroids re-read and
    * a fresh directory listing. SAME body as [[search]] — the public
    * form delegates here, so the two cannot drift.
    */
  private[graft] def searchOn(cents: DataFrame, postings: DataFrame,
      queries: DataFrame, nprobe: Int, topK: Int): DataFrame = {
    val q = normalized(queries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val byQ = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cent_id").asc)
    val probes = q.join(broadcast(cents))
      .select(col("qid"), col("qv"), col("cent_id"),
        expr("dot_product(qv, cv)").as("sim"))
      .withColumn("rn", row_number().over(byQ))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cent_id").as("cell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    // join on the partition column: only probed cells are scanned (a
    // vector lives in exactly one cell, so no cross-probe duplicates)
    probes.join(postings, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"),
        expr("dot_product(qv, v)").as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("qid"), col("neighbor_id"),
        col("rk").cast("int").as("rk"), round(col("cos"), 6).as("cos_r"))
  }

  // ------------------------------------------------------------------
  // IVF-PQ: the compressed-postings variant (Jégou et al. 2011) — the
  // same coarse quantizer routes probes to cells, but each cell stores
  // 8-byte PQ codes instead of raw vectors, and search scores by
  // asymmetric distance (per-query LUT, 8 lookups summed). 64× smaller
  // postings, no decompression at scan time — the layout that makes
  // billion-vector serving fit a cluster's disks. Codes quantize the
  // RAW vector (q71's math), not the IVF residual: it keeps codes
  // independent of cell assignment (append never re-encodes, ONE
  // codebook serves every cell) and stays byte-pinned to the in-query
  // q71/q72 twins; residual encoding is the classical refinement and
  // would need a per-build residual codebook — a rebuild-only variant.
  //
  // Layout (alongside [[build]]'s):
  //   <dir>/codebook/            (j, cent_id, csub, csub2) — 128 rows
  //   <dir>/pq_postings/cell=<c>/ (vec_id, codes[8])
  // ------------------------------------------------------------------

  /** Per-vector PQ codes (codes[j] = chosen codeword of subspace j)
    * from normalized vectors — `SimilarityQueries.pqSub/pqAssign`, the
    * q71-pinned math, folded back to one array row per vector.
    */
  private def pqCodes(e: DataFrame, codebook: DataFrame): DataFrame =
    graft.queries.SimilarityQueries.pqAssign(
        graft.queries.SimilarityQueries.pqSub(e), codebook)
      .groupBy(col("vec_id"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(j, cent_id))), s -> s.cent_id)")
        .as("codes"))

  /** Build the IVF-PQ index: the [[build]] coarse quantizer + cell
    * assignment, but postings carry PQ codes, and the 128-row codebook
    * (first-16-vectors' slices — the fixed-sample convention that makes
    * [[appendPq]] ≡ rebuild exact) persists alongside the centroids.
    */
  def buildPq(emb: DataFrame, outDir: String, k: Int,
      maxRecordsPerFile: Int = 1 << 20, trainIters: Int = 0): Unit = {
    val e = normalized(emb).ckpt() // quantizer + cells + codes
    val cents = graft.queries.SimilarityQueries.ivfCentroids(
      e, k, iters = trainIters)
    require(cents.count() == k,
      s"quantizer needs seed vec_ids 0..${k - 1} present in the corpus")
    cents.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/centroids")
    val codebook = graft.queries.SimilarityQueries.pqCodebook(
      graft.queries.SimilarityQueries.pqSub(e))
    require(codebook.count() == 128,
      "codebook needs seed vec_ids 0..15 present in the corpus")
    codebook.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/codebook")
    assignCells(e, cents).select(col("vec_id"), col("cell"))
      .join(pqCodes(e, codebook), "vec_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("cell")
      .parquet(s"$outDir/pq_postings")
  }

  /** Incrementally PQ-index a new batch against the EXISTING quantizer
    * and codebook — O(batch), no re-encoding of indexed cells (codes
    * are cell-independent by the raw-vector convention above).
    * Exactly-once callers only — at-least-once callers use
    * [[appendDeltaPq]].
    */
  def appendPq(spark: SparkSession, indexDir: String,
      emb: DataFrame, maxRecordsPerFile: Int = 1 << 20,
      claim: Option[ClaimPrimitive] = None): Unit =
    // Same delta-tree routing as [[append]] — the PQ main tree is
    // cell-partitioned too, so mode-append's full-tree listing grows
    // with the corpus; the gen= subtree write stays O(batch).
    appendDeltaPq(spark, indexDir, emb,
      DeltaIO.nextPlainGen(spark, indexDir, Seq("pq_postings"), claim),
      maxRecordsPerFile)

  /** Gen-scoped delta form of [[appendPq]] — the [[appendDelta]]
    * pattern applied to the compressed postings, so the raw and PQ
    * trees share ONE replay story: a replayed micro-batch rewrites its
    * own `pq_postings_delta/gen=<gen>` subtree; [[searchAdc]] unions
    * deltas transparently and [[compact]] folds them into the main
    * tree.
    */
  def appendDeltaPq(spark: SparkSession, indexDir: String,
      emb: DataFrame, gen: Long, maxRecordsPerFile: Int = 1 << 20): Unit = {
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val codebook = spark.read.parquet(s"$indexDir/codebook")
    val e = normalized(emb).ckpt() // cells + codes
    assignCells(e, cents).select(col("vec_id"), col("cell"))
      .join(pqCodes(e, codebook), "vec_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("cell")
      .parquet(s"$indexDir/pq_postings_delta/gen=$gen")
  }

  /** The PQ-code relation: the main tree plus, when present, every
    * `pq_postings_delta` generation (gen column dropped — readers see
    * one (vec_id, codes, cell) relation either way).
    */
  private[sinks] def readPqPostings(spark: SparkSession,
      indexDir: String): DataFrame = {
    val main = spark.read.parquet(s"$indexDir/pq_postings")
    if (fsExists(spark, s"$indexDir/pq_postings_delta"))
      main.unionByName(
        spark.read.parquet(s"$indexDir/pq_postings_delta")
          .select(col("vec_id"), col("codes"), col("cell")))
    else main
  }

  /** ADC search over the persisted IVF-PQ index: rank centroids per
    * query, scan ONLY the top-`nprobe` cells' code partitions, score
    * candidates by summed LUT lookups (never decompressing a code),
    * and return the top `topK` per query as (qid, neighbor_id, rk,
    * adist_r) — q72's scorer (`SimilarityQueries.pqLut`/`pqAdcTopK`)
    * and output contract; with `nprobe = k` the answers are exactly
    * the in-query q72 ranking (the spec pins it).
    */
  def searchAdc(spark: SparkSession, indexDir: String, queries: DataFrame,
      nprobe: Int, topK: Int): DataFrame = {
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val codebook = spark.read.parquet(s"$indexDir/codebook")
    val q = normalized(queries).ckpt() // probes + LUT
    val byQ = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cent_id").asc)
    val probes = q.select(col("vec_id").as("qid"), col("v").as("qv"))
      .join(broadcast(cents))
      .select(col("qid"), col("cent_id"),
        expr("dot_product(qv, cv)").as("sim"))
      .withColumn("rn", row_number().over(byQ))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("cent_id").as("cell"))
    val lut = graft.queries.SimilarityQueries.pqLut(
      graft.queries.SimilarityQueries.pqSub(q), codebook)
    // join on the partition column prunes the scan to probed cells;
    // candidates carry qid, so the shared scorer joins per query
    val cand = probes
      .join(readPqPostings(spark, indexDir), "cell")
      .select(col("qid"), col("vec_id"),
        posexplode(col("codes")).as(Seq("j", "cent_id")))
    graft.queries.SimilarityQueries.pqAdcTopK(cand, lut, topK)
  }

  /** Compact an appended index: consolidate each cell partition's
    * accumulated append-delta files into one generation (probe-time
    * partition pruning is untouched — the hive cell layout is
    * preserved). Streaming-ingest [[appendDelta]] generations fold
    * into the main postings tree (the compacted index has NO delta
    * tree — readers go back to one scan). Centroids and codebook copy
    * through unchanged; compacts whichever posting trees exist (raw,
    * PQ, or both). Separate dstDir; the swap is the caller's
    * atomic-rename concern (the CorpusExport.compact contract).
    *
    * `retrain = true` is the DRIFT-MAINTENANCE form: instead of copying
    * the frozen quantizer, it re-trains centroids over a deterministic
    * corpus-representative sample of the MERGED postings (main + every
    * delta — the appended generations the frozen quantizer never saw)
    * and re-assigns every vector's cell. One corpus scan for the
    * reassignment (centroids broadcast), a TakeOrdered for the sample —
    * O(corpus), no per-pair work. PQ codes survive unchanged (they
    * quantize the raw vector, independent of cell — the append
    * convention), so only the cell column of the PQ tree is rewritten,
    * via a vec_id join against the raw reassignment; retrain therefore
    * requires the raw tree to be present. The retrained quantizer is
    * deterministic (hash-ordered sample, fixed seeds, Lloyd over a
    * bounded relation) but intentionally NOT the frozen one, so
    * searches after a retraining compact are a new epoch — the recall
    * maintenance VectorIndexSpec measures per drift generation.
    * `trainIters` defaults to 0 — data-point anchors drawn from the
    * hash sample (all generations), matching [[build]]'s measured-
    * winner default on unstructured corpora; Lloyd refinement is the
    * same opt-in it is at build time.
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
      maxRecordsPerFile: Int = 1 << 20, retrain: Boolean = false,
      trainIters: Int = 0): Unit = {
    if (retrain) return compactRetrain(
      spark, srcDir, dstDir, maxRecordsPerFile, trainIters)
    spark.read.parquet(s"$srcDir/centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$dstDir/centroids")
    if (fsExists(spark, s"$srcDir/codebook"))
      spark.read.parquet(s"$srcDir/codebook")
        .coalesce(1).write.mode("overwrite").parquet(s"$dstDir/codebook")
    if (fsExists(spark, s"$srcDir/postings"))
      readPostings(spark, srcDir) // main + every delta generation
        .repartition(col("cell"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
        .partitionBy("cell")
        .parquet(s"$dstDir/postings")
    if (fsExists(spark, s"$srcDir/pq_postings"))
      readPqPostings(spark, srcDir) // main + every delta generation
        .repartition(col("cell"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
        .partitionBy("cell")
        .parquet(s"$dstDir/pq_postings")
  }

  /** Per-cell balance audit over the PERSISTED index — q221's health
    * check (member count, corpus share, exact-integer hot flag
    * n·k > 2·total) computed from the postings tree alone: a groupBy
    * on the hive partition column plus a k-row left join — no corpus
    * similarity math, so it is cheap enough to run after every append.
    * This is the maintenance TRIGGER: an appended index whose audit
    * goes hot (drifted generations crowding a frozen quantizer's
    * cells) is the operational signal to run a retraining [[compact]]
    * — the consumer loop VectorIndexSpec's drift scenario exercises.
    */
  def cellBalance(spark: SparkSession, indexDir: String): DataFrame = {
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val k = cents.count()
    val counts = readPostings(spark, indexDir)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
    val tot = counts.agg(sum(col("n_vecs")).as("total"))
    cents.select(col("cent_id").as("cell"))
      .join(counts, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
      .crossJoin(broadcast(tot))
      .select(col("cell"), col("n_vecs"),
        round(col("n_vecs").cast("double") / col("total"), 6)
          .as("share_r"),
        (col("n_vecs") * k > col("total") * 2L).cast("int").as("hot"))
  }

  /** One hot cell's split outcome: `cell` kept `nKept` members around
    * the first local sub-anchor (which replaces its centroid), and
    * `newCell` received `nMoved` members around the second.
    */
  final case class CellSplit(cell: Long, newCell: Long,
      nKept: Long, nMoved: Long)

  /** The per-cell split reassignment: members of `cellId` (main tree +
    * every delta generation, duplicate-guarded) re-assigned to the
    * nearer of TWO locally-derived sub-centroids — sub-anchor 0 keeps
    * `cellId`, sub-anchor 1 becomes `newId`. Sub-centroids come from
    * [[retrainSample]] over the cell's own members + `ivfCentroids`
    * (k = 2) — the hash-ordered deterministic draw and the exact
    * assignment tiebreak every other quantizer step uses, so a re-run
    * over the same members reproduces the same split. Returns
    * (vec_id, v, cell) with cell ∈ {cellId, newId}, plus the two
    * sub-centroid rows. Shared by [[splitHotCells]] and the SinkPlans
    * "VectorIndex.split.reassign" plan-gate entry.
    */
  private[sinks] def splitAssignment(spark: SparkSession,
      indexDir: String, cellId: Long, newId: Long,
      trainIters: Int): (DataFrame, DataFrame) = {
    // dropDuplicates is the crash-replay guard: an interrupted earlier
    // split that folded delta rows into the main partition but died
    // before deleting the delta subtree leaves the SAME (vec_id, v)
    // twice; the re-run folds them back to one
    val members = readPostings(spark, indexDir)
      .where(col("cell").cast("long") === cellId)
      .select(col("vec_id"), col("v"))
      .dropDuplicates("vec_id")
      .ckpt() // cuts the file lineage: the rewrite below OVERWRITES
              // the very partitions this relation was read from
    val sub = graft.queries.SimilarityQueries.ivfCentroids(
      retrainSample(members), k = 2, iters = trainIters)
    val reassigned = assignCells(members, sub)
      .select(col("vec_id"), col("v"),
        when(col("cell") === 0L, lit(cellId)).otherwise(lit(newId))
          .as("cell"))
    val cents = sub.select(
      when(col("cent_id") === 0L, lit(cellId)).otherwise(lit(newId))
        .as("cent_id"), col("cv"))
    (reassigned, cents)
  }

  /** TARGETED hot-cell remediation — the maintenance response
    * [[cellBalance]]'s hot flag calls for, at O(hot cells) cost
    * instead of [[compact]]`(retrain = true)`'s O(corpus): each flagged
    * cell is split in two around locally-trained sub-centroids, ONLY
    * that cell's partitions are rewritten, and every other cell's
    * files, the quantizer rows of every cold cell, and all unrelated
    * delta generations are untouched (VectorIndexSpec asserts the
    * file-level invariant). At 100 TB a hot cell IS the probe cost —
    * ServeBench's census shows per-query latency tracking probed-cell
    * size — and a global retrain to fix one cell rewrites the corpus.
    *
    * Mechanics per hot cell (ids ascending; new cent_ids allocated
    * from max(cent_id)+1):
    *   1. centroids table is rewritten FIRST — the hot cell's centroid
    *      becomes sub-anchor 0, the new cell's row is added. From this
    *      instant probes rank k+1 cells; until step 2 lands the new
    *      cell scans empty and every vector is still reachable via the
    *      old cell (recall dips near the split plane, nothing is lost
    *      or duplicated).
    *   2. the cell's members (main + delta, duplicate-guarded) are
    *      reassigned to the nearer sub-centroid and written back:
    *      `postings/cell=<old>` overwritten with the kept half,
    *      `postings/cell=<new>` created with the moved half; when a PQ
    *      tree exists, the same two cell partitions of `pq_postings`
    *      are rewritten via a vec_id join (codes are cell-independent
    *      by the append convention — only the cell column moves).
    *   3. the cell's folded delta subdirectories (`cell=<old>` under
    *      every delta generation of both trees) are deleted.
    *
    * Crash contract (single-writer, like [[compact]]'s swap): dying
    * after 1 leaves an empty-but-probed new cell (pure recall wart; a
    * re-run splits the still-hot cell again under a fresh id and the
    * orphan centroid row is swept by the next retraining compact);
    * dying between 2 and 3 leaves the folded delta rows duplicated,
    * which the next run's duplicate guard (or [[compact]]) heals.
    *
    * Like a retraining [[compact]], a split is a new quantizer EPOCH:
    * append-then-search ≡ rebuild no longer holds (the quantizer is no
    * longer the fixed-sample one), while append itself keeps working
    * unchanged against the updated centroid table.
    *
    * `trainIters` defaults to [[graft.queries.SimilarityQueries
    * .IvfIters]] Lloyd iterations — the OPPOSITE default from
    * [[build]], deliberately: build's data-point anchors are the
    * measured recall winner for seeding k cells over an unstructured
    * corpus, but a split's one job is to BALANCE a crowded direction,
    * and two hash-drawn anchors from a dense crowd often sit adjacent
    * and shave off a sliver (a measured 573/51 split on the SplitBench
    * fixture); local Lloyd over the cell's own sample converges to the
    * crowd's real halves. `trainIters = 0` opts back into anchors.
    *
    * @return one [[CellSplit]] per split cell (empty = nothing hot,
    *         zero writes)
    */
  def splitHotCells(spark: SparkSession, indexDir: String,
      maxRecordsPerFile: Int = 1 << 20,
      trainIters: Int = graft.queries.SimilarityQueries.IvfIters)
      : Seq[CellSplit] = {
    val hot = cellBalance(spark, indexDir)
      .where(col("hot") === 1)
      .select(col("cell").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    if (hot.isEmpty) return Seq.empty
    val conf = spark.sparkContext.hadoopConfiguration
    val centRows = spark.read.parquet(s"$indexDir/centroids")
      .select(col("cent_id").cast("long"), col("cv")).collect()
    val maxId = centRows.map(_.getLong(0)).max
    val newIds = hot.zipWithIndex
      .map { case (c, i) => c -> (maxId + 1 + i) }.toMap

    // the split assignments + sub-centroids, one bounded relation per
    // hot cell (|hot| ≤ k — a driver loop, not a corpus job)
    val parts = hot.map { c =>
      val (reassigned, subCents) =
        splitAssignment(spark, indexDir, c, newIds(c), trainIters)
      (c, reassigned.ckpt(), subCents.collect())
    }

    // ---- step 1: centroids first (see crash contract above) --------
    val splitCv = parts.flatMap(_._3)
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cent_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true)))
    val keptRows = centRows.map { r =>
      val id = r.getLong(0)
      org.apache.spark.sql.Row(id,
        splitCv.getOrElse(id, r.getSeq[Double](1)))
    }
    val newRows = newIds.toSeq.sortBy(_._2).map { case (_, n) =>
      org.apache.spark.sql.Row(n, splitCv(n)) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(keptRows.toSeq ++ newRows, 1),
        centSchema)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/centroids")

    // ---- step 2: rewrite ONLY the split cells' partitions ----------
    val hasPq = fsExists(spark, s"$indexDir/pq_postings")
    val pqAll = if (hasPq) {
      // the split cells' PQ rows (main + deltas, same duplicate guard)
      readPqPostings(spark, indexDir)
        .where(col("cell").cast("long").isin(hot: _*))
        .select(col("vec_id"), col("codes"))
        .dropDuplicates("vec_id")
        .ckpt()
    } else null
    val report = parts.map { case (c, reassigned, _) =>
      val n = newIds(c)
      Seq(c, n).foreach { cell =>
        reassigned.where(col("cell") === cell)
          .select(col("vec_id"), col("v"))
          .write.mode("overwrite")
          .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
          .parquet(s"$indexDir/postings/cell=$cell")
        if (hasPq)
          pqAll.join(reassigned.where(col("cell") === cell)
              .select(col("vec_id")), "vec_id")
            .select(col("vec_id"), col("codes"))
            .write.mode("overwrite")
            .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
            .parquet(s"$indexDir/pq_postings/cell=$cell")
      }
      // one keyed count over the (already-checkpointed) reassignment
      // instead of a job per half
      val sizes = reassigned.groupBy(col("cell")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      CellSplit(c, n, sizes.getOrElse(c, 0L), sizes.getOrElse(n, 0L))
    }

    // ---- step 3: drop the folded delta subdirectories --------------
    val trees = Seq("postings_delta") ++
      (if (hasPq) Seq("pq_postings_delta") else Seq.empty)
    trees.foreach { t =>
      val root = new org.apache.hadoop.fs.Path(s"$indexDir/$t")
      val fs = root.getFileSystem(conf)
      if (fs.exists(root)) {
        fs.listStatus(root).foreach { gen =>
          hot.foreach { c =>
            val p = new org.apache.hadoop.fs.Path(gen.getPath, s"cell=$c")
            if (fs.exists(p)) fs.delete(p, true)
          }
          // a generation whose ONLY cells were split is now payload-
          // free (just commit markers) and would fail the delta
          // union's schema inference — drop it whole
          if (!fs.listStatus(gen.getPath)
              .exists(_.getPath.getName.startsWith("cell=")))
            fs.delete(gen.getPath, true)
        }
        // likewise an emptied delta tree: readers check exists() and
        // must go back to the main-tree-only path
        if (!fs.listStatus(root)
            .exists(_.getPath.getName.startsWith("gen=")))
          fs.delete(root, true)
      }
    }
    report
  }

  /** Deterministic corpus-representative training sample for a
    * retraining [[compact]]: the [[graft.queries.SimilarityQueries
    * .IvfSampleCap]] smallest rows by (fnv1a(vec_id), vec_id) — a
    * hash-ordered pseudo-random draw that covers EVERY appended
    * generation, unlike the build-time `vec_id < cap` sample that a
    * drifting corpus outgrows. Renumbered 0..cap-1 in hash order so
    * `ivfCentroids`' fixed-sample contract (seeds = first k ids,
    * training set = first cap ids) applies unchanged. The
    * TakeOrderedAndProject is the only global step — a top-256 over
    * the corpus, not a sort; the 256-row renumber window is bounded by
    * construction (globalWindowBudget-reviewed).
    */
  private[sinks] def retrainSample(postings: DataFrame): DataFrame = {
    val cap = graft.queries.SimilarityQueries.IvfSampleCap
    val byHash = Window.orderBy(col("h"), col("orig_id"))
    postings
      .select(col("vec_id").as("orig_id"), col("v"),
        expr("fnv1a(cast(vec_id as string))").as("h"))
      .orderBy(col("h"), col("orig_id")).limit(cap)
      .select((row_number().over(byHash) - 1).cast("long").as("vec_id"),
        col("v"))
  }

  private def compactRetrain(spark: SparkSession, srcDir: String,
      dstDir: String, maxRecordsPerFile: Int, trainIters: Int): Unit = {
    require(fsExists(spark, s"$srcDir/postings"),
      "retraining compact needs the raw postings tree " +
        "(PQ codes cannot recover the vectors the quantizer trains on)")
    val k = spark.read.parquet(s"$srcDir/centroids").count().toInt
    // merged corpus feeds the sample AND the reassignment scan
    val merged = readPostings(spark, srcDir)
      .select(col("vec_id"), col("v")).ckpt()
    val cents = graft.queries.SimilarityQueries.ivfCentroids(
      retrainSample(merged), k, iters = trainIters)
    require(cents.count() == k,
      s"retrain sample too small to seed $k centroids")
    cents.coalesce(1).write.mode("overwrite")
      .parquet(s"$dstDir/centroids")
    // one corpus scan: broadcast the k new centroids, re-assign cells
    val assigned = assignCells(merged, cents).ckpt()
    assigned
      .repartition(col("cell"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("cell")
      .parquet(s"$dstDir/postings")
    if (fsExists(spark, s"$srcDir/pq_postings")) {
      // codes are cell-independent — only the cell column changes
      spark.read.parquet(s"$srcDir/codebook")
        .coalesce(1).write.mode("overwrite").parquet(s"$dstDir/codebook")
      readPqPostings(spark, srcDir)
        .select(col("vec_id"), col("codes"))
        .join(assigned.select(col("vec_id"), col("cell")), "vec_id")
        .repartition(col("cell"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
        .partitionBy("cell")
        .parquet(s"$dstDir/pq_postings")
    }
  }
}
