package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Ckpt._
import graft.sinks.{TextIndex, VectorIndex}

/** Index-backed form of the q269 hybrid-retrieval eval — the 100 TB
  * candidate path the in-query twin documents: per-query candidates
  * come from a persisted [[graft.sinks.TextIndex]] probe (lexical arm)
  * and a persisted [[graft.sinks.VectorIndex]] probe (semantic arm)
  * instead of a corpus broadcast-join, and the fusion + MRR@10 tail is
  * the SAME shared definition ([[SimilarityQueries.hybridMrrTail]]) so
  * the two surfaces cannot drift — the [[Valuation]] precedent.
  *
  * RetrievalSpec pins [[hybridMrrFromIndexes]] at full probe (every
  * IVF cell probed, both fetches covering the corpus) ≡ q269 row for
  * row; at bounded nprobe/fetch the candidate sets narrow and the
  * metric degrades gracefully — the q120/q194 recall story, not a new
  * approximation.
  *
  * Candidate-recall contract per arm:
  *  - semantic: [[VectorIndex.search]] ranks by RAW cosine while q269
  *    ranks by round(sim, 9); the fetch over-pulls by `fetchMargin`
  *    and re-ranks the re-scored candidates by the shared (round-9
  *    DESC, id ASC) order before capping (the Valuation boundary-tie
  *    discipline).
  *  - lexical: BM25 candidates are docs sharing ≥1 query WORD — a
  *    superset of every positive-trigram-Jaccard doc (a shared
  *    trigram shares its three words). q269 additionally back-fills
  *    zero-similarity docs by ascending id when fewer than topN
  *    positives exist, so exact parity needs `lexFetchK` to cover the
  *    query's whole match set (the spec asserts that precondition);
  *    production callers pass a bounded lexFetchK and accept the
  *    documented candidate cut.
  */
object Retrieval {

  private val fetchMargin = 8

  /** q269's three-system MRR@10 eval with per-query candidates from
    * the two persisted indexes.
    *
    * @param textIndexDir [[TextIndex]] built over the eval corpus's
    *                     (doc_id, text)
    * @param vecIndexDir  [[VectorIndex]] built over the eval corpus's
    *                     (vec_id = doc_id, embedding)
    * @param queries      (vec_id, label, text, embedding) — the query
    *                     battery, fixed-size by design
    * @param corpus       (doc_id, label, text) — the metadata relation
    *                     candidates re-score and label against; joined
    *                     on the BOUNDED candidate side, so at scale the
    *                     id-join is parquet-stats pruned, never a full
    *                     scan (the [[VectorIndex.storedVectors]] join
    *                     discipline)
    * @param nprobe       IVF cells probed per query (semantic recall
    *                     knob)
    * @param lexFetchK    BM25 candidates fetched per query BEFORE the
    *                     trigram-Jaccard re-score (lexical recall knob;
    *                     ≥ |corpus| reproduces q269's arm exactly when
    *                     every corpus doc matches ≥1 query word)
    * @param topN         per-system list depth (q269 uses 50)
    * @param semFetchK    semantic candidates fetched per query; 0
    *                     (default) = topN + a tie margin
    * @param kRrf         RRF smoothing constant (60)
    * @return (system, n_queries, n_hit, mrr_at_10_r) — q269's contract
    *
    * Scale shape: the corpus is never cross-joined — the lexical arm
    * scans only word-range-pruned postings files, the semantic arm
    * only probed IVF cells; candidates (|queries|·fetch rows) re-score
    * against id-pruned metadata/vector fetches; the fusion and eval
    * tail see ≤ topN rows per (query, system).
    */
  /** q171's fused hybrid retrieval as the SERVING path over the two
    * persisted indexes — one query in, the RRF-fused top-N out: the
    * lexical arm from [[TextIndex.searchBm25]] (word-pruned postings
    * scan, the q132-pinned scorer), the semantic arm from
    * [[VectorIndex.search]] re-scored at round-9 on the index's stored
    * vectors (the Valuation boundary-tie margin), both capped at
    * `arms`, fused by the SHARED [[SimilarityQueries.rrfFuseTop]] —
    * the q171 QDef executes the same tail, so the in-query and
    * index-backed rankings cannot drift. RetrievalSpec pins full probe
    * ≡ q171 row for row.
    *
    * @param terms  lexical term bag
    * @param query  ONE-row (vec_id, embedding) query vector; its own
    *               corpus entry (if indexed) is excluded, matching
    *               q171's vec_id-0 convention
    * @param nprobe IVF cells probed (semantic recall knob)
    * @param arms   per-arm candidate-list depth before fusion (50)
    * @param topN   fused results returned (20)
    * @return (rk, doc_id, lex_rk, sem_rk, rrf) — q171's contract
    */
  def hybridSearch(spark: SparkSession, textIndexDir: String,
      vecIndexDir: String, terms: Seq[String], query: DataFrame,
      nprobe: Int, arms: Int = 50, topN: Int = 20,
      kRrf: Int = 60): DataFrame =
    hybridSearchPrepared(
      prepareServing(spark, textIndexDir, vecIndexDir, cache = false),
      terms, query, nprobe, arms, topN, kRrf)

  /** A prepared serving context for [[hybridSearchPrepared]]: every
    * index relation [[hybridSearch]] re-resolves per call — the
    * postings/doclens/stats trees of the TextIndex, the centroids and
    * postings of the VectorIndex — resolved ONCE (one directory
    * listing and schema merge each) and, when `cache` is on, the
    * BOUNDED statistics pinned in executor memory:
    *
    *  - `centroids` — k rows (one per IVF cell),
    *  - `totals` — the ONE merged (nn, toktot) row,
    *  - `doclens` — (doc_id, dl), 16 bytes/doc: the BM25 length norms
    *    a lexical serving tier holds resident (what Lucene keeps in
    *    its norms file) — ~160 MB per executor per billion docs on a
    *    1000-executor cluster, MEMORY_AND_DISK so an undersized
    *    executor degrades to spill, not OOM.
    *
    * The two posting trees are NOT cached — their scale contract is
    * the word-range / IVF-cell pruned scan, and caching a corpus-sized
    * tree would defeat it — but their resolved file indexes are
    * reused, so the per-query driver cost drops to planning alone.
    *
    * SNAPSHOT semantics: the handle pins the generation set visible at
    * prepare time. Rows appended (or cells split/compacted) after
    * [[prepareServing]] are invisible to it — re-prepare to pick up a
    * new generation, the swap a serving tier does at index publish.
    * Call [[ServingHandle.close]] to release the pinned relations.
    */
  final class ServingHandle private[queries] (
      private[queries] val textPostings: DataFrame,
      private[queries] val doclens: DataFrame,
      private[queries] val totals: DataFrame,
      private[queries] val centroids: DataFrame,
      private[queries] val vecPostings: DataFrame,
      private val cached: Seq[DataFrame]) {
    def close(): Unit = cached.foreach(_.unpersist())
  }

  /** Build a [[ServingHandle]] over the two persisted indexes.
    * `cache = false` skips the persist/materialize step and is the
    * exact relation set [[hybridSearch]] uses per call (the cold path
    * delegates through it, so prepared and unprepared CANNOT drift).
    */
  def prepareServing(spark: SparkSession, textIndexDir: String,
      vecIndexDir: String, cache: Boolean = true): ServingHandle = {
    val doclens = TextIndex.readDoclens(spark, textIndexDir)
    val totals = TextIndex.readTotals(spark, textIndexDir)
    val cents = spark.read.parquet(s"$vecIndexDir/centroids")
    val cached =
      if (!cache) Seq.empty[DataFrame]
      else {
        val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        Seq(doclens, totals, cents).map { df =>
          df.persist(lvl).count() // materialize: first query serves warm
          df
        }
      }
    new ServingHandle(
      TextIndex.readPostings(spark, textIndexDir), doclens, totals,
      cents, VectorIndex.readPostings(spark, vecIndexDir), cached)
  }

  /** [[hybridSearch]] over a prepared handle — q171's fused ranking
    * with per-query work cut to the two pruned scans + the fusion
    * tail. Identical results by construction ([[hybridSearch]] IS this
    * method over an uncached handle); RetrievalSpec additionally pins
    * warm ≡ cold row for row and the snapshot contract (post-prepare
    * appends invisible until re-prepare).
    */
  def hybridSearchPrepared(handle: ServingHandle, terms: Seq[String],
      query: DataFrame, nprobe: Int, arms: Int = 50, topN: Int = 20,
      kRrf: Int = 60): DataFrame = {
    val lex = TextIndex.searchBm25On(handle.textPostings,
        handle.doclens, handle.totals, terms, arms)
      .select(col("doc_id"), col("rk").as("lex_rk"))
    val qv = query.select(expr("l2_normalize(embedding)").as("qv"))
      .ckpt() // one row; cuts the query lineage before the join below
    val hits = VectorIndex.searchOn(handle.centroids,
        handle.vecPostings, query, nprobe,
        topK = arms + fetchMargin) // self already excluded by search
      .select(col("neighbor_id").as("vec_id"))
    val sem = handle.vecPostings.select(col("vec_id"), col("v"))
      .join(broadcast(hits), "vec_id")
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(expr("dot_product(v, qv)"), 9).as("cos_r"))
      .orderBy(col("cos_r").desc, col("doc_id").asc)
      .limit(arms)
      .withColumn("sem_rk", row_number().over(Q.bounded.orderBy(
        col("cos_r").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("sem_rk"))
    SimilarityQueries.rrfFuseTop(sem, lex, kRrf, topN)
  }

  def hybridMrrFromIndexes(spark: SparkSession, textIndexDir: String,
      vecIndexDir: String, queries: DataFrame, corpus: DataFrame,
      nprobe: Int, lexFetchK: Int, topN: Int = 50, semFetchK: Int = 0,
      kRrf: Int = 60): DataFrame = {
    val W = TextQueries.wordsExpr
    val qmeta = queries
      .select(col("vec_id").as("qid"), col("label").as("ql"),
        expr(W).as("ws"))
      .select(col("qid"), col("ql"),
        SimilarityQueries.triShingles.as("qsg"))
      .ckpt() // bounded: one row per query
    val byQ = (c: String) => Window.partitionBy(col("qid"))
      .orderBy(col(c).desc, col("vec_id").asc)

    // ---- semantic arm: IVF probe → round-9 re-score on the index's
    // stored vectors (search's cos_r is round-6 display precision)
    val semFetch = if (semFetchK > 0) semFetchK else topN + fetchMargin
    val semHits = VectorIndex.search(spark, vecIndexDir,
        queries.select(col("vec_id"), col("embedding")),
        nprobe, topK = semFetch)
      .select(col("qid"), col("neighbor_id").as("vec_id"))
    val qv = queries.select(col("vec_id").as("qid"),
        expr("l2_normalize(embedding)").as("qv"))
      .ckpt() // bounded (one row per query); distinct lineage from the
              // search()-derived hits it joins, both roots = `queries`
    val semScored = VectorIndex.storedVectors(spark, vecIndexDir)
      .join(broadcast(semHits), "vec_id")
      .join(broadcast(qv), "qid")
      .select(col("qid"), col("vec_id"),
        round(expr("dot_product(v, qv)"), 9).as("sim"))
      .ckpt() // bounded: |queries|·fetch rows; also cuts the corpus
              // lineage before arm() rejoins the metadata relation

    // ---- lexical arm: batched BM25 candidates (docs sharing ≥1 query
    // word, word-pruned postings scan) → trigram-Jaccard re-score on
    // the id-pruned metadata fetch; self dropped to match q269
    val qterms = queries.select(col("vec_id").as("qid"),
      expr(s"array_distinct($W)").as("terms"))
    val lexHits = TextIndex.searchBm25Batch(spark, textIndexDir,
        qterms, topK = lexFetchK)
      .where(col("doc_id") =!= col("qid"))
      .select(col("qid"), col("doc_id").as("vec_id"))
    val lexScored = corpus
      .select(col("doc_id").as("vec_id"), col("text"))
      .join(broadcast(lexHits), "vec_id")
      .join(broadcast(qmeta.select(col("qid"), col("qsg"))), "qid")
      .select(col("qid"), col("vec_id"), expr(W).as("ws"), col("qsg"))
      .select(col("qid"), col("vec_id"),
        SimilarityQueries.triShingles.as("sg"), col("qsg"))
      .select(col("qid"), col("vec_id"),
        SimilarityQueries.triJaccard9.as("sim"))
      .ckpt() // bounded: |queries|·lexFetchK rows; cuts the corpus
              // lineage before arm() rejoins the metadata relation

    // ---- label the bounded candidate lists (rel = label agreement),
    // re-rank by the SHARED (round-9 DESC, id ASC) order, cap at topN
    def arm(scored: DataFrame, rkName: String): DataFrame =
      corpus.select(col("doc_id").as("vec_id"), col("label"))
        .join(broadcast(scored), "vec_id")
        .join(broadcast(qmeta.select(col("qid"), col("ql"))), "qid")
        .select(col("qid"), col("vec_id"),
          when(col("label") === col("ql"), 1).otherwise(0).as("rel"),
          col("sim"))
        .withColumn(rkName, row_number().over(byQ("sim")))
        .where(col(rkName) <= topN)
        .select(col("qid"), col("vec_id"), col("rel"), col(rkName))

    SimilarityQueries.hybridMrrTail(
      arm(semScored, "sem_rk"), arm(lexScored, "lex_rk"),
      qmeta.select(col("qid")), kRrf)
  }

  /** q172's NDCG@10 retrieval eval with candidates from a PERSISTED
    * [[VectorIndex]] — the third and last retrieval-eval surface on
    * the index-backed path (MRR: [[hybridMrrFromIndexes]]; serving:
    * [[hybridSearch]]). The quantizer, cell assignments, and probe
    * rule all come from the index (centroids + cell-partitioned
    * postings); the metric math is the SHARED
    * [[SimilarityQueries.ndcgAt10Tail]] the q172 QDef executes, so the
    * two evals cannot drift. With the index built at q172's k=16 /
    * trainIters=0 quantizer and nprobe=2, RetrievalSpec pins this
    * ≡ q172 row for row.
    *
    * Unlike [[VectorIndex.search]] the candidate set is NOT
    * top-k-capped: ideal DCG needs the full relevant count among the
    * probed cells' candidates, so the probe joins whole cells — the
    * blast radius is still nprobe/k of the corpus per query, the IVF
    * scale contract.
    *
    * @param queries (vec_id, label, embedding) — the eval battery
    * @param labels  (vec_id, label) — neighbor ground truth, co-keyed
    *                with the postings on vec_id (one equi-join; at
    *                scale both sides are corpus-sized and hash-join on
    *                the id)
    * @param nprobe  IVF cells probed per query (q172 uses 2)
    * @return (qlabel, n_eval, mean_ndcg) — q172's contract
    */
  /** q280's semantic eval-set decontamination screen over a PERSISTED
    * [[VectorIndex]] — the 100 TB candidate path: the quantizer, the
    * train-side cell assignments (rn=1 — the index's stored cells) and
    * the eval vectors all come from the index; the eval battery is the
    * caller's BOUNDED id relation (the fixed eval release q280's
    * in-query cap models); and the closing z-score ranking is the
    * SHARED [[SimilarityQueries.decontamTail]] the q280 QDef executes,
    * so the two screens cannot drift. With the index built at q280's
    * k=16 / trainIters=0 quantizer over the full corpus, nprobe=2, and
    * the battery/exclusion matching the stride split, RetrievalSpec
    * pins this ≡ q280 row for row.
    *
    * Like [[ndcgFromIndexes]], candidates are NOT top-k-capped: the
    * per-eval NN must be exact over the probed cells (a capped fetch
    * could drop the true nearest train doc behind excluded eval docs),
    * so the probe joins whole cells — blast radius nprobe/k of the
    * corpus per eval doc, the IVF scale contract.
    *
    * @param evalIds    bounded (vec_id) battery to screen — vectors
    *                   are fetched FROM THE INDEX id-pruned, so the
    *                   eval release needs no separate vector store
    * @param excludeIds bounded (vec_id) relation candidates must NOT
    *                   come from (every held-out id, not just the
    *                   screened battery); defaults to `evalIds`
    * @param nprobe     IVF cells probed per eval doc (q280 uses 2)
    * @return top-50 most-suspect (eval_id, nn_train_id, nn_cos_r, z_r)
    *         — q280's contract
    */
  def semanticDecontamFromIndexes(spark: SparkSession,
      vecIndexDir: String, evalIds: DataFrame,
      excludeIds: DataFrame = null, nprobe: Int = 2): DataFrame = {
    val excl = Option(excludeIds).getOrElse(evalIds)
      .select(col("vec_id"))
    val cents = spark.read.parquet(s"$vecIndexDir/centroids")
    val ev = VectorIndex.storedVectors(spark, vecIndexDir)
      .join(broadcast(evalIds.select(col("vec_id"))), "vec_id")
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .ckpt() // bounded battery: feeds probe selection AND the re-score
    val byQ = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cent_id").asc)
    val probes = ev.join(broadcast(cents))
      .select(col("qid"), col("cent_id"),
        expr("dot_product(qv, cv)").as("sim"))
      .withColumn("rn", row_number().over(byQ))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("cent_id").as("cell"))
    val nn = VectorIndex.readPostings(spark, vecIndexDir)
      .join(broadcast(excl), Seq("vec_id"), "left_anti") // train side
      .withColumnRenamed("vec_id", "nid")
      .join(broadcast(probes), "cell")
      .join(broadcast(ev), "qid")
      .select(col("qid"), col("nid"),
        round(expr("dot_product(v, qv)"), 9).as("cos_r"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cos_r").desc, col("nid").asc)))
      .where(col("rk") === 1)
      .select(col("qid").as("eval_id"), col("nid").as("nn_train_id"),
        col("cos_r").as("nn_cos_r"))
    SimilarityQueries.decontamTail(nn)
  }

  def ndcgFromIndexes(spark: SparkSession, vecIndexDir: String,
      queries: DataFrame, labels: DataFrame, nprobe: Int): DataFrame = {
    val cents = spark.read.parquet(s"$vecIndexDir/centroids")
    val q = queries.select(col("vec_id").as("qid"),
        col("label").as("qlabel"),
        expr("l2_normalize(embedding)").as("qv"))
      .ckpt() // eval battery: feeds probe selection AND the re-score
    val byQ = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cent_id").asc)
    val probes = q.join(broadcast(cents))
      .select(col("qid"), col("cent_id"),
        expr("dot_product(qv, cv)").as("sim"))
      .withColumn("rn", row_number().over(byQ))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("cent_id").as("cell"))
    val cand = VectorIndex.readPostings(spark, vecIndexDir)
      .join(labels.select(col("vec_id"), col("label").as("nlabel")),
        "vec_id")
      .withColumnRenamed("vec_id", "nid")
      .join(broadcast(probes), "cell")
      .where(col("nid") =!= col("qid"))
      .join(broadcast(q.select(col("qid"), col("qlabel"), col("qv"))),
        "qid")
      .select(col("qid"), col("qlabel"), col("nid"), col("nlabel"),
        expr("dot_product(v, qv)").as("sim"))
    SimilarityQueries.ndcgAt10Tail(cand)
  }
}
