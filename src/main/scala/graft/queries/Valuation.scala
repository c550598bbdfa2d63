package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Ckpt._
import graft.sinks.VectorIndex

/** Index-backed forms of the valuation / diversified-retrieval
  * operators — the 100 TB candidate path the in-query twins (q260,
  * q262, q268) document: candidates come from a persisted
  * [[graft.sinks.VectorIndex]] probe instead of a corpus cross join,
  * and everything downstream rides the SAME shared definitions
  * ([[SimilarityQueries.shapleySweep]], [[SimilarityQueries.mmrSelect]])
  * so the two surfaces cannot drift. ValuationSpec pins:
  *   - [[knnShapleyTopR]] at full R (R = |train|, all cells probed)
  *     ≡ q262 row-for-row, and at R = 64 ≡ q268 (the oracle-gated
  *     truncation semantics);
  *   - [[mmrFromIndex]] with all cells probed ≡ q260.
  *
  * Probe-accuracy tradeoff (nprobe < #cells) is the q120/q194 recall
  * story, measured there; these functions add no approximation of
  * their own beyond the candidate source.
  *
  * Boundary-tie discipline: [[VectorIndex.search]] ranks by RAW cosine
  * (neighbor-id tiebreak) while the shared definitions rank by
  * round(sim, 9) with an id tiebreak, so a round-9 tie group straddling
  * the fetch boundary could differ in membership between the two
  * orders. Both functions therefore over-fetch by a small margin
  * (`fetchMargin`) and re-rank the re-scored candidates by the shared
  * (round-9 DESC, id ASC) order before capping — the cap is decided by
  * the SHARED order, and the margin only has to cover raw-vs-rounded
  * rank inversions at the boundary, which are ULP-sized.
  */
object Valuation {

  private val fetchMargin = 8

  /** Truncated top-R KNN-Shapley (q268's estimator) with per-query
    * candidates from a [[VectorIndex]] probe — the exact sweep over the
    * top R training points per validation query, the tail beyond R
    * folded to zero (each dropped term is bounded by 1/i, so the tail
    * contributes ≤ kNn/R; see the q268 header).
    *
    * @param indexDir index over a corpus CONTAINING `train`'s vectors
    *                 (it may contain more — e.g. the val points, or an
    *                 undivided production corpus; non-train neighbors
    *                 are dropped by the train-label join before
    *                 ranking)
    * @param train    (vec_id, label, embedding) training corpus — the
    *                 points being valued
    * @param valq     (vec_id, label, embedding) validation queries
    *                 (fixed-size by design; ids must be disjoint from
    *                 train's)
    * @param r        truncation rank; r >= |train| (with every cell
    *                 probed and fetchK covering the corpus) makes the
    *                 sweep exact ≡ q262
    * @param nprobe   cells probed per query (the recall knob)
    * @param fetchK   neighbors pulled per query BEFORE the train
    *                 filter; 0 (default) = r + a small tie margin —
    *                 raise it by the expected number of non-train
    *                 interlopers when the index is a superset of train
    * @return (vec_id, label, nq, shap_topr_r) — nq the number of
    *         queries whose top-R retained the point; normalization is
    *         by |valq| (a point outside a query's top-R contributes 0
    *         for that query); points retrieved by no query are absent
    *         (value 0 under the fold)
    *
    * Scale shape: the corpus is never cross-joined — only probed cells
    * are scanned; candidates (|valq|·R rows) re-score against the
    * index's own stored vectors ([[VectorIndex.storedVectors]], id-join
    * pruned by parquet stats); the sweep is O(R log R) per query
    * sharded by qid.
    */
  def knnShapleyTopR(spark: SparkSession, indexDir: String,
      train: DataFrame, valq: DataFrame, r: Int, nprobe: Int,
      kNn: Int = 5, fetchK: Int = 0): DataFrame = {
    val fetch = if (fetchK > 0) fetchK else r + fetchMargin
    val trLabels = train.select(col("vec_id").as("tid"),
      col("label").as("tl"))
    val van = valq.select(col("vec_id").as("qid"),
      col("label").as("ql"),
      expr("l2_normalize(embedding)").as("qv"))
    val ntr = train.agg(count(lit(1)).as("ntr"))
    val nva = valq.agg(count(lit(1)).as("nva"))
    val hits = VectorIndex.search(spark, indexDir,
        valq.select(col("vec_id"), col("embedding")),
        nprobe, topK = fetch)
      .select(col("qid"), col("neighbor_id").as("tid"))
    // re-score at round-9 from the index's stored vectors (search's
    // cos_r is round-6 — display precision, not ranking precision)
    val scored = VectorIndex.storedVectors(spark, indexDir)
      .select(col("vec_id").as("tid"), col("v").as("tv"))
      .join(broadcast(hits), "tid")
      .join(broadcast(van), "qid")
      .select(col("qid"), col("tid"),
        round(expr("dot_product(tv, qv)"), 9).as("sim"),
        col("ql"))
    // label lookup broadcasts the BOUNDED side (|valq|·R candidate
    // rows) into the training-label scan, not the corpus-sized labels
    val cand = trLabels.join(broadcast(scored), "tid")
      .select(col("qid"), col("tid"), col("tl"),
        when(col("tl") === col("ql"), 1).otherwise(0).as("ind"),
        col("sim"))
    SimilarityQueries.shapleySweep(cand, ntr, rCap = Some(r), kNn = kNn)
      .crossJoin(broadcast(nva))
      .select(col("tid").as("vec_id"), col("tl").as("label"),
        col("nq"),
        expr("round(cast(tot as double) / nva, 9)").as("shap_topr_r"))
  }

  /** MMR diversified retrieval (q260's selection) with per-query
    * candidates from a [[VectorIndex]] probe instead of the brute-force
    * top-k scan — the path q260's own header names for scale.
    *
    * @param indexDir index built over the candidate corpus
    * @param queries  (vec_id, embedding) query vectors
    * @param topC     candidate-pool size per query (q260 uses 20)
    * @param nprobe   cells probed per query
    * @param steps    result-list length (q260 uses 8)
    * @return (qid, rank, vec_id, mmr_r) — q260's output contract
    */
  def mmrFromIndex(spark: SparkSession, indexDir: String,
      queries: DataFrame, topC: Int, nprobe: Int,
      steps: Int = 8): DataFrame = {
    val qs = queries.select(col("vec_id").as("qid"),
      expr("l2_normalize(embedding)").as("qv"))
    val hits = VectorIndex.search(spark, indexDir,
        queries, nprobe, topK = topC + fetchMargin)
      .select(col("qid"), col("neighbor_id").as("vec_id"))
    val cand = VectorIndex.storedVectors(spark, indexDir)
      .join(broadcast(hits), "vec_id")
      .join(broadcast(qs), "qid")
      .select(col("qid"), col("vec_id"),
        round(expr("dot_product(qv, v)"), 9).as("simq"), col("v"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("simq").desc, col("vec_id").asc)))
      .where(col("rk") <= topC).drop("rk")
      .ckpt() // bounded: topC rows/query feeding pairs + supersteps
    SimilarityQueries.mmrSelect(cand, steps)
      .select(col("qid"), col("rank"), col("vec_id"),
        col("score").as("mmr_r"))
      .orderBy(col("qid"), col("rank"))
  }
}
