package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index — the postings/statistics structures
  * behind q132 (BM25) and q139 (boolean retrieval) as durable LIBRARY
  * artifacts: tokenize and aggregate the corpus once, then serve any
  * number of term queries without re-reading a single document.
  *
  * Layout:
  * {{{
  *   <dir>/postings/  (word, doc_id, tf)  range-clustered + sorted by
  *                                        word → parquet min/max stats
  *                                        prune non-matching files and
  *                                        row groups at the scan
  *   <dir>/doclens/   (doc_id, dl)        per-doc token counts
  *   <dir>/stats/     (nn, toktot)        one row: corpus totals
  * }}}
  *
  * Scale shape: a term lookup pushes `word IN (...)` into the parquet
  * scan (PushedFilters — the spec asserts it), so only the files whose
  * word range covers a query term are read: the inverted-index access
  * path, file-pruned instead of B-tree-walked. Scoring then touches
  * only matching postings; doc lengths join co-keyed on doc_id and the
  * one-row stats broadcast. BM25 constants and every tiebreak match
  * q132 (k1 = 1.2, b = 0.75, Robertson +1 idf, round-9 rank key,
  * doc_id tiebreak, round-6 emitted score); TextIndexSpec pins search
  * over the persisted index byte-for-byte to the in-query q132 plan.
  */
object TextIndex {

  /** Tokenize and index a (doc_id, text) corpus. */
  def build(docs: DataFrame, outDir: String): Unit = {
    val toks = docs.select(col("doc_id"),
        explode(expr(graft.queries.TextQueries.wordsExpr)).as("word"))
      .localCheckpoint() // feeds postings AND doclens/stats
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    toks.groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      // range-cluster + sort by word: every file covers a tight word
      // range, so a term filter prunes files via parquet min/max stats
      .repartitionByRange(col("word"))
      .sortWithinPartitions(col("word"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$outDir/postings")
    dl.write.mode("overwrite").parquet(s"$outDir/doclens")
    dl.agg(count(lit(1)).as("nn"), sum(col("dl")).as("toktot"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/stats")
  }

  /** BM25 top-k over the persisted index for a bag of query terms —
    * q132's scorer and output contract: (rk, doc_id, n_terms, score).
    */
  def searchBm25(spark: SparkSession, indexDir: String,
      terms: Seq[String], topK: Int): DataFrame = {
    val tf = spark.read.parquet(s"$indexDir/postings")
      .where(col("word").isin(terms: _*))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val dl = spark.read.parquet(s"$indexDir/doclens")
    val totals = spark.read.parquet(s"$indexDir/stats")
    val scored = tf.join(broadcast(df), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("avgdl", col("toktot").cast("double") / col("nn"))
      .withColumn("part",
        log(lit(1.0d) + (col("nn").cast("double") - col("df") +
          lit(0.5d)) / (col("df").cast("double") + lit(0.5d))) *
          (col("tf").cast("double") * lit(2.2d)) /
          (col("tf").cast("double") + lit(1.2d) *
            (lit(0.25d) + lit(0.75d) *
              col("dl").cast("double") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("part")).as("score_raw"),
        count(lit(1)).as("n_terms"))
    scored
      .withColumn("key", round(col("score_raw"), 9))
      .orderBy(col("key").desc, col("doc_id").asc)
      .limit(topK)
      .withColumn("rk", row_number().over(
        graft.queries.Q.bounded.orderBy(
          col("key").desc, col("doc_id").asc)))
      .select(col("rk"), col("doc_id"), col("n_terms"),
        round(col("score_raw"), 6).as("score"))
  }
}
