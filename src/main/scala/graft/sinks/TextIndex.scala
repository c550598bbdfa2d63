package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index — the postings/statistics structures
  * behind q132 (BM25) and q139 (boolean retrieval) as durable LIBRARY
  * artifacts: tokenize and aggregate the corpus once, then serve any
  * number of term queries without re-reading a single document.
  *
  * Layout:
  * {{{
  *   <dir>/postings/  (word, doc_id, tf,  range-clustered + sorted by
  *                     positions[])       word → parquet min/max stats
  *                                        prune non-matching files and
  *                                        row groups at the scan;
  *                                        positions are 0-based per doc
  *                                        (phrase search reads them,
  *                                        bag-of-words scorers skip the
  *                                        column via parquet projection)
  *   <dir>/doclens/   (doc_id, dl)        per-doc token counts
  *   <dir>/stats/     (nn, toktot)        one row PER build/append
  *                                        delta; readers SUM
  * }}}
  *
  * Incremental maintenance ([[append]]) is O(batch): each batch writes
  * its own range-clustered postings delta files (their min/max stats
  * prune independently — a term lookup reads only word-range-matching
  * files from EVERY generation), appends its doclens rows, and appends
  * a one-row (nn, toktot) delta to stats. Readers merge at read time:
  * parquet unions delta files natively and [[readTotals]] sums the
  * stats log — the DedupIndex.append contract, and TextIndexSpec pins
  * append-then-search ≡ full rebuild. Contract: appended doc_ids must
  * be NEW (dedup/ingest upstream decides admission — same as
  * DedupIndex); re-appending an indexed doc would double-count it.
  * Many small appends accumulate delta files; compaction is re-running
  * [[build]] over the full corpus (mode Overwrite).
  *
  * Scale shape: a term lookup pushes `word IN (...)` into the parquet
  * scan (PushedFilters — the spec asserts it), so only the files whose
  * word range covers a query term are read: the inverted-index access
  * path, file-pruned instead of B-tree-walked. Scoring then touches
  * only matching postings; doc lengths join co-keyed on doc_id and the
  * one-row summed stats broadcast. The BM25 math and result contract
  * are `Q.bm25Aggregate`/`Q.bm25TopK` — the SAME definitions q132
  * executes, so the persisted and in-query rankers cannot drift;
  * TextIndexSpec additionally pins search over the persisted index
  * byte-for-byte to the in-query q132 plan.
  */
object TextIndex {

  private def write(docs: DataFrame, outDir: String,
      mode: SaveMode): Unit = {
    val toks = docs.select(col("doc_id"),
        posexplode(expr(graft.queries.TextQueries.wordsExpr))
          .as(Seq("pos", "word")))
      .localCheckpoint() // feeds postings AND doclens/stats
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .localCheckpoint() // feeds doclens AND the stats delta
    toks.groupBy(col("word"), col("doc_id"))
      // positions ride along sorted (0-based, per doc) — the
      // positional-postings payload phrase search reads; bag-of-words
      // scorers (BM25, boolean) never deserialize the column thanks to
      // parquet's columnar projection
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      // range-cluster + sort by word: every file covers a tight word
      // range, so a term filter prunes files via parquet min/max stats
      // (per append generation — deltas prune independently)
      .repartitionByRange(col("word"))
      .sortWithinPartitions(col("word"), col("doc_id"))
      .write.mode(mode).parquet(s"$outDir/postings")
    dl.write.mode(mode).parquet(s"$outDir/doclens")
    dl.agg(count(lit(1)).as("nn"), sum(col("dl")).as("toktot"))
      .coalesce(1).write.mode(mode).parquet(s"$outDir/stats")
  }

  /** Tokenize and index a (doc_id, text) corpus from scratch. */
  def build(docs: DataFrame, outDir: String): Unit =
    write(docs, outDir, SaveMode.Overwrite)

  /** Incrementally index a (doc_id, text) batch of NEW docs — O(batch),
    * no corpus rescan: postings/doclens deltas + a one-row stats delta
    * (merged at read; see the object scaladoc for the contract).
    */
  def append(docs: DataFrame, indexDir: String): Unit =
    write(docs, indexDir, SaveMode.Append)

  /** Corpus totals merged across build/append generations: one row
    * (nn, toktot).
    */
  private def readTotals(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/stats")
      .agg(sum(col("nn")).as("nn"), sum(col("toktot")).as("toktot"))

  /** BM25 top-k over the persisted index for a bag of query terms —
    * q132's scorer and output contract: (rk, doc_id, n_terms, score).
    */
  def searchBm25(spark: SparkSession, indexDir: String,
      terms: Seq[String], topK: Int): DataFrame = {
    val tf = spark.read.parquet(s"$indexDir/postings")
      .where(col("word").isin(terms: _*))
      .select(col("word"), col("doc_id"), col("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val dl = spark.read.parquet(s"$indexDir/doclens")
    val scored = graft.queries.Q.bm25Aggregate(
      tf, df, dl, readTotals(spark, indexDir))
    graft.queries.Q.bm25TopK(scored, topK)
  }

  /** Exact phrase search over the positional postings — q189's matcher
    * (`Q.phraseHits`, the shared anchor-vote scorer) and output
    * contract (doc_id, n_hits, first_pos), but starting from the
    * word-pruned postings scan instead of a corpus re-tokenization:
    * only files whose word range covers a phrase word are read, then
    * each surviving posting explodes back to (pos, w) votes. The spec
    * pins parity with the in-query q189 plan over the same corpus.
    */
  def searchPhrase(spark: SparkSession, indexDir: String,
      phrase: Seq[String]): DataFrame = {
    val toks = spark.read.parquet(s"$indexDir/postings")
      .where(col("word").isin(phrase.distinct: _*))
      .select(col("doc_id"), col("word").as("w"),
        explode(col("positions")).as("pos"))
    graft.queries.Q.phraseHits(toks, phrase)
  }

  /** Compact an appended index: re-cluster EVERY postings generation
    * into one word-range-sorted generation (a term lookup then prunes
    * one tight file set instead of one per append), consolidate
    * doclens, and fold the stats log to a single row — all without
    * re-tokenizing a document (contrast [[build]], which re-reads the
    * corpus). Writes to a separate directory; the swap is the caller's
    * atomic-rename concern (the CorpusExport.compact contract — never
    * read-and-overwrite one path in a single job).
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    spark.read.parquet(s"$srcDir/postings")
      .repartitionByRange(col("word"))
      .sortWithinPartitions(col("word"), col("doc_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dstDir/postings")
    spark.read.parquet(s"$srcDir/doclens")
      .write.mode(SaveMode.Overwrite).parquet(s"$dstDir/doclens")
    readTotals(spark, srcDir)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dstDir/stats")
  }
}
