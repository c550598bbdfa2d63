package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Ckpt._

/** Persisted exact-substring span index — q190's positioned-8-gram
  * probe structures as durable LIBRARY artifacts, closing the loop the
  * round-6 verdict named: exact-substring dedup (Lee et al. 2022) must
  * screen EVERY ingest batch against the corpus, and re-shingling
  * 100 TB per batch is exactly what an index exists to avoid. Build
  * once over the corpus, then [[probe]] any number of batches in
  * O(batch × matched postings).
  *
  * Layout:
  * {{{
  *   <dir>/grams/  (gram, doc_id, pos)  positioned 8-gram postings,
  *                                      range-clustered + sorted by
  *                                      gram → parquet min/max stats
  *                                      prune non-matching files
  *   <dir>/dfs/    (gram, df)           per-gram document-frequency
  *                                      ledger, one rowset per
  *                                      build/append generation;
  *                                      readers SUM per gram
  *   <dir>/docs/   (doc_id)             indexed-doc membership ledger,
  *                                      one rowset per generation;
  *                                      probe's exact-cap fold reads it
  * }}}
  *
  * Gram extraction is `DedupQueries.positionedGrams` and run assembly
  * is `DedupQueries.spanRuns` — the SAME definitions q190 executes, so
  * the persisted and in-query probes cannot drift (SpanIndexSpec pins
  * probe ≡ q190 byte-for-byte).
  *
  * THE HOT-GRAM CAP IS A PROBE-TIME RULE, not a build-time drop: the
  * postings keep every gram, and the df ledger keeps every count, so
  * an append that pushes a boilerplate gram past the cap retroactively
  * silences it corpus-wide — exactly what a full rebuild would
  * compute, which is what makes append ≡ rebuild EXACT (the
  * [[IndexSink]] contract) instead of approximate. Because df only
  * grows, a gram past the cap is dead forever; [[compact]] exploits
  * that monotonicity to garbage-collect dead grams' postings (the
  * boilerplate navbar that bloated every generation) while the ledger
  * keeps their counts — probe results are untouched.
  *
  * Scale shape: [[probe]] joins batch grams against postings KEYED ON
  * THE GRAM — the shard key at 100 TB; nothing re-shingles the corpus
  * and the per-gram blast radius is bounded by the cap (≤ cap corpus
  * postings per gram reach the join). The windows inside `spanRuns`
  * are bounded by matched-span length, never corpus size.
  */
object SpanIndex {

  /** q190's cap — one constant, shared with the in-query twin. */
  val dfCap: Int = graft.queries.DedupQueries.spanDfCap

  /** The three index relations for one (doc_id, text) batch — ONE
    * shingling shared by build/append/appendDelta. The `docs` ledger
    * (one row per indexed doc_id) exists so [[probe]] can tell which
    * of the probe batch's docs are ALREADY indexed — the membership
    * fact that makes the probe-time cap exact over corpus ∪ batch
    * without double-counting an indexed doc's grams.
    */
  private[sinks] def relations(docs: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val grams = graft.queries.DedupQueries.positionedGrams(docs)
      .ckpt() // feeds postings AND the df ledger
    val clustered = grams
      .repartitionByRange(col("gram"))
      .sortWithinPartitions(col("gram"), col("doc_id"), col("pos"))
    val dfs = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    (clustered, dfs, docs.select(col("doc_id")).distinct())
  }

  /** Shingle and index a (doc_id, text) corpus from scratch. */
  def build(docs: DataFrame, outDir: String): Unit = {
    val (grams, dfs, ids) = relations(docs)
    grams.write.mode(SaveMode.Overwrite).parquet(s"$outDir/grams")
    dfs.write.mode(SaveMode.Overwrite).parquet(s"$outDir/dfs")
    ids.write.mode(SaveMode.Overwrite).parquet(s"$outDir/docs")
  }

  /** Incrementally index a (doc_id, text) batch of NEW docs — O(batch),
    * no corpus re-shingling; postings and df deltas merge at read time
    * (the DedupIndex/TextIndex append contract: appended doc_ids must
    * be new). Routed through the claimed gen-scoped delta tree
    * ([[DeltaIO.nextPlainGen]]'s negative-gen namespace) — a parquet
    * mode-append commit would list + schema-infer the whole main tree
    * (a constant factor that grows with the corpus, the r9 SinkBench
    * flag) and gives concurrent appenders no claim. `claim` defaults
    * to the filesystem create; object stores pass
    * [[ClaimPrimitive.conditionalPut]].
    */
  def append(docs: DataFrame, indexDir: String,
      claim: Option[ClaimPrimitive] = None): Unit =
    appendDelta(docs, indexDir,
      DeltaIO.nextPlainGen(docs.sparkSession, indexDir,
        Seq("grams", "dfs", "docs"), claim))

  /** Replay-safe gen-scoped [[append]] (the [[IndexSink.appendDelta]]
    * contract): postings and df-ledger rows land under gen-scoped
    * delta subtrees with Overwrite, so a replayed micro-batch rewrites
    * its own generation. Under plain append a replay would DOUBLE the
    * batch's df contributions — silently pushing shared grams toward
    * the hot cap and silencing spans a correct index reports; the
    * gen-scoped form makes the df ledger replay-proof.
    */
  def appendDelta(docs: DataFrame, indexDir: String, gen: Long): Unit = {
    val (grams, dfs, ids) = relations(docs)
    DeltaIO.writeGen(grams, indexDir, "grams", gen)
    DeltaIO.writeGen(dfs, indexDir, "dfs", gen)
    DeltaIO.writeGen(ids, indexDir, "docs", gen)
  }

  /** Every indexed doc_id (append + streaming delta generations).
    * Indexes persisted before the docs membership ledger existed have
    * no `docs` relation at all — treat that as an EMPTY ledger (probe
    * then re-screens nothing, exactly the pre-ledger behavior) instead
    * of failing the read with path-not-found.
    */
  private[sinks] def indexedDocs(spark: SparkSession,
      indexDir: String): DataFrame = {
    val hasMain = DeltaIO.exists(spark, s"$indexDir/docs")
    val hasDelta = DeltaIO.exists(spark, s"$indexDir/docs_delta")
    if (hasMain) DeltaIO.readMerged(spark, indexDir, "docs", Seq("doc_id"))
    else if (hasDelta)
      spark.read.parquet(s"$indexDir/docs_delta").select(col("doc_id"))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
  }

  /** Per-gram total df across generations (append + streaming delta). */
  private[sinks] def totalDfs(spark: SparkSession, indexDir: String): DataFrame =
    DeltaIO.readMerged(spark, indexDir, "dfs", Seq("gram", "df"))
      .groupBy(col("gram")).agg(sum(col("df")).as("df"))

  /** The probe-visible postings: grams at or under the cap.
    * `extraDfs`, when given, folds additional (gram, df) counts into
    * the cap computation before thresholding — [[probe]] passes the
    * un-indexed part of its batch so the cap is evaluated over
    * corpus ∪ batch exactly.
    */
  private[sinks] def livePostings(spark: SparkSession, indexDir: String,
      extraDfs: Option[DataFrame] = None): DataFrame = {
    // the hot set is tiny (≤ total_grams / cap rows) → broadcast
    // anti-join, the q190 exclusion shape
    val dfs = extraDfs match {
      case Some(extra) => totalDfs(spark, indexDir).unionByName(extra)
        .groupBy(col("gram")).agg(sum(col("df")).as("df"))
      case None => totalDfs(spark, indexDir)
    }
    val hot = dfs.where(col("df") > dfCap).select(col("gram"))
    DeltaIO.readMerged(spark, indexDir, "grams",
        Seq("gram", "doc_id", "pos"))
      .join(broadcast(hot), Seq("gram"), "left_anti")
  }

  /** Shared verbatim spans between a (doc_id, text) BATCH and the
    * indexed corpus: for every (corpus doc, batch doc) pair sharing at
    * least one ≥8-token verbatim run, the longest run and the count of
    * distinct maximal runs — q190's exact output contract (da, db,
    * longest_run, n_spans), with da from the corpus side and db from
    * the batch. Self-pairs (a doc probed against its own postings) are
    * excluded. Probing the indexed corpus against itself with the
    * da < db half kept reproduces q190 exactly — SpanIndexSpec pins
    * it.
    *
    * The hot-gram cap is evaluated over corpus ∪ batch EXACTLY: the
    * probe folds the batch's own gram counts into the cap — but only
    * for batch docs NOT already indexed (the `docs` ledger supplies
    * membership), so a self-probe of indexed docs never double-counts
    * and stays byte-identical to q190, while a large UN-indexed batch
    * whose own boilerplate pushes a gram past dfCap sees it silenced
    * exactly as q190 over the union would compute (the round-8
    * precondition, closed — SpanIndexSpec pins the cap-crossing
    * un-indexed batch case). Cost: one scan of the tiny docs ledger
    * plus a broadcast semi/anti pair on the batch's doc_ids — the
    * corpus postings are still never re-shingled.
    */
  def probe(spark: SparkSession, indexDir: String,
      batch: DataFrame): DataFrame = {
    val bg = graft.queries.DedupQueries.positionedGrams(batch)
      .ckpt() // feeds the cap fold AND the match join
    // batch docs already in the index: their grams are in the df
    // ledger already — counting them again would double them. The
    // batch doc-id set is small by contract → broadcast both hops.
    val batchIds = batch.select(col("doc_id")).distinct()
    val overlap = indexedDocs(spark, indexDir)
      .join(broadcast(batchIds), Seq("doc_id"), "left_semi")
    val newDfs = bg.join(broadcast(overlap), Seq("doc_id"), "left_anti")
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val m = livePostings(spark, indexDir, Some(newDfs)).alias("a")
      .join(bg.alias("b"),
        col("a.gram") === col("b.gram") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.pos").as("pa"),
        (col("a.pos") - col("b.pos")).as("diag"))
    graft.queries.DedupQueries.spanRuns(m)
  }

  /** Re-cluster every append generation into one tight gram-range file
    * set, fold the df ledger to one row per gram, and GARBAGE-COLLECT
    * dead grams' postings: df only ever grows, so a gram past the cap
    * can never become probe-visible again and its postings are pure
    * storage waste (this is where the boilerplate navbar finally
    * leaves the disk). The ledger keeps the dead grams' counts — an
    * append after compact still sums the true corpus df. No document
    * is re-shingled. Separate dstDir; the swap is the caller's
    * atomic-rename concern (the CorpusExport.compact contract).
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    livePostings(spark, srcDir)
      .repartitionByRange(col("gram"))
      .sortWithinPartitions(col("gram"), col("doc_id"), col("pos"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dstDir/grams")
    totalDfs(spark, srcDir)
      .write.mode(SaveMode.Overwrite).parquet(s"$dstDir/dfs")
    indexedDocs(spark, srcDir).distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$dstDir/docs")
  }
}
