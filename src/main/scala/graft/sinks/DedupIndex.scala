package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Ckpt._

/** Persisted dedup index — q83's incremental-dedup probe structures as
  * durable LIBRARY artifacts, so each ingest batch is checked against
  * the corpus WITHOUT rescanning it: build once over the corpus, then
  * `classify` any number of new batches in O(batch).
  *
  * Layout:
  * {{{
  *   <dir>/fingerprints/  (doc_id, fp)                    exact probe
  *   <dir>/bands/         (doc_id, bucket, sig_0..sig_7)  fuzzy probe
  * }}}
  *
  * The exact probe is a fingerprint equi-join (batch side small → the
  * planner broadcasts it into the index scan); the fuzzy probe joins
  * MinHash band buckets new×corpus only — the bucket hash is the
  * shuffle key at scale, and no corpus self-join ever runs. Hashing
  * (md5 fingerprint, 8 MinHash fields from 2 md5 digests per shingle,
  * 4×2 band buckets) restates q23/q83's exact arithmetic;
  * DedupIndexSpec pins classify-over-the-persisted-index byte-for-byte
  * to the in-query q83 classification, so the two cannot drift.
  */
object DedupIndex {

  /** 8 MinHash fields as MIN aggregates over the shingle Generator —
    * map-side combinable, no per-doc arrays (q23's recipe: 2 digests
    * per shingle, 4 disjoint 8-hex-char fields each; fixed-width hex
    * compares lexicographically == numerically).
    */
  private[sinks] def sigs(docs: DataFrame): DataFrame = {
    val minhashes = (0 until 8).map { j =>
      val seed = if (j < 4) "A|" else "B|"
      val lo = (j % 4) * 8 + 1
      min(substring(
        md5(concat(lit(seed), col("shingle")).cast("binary")), lo, 8))
        .as(s"sig_$j")
    }
    docs.select(col("doc_id"),
        graft.functions.Shingles.shingles(col("text"), 3).as("shingle"))
      .groupBy(col("doc_id"))
      .agg(minhashes.head, minhashes.tail: _*)
  }

  /** 4 band buckets (2 signature fields each) per signature row. */
  private[sinks] def banded(sig: DataFrame): DataFrame =
    sig.withColumn("bucket",
      explode(array((0 until 4).map(b =>
        md5(concat(col(s"sig_${2 * b}"), col(s"sig_${2 * b + 1}"))
          .cast("binary"))): _*)))

  /** Index a (doc_id, text) corpus: exact-dup fingerprints + banded
    * MinHash signatures.
    */
  def build(docs: DataFrame, outDir: String): Unit = {
    docs.select(col("doc_id"),
        graft.queries.Q.fingerprint(col("text")).as("fp"))
      .write.mode("overwrite").parquet(s"$outDir/fingerprints")
    banded(sigs(docs))
      .write.mode("overwrite").parquet(s"$outDir/bands")
  }

  /** Incrementally index a (doc_id, text) batch — the post-classify
    * step of a continuous ingest: docs accepted into the corpus append
    * their fingerprints and banded signatures so the NEXT batch dedups
    * against them too. O(batch), no corpus rescan; hashing is
    * identical to build, so append-then-classify equals a full rebuild
    * (DedupIndexSpec pins it).
    */
  def append(docs: DataFrame, indexDir: String,
      claim: Option[ClaimPrimitive] = None): Unit =
    // Routed through the gen-scoped delta tree (negative-gen namespace
    // — see DeltaIO.nextPlainGen) instead of parquet mode-append on the
    // main tree: the mode-append commit lists + schema-infers the whole
    // main tree, a constant factor that grows with the corpus (the r9
    // 10× SinkBench flag). The delta write is O(batch) at any index
    // size; readers merge and compact folds, exactly as for streaming.
    appendDelta(docs, indexDir,
      DeltaIO.nextPlainGen(docs.sparkSession, indexDir,
        Seq("fingerprints", "bands"), claim))

  /** Replay-safe gen-scoped [[append]] (the [[IndexSink.appendDelta]]
    * contract): a replayed micro-batch rewrites its own generation. A
    * duplicated fingerprint row would not change classify's min-id
    * answer, but it doubles probe fan-out and corrupts any consumer
    * counting index rows — the contract is uniform across sinks on
    * purpose.
    */
  def appendDelta(docs: DataFrame, indexDir: String, gen: Long): Unit = {
    DeltaIO.writeGen(
      docs.select(col("doc_id"),
        graft.queries.Q.fingerprint(col("text")).as("fp")),
      indexDir, "fingerprints", gen)
    DeltaIO.writeGen(banded(sigs(docs)), indexDir, "bands", gen)
  }

  /** Fingerprints across the main tree and every streaming delta gen. */
  private[sinks] def readFingerprints(spark: SparkSession,
      indexDir: String): DataFrame =
    DeltaIO.readMerged(spark, indexDir, "fingerprints",
      Seq("doc_id", "fp"))

  /** Banded signatures across the main tree and every delta gen. */
  private[sinks] def readBands(spark: SparkSession,
      indexDir: String): DataFrame =
    DeltaIO.readMerged(spark, indexDir, "bands",
      Seq("doc_id", "bucket") ++ (0 until 8).map(j => s"sig_$j"))

  /** Classify a (doc_id, text) batch against the persisted corpus
    * index: exact_dup (fingerprint present), near_dup (≥6/8 signature
    * agreement with a corpus doc sharing a band bucket), or unique —
    * with the smallest matching corpus doc_id as evidence (q83's
    * output contract).
    *
    * INTRA-BATCH duplicates are out of scope (q83's batch-vs-corpus
    * contract): the batch is checked only against the persisted index,
    * so two identical NEW docs in one batch both classify `unique`.
    * Either pre-dedup the batch (q22's exact/q23's near rules) or
    * split it — append the accepted docs, then classify the next slice
    * against the now-updated index.
    */
  def classify(spark: SparkSession, indexDir: String,
      batch: DataFrame): DataFrame = {
    val fps = readFingerprints(spark, indexDir)
    val bfp = batch.select(col("doc_id"),
        graft.queries.Q.fingerprint(col("text")).as("fp"))
      .ckpt() // feeds the exact probe AND the final assembly
    val exact = bfp.alias("n")
      .join(fps.alias("c"), col("n.fp") === col("c.fp"))
      .groupBy(col("n.doc_id").as("doc_id"))
      .agg(min(col("c.doc_id")).as("exact_match"))
    val idx = readBands(spark, indexDir)
    val agree = (0 until 8)
      .map(j => s"(case when a.sig_$j = b.sig_$j then 1 else 0 end)")
      .mkString(" + ")
    val near = banded(sigs(batch)).alias("a")
      .join(idx.alias("b"), col("a.bucket") === col("b.bucket"))
      .where(expr(s"($agree) >= 6"))
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(min(col("b.doc_id")).as("near_match"))
    bfp.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        expr("""case when exact_match is not null then 'exact_dup'
                     when near_match is not null then 'near_dup'
                     else 'unique' end""").as("status"),
        coalesce(col("exact_match"), col("near_match"), lit(-1L))
          .as("match_id"))
  }

  /** Compact an appended index: consolidate each probe structure's
    * accumulated append-delta files into one generation. Probes are
    * equi-joins (no file-range pruning to preserve), so this is purely
    * the small-files consolidation — rows are untouched. Separate
    * dstDir; the swap is the caller's atomic-rename concern (the
    * CorpusExport.compact contract).
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    readFingerprints(spark, srcDir) // main + every streaming delta gen
      .repartition(col("fp"))
      .write.mode("overwrite").parquet(s"$dstDir/fingerprints")
    readBands(spark, srcDir)
      .repartition(col("bucket"))
      .write.mode("overwrite").parquet(s"$dstDir/bands")
  }
}
