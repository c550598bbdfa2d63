package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Ckpt._

/** Persisted n-gram language model — q184's add-one-smoothed bigram LM
  * (TextQueries.bigramLm) as a durable LIBRARY artifact. Perplexity
  * filtering is a gate every future ingest batch must pass, but the
  * model behind it only changes when the REFERENCE corpus changes —
  * so the counts are exactly what deserves an index: tokenize the
  * reference once, then score any number of candidate batches in
  * O(batch) without re-reading a single reference document.
  *
  * Layout:
  * {{{
  *   <dir>/bigrams/  (w1, w2, c)  bigram counts, range-clustered +
  *                                sorted by (w1, w2) → parquet min/max
  *                                stats prune non-matching files on
  *                                point lookups
  *   <dir>/words/    (w, c)       token unigram counts over docs with
  *                                >= 2 tokens — EXACTLY bigramLm's
  *                                vocab relation (q184 drops 0/1-token
  *                                docs before counting V, so a word
  *                                appearing only in such a doc must
  *                                not inflate the vocab)
  *   <dir>/_format                format-version marker (see
  *                                [[FormatVersion]]) — readers and
  *                                appenders refuse an unmarked tree
  *                                rather than merge pre-v2 counts
  * }}}
  *
  * Both relations are ADDITIVE: merging generations sums counts, so
  * [[append]] is O(batch) (count the batch, land it as a delta
  * generation) and read-time merge ≡ rebuild by arithmetic, not by
  * convention. History counts c1 are NOT persisted — they are exactly
  * Σ_w2 c12 over the vocab²-bounded bigram relation, derived at read
  * time so the two can never disagree.
  *
  * [[score]] is the generalization of q184's scorer to batches the
  * model has never seen: a candidate bigram absent from the reference
  * scores ln(1/(c1 + V)) (the add-one floor; c1 = 0 for an unseen
  * history), the same formula with c12 = 0 — so scoring the indexed
  * corpus itself reproduces q184 byte-for-byte (LmIndexSpec pins it),
  * and each ln term keeps q184's round-at-9 discipline over exact
  * integer counts.
  *
  * Scale shape: [[score]] joins candidate bigrams against the
  * persisted counts KEYED ON (w1, w2) — the natural shard key; the
  * reference corpus never rescans. The count relations are
  * vocab/vocab²-bounded, so at 100 TB the planner broadcasts them
  * into the batch scan while the batch side stays partition-local.
  * [[probeNext]] point lookups push `w1 IN (...)` into the parquet
  * scan and read only range-matching files.
  */
object LmIndex {

  /** On-disk format version, stamped as a tiny `<dir>/_format` file.
    *
    * v1 (UNMARKED — indexes built before this marker existed): words/
    * counted unigrams over ALL docs. v2: words/ counts over >=2-token
    * docs only (exactly bigramLm's V — see [[relations]]). The change
    * is silent at the file level: both layouts are a (w, c) parquet
    * relation, so an old-generation tree appended to (or merged with)
    * a v2 one would sum INCOMPATIBLE vocab counts and score() would
    * reproduce neither q184 nor the old behavior. Every writer stamps
    * the marker; every reader and appender refuses an unmarked or
    * older tree with a rebuild instruction instead of merging it.
    */
  private[sinks] val FormatVersion = 2

  private def fmtPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_format")

  private def stampFormat(spark: SparkSession, dir: String): Unit = {
    val p = fmtPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(s"lmindex.format=$FormatVersion\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** Refuse to touch a pre-v2 (unmarked) or future-format tree. A
    * fully fresh directory (no relations yet) passes — build/append
    * stamp it on first write.
    */
  private[sinks] def requireFormat(spark: SparkSession, dir: String): Unit = {
    val p = fmtPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val ver = txt.linesIterator.toSeq.headOption
        .flatMap(l => scala.util.Try(
          l.stripPrefix("lmindex.format=").trim.toInt).toOption)
      if (!ver.contains(FormatVersion)) throw new IllegalStateException(
        s"rebuild-required: LmIndex at $dir declares format $ver, not " +
          s"$FormatVersion — refusing to mix incompatible count " +
          "generations; re-run LmIndex.build(docs, dir) over the full " +
          "corpus to migrate")
    } else if (DeltaIO.exists(spark, s"$dir/bigrams") ||
        DeltaIO.exists(spark, s"$dir/bigrams_delta")) {
      throw new IllegalStateException(
        s"rebuild-required: LmIndex at $dir has no _format marker: it " +
          "predates the v2 words/ semantics (unigram counts over " +
          ">=2-token docs only, matching q184's vocab). Appending to or " +
          "scoring it would silently merge incompatible vocab counts — " +
          "re-run LmIndex.build(docs, dir) over the full corpus to " +
          "migrate")
    }
  }

  /** Tokenizer — THE engine-wide word rule (TextQueries.wordsExpr). */
  private val W = graft.queries.TextQueries.wordsExpr

  /** The two count relations for one (doc_id, text) batch — ONE
    * tokenization shared by build/append/appendDelta.
    */
  private[sinks] def relations(docs: DataFrame): (DataFrame, DataFrame) = {
    // tokenized ONCE; docs under 2 tokens are dropped HERE so both
    // relations see the same doc set — bigramLm's V counts distinct
    // words over >=2-token docs only, and score() must reproduce q184
    // byte-for-byte (a vocab-unique word in a 1-token doc would
    // otherwise inflate V and shift every smoothed lp term)
    val toks = docs.select(expr(W).as("ws"))
      .where(size(col("ws")) >= 2).ckpt()
    val bigrams = toks
      .select(explode(expr(
        """transform(sequence(1, size(ws) - 1),
           i -> struct(element_at(ws, i) as w1,
                       element_at(ws, i + 1) as w2))""")).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
      .repartitionByRange(col("w1"), col("w2"))
      .sortWithinPartitions(col("w1"), col("w2"))
    val words = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    (bigrams, words)
  }

  /** Count and index a (doc_id, text) reference corpus from scratch. */
  def build(docs: DataFrame, outDir: String): Unit = {
    val (bigrams, words) = relations(docs)
    bigrams.write.mode("overwrite").parquet(s"$outDir/bigrams")
    words.write.mode("overwrite").parquet(s"$outDir/words")
    stampFormat(docs.sparkSession, outDir)
  }

  /** Incrementally fold a (doc_id, text) batch of NEW reference docs
    * into the model — O(batch): the batch's own counts land as a
    * fresh delta generation (the negative-gen namespace, so the
    * commit never lists the main tree) and SUM into the model at read
    * time. Unlike the doc-keyed sinks there is no novelty requirement
    * on ids — counts are additive by nature — but indexing the same
    * TEXT twice doubles its evidence, exactly as rebuild would.
    * Exactly-once callers only; at-least-once callers use
    * [[appendDelta]].
    */
  def append(docs: DataFrame, indexDir: String,
      claim: Option[ClaimPrimitive] = None): Unit = {
    // format check BEFORE allocating a gen claim, so a refused append
    // leaves no stale claim marker behind
    requireFormat(docs.sparkSession, indexDir)
    appendDelta(docs, indexDir,
      DeltaIO.nextPlainGen(docs.sparkSession, indexDir,
        Seq("bigrams", "words"), claim))
  }

  /** Replay-safe gen-scoped [[append]] (the [[IndexSink.appendDelta]]
    * contract): a replayed micro-batch rewrites its own generation
    * instead of double-counting its evidence.
    */
  def appendDelta(docs: DataFrame, indexDir: String, gen: Long): Unit = {
    requireFormat(docs.sparkSession, indexDir)
    val (bigrams, words) = relations(docs)
    DeltaIO.writeGen(bigrams, indexDir, "bigrams", gen)
    DeltaIO.writeGen(words, indexDir, "words", gen)
    stampFormat(docs.sparkSession, indexDir)
  }

  /** Merged-and-summed bigram counts across main + delta gens — the
    * canonical model relation (what every reader consumes).
    */
  private[sinks] def readBigrams(spark: SparkSession,
      indexDir: String): DataFrame = {
    requireFormat(spark, indexDir)
    DeltaIO.readMerged(spark, indexDir, "bigrams", Seq("w1", "w2", "c"))
      .groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("c"))
  }

  /** Merged-and-summed token counts across main + delta gens. */
  private[sinks] def readWords(spark: SparkSession,
      indexDir: String): DataFrame = {
    requireFormat(spark, indexDir)
    DeltaIO.readMerged(spark, indexDir, "words", Seq("w", "c"))
      .groupBy(col("w")).agg(sum(col("c")).as("c"))
  }

  /** Score a (doc_id, text) candidate batch under the indexed model:
    * per doc, the bigram count and add-one-smoothed perplexity —
    * q184's exact report when the batch IS the indexed corpus
    * (spec-pinned), and the smoothed-floor generalization for text
    * the model has never seen.
    */
  def score(spark: SparkSession, indexDir: String,
      batch: DataFrame): DataFrame = {
    val c12 = readBigrams(spark, indexDir)
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
    // vocab size = the ROW COUNT of the merged word relation (it is
    // already grouped by w) — no countDistinct expand needed
    val v = readWords(spark, indexDir).agg(count(lit(1)).as("v"))
    val bg = batch.select(col("doc_id"), expr(W).as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
           i -> struct(element_at(ws, i) as w1,
                       element_at(ws, i + 1) as w2))""")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    bg.join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      // q184's lp formula with absent counts floored at 0 — the
      // add-one smoothing that makes unseen bigrams finite; same
      // round-at-9 per term, round-at-6 perplexity
      .select(col("doc_id"), expr(
        """round(ln((cast(coalesce(c, 0) as double) + 1.0d)
           / (cast(coalesce(c1, 0) as double) + cast(v as double))),
           9)""").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-avg(col("lp"))), 6).as("ppl"))
  }

  /** Score a (doc_id, text) candidate batch under the interpolated
    * Kneser-Ney model derived from the SAME persisted count relations
    * (q259's exact formulation — D = 0.75, continuation-count
    * backoff): every KN statistic (c12, c1 = Σ_w2 c12, the distinct-
    * continuation counts N1+(w1,·) / N1+(·,w2), the distinct-bigram
    * total) is derived at read time from the merged bigram relation,
    * so the add-one and KN scorers can never disagree about the
    * counts. Scoring the indexed corpus reproduces q259 byte-for-byte
    * (spec-pinned). Generalization to unseen text: an unseen bigram
    * over a seen history scores the discounted-backoff mass
    * D·N1+(w1,·)·p_cont(w2)/c1 (c12 = 0 in the same formula); a fully
    * unseen history or continuation falls to the floor 1/(B+1), where
    * B is the distinct-bigram-TYPE count (the `nall` normalizer the KN
    * continuation probabilities already use — NOT the unigram vocab
    * size V) — finite everywhere, like score()'s add-one floor.
    */
  def scoreKn(spark: SparkSession, indexDir: String,
      batch: DataFrame): DataFrame = {
    val c12 = readBigrams(spark, indexDir).ckpt()
    val hist = c12.groupBy(col("w1"))
      .agg(sum(col("c")).as("c1"), count(lit(1)).as("n1f"))
    val cont = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val nall = c12.agg(count(lit(1)).as("nall"))
    val bg = batch.select(col("doc_id"), expr(W).as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
           i -> struct(element_at(ws, i) as w1,
                       element_at(ws, i + 1) as w2))""")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    bg.join(c12, Seq("w1", "w2"), "left")
      .join(hist, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(nall))
      // q259's formula verbatim when all counts are present; absent
      // counts floor to the 1/(B+1) interpolation, B = nall the
      // distinct-bigram-TYPE count (unseen
      // history or unseen continuation word)
      .select(col("doc_id"), expr(
        """round(ln(case
             when c1 is null or n1b is null
               then 1.0d / (cast(nall as double) + 1.0d)
             else (greatest(cast(coalesce(c, 0) as double) - 0.75d, 0.0d)
               + 0.75d * cast(n1f as double) * cast(n1b as double)
                 / cast(nall as double))
               / cast(c1 as double) end), 9)""").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-avg(col("lp"))), 6).as("ppl_kn"))
  }

  /** Point lookup: the indexed continuations of the given history
    * words, with their smoothed conditional probabilities — the
    * `w1 IN (...)` filter reaches the parquet scan, so only
    * range-matching bigram files are read.
    */
  def probeNext(spark: SparkSession, indexDir: String,
      histories: Seq[String], k: Int = 5): DataFrame = {
    val hits = readBigrams(spark, indexDir)
      .where(col("w1").isin(histories: _*))
    val c1 = hits.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
    val v = readWords(spark, indexDir).agg(count(lit(1)).as("v"))
    val ranked = hits.join(c1, "w1").crossJoin(broadcast(v))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("w1"))
          .orderBy(col("c").desc, col("w2").asc)))
      .where(col("rk") <= k)
    ranked.select(col("w1"), col("w2"), col("c"),
        expr("""round((cast(c as double) + 1.0d)
                / (cast(c1 as double) + cast(v as double)), 9)""")
          .as("p_next_r"))
      .orderBy(col("w1"), col("rk"))
  }

  /** Fold every append generation back into one tight count tree —
    * counts are SUMMED (arithmetic fold, no document recounted),
    * re-clustered by (w1, w2) for pushdown.
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    readBigrams(spark, srcDir)
      .repartitionByRange(col("w1"), col("w2"))
      .sortWithinPartitions(col("w1"), col("w2"))
      .write.mode("overwrite").parquet(s"$dstDir/bigrams")
    readWords(spark, srcDir)
      .write.mode("overwrite").parquet(s"$dstDir/words")
    stampFormat(spark, dstDir)
  }
}
