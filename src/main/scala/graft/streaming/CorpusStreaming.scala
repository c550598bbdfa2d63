package graft.streaming

import graft.sinks.CorpusExport
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Streaming corpus ingest — the continuous twin of the batch pipeline
  * (q52 funnel → q22 exact dedup → q51 split → CorpusExport): documents
  * arrive as a stream, are feature-scored in the same single map pass,
  * deduplicated on content fingerprint with watermark-bounded state,
  * and each micro-batch of survivors is appended to the partitioned
  * corpus tree.
  *
  * Scale: the only stateful operator is the fingerprint dedup, keyed by
  * md5 — state shards across executors and the watermark forgets
  * fingerprints older than the horizon, so state is bounded on an
  * infinite crawl. Everything else is stateless per-row work.
  */
object CorpusStreaming {

  /** Funnel survivors of a document stream (needs an `ingest_ts`
    * timestamp column): exact-dup losers within the watermark horizon
    * are dropped first (same fingerprint rule as q22 — state, not a
    * window, because the stream has no fixed corpus to rank), then the
    * q52 quality thresholds apply, then the q51 split is attached.
    */
  def cleanStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    cleanWithFp(
      docs.withColumn("fp", graft.queries.Q.fingerprint(col("text"))),
      watermark)

  /** Shared tail for streams that ALREADY carry the content
    * fingerprint — private so the public contract stays "fp is always
    * derived from text" (a caller-supplied column named fp with other
    * semantics must not silently become the dedup key).
    */
  private def cleanWithFp(docs: DataFrame, watermark: String): DataFrame = {
    import graft.queries.PipelineQueries.{minStopRatio, minTokens,
      splitExprSpark, stopRatioExprSpark}
    docs
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("fp"))
      .withColumn("ws", expr(graft.queries.TextQueries.wordsExpr))
      .withColumn("n_tokens", expr("cast(size(ws) as bigint)"))
      .withColumn("stop_ratio", expr(stopRatioExprSpark))
      .where(col("n_tokens") >= minTokens && col("stop_ratio") >= minStopRatio)
      .withColumn("split", expr(splitExprSpark))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_tokens"), col("split"))
  }

  /** Incremental ingest against an EXISTING corpus: documents whose
    * fingerprint already appears in the historical index are dropped
    * before the in-stream dedup/funnel run. Stream-static anti-join —
    * stateless on the stream side (the static index is re-read per
    * micro-batch, with its filters/pruning pushed down), so unlike
    * [[cleanStream]]'s watermark state this dedups against the WHOLE
    * history, not just the watermark horizon. The two compose: history
    * handles everything already ingested, state handles dups arriving
    * within the current horizon.
    *
    * @param historical any frame with a `fp` column (e.g. the corpus
    *                   tree with `Q.fingerprint(text)` applied, or a
    *                   precomputed fingerprint index)
    */
  def cleanStreamIncremental(docs: DataFrame, historical: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val fresh = docs
      .withColumn("fp", graft.queries.Q.fingerprint(col("text")))
      .join(historical.select(col("fp")), Seq("fp"), "left_anti")
    cleanWithFp(fresh, watermark) // reuses the fp column, no recompute
  }

  /** Streaming decontamination alerts against a persisted
    * `sinks.ContamIndex`: every streamed document that shares ≥ 1
    * 13-gram with the indexed held-out sets emits ONE (doc_id,
    * ingest_ts) alert row — the continuous twin of the q56 batch
    * screen, so eval-set leakage is caught AT INGEST instead of at the
    * next corpus audit. Shingling is the same `Shingles` generator the
    * index was built with (one shared contract, like the fingerprint
    * dedup above).
    *
    * Scale: the gram explode is stateless per-row work; the join is
    * stream-static keyed on the gram (the static postings re-read per
    * micro-batch with pushdown — eval sets are small by construction,
    * so the planner broadcasts them); the only state is the per-doc
    * alert dedup, watermark-bounded like the fingerprint state.
    *
    * @param postings the index's postings relation (any frame with a
    *                 `g` column, e.g. `spark.read.parquet(idx/postings)`)
    */
  def contaminationAlerts(docs: DataFrame, postings: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ingest_ts", watermark)
      .select(col("doc_id"), col("ingest_ts"),
        graft.functions.Shingles.shingles(col("text"), 13).as("g"))
      .join(postings.select(col("g")).distinct(), "g")
      .dropDuplicatesWithinWatermark(Seq("doc_id"))
      .select(col("doc_id"), col("ingest_ts"))

  /** Streaming PII alerts — the continuous twin of the q218 batch
    * scrub: every streamed document matching a PII pattern emits ONE
    * (doc_id, ingest_ts, n_emails, n_phones) row, so leaked personal
    * data is flagged AT INGEST, before the document ever lands in a
    * release tree. Patterns are `TextQueries.piiEmailPat/piiPhonePat`
    * — the SAME definitions q218 redacts with, so the monitor fires on
    * exactly what the scrub would rewrite (the contaminationAlerts
    * shared-contract pattern).
    *
    * Scale: pattern counting is stateless per-row work on the scan
    * side (payloads never shuffle); the only state is the per-doc
    * alert dedup, watermark-bounded like the fingerprint state.
    */
  def piiAlerts(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ingest_ts", watermark)
      .select(col("doc_id"), col("ingest_ts"),
        regexp_count(col("text"),
          lit(graft.queries.TextQueries.piiEmailPat)).cast("long")
          .as("n_emails"),
        regexp_count(col("text"),
          lit(graft.queries.TextQueries.piiPhonePat)).cast("long")
          .as("n_phones"))
      .where(col("n_emails") + col("n_phones") > 0)
      .dropDuplicatesWithinWatermark(Seq("doc_id"))

  final case class PackedDoc(
      doc_id: Long,
      shard: Long,
      n_tok: Long,
      start_tok: Long,
      end_tok: Long,
      first_block: Long,
      last_block: Long,
      split_block: Boolean)

  /** Streaming sequence packing — q217's concat-and-chunk layout as
    * continuous ingest: each output shard's writer keeps its running
    * token total as ONE long of keyed state, and every arriving
    * document is assigned its [start, end) token interval and block
    * span AT ARRIVAL (the offsets a streaming shard writer needs to
    * place the doc without re-reading anything). Within a micro-batch
    * docs process in doc_id order, so when batches arrive id-ordered
    * the assignments equal the batch q217 cumsum exactly
    * (spec-pinned); under arbitrary arrival the assignment is
    * arrival-ordered — which is the DEFINITION of packing a stream.
    *
    * Scale: state is O(shards) longs regardless of volume; the only
    * shuffle keys on the shard — the writer parallelism unit. `shards`
    * and `block` default to the SAME constants the q217 batch audit
    * uses (`PipelineQueries.packShards`/`packBlock` — one definition,
    * so the twins cannot pack to different layouts); raise `shards` to
    * raise ingest parallelism (state stays one long per shard).
    * CorpusStreamingSpec pins twin parity at a NON-default count.
    */
  def packingAssignments(docs: DataFrame,
      block: Int = graft.queries.PipelineQueries.packBlock,
      shards: Int = graft.queries.PipelineQueries.packShards)
      : org.apache.spark.sql.Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val toks = docs.select(col("doc_id"), (col("doc_id") % shards).as("shard"),
        expr(s"cast(size(${graft.queries.TextQueries.wordsExpr}) as bigint)")
          .as("n_tok"))
      .as[(Long, Long, Long)]
    def fold(shard: Long, it: Iterator[(Long, Long, Long)],
        state: GroupState[Long]): Iterator[PackedDoc] = {
      val sorted = it.toSeq.sortBy(_._1)
      var cum = state.getOption.getOrElse(0L)
      val out = sorted.map { case (id, _, n) =>
        val start = cum
        cum += n
        val first = start / block
        val last = if (n == 0) first else (cum - 1) / block
        PackedDoc(id, shard, n, start, cum, first, last,
          n > 0 && last > first)
      }
      state.update(cum)
      out.iterator
    }
    toks.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fold)
  }

  /** Streaming inverted-index ingest — each micro-batch of (doc_id,
    * text) documents is tokenized and committed to a persisted
    * `sinks.TextIndex` as a gen-scoped delta (gen = micro-batch id),
    * so the SAME index that serves batch-built BM25/phrase search
    * stays current as documents stream in. foreachBatch is
    * at-least-once; `TextIndex.appendDelta` overwrites its own
    * generation on replay, so a retried micro-batch can never
    * double-count a posting, a doc length, or the corpus totals BM25
    * normalizes by — the commit is idempotent per batch (the
    * [[exportSink]] batch-scoped pattern applied to the index).
    * CorpusStreamingSpec pins post-stream search ≡ one-shot build.
    *
    * Admission contract is the index's: streamed doc_ids must be new
    * (route the stream through [[cleanStream]]/
    * [[cleanStreamIncremental]] first — that is the composition this
    * sink exists for).
    */
  def textIndexSink(docs: DataFrame,
      indexDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sinks.TextIndex.appendDelta(
          batch.select(col("doc_id"), col("text")), indexDir, gen = id)
      }

  /** Streaming exact-substring-index ingest — the [[textIndexSink]]
    * pattern for `sinks.SpanIndex`: each micro-batch's positioned
    * 8-gram postings and df-ledger rows commit as a gen-scoped delta,
    * keeping the span-dedup probe surface current at ingest. Replay
    * safety matters doubly here: a double-counted df delta would push
    * shared grams toward the hot cap and silently SILENCE spans the
    * correct index reports (df decides probe visibility, not just
    * ranking). Spec pins post-stream probe ≡ one-shot build.
    */
  def spanIndexSink(docs: DataFrame,
      indexDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sinks.SpanIndex.appendDelta(
          batch.select(col("doc_id"), col("text")), indexDir, gen = id)
      }

  /** Streaming dedup-index ingest — the [[textIndexSink]] pattern for
    * `sinks.DedupIndex`: each micro-batch of ADMITTED documents
    * commits its fingerprints and banded MinHash signatures as a
    * gen-scoped delta, so the NEXT batch's classify/anti-join screens
    * against everything already ingested, and a replayed micro-batch
    * rewrites its own generation instead of double-writing probe rows.
    * Composes with [[cleanStreamIncremental]]: the index this sink
    * maintains is the `historical` side the cleaner anti-joins.
    */
  def dedupIndexSink(docs: DataFrame,
      indexDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sinks.DedupIndex.appendDelta(
          batch.select(col("doc_id"), col("text")), indexDir, gen = id)
      }

  /** Streaming decontamination-index ingest — the same pattern for
    * `sinks.ContamIndex`: a freshly released eval snapshot streams in
    * and its 13-gram postings commit as a gen-scoped delta, so every
    * subsequent train-batch probe (and [[contaminationAlerts]] monitor
    * reading the index's postings) screens against it immediately;
    * replay-idempotent per micro-batch like the other index sinks.
    */
  def contamIndexSink(docs: DataFrame,
      indexDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sinks.ContamIndex.appendDelta(
          batch.select(col("doc_id"), col("text")), indexDir, gen = id)
      }

  /** Streaming language-model ingest — the [[textIndexSink]] pattern
    * for `sinks.LmIndex`: each micro-batch of ADMITTED reference docs
    * commits its bigram/token counts as a gen-scoped delta, so the
    * perplexity gate's model stays current with the corpus it guards.
    * Replay safety is ARITHMETIC here: counts are additive, so a
    * double-committed micro-batch would silently double its evidence
    * (not just duplicate rows) — the gen-overwrite makes the commit
    * idempotent. Spec pins post-stream score ≡ one-shot build.
    */
  def lmIndexSink(docs: DataFrame,
      indexDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sinks.LmIndex.appendDelta(
          batch.select(col("doc_id"), col("text")), indexDir, gen = id)
      }

  /** Streaming curation close-out — the per-micro-batch ship/hold
    * dashboard a curation loop actually watches: each batch of newly
    * ADMITTED documents (route through [[cleanStream]] /
    * [[cleanStreamIncremental]] upstream) lands in an accumulating
    * corpus tree, and the FULL q279 close-out recomputes over
    * corpus-so-far, persisting one per-source verdict set per batch —
    * so `outDir` holds the verdict HISTORY (which batch flipped a
    * source from ship to hold_duplication is a batch= scan away).
    *
    * Shared-definition discipline: the close-out is literally
    * `SparkEntry.queries("q279_curation_closeout")` over the
    * accumulated tree — dedup mass, Shapley rollup, DoReMi weight and
    * the verdict rule all stay the oracle-gated definitions; a
    * streaming twin that re-derived any of them could silently drift.
    *
    * Contract: `corpusRoot/embeddings.parquet` must exist (the FIXED
    * embedding/eval release the value arm scores against — embeddings
    * for not-yet-ingested docs are inert until their doc arrives,
    * because the per-source rollup joins through documents). Each
    * batch OVERWRITES `documents.parquet/batch=<id>/` and
    * `outDir/batch=<id>/`, so an at-least-once replay rewrites its own
    * generation — both commits idempotent per batch (the exportSink
    * pattern).
    *
    * Scale: the close-out is O(corpus-so-far) per batch — this sink is
    * the DASHBOARD cadence (a curation loop re-checks verdicts per
    * ingest wave), not a per-event path; at production volume the
    * same sink runs on a trigger interval matched to how often a data
    * lead reads it. Within a batch, the composed query keeps q279's
    * own scale shape (banded candidates, one partial-agg exchange per
    * arm, ǀsourcesǀ-row joins).
    */
  def curationCloseoutSink(docs: DataFrame, corpusRoot: String,
      outDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        closeoutBatch(batch, id, corpusRoot, outDir)
      }

  /** One micro-batch of [[curationCloseoutSink]], exposed so the spec
    * can pin the two edge contracts directly:
    *  - the corpus write carries ONLY the canonical documents-table
    *    columns (doc_id, text, lang, source) — feed extras like
    *    ingest_ts never leak into the accumulated tree, so q279's
    *    sub-definitions see `batch` as the ONE addition to the
    *    documents contract (an inert hive partition column);
    *  - an EMPTY micro-batch is a no-op: it neither adds a corpus
    *    generation nor re-publishes an identical verdict set (the
    *    dashboard keeps the previous batch's verdicts) — and a
    *    replayed empty batch skips again, so idempotence holds.
    */
  private[graft] def closeoutBatch(batch: DataFrame, id: Long,
      corpusRoot: String, outDir: String): Unit = {
    val canon = batch.select(col("doc_id"), col("text"),
      col("lang"), col("source"))
    if (!canon.isEmpty) {
      canon.write.mode("overwrite")
        .parquet(s"$corpusRoot/documents.parquet/batch=$id")
      graft.SparkEntry.queries("q279_curation_closeout")(
          batch.sparkSession, corpusRoot)
        .withColumn("batch_id", lit(id))
        .write.mode("overwrite").parquet(s"$outDir/batch=$id")
    }
  }

  /** [[curationCloseoutSink]] with the VALUE ARM CACHED — the
    * incremental form the r14 verdict asked the close-out to grow
    * toward: q279's KNN-Shapley sweep depends ONLY on the fixed
    * embedding release the sink's contract already pins
    * (`corpusRoot/embeddings.parquet`), so it is computed once, on the
    * first non-empty micro-batch, and persisted to
    * `corpusRoot/shap.parquet`; every batch's close-out then runs
    * [[graft.queries.SimilarityQueries.curationCloseout]] — the SAME
    * composition the q279 QDef executes — over the cached relation.
    * EXACT by construction (not an approximation): the cached input is
    * the identical relation every batch would recompute, and
    * CorpusStreamingSpec pins this sink's verdicts ≡ the full
    * recomputing sink's ≡ batch q279, per wave.
    *
    * What stays O(corpus-so-far): the dedup-mass and DoReMi arms,
    * which genuinely depend on the accumulated documents — the
    * dashboard-cadence contract is unchanged for them, and
    * `graft.CloseoutBench` measures both variants' per-wave growth
    * curves side by side (the cached sweep is the dominant fixed-input
    * cost at every measured wave).
    */
  def curationCloseoutIncrementalSink(docs: DataFrame, corpusRoot: String,
      outDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        closeoutBatchIncremental(batch, id, corpusRoot, outDir)
      }

  private[graft] def closeoutBatchIncremental(batch: DataFrame,
      id: Long, corpusRoot: String, outDir: String): Unit = {
    val canon = batch.select(col("doc_id"), col("text"),
      col("lang"), col("source"))
    if (!canon.isEmpty) {
      val s = batch.sparkSession
      canon.write.mode("overwrite")
        .parquet(s"$corpusRoot/documents.parquet/batch=$id")
      val shapPath = s"$corpusRoot/shap.parquet"
      val p = new org.apache.hadoop.fs.Path(shapPath)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      // one-time cache build; a crash mid-write leaves a partial dir
      // without _SUCCESS, and the overwrite below redoes it whole (the
      // single-writer discipline every sink build already carries)
      if (!fs.exists(new org.apache.hadoop.fs.Path(shapPath, "_SUCCESS")))
        graft.queries.SimilarityQueries.knnShapley(s, corpusRoot)
          .write.mode("overwrite").parquet(shapPath)
      graft.queries.SimilarityQueries.curationCloseout(s, corpusRoot,
          s.read.parquet(shapPath))
        .withColumn("batch_id", lit(id))
        .write.mode("overwrite").parquet(s"$outDir/batch=$id")
    }
  }

  /** [[curationCloseoutIncrementalSink]] with the DEDUP ARM
    * index-backed too — the last O(corpus-so-far) recompute in the
    * streaming close-out replaced by maintained state: each batch
    * appends into a persisted [[graft.sinks.ClusterIndex]] (gen =
    * micro-batch id, the replay-safe delta contract) and the
    * uniqueness/dedup-share columns come from
    * [[graft.sinks.ClusterIndex.report]] — ClusterIndexSpec pins that
    * report ≡ the full q54+q278 recompute over the accumulated corpus
    * after any append sequence, so the verdicts are EXACT, not
    * approximate (CorpusStreamingSpec re-pins ≡ batch q279 per wave).
    * Per-batch cost: the value arm is the cached fixed-release sweep
    * (one build), the dedup arm is O(batch + touched clusters) index
    * maintenance plus an O(clusters) rollup, and only DoReMi's mixture
    * arm still recomputes over the corpus tree — dashboard cadence for
    * one arm instead of three.
    */
  def curationCloseoutIndexedSink(docs: DataFrame, corpusRoot: String,
      outDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        closeoutBatchIndexed(batch, id, corpusRoot, outDir)
      }

  private[graft] def closeoutBatchIndexed(batch: DataFrame,
      id: Long, corpusRoot: String, outDir: String): Unit = {
    val canon = batch.select(col("doc_id"), col("text"),
      col("lang"), col("source"))
    if (!canon.isEmpty) {
      val s = batch.sparkSession
      canon.write.mode("overwrite")
        .parquet(s"$corpusRoot/documents.parquet/batch=$id")
      val shapPath = s"$corpusRoot/shap.parquet"
      val p = new org.apache.hadoop.fs.Path(shapPath)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(shapPath, "_SUCCESS")))
        graft.queries.SimilarityQueries.knnShapley(s, corpusRoot)
          .write.mode("overwrite").parquet(shapPath)
      val cidx = s"$corpusRoot/cluster_index"
      graft.sinks.ClusterIndex.init(s, cidx) // no-op once present
      graft.sinks.ClusterIndex.appendDelta(s, cidx,
        canon.select(col("doc_id"), col("source"), col("text")),
        gen = id)
      graft.queries.SimilarityQueries.curationCloseout(s, corpusRoot,
          s.read.parquet(shapPath),
          graft.sinks.ClusterIndex.report(s, cidx))
        .withColumn("batch_id", lit(id))
        .write.mode("overwrite").parquet(s"$outDir/batch=$id")
    }
  }

  /** Append each micro-batch to the partitioned corpus tree via the
    * batch export sink (same layout contract as [[CorpusExport]], with
    * `batch=<id>` as the leading partition directory). foreachBatch is
    * at-least-once — a replayed micro-batch would duplicate rows under
    * a plain append — so each batch OVERWRITES its own batch-scoped
    * subtree: replay rewrites the same `batch=<id>/split=…/lang=…`
    * directories instead of adding a second copy, making the commit
    * idempotent. Readers see batch/split/lang as ordinary hive
    * partition columns on one recursive read.
    */
  def exportSink(clean: DataFrame, outDir: String): DataStreamWriter[Row] =
    clean.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        CorpusExport.write(batch, s"$outDir/batch=$id", mode = "overwrite")
      }
}
