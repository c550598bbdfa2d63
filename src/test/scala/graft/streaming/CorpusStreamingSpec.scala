package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

// top-level: a nested case class would capture the suite as an outer
// pointer and break encoder codegen
case class StreamedDoc(doc_id: Long, text: String, lang: String,
    source: String, ingest_ts: Timestamp)

class CorpusStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  // 30+ tokens with enough stopwords to clear the q52 thresholds
  private val goodText =
    ("the quick brown fox jumps over a lazy dog and then " * 4).trim

  test("streaming ingest dedups across batches and appends partitions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val out = TestSpark.tmpDir("stream-corpus")
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming
      .exportSink(CorpusStreaming.cleanStream(ms.toDF()), out)
      .option("checkpointLocation", TestSpark.tmpDir("stream-corpus-ckpt"))
      .start()
    try {
      // batch 1: one keeper, one too-short reject
      ms.addData(
        StreamedDoc(1L, goodText, "en", "src0", ts("2024-01-01 00:00:00")),
        StreamedDoc(2L, "too short", "en", "src0", ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      // batch 2: exact dup of doc 1 (different id, same content) must be
      // dropped by cross-batch fingerprint STATE, plus a new keeper
      ms.addData(
        StreamedDoc(3L, goodText, "de", "src1", ts("2024-01-01 00:10:00")),
        StreamedDoc(4L, goodText + " extra unique tail words here now",
          "de", "src1", ts("2024-01-01 00:11:00")))
      q.processAllAvailable()

      val got = spark.read.parquet(out)
      assert(got.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
      // layout: batch-scoped subtrees (the idempotent-replay unit),
      // each carrying the hive split=/lang= tree
      val dirs = new java.io.File(out).listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(dirs.forall(_.startsWith("batch=")) && dirs.nonEmpty)
      assert(got.columns.contains("batch"))
      // survivors carry the deterministic split + token count
      assert(got.where(col("n_tokens") < 30).isEmpty)
      assert(got.select("split").as[String].collect()
        .forall(s => s == "train" || s == "held_out"))
    } finally q.stop()
  }

  test("incremental ingest anti-joins the historical fingerprint index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // historical corpus already contains goodText
    val historical = Seq(goodText, "some other old doc").toDF("text")
      .select(graft.queries.Q.fingerprint(col("text")).as("fp"))
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming
      .cleanStreamIncremental(ms.toDF(), historical)
      .writeStream.format("memory").queryName("inc").outputMode("append")
      .start()
    try {
      ms.addData(
        // dup of history → dropped by the static index, not state
        StreamedDoc(10L, goodText, "en", "src0", ts("2024-01-01 00:00:00")),
        // genuinely new → kept
        StreamedDoc(11L, goodText + " fresh tail for the new corpus era",
          "en", "src0", ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      assert(spark.table("inc").select("doc_id").as[Long].collect()
        .toSet == Set(11L))
    } finally q.stop()
  }

  test("a persisted DedupIndex serves as the historical side directly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // index a tiny corpus with the LIBRARY artifact, then hand its
    // fingerprints/ relation to the incremental stream unchanged — the
    // batch index and the streaming ingest share one dedup contract
    val idx = TestSpark.tmpDir("stream-dedup-idx")
    graft.sinks.DedupIndex.build(
      Seq((100L, goodText)).toDF("doc_id", "text"), idx)
    val historical = spark.read.parquet(s"$idx/fingerprints")
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming
      .cleanStreamIncremental(ms.toDF(), historical)
      .writeStream.format("memory").queryName("incidx").outputMode("append")
      .start()
    try {
      ms.addData(
        StreamedDoc(20L, goodText, "en", "src0", ts("2024-01-01 00:00:00")),
        StreamedDoc(21L, goodText + " beyond the indexed history entirely",
          "en", "src0", ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      assert(spark.table("incidx").select("doc_id").as[Long].collect()
        .toSet == Set(21L))
    } finally q.stop()
  }

  test("streaming decontamination alerts fire on indexed held-out grams") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // index one held-out doc with the LIBRARY artifact; a streamed doc
    // is contaminated iff it shares a 13-gram with it (q56's rule)
    val heldText =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val idx = TestSpark.tmpDir("stream-contam-idx")
    graft.sinks.ContamIndex.build(
      Seq((900L, heldText)).toDF("doc_id", "text"), idx)
    val postings = spark.read.parquet(s"$idx/postings")
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming
      .contaminationAlerts(ms.toDF(), postings)
      .writeStream.format("memory").queryName("alerts")
      .outputMode("append").start()
    try {
      ms.addData(
        // embeds a verbatim 13-gram of the held doc → alert
        StreamedDoc(30L, "prefix words here " + heldText.split(" ")
          .slice(2, 15).mkString(" ") + " trailing words", "en", "src0",
          ts("2024-01-01 00:00:00")),
        // clean: no shared 13-gram (different vocabulary entirely)
        StreamedDoc(31L, goodText, "en", "src0",
          ts("2024-01-01 00:01:00")),
        // the whole held doc verbatim (many matching grams) → ONE alert
        StreamedDoc(32L, heldText, "en", "src0",
          ts("2024-01-01 00:02:00")))
      q.processAllAvailable()
      val alerts = spark.table("alerts").select("doc_id").as[Long]
        .collect()
      assert(alerts.toSet == Set(30L, 32L), alerts.mkString(","))
      assert(alerts.length == 2, "one alert per contaminated doc")
    } finally q.stop()
  }

  test("streaming PII alerts fire on the q218 patterns, once per doc") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming.piiAlerts(ms.toDF())
      .writeStream.format("memory").queryName("pii")
      .outputMode("append").start()
    try {
      ms.addData(
        // one email → alert with (1, 0)
        StreamedDoc(40L, goodText + " contact someone@example.com now",
          "en", "src0", ts("2024-01-01 00:00:00")),
        // clean → no alert
        StreamedDoc(41L, goodText, "en", "src0", ts("2024-01-01 00:01:00")),
        // two phones + an email → ONE alert carrying both counts
        StreamedDoc(42L, "call 555-0101 or 555-0102 or mail a@b.org",
          "en", "src0", ts("2024-01-01 00:02:00")))
      q.processAllAvailable()
      val rows = spark.table("pii")
        .select("doc_id", "n_emails", "n_phones").as[(Long, Long, Long)]
        .collect().sortBy(_._1)
      assert(rows.toSeq == Seq((40L, 1L, 0L), (42L, 1L, 2L)),
        rows.mkString(","))
    } finally q.stop()
  }

  test("streaming packing carries shard token totals across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // ids chosen so two docs share shard 0 across DIFFERENT batches
    // (the state handoff under test) and one lands on shard 1; block=8
    // so the 10-token texts actually split blocks
    def doc(id: Long, words: Int) = StreamedDoc(id,
      (1 to words).map(i => "tok").mkString(" "), "en", "src0",
      ts("2024-01-01 00:00:00"))
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming.packingAssignments(ms.toDF(), block = 8)
      .writeStream.format("memory").queryName("pack")
      .outputMode("append").start()
    try {
      ms.addData(doc(0L, 5), doc(1L, 10)) // shards 0 and 1
      q.processAllAvailable()
      ms.addData(doc(8L, 6), doc(16L, 4)) // both shard 0, one batch
      q.processAllAvailable()
      val got = spark.table("pack")
        .select("doc_id", "shard", "start_tok", "end_tok", "first_block",
          "last_block", "split_block")
        .as[(Long, Long, Long, Long, Long, Long, Boolean)]
        .collect().sortBy(_._1)
      // shard 0 arrival order 0 → 8 → 16: 5 + 6 + 4 tokens; doc 8 must
      // START at 5 (state survived the batch boundary) and cross the
      // 8-token block edge; doc 16 fits inside block 1
      assert(got.toSeq == Seq(
        (0L, 0L, 0L, 5L, 0L, 0L, false),
        (1L, 1L, 0L, 10L, 0L, 1L, true),
        (8L, 0L, 5L, 11L, 0L, 1L, true),
        (16L, 0L, 11L, 15L, 1L, 1L, false)), got.mkString(","))
    } finally q.stop()
  }

  test("streaming TextIndex ingest ≡ one-shot batch build") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // seed corpus built batch-side, then two MORE docs arrive over the
    // stream in separate micro-batches (distinct gens); afterwards both
    // search surfaces must equal a one-shot build over all four docs
    val seed = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a lazy dog sleeps all day long"))
    val streamed = Seq(
      (3L, "the fox and the hound chase the quick rabbit"),
      (4L, "quick thinking saves the day for the lazy fox"))
    val idx = TestSpark.tmpDir("stream-text-idx")
    graft.sinks.TextIndex.build(seed.toDF("doc_id", "text"), idx)
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming.textIndexSink(
        ms.toDF().select(col("doc_id"), col("text")), idx)
      .option("checkpointLocation", TestSpark.tmpDir("stream-text-ckpt"))
      .start()
    try {
      streamed.foreach { case (id, text) =>
        ms.addData(StreamedDoc(id, text, "en", "src0",
          ts("2024-01-01 00:00:00")))
        q.processAllAvailable() // one micro-batch (= one gen) per doc
      }
    } finally q.stop()
    val oneShot = TestSpark.tmpDir("stream-text-oneshot")
    graft.sinks.TextIndex.build(
      (seed ++ streamed).toDF("doc_id", "text"), oneShot)
    def img(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    // BM25 (corpus totals + df + dl all feed the score — any
    // double-count or missed delta changes it) and positional phrase
    // search must both see the streamed docs exactly once
    assert(img(graft.sinks.TextIndex.searchBm25(spark, idx,
        Seq("quick", "fox"), 10))
      == img(graft.sinks.TextIndex.searchBm25(spark, oneShot,
        Seq("quick", "fox"), 10)))
    assert(img(graft.sinks.TextIndex.searchPhrase(spark, idx,
        Seq("the", "quick")))
      == img(graft.sinks.TextIndex.searchPhrase(spark, oneShot,
        Seq("the", "quick"))))
  }

  test("streaming LmIndex ingest ≡ one-shot batch build") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // counts are ADDITIVE, so the equality is arithmetic: the streamed
    // docs' bigram evidence must fold in exactly once — a replayed or
    // doubled gen would shift every smoothed probability
    val seed = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a lazy dog sleeps all day long"))
    val streamed = Seq(
      (3L, "the fox and the hound chase the quick rabbit"),
      (4L, "quick thinking saves the day for the lazy fox"))
    val idx = TestSpark.tmpDir("stream-lm-idx")
    graft.sinks.LmIndex.build(seed.toDF("doc_id", "text"), idx)
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming.lmIndexSink(
        ms.toDF().select(col("doc_id"), col("text")), idx)
      .option("checkpointLocation", TestSpark.tmpDir("stream-lm-ckpt"))
      .start()
    try {
      streamed.foreach { case (id, text) =>
        ms.addData(StreamedDoc(id, text, "en", "src0",
          ts("2024-01-01 00:00:00")))
        q.processAllAvailable() // one micro-batch (= one gen) per doc
      }
    } finally q.stop()
    val oneShot = TestSpark.tmpDir("stream-lm-oneshot")
    graft.sinks.LmIndex.build(
      (seed ++ streamed).toDF("doc_id", "text"), oneShot)
    def img(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    val batch = (seed ++ streamed).toDF("doc_id", "text")
    assert(img(graft.sinks.LmIndex.score(spark, idx, batch))
      == img(graft.sinks.LmIndex.score(spark, oneShot, batch)))
    assert(img(graft.sinks.LmIndex.probeNext(spark, idx,
        Seq("the", "lazy"), 3))
      == img(graft.sinks.LmIndex.probeNext(spark, oneShot,
        Seq("the", "lazy"), 3)))
  }

  test("streaming SpanIndex ingest ≡ one-shot batch build") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // a 12-token verbatim run shared between a seed doc and a streamed
    // doc: the probe must report the span only after the stream commits
    val run12 = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu"
    val seed = Seq(
      (1L, s"seed prefix words $run12 seed suffix words"),
      (2L, "entirely unrelated vocabulary with no shared runs at all " +
        "just filler tokens everywhere"))
    val streamedDoc = (3L, s"streamed lead-in $run12 streamed tail")
    val idx = TestSpark.tmpDir("stream-span-idx")
    graft.sinks.SpanIndex.build(seed.toDF("doc_id", "text"), idx)
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming.spanIndexSink(
        ms.toDF().select(col("doc_id"), col("text")), idx)
      .option("checkpointLocation", TestSpark.tmpDir("stream-span-ckpt"))
      .start()
    try {
      ms.addData(StreamedDoc(streamedDoc._1, streamedDoc._2, "en",
        "src0", ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = TestSpark.tmpDir("stream-span-oneshot")
    graft.sinks.SpanIndex.build(
      (seed :+ streamedDoc).toDF("doc_id", "text"), oneShot)
    // self-probe of the whole corpus against each index: the da < db
    // half is exactly q190 (the SpanIndexSpec equivalence), so equal
    // images mean the streamed generation is indistinguishable from a
    // batch-indexed doc
    val corpus = (seed :+ streamedDoc).toDF("doc_id", "text")
    def img(d: org.apache.spark.sql.DataFrame) =
      d.where(col("da") < col("db")).collect().map(_.toString).sorted.toSeq
    val got = img(graft.sinks.SpanIndex.probe(spark, idx, corpus))
    val want = img(graft.sinks.SpanIndex.probe(spark, oneShot, corpus))
    assert(got == want, s"got=$got want=$want")
    assert(got.nonEmpty, "fixture must actually share a span")
  }

  test("kill-and-restart through a real checkpoint: recovered TextIndex ≡ one-shot build") {
    import spark.implicits._
    // A FILE source (replayable across restarts, unlike MemoryStream,
    // which dies with its query object) feeding the TextIndex sink
    // through a REAL checkpointLocation. The scenario: ingest three
    // docs (one micro-batch each via maxFilesPerTrigger=1), stop the
    // query, then delete the LAST batch's commit marker from the
    // checkpoint — the on-disk state of a crash between the sink
    // commit and the checkpoint commit, the at-least-once window
    // foreachBatch exposes. A new query over the SAME checkpoint must
    // replay that batch id (its delta generation already exists on
    // disk — the gen-scoped overwrite makes the replay harmless) and
    // then continue with three more docs written while the stream was
    // down. BM25 is the assertion surface because every double-count
    // (postings, doclens, corpus totals) shifts a score.
    val srcDir = TestSpark.tmpDir("stream-restart-src")
    val ckpt = TestSpark.tmpDir("stream-restart-ckpt")
    val idx = TestSpark.tmpDir("stream-restart-idx")
    val docsAll = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "a lazy dog sleeps all day long",
      3L -> "the fox and the hound chase the quick rabbit",
      4L -> "quick thinking saves the day for the lazy fox",
      5L -> "a hound naps while the rabbit runs past the dog",
      6L -> "foxes and rabbits share the quiet meadow at dusk")
    def writeFile(d: (Long, String)): Unit =
      Seq(d).toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(srcDir)
    def startQuery() = CorpusStreaming.textIndexSink(
        spark.readStream
          .schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", 1)
          .parquet(srcDir),
        idx)
      .option("checkpointLocation", ckpt)
      .start()
    graft.sinks.TextIndex.build(Seq.empty[(Long, String)]
      .toDF("doc_id", "text"), idx)
    docsAll.take(3).foreach(writeFile)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // forge the crash window: the last batch's sink delta is on disk
    // but its checkpoint commit is gone → restart MUST re-run it
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.length == 3, s"expected 3 committed batches, got ${commits.length}")
    assert(commits.last.delete(), "could not remove the last commit marker")
    // the local-FS checksum sidecar must go with it, or the restarted
    // query's commit rename trips over the stale CRC
    val crc = new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    docsAll.drop(3).foreach(writeFile)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    // recovered index ≡ one-shot batch build over all six docs
    val oneShot = TestSpark.tmpDir("stream-restart-oneshot")
    graft.sinks.TextIndex.build(docsAll.toDF("doc_id", "text"), oneShot)
    def img(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    assert(img(graft.sinks.TextIndex.searchBm25(spark, idx,
        Seq("quick", "fox"), 10))
      == img(graft.sinks.TextIndex.searchBm25(spark, oneShot,
        Seq("quick", "fox"), 10)))
    assert(img(graft.sinks.TextIndex.searchPhrase(spark, idx,
        Seq("the", "quick")))
      == img(graft.sinks.TextIndex.searchPhrase(spark, oneShot,
        Seq("the", "quick"))))
    // and the replayed generation really was replayed, not skipped:
    // six one-doc batches → gens 0..5 present exactly once
    val gens = new java.io.File(s"$idx/postings_delta").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(gens == (0 to 5).map(g => s"gen=$g"),
      s"unexpected delta generations: $gens")
  }

  test("streaming DedupIndex/ContamIndex ingest ≡ one-shot batch build") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val seed = Seq((1L, goodText),
      (2L, "a completely different seed document with its own words"))
    val streamed = Seq(
      (3L, goodText + " with a small twist at the end"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"))
    def streamInto(sinkOf: (org.apache.spark.sql.DataFrame, String) =>
        org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row], idx: String): Unit = {
      val ms = MemoryStream[StreamedDoc]
      val q = sinkOf(ms.toDF().select(col("doc_id"), col("text")), idx)
        .option("checkpointLocation", TestSpark.tmpDir("stream-idx-ckpt"))
        .start()
      try {
        streamed.foreach { case (id, text) =>
          ms.addData(StreamedDoc(id, text, "en", "src0",
            ts("2024-01-01 00:00:00")))
          q.processAllAvailable() // one micro-batch (= one gen) per doc
        }
      } finally q.stop()
    }
    def img(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq

    val dIdx = TestSpark.tmpDir("stream-dedup2-idx")
    graft.sinks.DedupIndex.build(seed.toDF("doc_id", "text"), dIdx)
    streamInto(CorpusStreaming.dedupIndexSink, dIdx)
    val dOne = TestSpark.tmpDir("stream-dedup2-oneshot")
    graft.sinks.DedupIndex.build(
      (seed ++ streamed).toDF("doc_id", "text"), dOne)
    // probe a batch containing an exact dup of a STREAMED doc: the
    // streamed generation must classify it exactly like a batch build
    val probe = Seq((90L, streamed.head._2), (91L, "novel content"))
      .toDF("doc_id", "text")
    assert(img(graft.sinks.DedupIndex.classify(spark, dIdx, probe))
      == img(graft.sinks.DedupIndex.classify(spark, dOne, probe)))

    val cIdx = TestSpark.tmpDir("stream-contam2-idx")
    graft.sinks.ContamIndex.build(seed.toDF("doc_id", "text"), cIdx)
    streamInto(CorpusStreaming.contamIndexSink, cIdx)
    val cOne = TestSpark.tmpDir("stream-contam2-oneshot")
    graft.sinks.ContamIndex.build(
      (seed ++ streamed).toDF("doc_id", "text"), cOne)
    // train batch shares a 13-gram with the STREAMED held-out doc 4
    val train = Seq((80L, "lead-in " + streamed(1)._2.split(" ")
      .take(13).mkString(" ") + " tail"), (81L, goodText))
      .toDF("doc_id", "text")
    val got = graft.sinks.ContamIndex.probe(spark, cIdx, train)
    assert(img(got)
      == img(graft.sinks.ContamIndex.probe(spark, cOne, train)))
    assert(got.where(col("doc_id") === 4L &&
      col("n_contaminated") > 0).count() == 1,
      "the streamed held-out doc must report the planted hit")
  }

  test("packing twins agree at a NON-default shard count") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // shards = 3 (≠ packShards = 8), block = 8: if either twin still
    // had its own baked-in % 8, the shard column (ids 0..9 mod 3 vs
    // mod 8) and every downstream offset would disagree. One
    // id-ordered batch, so the streaming arrival order equals the
    // batch doc_id order and the audits must match EXACTLY.
    assert(graft.queries.PipelineQueries.packShards != 3)
    val docs = (0L to 9L).map(id =>
      StreamedDoc(id, (1 to (3 + id % 4).toInt).map(_ => "tok")
        .mkString(" "), "en", "src0", ts("2024-01-01 00:00:00")))
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming.packingAssignments(ms.toDF(), block = 8,
        shards = 3)
      .writeStream.format("memory").queryName("pack3")
      .outputMode("append").start()
    try {
      ms.addData(docs: _*)
      q.processAllAvailable()
      // fold the streamed per-doc assignments to the audit rollup shape
      val streamed = spark.table("pack3")
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          sum(col("split_block").cast("long")).as("n_split_docs"),
          max(col("end_tok")).as("end_tok"))
        .select(col("shard"), col("n_docs"), col("n_tokens"),
          expr("(end_tok + 7) div 8").as("n_blocks"), col("n_split_docs"),
          (expr("(end_tok + 7) div 8") * 8L - col("end_tok"))
            .as("tail_waste"))
      val batch = graft.queries.PipelineQueries.packingAudit(
        docs.toDF(), shards = 3, block = 8)
      val img = (df: org.apache.spark.sql.DataFrame) =>
        df.orderBy("shard").collect().map(_.toString).toSeq
      assert(img(streamed) == img(batch),
        s"streaming=${img(streamed)} batch=${img(batch)}")
    } finally q.stop()
  }

  test("streaming curation close-out: last batch's verdicts ≡ batch q279") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    // corpus root pre-seeded with the FIXED embedding release (the
    // sink's contract); documents accumulate batch by batch
    val root = TestSpark.tmpDir("stream-closeout-corpus")
    spark.read.parquet(s"$src/embeddings.parquet")
      .write.parquet(s"$root/embeddings.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().map(r => StreamedDoc(r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3), ts("2024-01-01 00:00:00")))
    val out = TestSpark.tmpDir("stream-closeout-out")
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming.curationCloseoutSink(ms.toDF(), root, out)
      .option("checkpointLocation", TestSpark.tmpDir("closeout-ckpt"))
      .start()
    try {
      // three ingest waves; a verdict set persists after EACH
      val thirds = docs.grouped((docs.length + 2) / 3).toSeq
      thirds.zipWithIndex.foreach { case (wave, i) =>
        ms.addData(wave: _*)
        q.processAllAvailable()
        assert(new java.io.File(s"$out/batch=$i").exists(),
          s"wave $i must persist its close-out")
      }
      // the verdict HISTORY is one partitioned read; after the last
      // wave the corpus-so-far IS the full corpus, so the final
      // close-out must equal the oracle-gated batch q279 over the
      // original tables, row for row (the shared-definition pin)
      val hist = spark.read.parquet(out)
      assert(hist.select("batch").distinct().count() == thirds.length)
      val last = hist.where(col("batch") === (thirds.length - 1))
        .drop("batch", "batch_id")
      val want = graft.SparkEntry
        .queries("q279_curation_closeout")(spark, src)
      val img = (df: org.apache.spark.sql.DataFrame) =>
        df.orderBy("source").collect().map(_.toString).toSeq
      assert(img(last).nonEmpty && img(last) == img(want),
        "streaming close-out drifted from the batch q279")
      // the accumulated tree carries ONLY the canonical documents
      // columns + the batch partition — feed extras (ingest_ts) must
      // not leak into what q279's sub-definitions read
      assert(spark.read.parquet(s"$root/documents.parquet")
        .columns.sorted.toSeq ==
        Seq("batch", "doc_id", "lang", "source", "text"),
        "corpus tree must be canonical columns + batch only")
    } finally q.stop()
  }

  test("incremental curation close-out ≡ batch q279 (cached value arm)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val root = TestSpark.tmpDir("stream-closeout-incr-corpus")
    spark.read.parquet(s"$src/embeddings.parquet")
      .write.parquet(s"$root/embeddings.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().map(r => StreamedDoc(r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3), ts("2024-01-01 00:00:00")))
    val out = TestSpark.tmpDir("stream-closeout-incr-out")
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming
      .curationCloseoutIncrementalSink(ms.toDF(), root, out)
      .option("checkpointLocation", TestSpark.tmpDir("closeout-incr-ckpt"))
      .start()
    try {
      val thirds = docs.grouped((docs.length + 2) / 3).toSeq
      thirds.zipWithIndex.foreach { case (wave, i) =>
        ms.addData(wave: _*)
        q.processAllAvailable()
        assert(new java.io.File(s"$out/batch=$i").exists())
      }
      // the value arm was cached ONCE, on the first batch
      assert(new java.io.File(s"$root/shap.parquet/_SUCCESS").exists(),
        "Shapley cache must persist under the corpus root")
      // the cached relation IS knnShapley over the fixed release
      val cached = spark.read.parquet(s"$root/shap.parquet")
        .orderBy("vec_id").collect().map(_.toString).toSeq
      val live = graft.queries.SimilarityQueries.knnShapley(spark, src)
        .orderBy("vec_id").collect().map(_.toString).toSeq
      assert(cached == live, "cached value arm drifted from knnShapley")
      // and the final verdicts equal the oracle-gated batch q279 (the
      // full sink pins the same, so incremental ≡ full transitively)
      val last = spark.read.parquet(out)
        .where(col("batch") === (thirds.length - 1))
        .drop("batch", "batch_id")
      val want = graft.SparkEntry
        .queries("q279_curation_closeout")(spark, src)
      val img = (df: org.apache.spark.sql.DataFrame) =>
        df.orderBy("source").collect().map(_.toString).toSeq
      assert(img(last).nonEmpty && img(last) == img(want),
        "incremental close-out drifted from the batch q279")
    } finally q.stop()
  }

  test("indexed curation close-out ≡ batch q279 (index-backed dedup arm)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val root = TestSpark.tmpDir("stream-closeout-idx-corpus")
    spark.read.parquet(s"$src/embeddings.parquet")
      .write.parquet(s"$root/embeddings.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().map(r => StreamedDoc(r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3), ts("2024-01-01 00:00:00")))
    val out = TestSpark.tmpDir("stream-closeout-idx-out")
    val ms = MemoryStream[StreamedDoc]
    val q = CorpusStreaming
      .curationCloseoutIndexedSink(ms.toDF(), root, out)
      .option("checkpointLocation", TestSpark.tmpDir("closeout-idx-ckpt"))
      .start()
    try {
      val img = (df: org.apache.spark.sql.DataFrame) =>
        df.orderBy("source").collect().map(_.toString).toSeq
      val thirds = docs.grouped((docs.length + 2) / 3).toSeq
      thirds.zipWithIndex.foreach { case (wave, i) =>
        ms.addData(wave: _*)
        q.processAllAvailable()
        assert(new java.io.File(s"$out/batch=$i").exists())
      }
      // MID-stream exactness, not just the final state: wave 1's
      // persisted verdicts must equal the full-recompute close-out
      // over the corpus as of wave 1 — near-dup pairs STRADDLE the
      // wave boundaries (the accumulating corpus is id-interleaved),
      // so this pin exercises cross-wave cluster merges in the
      // maintained index, the part a final-state-only pin could pass
      // without
      val corpus1 = spark.read.parquet(s"$root/documents.parquet")
        .where(col("batch") <= 1)
      val fullDw1 = graft.queries.DedupQueries.dedupWeightsOf(
        corpus1.select(col("doc_id"), col("source"), col("text")))
      val snap1 = spark.read.parquet(out)
        .where(col("batch") === 1).drop("batch", "batch_id")
      // the recompute's doc/mixture arms must see the SAME wave-1
      // prefix the snapshot saw — materialize it as its own corpus
      val root1 = TestSpark.tmpDir("closeout-idx-prefix")
      spark.read.parquet(s"$root/embeddings.parquet")
        .write.parquet(s"$root1/embeddings.parquet")
      corpus1.write.parquet(s"$root1/documents.parquet")
      val want1p = graft.queries.SimilarityQueries.curationCloseout(
        spark, root1, spark.read.parquet(s"$root/shap.parquet"),
        fullDw1)
      assert(img(snap1).nonEmpty && img(snap1) == img(want1p),
        "wave-1 verdicts drifted from the full recompute at wave 1")
      // final verdicts ≡ the oracle-gated batch q279
      val last = spark.read.parquet(out)
        .where(col("batch") === (thirds.length - 1))
        .drop("batch", "batch_id")
      val want = graft.SparkEntry
        .queries("q279_curation_closeout")(spark, src)
      assert(img(last).nonEmpty && img(last) == img(want),
        "indexed close-out drifted from the batch q279")
    } finally q.stop()
  }

  test("curation close-out: an empty micro-batch is a no-op") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val root = TestSpark.tmpDir("closeout-empty-corpus")
    spark.read.parquet(s"$src/embeddings.parquet")
      .write.parquet(s"$root/embeddings.parquet")
    val out = TestSpark.tmpDir("closeout-empty-out")
    val feed = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        lit(ts("2024-01-01 00:00:00")).as("ingest_ts"))
    // wave 0: a real batch establishes the corpus and a verdict set
    CorpusStreaming.closeoutBatch(feed, 0L, root, out)
    assert(new java.io.File(s"$out/batch=0").exists())
    val before = spark.read.parquet(out).orderBy("source")
      .collect().map(_.toString).toSeq
    // wave 1: an EMPTY batch (same schema) must add neither a corpus
    // generation nor a verdict set — the dashboard keeps wave 0's
    CorpusStreaming.closeoutBatch(feed.limit(0), 1L, root, out)
    assert(!new java.io.File(
        s"$root/documents.parquet/batch=1").exists(),
      "empty batch must not add a corpus generation")
    assert(!new java.io.File(s"$out/batch=1").exists(),
      "empty batch must not publish a verdict set")
    assert(spark.read.parquet(out).orderBy("source")
      .collect().map(_.toString).toSeq == before,
      "verdict history must be unchanged by an empty batch")
  }
}
