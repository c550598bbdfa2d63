package graft.sinks

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted bigram LM must (a) reproduce EXACTLY the in-query
  * q184 perplexity report when scoring the corpus it was built from —
  * the index round-trip can't change an lp term or a rounding, (b)
  * give every UNSEEN bigram the finite add-one floor (strictly higher
  * perplexity than any indexed doc scores on smoothing alone —
  * that's the generalization [[LmIndex.score]] exists for), (c) keep
  * the lifecycle contract (SinkContractSpec covers append ≡ rebuild
  * uniformly; here we additionally pin that SCORING through an
  * appended index equals scoring through a rebuild), and (d) push
  * history point-lookups into the bigrams scan.
  */
class LmIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables(spark, dir).documents
    .select(col("doc_id"), col("text"))

  private lazy val indexDir = {
    val out = TestSpark.tmpDir("lm-index")
    LmIndex.build(docs, out)
    out
  }

  test("score(indexed corpus) == the in-query q184 report") {
    val got = LmIndex.score(spark, indexDir, docs)
      .orderBy(col("doc_id")).collect().toSeq
    val want = SparkEntry.queries("q184_perplexity_filter")(spark, dir)
      .orderBy(col("doc_id")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("unseen bigrams get the finite add-one floor") {
    import spark.implicits._
    // a candidate whose words exist nowhere in the reference: every
    // bigram scores ln(1/(0 + V)) — defined, and the worst possible
    // perplexity under the model (exp(ln V) = V)
    val v = LmIndex.readWords(spark, indexDir)
      .agg(count(lit(1)).as("v")).head.getLong(0)
    val alien = Seq((9999L, "zzqx wwvk zzqx wwvk")).toDF("doc_id", "text")
    val row = LmIndex.score(spark, indexDir, alien).head
    assert(row.getLong(1) == 3L)
    assert(math.abs(row.getDouble(2) - v.toDouble) < 1e-3,
      s"alien-doc ppl ${row.getDouble(2)} != vocab size $v")
    // a half-seen candidate (seen words, unseen order) stays finite
    // and scores worse than the corpus it shares words with
    val seen = docs.limit(1).select(col("text")).head.getString(0)
    val shuffled = seen.split(" ").reverse.mkString(" ")
    val half = Seq((9998L, shuffled)).toDF("doc_id", "text")
    assert(!LmIndex.score(spark, indexDir, half).head.getDouble(2).isNaN)
  }

  test("scoreKn(indexed corpus) == the in-query q259 report") {
    val got = LmIndex.scoreKn(spark, indexDir, docs)
      .orderBy(col("doc_id")).collect().toSeq
    val want = SparkEntry.queries("q259_kneser_ney")(spark, dir)
      .orderBy(col("doc_id")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("scoreKn stays finite on unseen histories and continuations") {
    import spark.implicits._
    // words that exist nowhere in the reference: every bigram hits the
    // 1/(B+1) interpolation floor, B = the distinct-bigram-TYPE count
    // (scoreKn's nall normalizer, NOT the unigram vocab V) — defined
    // and worse than any indexed doc; the assertion below IS that
    // definition (ppl == |bigram types| + 1)
    val alien = Seq((9999L, "zzqx wwvk zzqx wwvk")).toDF("doc_id", "text")
    val row = LmIndex.scoreKn(spark, indexDir, alien).head
    val nall = LmIndex.readBigrams(spark, indexDir).count()
    assert(row.getLong(1) == 3L)
    assert(math.abs(row.getDouble(2) - (nall + 1).toDouble) < 1e-2,
      s"alien ppl ${row.getDouble(2)} != |bigram types|+1 = ${nall + 1}")
    // seen words in unseen order: the discounted-backoff mass keeps
    // the score finite
    val seen = docs.limit(1).select(col("text")).head.getString(0)
    val shuffled = seen.split(" ").reverse.mkString(" ")
    val half = Seq((9998L, shuffled)).toDF("doc_id", "text")
    val h = LmIndex.scoreKn(spark, indexDir, half).head
    assert(!h.getDouble(2).isNaN && !h.getDouble(2).isInfinite)
  }

  test("a vocab-unique word in a sub-2-token doc does not inflate V") {
    import spark.implicits._
    // q184/bigramLm drops 0/1-token docs BEFORE counting V; the index
    // must too, or score(indexed corpus) diverges from q184 the first
    // time real ingest contains a short doc (the r10 advice edge).
    val edge = Seq(
      (1L, "alpha beta alpha"),
      (2L, "beta gamma"),
      (3L, "qqzyx"), // 1 token, vocab-unique — must NOT count toward V
      (4L, "")       // 0 tokens
    ).toDF("doc_id", "text")
    val eDir = TestSpark.tmpDir("lm-index-edge")
    LmIndex.build(edge, eDir)
    val v = LmIndex.readWords(spark, eDir)
      .agg(count(lit(1))).head.getLong(0)
    assert(v == 3L, s"V=$v but bigramLm's vocab over >=2-token docs is 3")
    // and the score matches the exact hand model for doc 1: bigram
    // (alpha,beta) has c12=1, c1(alpha)=1 → ln(2/4); (beta,alpha) has
    // c12=1, c1(beta)=2 (beta opens b->a and b->g) → ln(2/5)
    val row = LmIndex.score(spark, eDir, edge.where(col("doc_id") === 1))
      .head
    val lp1 = math.round(math.log(2.0 / 4.0) * 1e9) / 1e9
    val lp2 = math.round(math.log(2.0 / 5.0) * 1e9) / 1e9
    val want = math.round(math.exp(-(lp1 + lp2) / 2.0) * 1e6) / 1e6
    assert(row.getLong(1) == 2L && row.getDouble(2) == want,
      s"got (${row.getLong(1)}, ${row.getDouble(2)}), want (2, $want)")
  }

  test("scoring through an appended index == through a full rebuild") {
    val all = docs.localCheckpoint()
    val first = all.where(col("doc_id") % 2 === 0)
    val second = all.where(col("doc_id") % 2 === 1)
    val incDir = TestSpark.tmpDir("lm-index-inc")
    LmIndex.build(first, incDir)
    LmIndex.append(second, incDir)
    val batch = all.limit(40).localCheckpoint()
    assert(
      LmIndex.score(spark, incDir, batch)
        .orderBy(col("doc_id")).collect().toSeq ==
      LmIndex.score(spark, indexDir, batch)
        .orderBy(col("doc_id")).collect().toSeq)
    // compaction changes the file layout, never an answer
    val cDir = TestSpark.tmpDir("lm-index-compacted")
    LmIndex.compact(spark, incDir, cDir)
    assert(
      LmIndex.score(spark, cDir, batch)
        .orderBy(col("doc_id")).collect().toSeq ==
      LmIndex.score(spark, incDir, batch)
        .orderBy(col("doc_id")).collect().toSeq)
  }

  test("an unmarked (pre-v2) tree is refused, not silently merged") {
    // simulate an index built before the _format marker existed: the
    // words/ semantics changed in-place (unigrams over ALL docs →
    // >=2-token docs only), so appending v2 counts to a v1 tree — or
    // scoring one — would mix incompatible vocab counts; both paths
    // must fail fast with a rebuild instruction instead
    import spark.implicits._
    val legacy = TestSpark.tmpDir("lm-index-legacy")
    LmIndex.build(docs, legacy)
    val fmt = new org.apache.hadoop.fs.Path(s"$legacy/_format")
    val fs = fmt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fmt, false)
    val batch = Seq((1L, "hello world")).toDF("doc_id", "text")
    // every refusal opens with the structured hint and names the
    // remedy — the operational loop is closed in the message itself
    def assertRemedy(e: IllegalStateException): Unit = {
      assert(e.getMessage.startsWith("rebuild-required:"), e.getMessage)
      assert(e.getMessage.contains("LmIndex.build"), e.getMessage)
    }
    val e1 = intercept[IllegalStateException](
      LmIndex.append(batch, legacy))
    assertRemedy(e1)
    val e2 = intercept[IllegalStateException](
      LmIndex.score(spark, legacy, batch).collect())
    assert(e2.getMessage.contains("_format"))
    assertRemedy(e2)
    // a future/foreign version is refused the same way
    val out = fs.create(fmt, true)
    out.write("lmindex.format=99\n".getBytes("UTF-8")); out.close()
    val e3 = intercept[IllegalStateException](
      LmIndex.scoreKn(spark, legacy, batch).collect())
    assert(e3.getMessage.contains("99"))
    assertRemedy(e3)
    // a FRESH directory passes the check (build/appendDelta stamp it):
    // first-writer-stamps, so a streaming twin's first micro-batch on
    // an empty dir is legal
    val fresh = TestSpark.tmpDir("lm-index-fresh")
    LmIndex.appendDelta(batch, fresh, gen = 0L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$fresh/_format")))
  }

  test("probeNext ranks continuations by count and pushes the history filter") {
    val rows = LmIndex.probeNext(spark, indexDir, Seq("the", "a"), 3)
      .collect()
    assert(rows.nonEmpty)
    // per-history: counts non-increasing, probabilities in (0, 1]
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val cs = g.map(_.getLong(2)).toSeq
      assert(cs == cs.sorted.reverse, s"counts not ranked: $cs")
    }
    assert(rows.forall(r =>
      r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    val scan = spark.read.parquet(s"$indexDir/bigrams")
      .where(col("w1").isin("the", "a"))
      .queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get
    assert(scan.metadata("PushedFilters").contains("In(w1"),
      s"expected In(w1, ...) pushed, got ${scan.metadata("PushedFilters")}")
  }
}
