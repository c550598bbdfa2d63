package graft.sinks

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted span index must (a) serve EXACTLY the shared-span
  * answers the in-query q190 plan computes over the same corpus — the
  * index round-trip can't change a run length or span count — and
  * (b) make the hot-gram cap a PROBE-TIME rule over the summed df
  * ledger, so an append that pushes a boilerplate gram past the cap
  * silences it exactly as a rebuild would, and compact can
  * garbage-collect the dead postings. (The generic lifecycle
  * invariants — append ≡ rebuild, compact ≡ identity — run in
  * SinkContractSpec; this spec pins the probe semantics.)
  */
class SpanIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Letters-only id word: the tokenizer is `[a-z]+` (digits split),
    * so "unique42a" would collapse to the same tokens for every doc —
    * spell the digits instead (42 → "uec…"-style, distinct per id).
    */
  private def spell(i: Int): String =
    "u" + i.toString.map(c => ('a' + (c - '0')).toChar).mkString

  test("probe over the persisted index == the in-query q190 answers") {
    val corpus = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    val idx = TestSpark.tmpDir("span-index")
    SpanIndex.build(corpus, idx)
    // probing the corpus against its own index yields both orientations
    // of every pair; the da < db half is exactly q190's relation
    val got = SpanIndex.probe(spark, idx, corpus)
      .where(col("da") < col("db"))
      .orderBy(col("da"), col("db")).collect().toSeq
    val want = SparkEntry.queries("q190_shared_spans")(spark, dir)
      .orderBy(col("da"), col("db")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("append past the cap silences a gram retroactively (≡ rebuild)") {
    // one 8-word sentence shared verbatim by every doc; generation A
    // keeps its df at 40 (under the 64 cap), generation B pushes the
    // TOTAL to 80 — from then on the gram must be dead corpus-wide,
    // exactly as a from-scratch rebuild over A ∪ B would compute
    val boiler = "terms of service apply to all content here"
    def gen(ids: Range) = docs(ids.map(i =>
      i.toLong -> s"$boiler ${spell(i)}one ${spell(i)}two ${spell(i)}six"))
    val probeDoc = docs(Seq(9999L -> s"intro words $boiler trailing words"))

    val idx = TestSpark.tmpDir("span-index-cap")
    SpanIndex.build(gen(0 until 40), idx)
    val before = SpanIndex.probe(spark, idx, probeDoc)
    assert(before.count() == 40,
      "under the cap, the shared sentence matches every indexed doc")
    SpanIndex.append(gen(40 until 80), idx)
    assert(SpanIndex.probe(spark, idx, probeDoc).count() == 0,
      "over the cap, the gram is boilerplate and must go silent")

    val rebuilt = TestSpark.tmpDir("span-index-cap-rebuild")
    SpanIndex.build(gen(0 until 80), rebuilt)
    assert(SpanIndex.probe(spark, rebuilt, probeDoc).count() == 0)
  }

  test("un-indexed batch whose own grams cross the cap == q190 over corpus ∪ batch") {
    // corpus: 60 docs share the boilerplate sentence (df = 60, under
    // the 64 cap — probes see it). Batch: 10 NEW docs carrying the
    // same sentence. Over corpus ∪ batch the gram's df is 70 > 64, so
    // an exact probe must silence it — the round-8 precondition said
    // this case over-reported; the docs-ledger cap fold closes it.
    // Each doc also shares a unique 8-token tail with exactly one
    // corpus partner, so the probe still has REAL spans to report and
    // the assertion is equivalence, not mere emptiness.
    val boiler = "terms of service apply to all content here"
    def tail(i: Int) = s"${spell(i)}p ${spell(i)}q ${spell(i)}r " +
      s"${spell(i)}s ${spell(i)}t ${spell(i)}u ${spell(i)}v ${spell(i)}w"
    val corpus = docs((0 until 60).map(i =>
      i.toLong -> s"$boiler ${tail(i % 10)}"))
    val batch = docs((100 until 110).map(i =>
      i.toLong -> s"$boiler ${tail(i - 100)}"))
    val idx = TestSpark.tmpDir("span-index-unidx-cap")
    SpanIndex.build(corpus, idx)
    val got = SpanIndex.probe(spark, idx, batch)
      .orderBy(col("da"), col("db")).collect().toSeq
    // q190's own machinery over the UNION (sharedSpans is the
    // q190-pinned core), restricted to corpus×batch pairs — the
    // probe's contract surface
    val want = graft.queries.DedupQueries
      .sharedSpans(corpus.unionByName(batch),
        graft.queries.DedupQueries.spanDfCap)
      .where(col("da") < 100L && col("db") >= 100L)
      .orderBy(col("da"), col("db")).collect().toSeq
    assert(got.nonEmpty && got == want)
    // and the boilerplate really did cross the cap only via the fold:
    // no pure-boiler pair (da sharing ONLY the sentence with db)
    // survives, while the tail-sharing pairs do — 6 corpus docs per
    // batch doc (i%10 partners) = 60 pairs
    assert(got.size == 60, s"expected 60 tail-sharing pairs, got ${got.size}")
  }

  test("compact garbage-collects dead grams' postings, probes unchanged") {
    val nav = "home about products contact login search help news"
    val d = docs((0 until 100).map(i =>
      i.toLong ->
        s"$nav ${spell(i)}one ${spell(i)}two ${spell(i)}six ${spell(i)}ten"))
    val idx = TestSpark.tmpDir("span-index-gc")
    SpanIndex.build(d, idx)
    val raw = spark.read.parquet(s"$idx/grams").count()
    val live = SpanIndex.livePostings(spark, idx).count()
    assert(live < raw, "the df=100 navbar gram must be probe-dead")

    val cDir = TestSpark.tmpDir("span-index-gc-compacted")
    SpanIndex.compact(spark, idx, cDir)
    // dead postings left the disk; the ledger kept every count
    assert(spark.read.parquet(s"$cDir/grams").count() == live)
    assert(SpanIndex.totalDfs(spark, cDir)
      .where(col("df") > SpanIndex.dfCap).count() ==
      SpanIndex.totalDfs(spark, idx)
        .where(col("df") > SpanIndex.dfCap).count())
    // and a probe carrying both the navbar and a genuine sub-cap span
    // answers identically over src and compacted
    val probeDoc = docs(Seq(
      5000L -> s"$nav ${spell(7)}one ${spell(7)}two ${spell(7)}six ${spell(7)}ten"))
    val a = SpanIndex.probe(spark, idx, probeDoc)
      .orderBy(col("da")).collect().toSeq
    val b = SpanIndex.probe(spark, cDir, probeDoc)
      .orderBy(col("da")).collect().toSeq
    assert(a == b)
    // the probe doc repeats doc 7's full 12-token text: the grams
    // mixing navbar and unique7 words have df = 1 (only doc 7), so the
    // pair (7, 5000) must survive the GC even though the pure-navbar
    // gram is dead
    assert(a.exists(_.getLong(0) == 7L),
      "genuine sub-cap overlap with doc 7 must survive the GC")
  }
}
