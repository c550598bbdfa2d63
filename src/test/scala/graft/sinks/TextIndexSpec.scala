package graft.sinks

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted inverted index must (a) serve EXACTLY the answers the
  * in-query q132 BM25 plan computes for the same terms — the index
  * round-trip can't change a rank, count, or rounded score — and
  * (b) push the term filter into the postings scan so a lookup reads
  * only word-range-matching files, not the whole postings relation.
  */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val indexDir = {
    val out = TestSpark.tmpDir("text-index")
    TextIndex.build(
      Tables(spark, dir).documents.select(col("doc_id"), col("text")), out)
    out
  }

  test("BM25 over the persisted index == the in-query q132 answers") {
    val got = TextIndex
      .searchBm25(spark, indexDir, Seq("spark", "window", "merge"), 15)
      .orderBy(col("rk")).collect().toSeq
    val want = SparkEntry.queries("q132_bm25")(spark, dir)
      .orderBy(col("rk")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("batched BM25: each qid's slice == the single-query ranking") {
    // three term bags of different shapes (overlapping, disjoint,
    // single-term): the batch scan must reproduce each single-query
    // ranking exactly — same df/totals, same round-9 key + tiebreak
    val bags = Seq(
      1L -> Seq("spark", "window", "merge"),
      2L -> Seq("table", "hash"),
      3L -> Seq("batch"))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val qdf = spark.createDataFrame(
      spark.sparkContext.parallelize(bags.map { case (q, t) =>
        Row(q, t) }),
      StructType(Seq(StructField("qid", LongType),
        StructField("terms", ArrayType(StringType)))))
    val got = TextIndex.searchBm25Batch(spark, indexDir, qdf, topK = 15)
      .orderBy(col("qid"), col("rk")).collect().toSeq
      .groupBy(_.getLong(0))
    bags.foreach { case (q, terms) =>
      val single = TextIndex.searchBm25(spark, indexDir, terms, 15)
        .orderBy(col("rk")).collect().toSeq
      val batch = got(q).map(r => Row(r.getInt(1), r.get(2),
        r.get(3), r.get(4)))
      assert(batch == single.map(r => Row(r.getInt(0), r.get(1),
        r.get(2), r.get(3))), s"qid $q batch != single")
    }
  }

  test("phrase search over positional postings == the in-query q189 answers") {
    val got = TextIndex
      .searchPhrase(spark, indexDir, Seq("table", "hash"))
      .orderBy(col("doc_id")).collect().toSeq
    val want = SparkEntry.queries("q189_phrase_search")(spark, dir)
      .orderBy(col("doc_id")).collect().toSeq
    assert(got.nonEmpty && got == want)
    // a repeated-word phrase exercises the distinct-slot anchor rule:
    // "batch batch" must demand batch at BOTH adjacent positions, not
    // count one token twice (doc 0's "batch batch batch" run has 2
    // overlapping occurrences)
    val rep = TextIndex
      .searchPhrase(spark, indexDir, Seq("batch", "batch"))
      .where(col("doc_id") === 0).collect().toSeq
    assert(rep.map(_.getLong(1)) == Seq(2L))
  }

  test("append-then-search == full rebuild (O(batch) incremental index)") {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    // two ingest generations: build on the first half, append the rest
    val incDir = TestSpark.tmpDir("text-index-inc")
    TextIndex.build(docs.where(col("doc_id") % 2 === 0), incDir)
    TextIndex.append(docs.where(col("doc_id") % 2 === 1), incDir)
    val fullDir = TestSpark.tmpDir("text-index-full")
    TextIndex.build(docs, fullDir)
    // a different term set than the q132 parity case — the scorer is
    // shared code (Q.bm25Aggregate), but this exercises it at a second
    // (terms, k) point over merged delta generations
    val terms = Seq("shuffle", "parquet", "join")
    val got = TextIndex.searchBm25(spark, incDir, terms, 20)
      .orderBy(col("rk")).collect().toSeq
    val want = TextIndex.searchBm25(spark, fullDir, terms, 20)
      .orderBy(col("rk")).collect().toSeq
    assert(got.nonEmpty && got == want,
      "append deltas must be indistinguishable from a rebuild")
    // the stats log really is one delta row per generation, summed at
    // read: build's row in the main tree, the append's in its claimed
    // gen=-1 delta subtree (plain append routes through the gen-delta
    // path since r14 — the main tree is never touched)
    assert(spark.read.parquet(s"$incDir/stats").count() == 1)
    assert(spark.read.parquet(s"$incDir/stats_delta").count() == 1)
  }

  test("compact merges append generations without re-tokenizing") {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    val incDir = TestSpark.tmpDir("text-index-4gen")
    TextIndex.build(docs.where(col("doc_id") % 4 === 0), incDir)
    (1 to 3).foreach(g =>
      TextIndex.append(docs.where(col("doc_id") % 4 === g), incDir))
    val cDir = TestSpark.tmpDir("text-index-compacted")
    TextIndex.compact(spark, incDir, cDir)
    // count postings files across the main tree AND the gen-delta
    // subtrees (plain appends land under postings_delta/gen=-g since
    // r14) — compaction's claim is fewer files over the WHOLE reader
    // surface, and a compacted tree carries no delta subtree at all
    def files(d: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(d)).count(_.getName.endsWith(".parquet"))
    }
    // one generation: the 4-generation stats log folds to a single row
    assert(spark.read.parquet(s"$cDir/stats").count() == 1)
    assert(!new java.io.File(s"$cDir/postings_delta").exists())
    assert(files(s"$cDir/postings") <
      files(s"$incDir/postings") + files(s"$incDir/postings_delta"),
      "compaction must consolidate postings delta files")
    // and searches over the compacted index are byte-identical
    val terms = Seq("shuffle", "parquet", "join")
    assert(
      TextIndex.searchBm25(spark, cDir, terms, 20)
        .orderBy(col("rk")).collect().toSeq ==
      TextIndex.searchBm25(spark, incDir, terms, 20)
        .orderBy(col("rk")).collect().toSeq)
    assert(
      TextIndex.searchPhrase(spark, cDir, Seq("table", "hash"))
        .orderBy(col("doc_id")).collect().toSeq ==
      TextIndex.searchPhrase(spark, incDir, Seq("table", "hash"))
        .orderBy(col("doc_id")).collect().toSeq)
  }

  test("term filters push down into the postings scan") {
    val scan = spark.read.parquet(s"$indexDir/postings")
      .where(col("word").isin("spark", "merge"))
      .queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get
    assert(scan.dataFilters.nonEmpty, "term filter must reach the scan")
    assert(scan.metadata("PushedFilters").contains("In(word"),
      s"expected In(word, ...) pushed, got ${scan.metadata("PushedFilters")}")
  }
}
