package graft.sinks

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF index must (a) serve EXACTLY the answers the
  * in-query q48 plan computes — build/search round-tripping through
  * parquet can't change a single rank or rounded cosine — and (b) lay
  * postings out hive-partitioned by cell so a probe's scan prunes to
  * its cells at the source.
  */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val indexDir = {
    val out = TestSpark.tmpDir("ivf-index")
    VectorIndex.build(
      Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding")),
      out, k = 16)
    out
  }

  test("search over the persisted index == the in-query q48 answers") {
    val queries = Tables(spark, dir).embeddings
      .where(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    val got = VectorIndex
      .search(spark, indexDir, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    val want = SparkEntry.queries("q48_ann_ivf")(spark, dir)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("incremental append serves the same answers as a full rebuild") {
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val out = TestSpark.tmpDir("ivf-index-inc")
    // the first 300 ids contain the ENTIRE Lloyd training sample
    // (vec_id < IvfSampleCap = 256), so the trained quantizer is
    // identical to the full build's — the sample-bounded-training
    // contract that makes append ≡ rebuild exact
    VectorIndex.build(emb.where(col("vec_id") < 300), out, k = 16)
    VectorIndex.append(spark, out, emb.where(col("vec_id") >= 300))
    val queries = emb.where(col("vec_id") < 10)
    val got = VectorIndex.search(spark, out, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    val want = VectorIndex
      .search(spark, indexDir, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("trained build: deterministic quantizer, append == rebuild") {
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    // trained full rebuild, twice — Lloyd must be run-deterministic
    val t1 = TestSpark.tmpDir("ivf-trained-1")
    val t2 = TestSpark.tmpDir("ivf-trained-2")
    VectorIndex.build(emb, t1, k = 16, trainIters = 3)
    VectorIndex.build(emb, t2, k = 16, trainIters = 3)
    val c1 = spark.read.parquet(s"$t1/centroids")
      .orderBy(col("cent_id")).collect().toSeq
    val c2 = spark.read.parquet(s"$t2/centroids")
      .orderBy(col("cent_id")).collect().toSeq
    assert(c1.length == 16 && c1 == c2,
      "trained centroids must be byte-identical across builds")
    // trained centroids must actually have moved off the seed anchors
    val anchors = spark.read.parquet(s"$indexDir/centroids")
      .orderBy(col("cent_id")).collect().toSeq
    assert(c1 != anchors, "trainIters = 3 must not be a no-op")
    // append contract holds under training too: base ⊇ the training
    // sample (vec_id < 256) → identical quantizer → exact parity
    val inc = TestSpark.tmpDir("ivf-trained-inc")
    VectorIndex.build(emb.where(col("vec_id") < 300), inc,
      k = 16, trainIters = 3)
    VectorIndex.append(spark, inc, emb.where(col("vec_id") >= 300))
    val queries = emb.where(col("vec_id") < 10)
    val got = VectorIndex.search(spark, inc, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    val want = VectorIndex.search(spark, t1, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("degenerate corpus (missing seed ids) fails fast at build") {
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
      .where(col("vec_id") >= 8) // seeds 0..7 missing
    val out = TestSpark.tmpDir("ivf-degenerate")
    intercept[IllegalArgumentException] {
      VectorIndex.build(emb, out, k = 16)
    }
  }

  test("ADC search over the persisted IVF-PQ index == in-query q72 at full probe") {
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val out = TestSpark.tmpDir("ivfpq-index")
    VectorIndex.buildPq(emb, out, k = 16)
    val queries = emb.where(col("vec_id") < 10)
    // nprobe = k scans every cell, so the IVF routing is a no-op and
    // the persisted ADC path must reproduce the in-query q72 ranking
    // byte-for-byte (same LUT, scorer, rounding, tiebreaks)
    val got = VectorIndex
      .searchAdc(spark, out, queries, nprobe = 16, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    val want = SparkEntry.queries("q72_pq_adc_search")(spark, dir)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    assert(got.nonEmpty && got == want)
    // pruned probe still returns a full top-k per query (candidates
    // shrink, the contract doesn't)
    val pruned = VectorIndex
      .searchAdc(spark, out, queries, nprobe = 2, topK = 3)
      .collect().toSeq
    assert(pruned.size == 30)
  }

  test("incremental PQ append serves the same answers as a full rebuild") {
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val full = TestSpark.tmpDir("ivfpq-full")
    VectorIndex.buildPq(emb, full, k = 16)
    // base ⊇ both fixed samples (IVF quantizer: vec_id < 256 Lloyd
    // sample; PQ codebook: vec_id < 16 slices) → identical quantizer
    // AND codebook → append must be exact, not approximate
    val inc = TestSpark.tmpDir("ivfpq-inc")
    VectorIndex.buildPq(emb.where(col("vec_id") < 300), inc, k = 16)
    VectorIndex.appendPq(spark, inc, emb.where(col("vec_id") >= 300))
    val queries = emb.where(col("vec_id") < 10)
    val got = VectorIndex.searchAdc(spark, inc, queries, nprobe = 3, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    val want = VectorIndex.searchAdc(spark, full, queries, nprobe = 3, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("gen-scoped delta appends: replay-idempotent, search-identical") {
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val out = TestSpark.tmpDir("ivf-delta")
    VectorIndex.build(emb.where(col("vec_id") < 300), out, k = 16)
    VectorIndex.appendDelta(spark, out,
      emb.where(col("vec_id") >= 300 && col("vec_id") < 400), gen = 0L)
    // REPLAY gen 0 (foreachBatch's at-least-once case): the gen dir is
    // overwritten, not appended — rows must not duplicate
    VectorIndex.appendDelta(spark, out,
      emb.where(col("vec_id") >= 300 && col("vec_id") < 400), gen = 0L)
    VectorIndex.appendDelta(spark, out,
      emb.where(col("vec_id") >= 400), gen = 1L)
    val queries = emb.where(col("vec_id") < 10)
    val got = VectorIndex.search(spark, out, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    val want = VectorIndex
      .search(spark, indexDir, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    assert(got.nonEmpty && got == want)
    // compact folds the generations away and answers stay identical
    val cDir = TestSpark.tmpDir("ivf-delta-compacted")
    VectorIndex.compact(spark, out, cDir)
    assert(!new java.io.File(s"$cDir/postings_delta").exists())
    val cGot = VectorIndex.search(spark, cDir, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    assert(cGot == want)
  }

  test("gen-scoped PQ delta appends: replay-idempotent, ADC-identical") {
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val out = TestSpark.tmpDir("ivfpq-delta")
    VectorIndex.buildPq(emb.where(col("vec_id") < 300), out, k = 16)
    VectorIndex.appendDeltaPq(spark, out,
      emb.where(col("vec_id") >= 300 && col("vec_id") < 400), gen = 0L)
    // REPLAY gen 0: the gen dir is overwritten, codes must not dup
    VectorIndex.appendDeltaPq(spark, out,
      emb.where(col("vec_id") >= 300 && col("vec_id") < 400), gen = 0L)
    VectorIndex.appendDeltaPq(spark, out,
      emb.where(col("vec_id") >= 400), gen = 1L)
    val full = TestSpark.tmpDir("ivfpq-delta-full")
    VectorIndex.buildPq(emb, full, k = 16)
    val queries = emb.where(col("vec_id") < 10)
    val got = VectorIndex.searchAdc(spark, out, queries,
        nprobe = 16, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    val want = VectorIndex.searchAdc(spark, full, queries,
        nprobe = 16, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    assert(got.nonEmpty && got == want)
    // compact folds the PQ delta generations away; answers unchanged
    val cDir = TestSpark.tmpDir("ivfpq-delta-compacted")
    VectorIndex.compact(spark, out, cDir)
    assert(!new java.io.File(s"$cDir/pq_postings_delta").exists())
    val cGot = VectorIndex.searchAdc(spark, cDir, queries,
        nprobe = 16, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    assert(cGot == want)
  }

  test("compact preserves the cell layout and every search answer") {
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val out = TestSpark.tmpDir("ivf-compact-src")
    VectorIndex.build(emb.where(col("vec_id") < 300), out, k = 16)
    VectorIndex.append(spark, out, emb.where(col("vec_id") >= 300))
    VectorIndex.buildPq(emb, out, k = 16) // PQ tree in the same dir
    val cDir = TestSpark.tmpDir("ivf-compacted")
    VectorIndex.compact(spark, out, cDir)
    // hive cell dirs survive (probe-time pruning intact)
    val cells = new java.io.File(s"$cDir/postings").listFiles()
      .filter(_.isDirectory).count(_.getName.startsWith("cell="))
    assert(cells > 1)
    val queries = emb.where(col("vec_id") < 10)
    assert(
      VectorIndex.search(spark, cDir, queries, nprobe = 2, topK = 3)
        .orderBy(col("qid"), col("rk")).collect().toSeq ==
      VectorIndex.search(spark, out, queries, nprobe = 2, topK = 3)
        .orderBy(col("qid"), col("rk")).collect().toSeq)
    assert(
      VectorIndex.searchAdc(spark, cDir, queries, nprobe = 16, topK = 3)
        .orderBy(col("qid"), col("rk")).collect().toSeq ==
      VectorIndex.searchAdc(spark, out, queries, nprobe = 16, topK = 3)
        .orderBy(col("qid"), col("rk")).collect().toSeq)
  }

  test("postings are cell-partitioned and a cell filter prunes the scan") {
    val cells = new java.io.File(s"$indexDir/postings").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cells.length > 1, s"expected hive cell dirs, got ${cells.toSeq}")
    val scan = spark.read.parquet(s"$indexDir/postings")
      .where(col("cell") === 3)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scan.nonEmpty)
    // partition filter reached the file source: only cell=3's files
    assert(scan.head.partitionFilters.nonEmpty,
      "cell filter did not reach the scan as a partition filter")
  }
}
