package graft.sinks

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted dedup index must classify a batch EXACTLY as the
  * in-query q83 plan does (same split, same evidence doc ids), and
  * re-classifying indexed docs against their own index must find every
  * one of them as an exact duplicate — the round-trip invariant.
  */
class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // q83's SF-independent split: batch = newest 10% of doc ids
  private lazy val c9 = Tables(spark, dir).documents
    .agg(((max(col("doc_id")) + 1) * 9).as("c9")).head().getLong(0)
  private lazy val corpus = Tables(spark, dir).documents
    .where(col("doc_id") * 10 < c9).select(col("doc_id"), col("text"))
  private lazy val batch = Tables(spark, dir).documents
    .where(col("doc_id") * 10 >= c9).select(col("doc_id"), col("text"))

  private lazy val indexDir = {
    val out = TestSpark.tmpDir("dedup-index")
    DedupIndex.build(corpus, out)
    out
  }

  test("classify over the persisted index == the in-query q83 answers") {
    val got = DedupIndex.classify(spark, indexDir, batch)
      .orderBy(col("doc_id")).collect().toSeq
    val want = SparkEntry.queries("q83_incremental_dedup")(spark, dir)
      .orderBy(col("doc_id")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("incremental append classifies like a full rebuild") {
    // split the corpus in half, build on the first half, append the
    // second — classifying the batch must match the one-shot index
    val mid = corpus.agg(((max(col("doc_id")) + 1) / 2).cast("bigint"))
      .head().getLong(0)
    val out = TestSpark.tmpDir("dedup-index-inc")
    DedupIndex.build(corpus.where(col("doc_id") < mid), out)
    DedupIndex.append(corpus.where(col("doc_id") >= mid), out)
    val got = DedupIndex.classify(spark, out, batch)
      .orderBy(col("doc_id")).collect().toSeq
    val want = DedupIndex.classify(spark, indexDir, batch)
      .orderBy(col("doc_id")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("compact consolidates append deltas; classify is unchanged") {
    val mid = corpus.agg(((max(col("doc_id")) + 1) / 2).cast("bigint"))
      .head().getLong(0)
    val out = TestSpark.tmpDir("dedup-index-many-gen")
    DedupIndex.build(corpus.where(col("doc_id") < mid), out)
    DedupIndex.append(corpus.where(col("doc_id") >= mid), out)
    val cDir = TestSpark.tmpDir("dedup-index-compacted")
    DedupIndex.compact(spark, out, cDir)
    val got = DedupIndex.classify(spark, cDir, batch)
      .orderBy(col("doc_id")).collect().toSeq
    val want = DedupIndex.classify(spark, out, batch)
      .orderBy(col("doc_id")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("indexed docs re-classify as exact duplicates of themselves") {
    val statuses = DedupIndex.classify(spark, indexDir, corpus.limit(50))
      .select(col("status")).distinct().collect().map(_.getString(0)).toSet
    assert(statuses == Set("exact_dup"))
  }
}
