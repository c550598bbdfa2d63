package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-2 corpus operators (q56-q59) beyond
  * the driver's DuckDB hash gate: structural properties that must hold
  * at ANY scale factor, not just the verified one.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q56: ratios bounded; contamination implies a train source") {
    val out = SparkEntry.queries("q56_decontamination")(spark, dir).cache()
    assert(out.where(col("contam_ratio") < 0 || col("contam_ratio") > 1)
      .isEmpty)
    assert(out.where(col("n_contaminated") > col("n_shingles")).isEmpty)
    // a contaminated doc names at least one train doc, a clean one none
    assert(out.where((col("n_contaminated") > 0) =!=
      (col("n_train_docs") > 0)).isEmpty)
    // the synthetic corpus has real cross-split 13-gram leaks
    assert(out.where(col("contam_ratio") > 0).count() >= 5)
    out.unpersist()
  }

  test("q57: fraction bounds hold and the thresholds split the corpus") {
    val out = SparkEntry.queries("q57_repetition_stats")(spark, dir).cache()
    assert(out.where(col("top_word_frac") <= 0 || col("top_word_frac") > 1)
      .isEmpty)
    assert(out.where(col("distinct_ratio") <= 0 || col("distinct_ratio") > 1)
      .isEmpty)
    // a doc's top word can be no rarer than uniform
    assert(out
      .where(col("top_word_frac") * col("n_words") < lit(1) - lit(1e-9))
      .isEmpty)
    val flagged = out.where(col("repetitive") === 1).count()
    assert(flagged > 0 && flagged < out.count())
    out.unpersist()
  }

  test("q58: banded join finds exactly the brute-force hamming<=3 pairs") {
    val out = SparkEntry.queries("q58_simhash_neardup")(spark, dir).cache()
    assert(out.where(col("hamming") > 3 || col("doc_a") >= col("doc_b"))
      .isEmpty)
    assert(out.where(abs(col("est_similarity") -
      (lit(1.0) - col("hamming") / lit(64.0))) > 1e-12).isEmpty)
    // no duplicate pairs despite multi-band collisions
    assert(out.groupBy("doc_a", "doc_b").count().where(col("count") > 1)
      .isEmpty)
    // prototyped ground truth at sf0.001: 20 pairs at hamming<=3
    assert(out.count() == 20)
    out.unpersist()
  }

  test("q59: greedy survivor rule is consistent") {
    val out = SparkEntry.queries("q59_semantic_dedup")(spark, dir).cache()
    assert(out.count() ==
      graft.Tables(spark, dir).embeddings.count())
    // isolated vectors are always kept; dropped ones have a neighbor
    assert(out.where(col("n_near") === 0 && col("keep") === 0).isEmpty)
    // per cell, the smallest vec id can never be dropped (its neighbors
    // all have larger ids)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
    assert(out.withColumn("mn", min(col("vec_id")).over(w))
      .where(col("vec_id") === col("mn") && col("keep") === 0).isEmpty)
    // the epsilon graph is symmetric, so every dropped vector's cell
    // retains at least one kept vector
    val bad = out.groupBy("cell")
      .agg(sum(col("keep")).as("kept"), count(lit(1)).as("n"))
      .where(col("kept") === 0)
    assert(bad.isEmpty)
    out.unpersist()
  }

  test("q277: distinct-n arithmetic is exact against an independent recount") {
    val raw = SparkEntry.queries("q277_distinct_ngrams")(spark, dir)
      .collect()
    assert(raw.nonEmpty)
    // spine completeness: every (source, n in 1..3) combination present
    val srcs = raw.map(_.getString(0)).distinct
    assert(raw.length == srcs.length * 3,
      "spine must carry one row per (source, n in 1..3)")
    // degenerate cells (source has no documents with >= n words)
    // report 0 grams / 0 types / NULL ratios rather than dropping
    raw.filter(_.getLong(2) == 0L).foreach { r =>
      assert(r.getLong(3) == 0L && r.isNullAt(4) && r.isNullAt(5))
    }
    val rows = raw.filter(_.getLong(2) > 0L)
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, grams, types, ratio, top) =>
      assert(n >= 1 && n <= 3)
      assert(types >= 1 && types <= grams,
        s"$src n=$n: types $types vs grams $grams")
      assert(ratio == math.rint(types.toDouble / grams * 1e6) / 1e6)
      // the modal gram's share is at least the uniform share 1/types
      // and at most everything
      assert(top >= 1.0 / types - 1e-9 && top <= 1.0)
    }
    // distinct-1 recount: per-source word totals and type counts from
    // an independent aggregation must match the n=1 rows exactly
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"),
        explode(expr(TextQueries.wordsExpr)).as("w"))
    val want = words.groupBy("source")
      .agg(count(lit(1)).as("g"), countDistinct(col("w")).as("t"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = rows.filter(_._2 == 1)
      .map { case (s, _, g, t, _, _) => s -> (g, t) }.toMap
    assert(got == want, "n=1 rows disagree with the independent recount")
  }
}
