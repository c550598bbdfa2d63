package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-11 valuation/diversity/privacy operators
  * that the DuckDB hash cannot express as equality alone — properties
  * of the ALGORITHMS, valid at any scale factor.
  */
class ValuationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q260: MMR picks are distinct candidates, seeded by pure similarity") {
    val rows = graft.SparkEntry.queries("q260_mmr_rerank")(spark, dir)
      .collect()
    assert(rows.length == 40) // 5 queries × k=8
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.foreach { case (q, g) =>
      // ranks are exactly 1..8 and picks never repeat
      assert(g.map(_.getInt(1)).sorted.toSeq == (1 to 8),
        s"query $q ranks broken")
      val picks = g.map(_.getLong(2))
      assert(picks.distinct.length == 8, s"query $q repeated a pick")
      assert(!picks.contains(q), s"query $q selected itself")
    }
    // rank 1 is the raw nearest neighbor (MMR's second term is empty
    // at the seed) — recompute independently
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr("l2_normalize(embedding)").as("v"))
      .localCheckpoint()
    val top1 = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .crossJoin(e).where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(expr("dot_product(qv, v)"), 9).as("s"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("s").desc, col("vec_id").asc)))
      .where(col("rk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byQ.foreach { case (q, g) =>
      val first = g.find(_.getInt(1) == 1).get.getLong(2)
      assert(first == top1(q), s"query $q seed != nearest neighbor")
    }
  }

  test("Valuation.knnShapleyTopR: full R over the index ≡ q262; R=64 ≡ q268") {
    // the library path's only difference from the oracle-gated twins
    // is the candidate source (VectorIndex probe + stored-vector
    // re-score); with every cell probed and the fetch covering the
    // corpus it must reproduce them ROW FOR ROW
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint()
    val idx = graft.TestSpark.tmpDir("valuation-ivf")
    graft.sinks.VectorIndex.build(e, idx, k = 16)
    val train = e.where(col("vec_id") % 10 =!= 0)
    val valq = e.where(col("vec_id") % 10 === 0 && col("vec_id") < 2048)
    val n = e.count().toInt
    def img(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("vec_id")).collect().toSeq

    // full R: every cell probed, fetch covers the whole corpus (the
    // index also holds the val points; the train-label join drops
    // them) → the deepest rank is ntr and the sweep is exactly q262's
    val fullR = Valuation.knnShapleyTopR(spark, idx, train, valq,
      r = n, nprobe = 16, fetchK = n + 8)
    val q262 = graft.SparkEntry.queries("q262_knn_shapley")(spark, dir)
    assert(img(fullR.select(col("vec_id"), col("label"),
        col("shap_topr_r").as("s")))
      == img(q262.select(col("vec_id"), col("label"),
        col("shap_r").as("s"))),
      "full-R index-backed sweep != q262")
    // at full R every point is in every query's candidate set
    assert(fullR.where(col("nq") =!= valq.count()).count() == 0)

    // R = 64: the truncation semantics are q268's (oracle-gated);
    // fetch covers the val interlopers so the train top-64 is exact
    val topR = Valuation.knnShapleyTopR(spark, idx, train, valq,
      r = 64, nprobe = 16, fetchK = n + 8)
    val q268 = graft.SparkEntry.queries("q268_shapley_topr")(spark, dir)
    assert(img(topR) == img(q268), "R=64 index-backed sweep != q268")
  }

  test("Valuation.mmrFromIndex: all cells probed ≡ q260") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint()
    val idx = graft.TestSpark.tmpDir("valuation-mmr-ivf")
    graft.sinks.VectorIndex.build(e, idx, k = 16)
    val got = Valuation.mmrFromIndex(spark, idx,
        e.where(col("vec_id") < 5).select(col("vec_id"), col("embedding")),
        topC = 20, nprobe = 16)
      .collect().toSeq
    val want = graft.SparkEntry.queries("q260_mmr_rerank")(spark, dir)
      .collect().toSeq
    assert(got.nonEmpty && got == want, "index-backed MMR != q260")
  }

  test("q262: Shapley values satisfy the efficiency axiom") {
    // Σ_train s(q, t) == (top-K label agreement)/K per validation
    // point — the telescoping identity of the Jia et al. closed form.
    // The query outputs per-train averages over n_val queries, so
    // Σ_t shap(t) · n_val must equal Σ_q topK_frac(q) up to the
    // 12-decimal term quantization.
    val out = graft.SparkEntry.queries("q262_knn_shapley")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        expr("l2_normalize(embedding)").as("v"))
      .localCheckpoint()
    val nVal = e.where(col("vec_id") % 10 === 0).count()
    val shapTotal = out.map(_.getDouble(2)).sum * nVal
    // independent top-5 agreement per validation point
    val tr = e.where(col("vec_id") % 10 =!= 0)
      .select(col("vec_id").as("tid"), col("label").as("tl"),
        col("v").as("tv"))
    val va = e.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("label").as("ql"),
        col("v").as("qv"))
    val frac = tr.crossJoin(broadcast(va))
      .select(col("qid"), col("tid"),
        when(col("tl") === col("ql"), 1.0d).otherwise(0.0d).as("ind"),
        round(expr("dot_product(tv, qv)"), 9).as("sim"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("tid").asc)))
      .where(col("rk") <= 5)
      .groupBy(col("qid")).agg((sum(col("ind")) / 5.0d).as("f"))
      .agg(sum(col("f"))).head.getDouble(0)
    assert(math.abs(shapTotal - frac) < 1e-4,
      s"efficiency axiom: sum(shap)*nVal = $shapTotal vs $frac")
    // and a sanity sign check: some point must have non-zero value
    assert(out.exists(_.getDouble(2) != 0.0))
  }

  test("q263: non-rewritten controls score ROUGE F1 = 1 at both orders") {
    val rows = graft.SparkEntry.queries("q263_rouge")(spark, dir).collect()
    assert(rows.length == 500)
    val controls = rows.filter(_.getLong(1) == 0L)
    assert(controls.nonEmpty)
    controls.foreach { r =>
      // candidate ≡ reference ⇒ P = R = F = 1 wherever grams exist
      assert(r.getDouble(4) == 1.0, s"doc ${r.getLong(0)} r1_f != 1")
    }
    val rewritten = rows.filter(_.getLong(1) == 1L)
    assert(rewritten.nonEmpty)
    // a rewrite scrambles order: bigram F must drop below unigram F
    // somewhere (sentinels + boundary splices change 2-grams more)
    assert(rewritten.exists(r => r.getDouble(7) < r.getDouble(4)))
  }

  test("q264: maps are probabilities and regions partition the corpus") {
    val rows = graft.SparkEntry.queries("q264_data_maps")(spark, dir)
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (conf, v) = (r.getDouble(2), r.getDouble(3))
      assert(conf > 0.0 && conf < 1.0 && v >= 0.0 && v <= 0.5)
      val want =
        if (v > 0.15) "ambiguous"
        else if (conf >= 0.6) "easy"
        else if (conf <= 0.4) "hard"
        else "mid"
      assert(r.getString(4) == want)
    }
    // the trajectory must actually separate examples: both y classes
    // present and not all confidences identical
    assert(rows.map(_.getLong(1)).distinct.length == 2)
    assert(rows.map(_.getDouble(2)).distinct.length > 1)
  }

  test("q265: group-level straddle is zero; masses cover the corpus") {
    val rows = graft.SparkEntry.queries("q265_group_split")(spark, dir)
      .orderBy("grp_split").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getLong(5) == 0L), "group-level straddle != 0")
    val nDocs = graft.Tables(spark, dir).documents.count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    // groups never double-count across splits (fp → one split)
    val nGroups = graft.Tables(spark, dir).documents
      .select(graft.queries.Q.fingerprint(col("text"))).distinct().count()
    assert(rows.map(_.getLong(2)).sum == nGroups)
  }

  test("q266: PPR mass concentrates on and around the seed set") {
    val rows = graft.SparkEntry.queries("q266_ppr")(spark, dir)
      .collect()
    assert(rows.length == 20)
    // ranks are sorted desc with the v-asc tiebreak
    val ps = rows.map(_.getDouble(1))
    assert(ps.sliding(2).forall { case Array(a, b) => a >= b })
    // the seed flag is exactly the arithmetic rule
    rows.foreach { r =>
      assert((r.getLong(0) % 50 == 0) == (r.getLong(2) == 1L)) }
    // personalization must actually bite — RELATIVE to global
    // PageRank: seeds hold at least as many top-20 slots under PPR as
    // under q101 (high-degree hubs can still outrank low-degree
    // seeds; the teleport only ever helps seeds), and at least one
    // seed surfaces
    val seedSlots = rows.count(_.getLong(2) == 1L)
    assert(seedSlots >= 1, "no seed in the PPR top-20")
    val globalSeedSlots = graft.SparkEntry
      .queries("q101_pagerank")(spark, dir).collect()
      .count(_.getLong(0) % 50 == 0)
    assert(seedSlots >= globalSeedSlots,
      s"PPR seeds $seedSlots < global-PR seeds $globalSeedSlots")
  }

  test("q267: rule counts are exact against an independent recount") {
    val rows = graft.SparkEntry.queries("q267_gopher_rules")(spark, dir)
      .orderBy("rule").collect()
    assert(rows.length == 6)
    val nDocs = graft.Tables(spark, dir).documents.count()
    rows.foreach { r =>
      assert(r.getLong(3) == nDocs)
      assert(r.getLong(1) >= 0 && r.getLong(1) <= nDocs)
    }
    // word-count rule recounted independently over whitespace words
    val wc = graft.Tables(spark, dir).documents
      .selectExpr("size(filter(split(trim(text), '\\\\s+'), x -> x <> ''))"
        + " as nw")
      .where(col("nw") < 50 || col("nw") > 100000).count()
    val got = rows.find(_.getString(0) == "word_count_bounds").get
    assert(got.getLong(1) == wc)
  }

  test("q261: class arithmetic is exact and monotone in k") {
    val rows = graft.SparkEntry.queries("q261_k_anonymity")(spark, dir)
      .orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 5L, 10L, 20L))
    // counts non-decreasing in k; pct consistent with the division
    val below = rows.map(r => (r.getLong(1), r.getLong(2)))
    assert(below.sliding(2).forall { case Array((c1, r1), (c2, r2)) =>
      c1 <= c2 && r1 <= r2 })
    // independent recomputation of the class relation
    val cl = graft.Tables(spark, dir).customer
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        expr("cast(floor(c_acctbal / 1000.0d) as bigint)"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val minClass = cl.agg(min(col("cnt"))).head.getLong(0)
    assert(rows.forall(_.getLong(4) == minClass))
    val n5 = cl.where(col("cnt") < 5).count()
    assert(rows(1).getLong(1) == n5)
  }
}
