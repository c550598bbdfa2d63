package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q54 cluster formation + q55 quota mixing, plus the star-contraction
  * kernel on a hand-built graph whose diameter forces multi-round
  * convergence (the case a single propagation hop gets wrong).
  */
class DedupClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("star contraction labels a long chain, a triangle, and a pair") {
    import spark.implicits._
    // chain 1-2-3-4-5-6 (diameter 5: needs >1 contraction round),
    // triangle 10-11-12 given in mixed orientation, pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (5L, 6L),
      (10L, 11L), (12L, 10L), (11L, 12L), (21L, 20L)).toDF("u", "v")
    val got = graft.core.ConnectedComponents.run(edges)
      .as[(Long, Long)].collect().toSet
    val want = Set(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      11L -> 10L, 12L -> 10L, 21L -> 20L)
    assert(got == want)
  }

  test("q54 assigns every document; labels are component minima") {
    val out = SparkEntry.queries("q54_dedup_clusters")(spark, dir).cache()
    val docs = graft.Tables(spark, dir).documents.count()
    assert(out.count() == docs)
    // cluster id is a member of its own cluster and is its minimum
    assert(out.where(col("cluster_id") > col("doc_id")).isEmpty)
    val roots = out.where(col("is_survivor"))
    assert(roots.where(col("cluster_id") =!= col("doc_id")).isEmpty)
    // exactly one survivor per cluster; sizes sum back to the doc count
    val perCluster = out.groupBy("cluster_id")
      .agg(count(lit(1)).as("n"), max(col("n_members")).as("m"),
        sum(when(col("is_survivor"), 1L).otherwise(0L)).as("surv"))
    assert(perCluster.where(col("n") =!= col("m") || col("surv") =!= 1)
      .isEmpty)
    // the sf0.001 graph has real multi-doc clusters (prototyped: 16
    // clusters at threshold 0.02, largest of size 3)
    assert(out.where(col("n_members") >= 3).count() >= 3)
    out.unpersist()
  }

  test("q55 honors per-source quotas and is deterministic") {
    val q = SparkEntry.queries("q55_source_quota_mix")
    val out = q(spark, dir).cache()
    // never more rows than quota, ranks dense from 1
    val bad = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max(col("quota")).as("q"),
        max(col("rk")).as("maxrk"), min(col("rk")).as("minrk"))
      .where(col("n") > col("q") || col("maxrk") =!= col("n") ||
        col("minrk") =!= 1)
    assert(bad.isEmpty)
    // every source participates, with at least two distinct quotas
    // (weights 0.25/0.5/0.75 over 20 sources)
    assert(out.select("source").distinct().count() == 20)
    assert(out.select("quota").distinct().count() >= 2)
    // hash-identical on a rerun — the reproducibility contract
    val h1 = out.agg(sum(hash(col("source"), col("doc_id"), col("rk"))))
      .head.getLong(0)
    val h2 = q(spark, dir)
      .agg(sum(hash(col("source"), col("doc_id"), col("rk"))))
      .head.getLong(0)
    assert(h1 == h2)
    out.unpersist()
  }

  test("q278: effective mass is bounded by raw mass and shares sum to 1") {
    val rows = graft.SparkEntry.queries("q278_dedup_weights")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._2).sum == nDocs,
      "per-source doc counts must cover the corpus")
    rows.foreach { case (src, n, eff, raw, dedup, uniq) =>
      // a cluster weight is 1/|cluster| <= 1, so effective <= raw;
      // every doc contributes > 0, so effective > 0
      assert(eff > 0.0 && eff <= n + 1e-6, s"$src: eff $eff vs n $n")
      assert(uniq > 0.0 && uniq <= 1.0 + 1e-6)
      assert(raw >= 0.0 && raw <= 1.0 && dedup >= 0.0 && dedup <= 1.0)
    }
    // both share columns sum to 1 (each entry rounded at 6)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4)
    // total effective mass = number of clusters touched, weighted:
    // summing 1/|c| over every member of every cluster counts each
    // cluster exactly once
    val nClusters = graft.SparkEntry.queries("q54_dedup_clusters")(
      spark, dir).select("cluster_id").distinct().count()
    assert(math.abs(rows.map(_._3).sum - nClusters) < 1e-3,
      s"sum eff ${rows.map(_._3).sum} != n clusters $nClusters")
  }
}
