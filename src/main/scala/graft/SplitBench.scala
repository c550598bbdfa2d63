package graft

import org.apache.spark.sql.functions._

/** Hot-cell remediation cost probe — the measured form of
  * [[sinks.VectorIndex.splitHotCells]]'s O(hot cell) claim against the
  * O(corpus) alternative it replaces for targeted maintenance
  * (`compact(retrain = true)`).
  *
  * Fixture: the corpus index (k = 16, the q48 quantizer) plus a
  * FIXED-SIZE appended crowd (near-copies of one seed vector, ids past
  * the corpus max) that piles into a single cell and trips q221's hot
  * flag. The crowd is scale-INVARIANT — the same 5000-vector crowd
  * against a 1× and a 10× corpus — so the two maintenance paths
  * separate cleanly: split cost should track the HOT CELL (≈ the
  * crowd), retrain cost the corpus. Run on a base dir and a
  * `graft.ScaleProbe` blow-up; compare the two columns.
  *
  * Both variants run against their own freshly-built identical index
  * (split mutates in place; retrain writes a dst tree), and both
  * post-states are sanity-checked (total membership preserved; the
  * split index's hot set shrunk).
  *
  * Prints ONE JSON line:
  * {"metric":"split_vs_retrain","sf":…,"corpus_vecs":N,"crowd":C,
  *  "hot_cells":H,"split_s":…,"retrain_s":…,"splits":[[old,new,kept,moved]…]}
  */
object SplitBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val crowdN = sys.env.getOrElse("SPARK_GRAFT_SPLIT_CROWD",
      "5000").toInt
    val spark = Sessions.localSized("graft-splitbench", cpus, sfDir)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup

    val emb = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val nVec = emb.count()
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
    // deterministic jittered near-copies of vec 5 — all land in vec
    // 5's cell (the VectorIndexSpec crowd recipe at probe size)
    val crowd = emb.where(col("vec_id") === 5)
      .crossJoin(spark.range(crowdN))
      .select((col("id") + maxId + 1L).as("vec_id"),
        expr("""transform(embedding,
          (x, j) -> x + 1.0e-4d * sin(cast(id * 31 + j as double)))""")
          .as("embedding"))
      .localCheckpoint() // pay the synthesis once, outside the timers

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-splitbench").toString

    // ---- variant A: targeted split (in place) -----------------------
    val a = s"$tmp/ivf-a"
    sinks.VectorIndex.build(emb, a, k = 16)
    sinks.VectorIndex.append(spark, a, crowd)
    val hotBefore = sinks.VectorIndex.cellBalance(spark, a)
      .where(col("hot") === 1).count()
    require(hotBefore > 0, "crowd did not trip the hot flag")
    var report = Seq.empty[sinks.VectorIndex.CellSplit]
    val tSplit = sec {
      report = sinks.VectorIndex.splitHotCells(spark, a)
    }
    val postA = sinks.VectorIndex.readPostings(spark, a)
    require(postA.count() == nVec + crowdN, "split lost rows")
    val hotAfter = sinks.VectorIndex.cellBalance(spark, a)
      .where(col("hot") === 1).count()

    // ---- variant B: global retraining compact -----------------------
    val b = s"$tmp/ivf-b"
    sinks.VectorIndex.build(emb, b, k = 16)
    sinks.VectorIndex.append(spark, b, crowd)
    val tRetrain = sec {
      sinks.VectorIndex.compact(spark, b, s"$tmp/ivf-b-out",
        retrain = true)
    }
    require(spark.read.parquet(s"$tmp/ivf-b-out/postings").count()
      == nVec + crowdN, "retrain lost rows")

    val splits = report.map(r =>
      s"[${r.cell},${r.newCell},${r.nKept},${r.nMoved}]")
      .mkString("[", ",", "]")
    println(f"""{"metric":"split_vs_retrain","sf":"$sfDir","corpus_vecs":$nVec,"crowd":$crowdN,"hot_cells":$hotBefore,"hot_after":$hotAfter,"split_s":$tSplit%.2f,"retrain_s":$tRetrain%.2f,"splits":$splits}""")
    spark.stop()
  }
}
