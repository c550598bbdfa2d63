package graft

import org.apache.spark.sql.functions._

/** Hot-cell remediation cost probe — the measured form of
  * [[sinks.VectorIndex.splitHotCells]]'s O(hot cell) claim against the
  * O(corpus) alternative it replaces for targeted maintenance
  * (`compact(retrain = true)`).
  *
  * Fixture: the corpus index (k = 16, the q48 quantizer) plus an
  * appended drifted mode (jittered copies of one seed direction, ids
  * past the corpus max) that piles into a single cell and trips q221's
  * hot flag. A hot cell is corpus-RELATIVE by definition (share >
  * 2/k), so the crowd defaults to corpus/4 and the honest separation
  * between the two paths is WRITE AMPLIFICATION, not asymptotics:
  * split rewrites the hot cells' partitions (~share of the corpus),
  * retrain reassigns and rewrites EVERY cell — the bench reports
  * bytes rewritten per variant alongside wall time. Run on a base dir
  * and `graft.ScaleProbe` blow-ups; at small SFs fixed job overheads
  * dominate wall, and the bytes columns carry the claim.
  *
  * Both variants run against their own freshly-built identical index
  * (split mutates in place; retrain writes a dst tree), and both
  * post-states are sanity-checked (total membership preserved).
  *
  * Prints ONE JSON line:
  * {"metric":"split_vs_retrain","sf":…,"corpus_vecs":N,"crowd":C,
  *  "hot_cells":H,"split_s":…,"retrain_s":…,"split_mb":…,
  *  "retrain_mb":…,"index_mb":…,"splits":[[old,new,kept,moved]…]}
  */
object SplitBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.localSized("graft-splitbench", cpus, sfDir)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup

    val emb = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val nVec = emb.count()
    // hotness is share > 2/k, so the crowd scales with the corpus
    // (override via SPARK_GRAFT_SPLIT_CROWD)
    val crowdN = sys.env.get("SPARK_GRAFT_SPLIT_CROWD").map(_.toInt)
      .getOrElse((nVec / 4).toInt)
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
    // deterministic drifted mode around vec 5's direction: enough
    // jitter that the crowd has internal structure for the split's
    // local sub-quantizer to separate, little enough that every
    // member assigns to vec 5's cell
    val crowd = emb.where(col("vec_id") === 5)
      .crossJoin(spark.range(crowdN))
      .select((col("id") + maxId + 1L).as("vec_id"),
        expr("""transform(embedding,
          (x, j) -> x + 0.4d * sin(cast(id * 31 + j as double)))""")
          .as("embedding"))
      .localCheckpoint() // pay the synthesis once, outside the timers

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def mb(paths: String*): Double = paths.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }.sum / 1e6
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-splitbench").toString

    // ---- variant A: targeted split (in place) -----------------------
    val a = s"$tmp/ivf-a"
    sinks.VectorIndex.build(emb, a, k = 16)
    sinks.VectorIndex.append(spark, a, crowd)
    val hotBefore = sinks.VectorIndex.cellBalance(spark, a)
      .where(col("hot") === 1).count()
    require(hotBefore > 0, "crowd did not trip the hot flag")
    // probe latency on crowd-region queries BEFORE the split — the
    // ServeBench finding (per-query latency tracks probed-cell size)
    // is what a split exists to fix, so the bench closes that loop:
    // same 20 queries, same nprobe, before and after
    val probeQ = crowd.where(col("vec_id") <= maxId + 20L)
      .localCheckpoint()
    def probeSec(): Double = {
      sinks.VectorIndex.search(spark, a, probeQ, nprobe = 2, topK = 10)
        .collect() // warm (codegen + file listing)
      val laps = (1 to 3).map(_ => sec(
        sinks.VectorIndex.search(spark, a, probeQ, nprobe = 2,
          topK = 10).collect()))
      laps.sum / laps.length
    }
    val probeBefore = probeSec()
    // the realistic maintenance LOOP: split until nothing is hot (a
    // mode denser than the 2/k share needs log rounds) or a round cap
    var report = Seq.empty[sinks.VectorIndex.CellSplit]
    var rounds = 0
    val tSplit = sec {
      var go = true
      while (go && rounds < 4) {
        val r = sinks.VectorIndex.splitHotCells(spark, a)
        report = report ++ r
        rounds += 1
        go = r.nonEmpty
      }
    }
    val postA = sinks.VectorIndex.readPostings(spark, a)
    require(postA.count() == nVec + crowdN, "split lost rows")
    val hotAfter = sinks.VectorIndex.cellBalance(spark, a)
      .where(col("hot") === 1).count()
    val probeAfter = probeSec()
    // bytes the split rewrote: the touched cell partitions + centroids
    val splitMb = mb(report.flatMap(r => Seq(
      s"$a/postings/cell=${r.cell}", s"$a/postings/cell=${r.newCell}"))
      :+ s"$a/centroids": _*)

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
    val retrainMb = mb(s"$tmp/ivf-b-out")
    val indexMb = mb(b)

    val splits = report.map(r =>
      s"[${r.cell},${r.newCell},${r.nKept},${r.nMoved}]")
      .mkString("[", ",", "]")
    println(f"""{"metric":"split_vs_retrain","sf":"$sfDir","corpus_vecs":$nVec,"crowd":$crowdN,"hot_cells":$hotBefore,"hot_after":$hotAfter,"rounds":$rounds,"probe_before_s":$probeBefore%.2f,"probe_after_s":$probeAfter%.2f,"split_s":$tSplit%.2f,"retrain_s":$tRetrain%.2f,"split_mb":$splitMb%.1f,"retrain_mb":$retrainMb%.1f,"index_mb":$indexMb%.1f,"splits":$splits}""")
    spark.stop()
  }
}
