package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-6 trained/sketched operators that the DuckDB
  * oracle cannot express as hash equality: optimization progress (q201),
  * one-sided sketch error (q202), analytic bounds (q203), and unit
  * normalization (q204). These hold at ANY scale factor — they are
  * properties of the algorithms, not of the fixture data.
  */
class TrainedOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q201: GD loss starts at ln 2 and strictly decreases") {
    val rows = graft.SparkEntry.queries("q201_logreg_quality")(spark, dir)
      .orderBy("iter").collect()
    assert(rows.length == 3)
    // weights start at 0 => p = 0.5 everywhere => loss exactly ln 2
    assert(rows(0).getDouble(1) == math.rint(math.log(2) * 1e6) / 1e6)
    val losses = rows.map(_.getDouble(1))
    assert(losses.sliding(2).forall { case Array(a, b) => b < a },
      s"loss not strictly decreasing: ${losses.mkString(", ")}")
    // the learned separator must point somewhere: not all weights zero
    val last = rows(2)
    assert((2 to 5).map(last.getDouble).exists(_ != 0.0))
  }

  test("q202: CMS estimates never underestimate; exact column is exact") {
    val rows = graft.SparkEntry.queries("q202_cms_heavy_hitters")(spark, dir)
      .collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val (exact, est, over) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(est >= exact, s"${r.getString(1)}: CMS underestimated")
      assert(over == est - exact)
    }
    // cross-check the exact counts against an independent word count
    import org.apache.spark.sql.functions._
    val wc = graft.Tables(spark, dir).documents
      .select(explode(expr(TextQueries.wordsExpr)).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(wc(r.getString(1)) == r.getLong(2), s"${r.getString(1)}"))
  }

  test("q203: sample ACF is bounded by [-1, 1] (Cauchy-Schwarz)") {
    val rows = graft.SparkEntry.queries("q203_daily_acf")(spark, dir)
      .collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val acf = r.getDouble(2)
      assert(acf >= -1.0 && acf <= 1.0, s"lag ${r.getInt(0)}: $acf")
    }
  }

  test("q204: principal loadings are unit-norm, eigenvalue positive") {
    val rows = graft.SparkEntry.queries("q204_pca_power")(spark, dir)
      .collect()
    assert(rows.length == 64)
    val norm = math.sqrt(rows.map(r => {
      val v = r.getDouble(1); v * v
    }).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"‖v‖ = $norm")
    // a covariance matrix is PSD: its Rayleigh quotient can't be < 0
    assert(rows.head.getDouble(2) > 0.0)
  }

  test("q205: communities partition the vertex set") {
    import org.apache.spark.sql.functions._
    val top = graft.SparkEntry.queries("q205_label_prop")(spark, dir)
      .collect()
    assert(top.nonEmpty && top.length <= 20)
    // sizes are positive and ranked consistently
    val sizes = top.map(_.getLong(2))
    assert(sizes.forall(_ > 0))
    assert(sizes.sliding(2).forall { case Array(a, b) => a >= b })
    // total labeled vertices across ALL communities == graph vertices
    // (each vertex gets exactly one label per round)
    val li = graft.Tables(spark, dir).lineitem
      .where(col("l_quantity") >= 40)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nVerts = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("v"))
      .unionByName(li.as("a")
        .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .select(col("b.l_partkey").as("v")))
      .distinct().count()
    assert(sizes.sum <= nVerts)
  }

  test("BPE: a degenerate superstep (no pairs left) is the identity") {
    // Every word fully merged to one symbol ⇒ zero adjacent pairs.
    // The superstep must emit ONE all-null merge row and leave the
    // vocab byte-identical — the exact semantics bpeChainDuck's
    // empty-p_i UNION-ALL branch mirrors, so both engines stay in
    // lockstep on tiny vocabs / oversized bpeIters (the r10 advice
    // divergence).
    import spark.implicits._
    val merged = Seq(("ab", 3L, "ab_"), ("cd", 1L, "cd_"))
      .toDF("word", "wf", "rep")
    val (best, v1) = PipelineQueries.bpeStep(merged, 7)
    val b = best.collect()
    assert(b.length == 1)
    assert(b(0).getInt(0) == 7)
    assert((1 to 5).forall(b(0).isNullAt), s"expected all-null merge: ${b(0)}")
    assert(v1.orderBy("word").collect().toSeq ==
      merged.orderBy("word").collect().toSeq)
    // and a NON-degenerate step on the same shape still merges: the
    // most frequent adjacent pair wins with the lexicographic tiebreak
    val live = Seq(("ab", 3L, "a b _"), ("ac", 3L, "a c _"))
      .toDF("word", "wf", "rep")
    val (best2, v2) = PipelineQueries.bpeStep(live, 1)
    val r2 = best2.collect()(0)
    assert(r2.getString(1) == "a b" && r2.getLong(5) == 3L)
    assert(v2.orderBy("word").collect().map(_.getString(2)).toSeq ==
      Seq("ab _", "a c _"))
  }

  test("q271: spine partitions the corpus; flags match the definition") {
    val rows = graft.SparkEntry.queries("q271_label_noise")(spark, dir)
      .collect()
    // the 6-cell spine is always complete (given × {-1, 0, 1})
    assert(rows.length == 6)
    val nDocs = spark.read
      .parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == nDocs,
      "confident-joint cells + unassigned must partition the corpus")
    rows.foreach { r =>
      val (given, conf, n, flag) =
        (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(4))
      assert(flag == (if (conf >= 0 && conf != given) 1 else 0))
      // an empty cell has no mean self-confidence; a non-empty one
      // carries a probability
      if (n == 0L) assert(r.isNullAt(3))
      else {
        val mp = r.getDouble(3)
        assert(mp >= 0.0 && mp <= 1.0, s"p out of range: $mp")
      }
    }
  }

  test("q271 degenerate one-class corpus: absent class's threshold is " +
      "NULL and nothing is ever confidently assigned to it") {
    // class 1 is y = (n_chars >= 300); keep only short docs so it is
    // absent. The nullif-guarded t1 is NULL, every p1 >= t1 compare
    // is NULL, and each doc lands in class 0 or -1 — never class 1.
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-oneclass-").toString
    graft.Tables(spark, dir).documents
      .filter(col("n_chars") < 300)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = graft.SparkEntry.queries("q271_label_noise")(spark, tmp)
      .collect()
    assert(rows.length == 6) // spine survives the degenerate corpus
    val nShort = spark.read.parquet(s"$tmp/documents.parquet").count()
    assert(nShort > 0, "fixture needs at least one short doc")
    rows.foreach { r =>
      val (given, conf, n) = (r.getInt(0), r.getInt(1), r.getLong(2))
      assert(given != 1 || n == 0L, "no docs carry the absent label")
      assert(conf != 1 || n == 0L,
        "nothing may be confidently assigned to the absent class")
    }
    assert(rows.map(_.getLong(2)).sum == nShort,
      "present class + unassigned still partition the corpus")
  }

  test("q272: classes partition the corpus; forget counts are coherent") {
    val rows = graft.SparkEntry.queries("q272_forgetting")(spark, dir)
      .collect()
    val byCls = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val nDocs = spark.read
      .parquet(s"$dir/documents.parquet").count()
    assert(byCls.values.map(_._1).sum == nDocs)
    // shares sum to ~1 (each rounded at 6)
    val shareSum = byCls.values.map(_._3).sum
    assert(math.abs(shareSum - 1.0) < 1e-5 * byCls.size)
    // never_learned and unforgettable have ZERO forgetting events by
    // definition; forgettable has at least one per doc
    byCls.get("never_learned").foreach { case (_, nf, _) =>
      assert(nf == 0L) }
    byCls.get("unforgettable").foreach { case (_, nf, _) =>
      assert(nf == 0L) }
    byCls.get("forgettable").foreach { case (n, nf, _) =>
      assert(nf >= n, "each forgettable example has >= 1 event") }
  }

  test("q273: ranks are contiguous per cell; scores ranked and positive") {
    val rows = graft.SparkEntry.queries("q273_cell_topics")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (cell, rs) =>
      val sorted = rs.sortBy(_._2)
      // ranks 1..k contiguous, k <= 5
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq,
        s"cell $cell ranks not contiguous")
      assert(sorted.length <= 5)
      // terms distinct within the cell; scores non-increasing in rank
      assert(sorted.map(_._3).distinct.length == sorted.length)
      assert(sorted.map(_._5).sliding(2).forall {
        case Array(a, b) => a >= b
        case _           => true
      }, s"cell $cell scores not ranked")
      // c-TF-IDF of a present term is strictly positive: tf >= 1 and
      // ln(1 + A/f_w) > 0
      sorted.foreach { case (_, _, _, tf, s) =>
        assert(tf >= 1L && s > 0.0)
      }
    }
  }

  test("q274: exposure is the exact log2 identity and stays in range") {
    val rows = graft.SparkEntry.queries("q274_canary_exposure")(spark, dir)
      .collect()
    assert(rows.nonEmpty, "no canaries selected at sf0.001")
    rows.foreach { r =>
      val (n, rank, exp) =
        (r.getInt(1), r.getInt(2), r.getDouble(4))
      assert(rank >= 1 && rank <= n, s"rank $rank out of [1, $n]")
      // exposure = log2(n) - log2(rank), rounded at 6 — recompute
      val want = math.rint((math.log(n.toDouble) -
        math.log(rank.toDouble)) / math.log(2.0) * 1e6) / 1e6
      assert(math.abs(exp - want) < 1e-9, s"exposure $exp != $want")
      // bounded: 0 (rank = n) .. log2(n) (rank = 1)
      assert(exp >= 0.0 && exp <= math.log(n.toDouble) / math.log(2.0) + 1e-9)
    }
    // the reference set is the planted candidate plus at most 63
    // variants, capped by the vocabulary
    rows.foreach(r => assert(r.getInt(1) >= 2 && r.getInt(1) <= 64))
  }

  test("q275: bins partition predictions; ECE matches its own bins") {
    val rows = graft.SparkEntry.queries("q275_calibration")(spark, dir)
      .orderBy("bin").collect()
    assert(rows.length == 10)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    // confidence = max(p, 1-p) >= 0.5: bins 1..5 are structurally empty
    rows.filter(_.getInt(0) <= 5).foreach(r => assert(r.getLong(1) == 0L))
    val n = rows.map(_.getLong(1)).sum.toDouble
    // recompute ECE from the reported bins (same quantization)
    val want = rows.filter(_.getLong(1) > 0).map { r =>
      math.rint(r.getLong(1) / n * r.getDouble(4) * 1e12) / 1e12
    }.sum
    val ece = rows.head.getDouble(5)
    assert(math.abs(ece - math.rint(want * 1e6) / 1e6) < 1e-9,
      s"ECE $ece != recomputed $want")
    // Brier of a clamped probability is in (0, 1); gap within [0, 1]
    val brier = rows.head.getDouble(6)
    assert(brier > 0.0 && brier < 1.0)
    rows.filter(_.getLong(1) > 0).foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(2) >= 0.5 - 1e-9 && r.getDouble(2) < 1.0)
    }
  }

  test("q276: JS is a bounded symmetric distance over all source pairs") {
    val rows = graft.SparkEntry.queries("q276_semantic_drift")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // exactly one row per unordered pair of EMBEDDED sources
    val srcs = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
    val k = srcs.length
    assert(rows.length == k * (k - 1) / 2,
      s"expected C($k,2) pairs, got ${rows.length}")
    rows.foreach { case (a, b, na, nb, js) =>
      assert(a < b, "pairs must be canonically ordered")
      // JS divergence (nats) is bounded by ln 2; smoothing keeps it
      // finite and >= 0 (0 only for identical histograms)
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9,
        s"JS($a,$b) = $js out of [0, ln 2]")
      assert(na > 0 && nb > 0)
    }
    // per-source doc totals are consistent wherever a source appears
    val tots = collection.mutable.Map[String, Long]()
    rows.foreach { case (a, b, na, nb, _) =>
      assert(tots.getOrElseUpdate(a, na) == na)
      assert(tots.getOrElseUpdate(b, nb) == nb)
    }
  }
}
