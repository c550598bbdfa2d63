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

  /** Brute-force-vs-index recall@3 over an arbitrary corpus/query mix:
    * ground truth is the exact cosine top-3 (neighbor_id tiebreak —
    * q120's rule), the ANN side is the persisted index's 2-probe
    * search.
    */
  private def recallAt3(merged: org.apache.spark.sql.DataFrame,
      idxDir: String, queries: org.apache.spark.sql.DataFrame,
      nprobe: Int = 2): Double = {
    import org.apache.spark.sql.expressions.Window
    val e = merged.select(col("vec_id"),
      expr("l2_normalize(embedding)").as("v"))
    val q = queries.select(col("vec_id").as("qid"),
      expr("l2_normalize(embedding)").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val gt = q.join(e, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"),
        expr("dot_product(qv, v)").as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("qid"), col("neighbor_id"))
    val got = VectorIndex
      .search(spark, idxDir, queries, nprobe = nprobe, topK = 3)
      .select(col("qid"), col("neighbor_id"))
    gt.join(got, Seq("qid", "neighbor_id"), "left_semi").count().toDouble /
      gt.count()
  }

  test("drift maintenance: per-generation recall, hot-flag trigger, retraining compact") {
    // Drifted generations via the ScaleProbe dim-rotation recipe: copy
    // g rotates every vector by g dims (norm preserved, direction
    // decorrelated from the build distribution) and offsets vec_ids by
    // g*nVec. NOTE a "fresh rebuild" is NOT a drift mitigation here:
    // build's quantizer derives only from the fixed training sample
    // (vec_id < IvfSampleCap — all generation-0 ids), so rebuild over
    // the union reproduces the frozen quantizer exactly (the append ≡
    // rebuild contract). The drift-aware path is compact(retrain=true),
    // whose hash-ordered sample covers every generation.
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val nVec = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    def gen(g: Int): org.apache.spark.sql.DataFrame = emb.select(
      (col("vec_id") + lit(g * nVec)).as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        s"j -> embedding[cast((j + $g) % $dim as int)])").as("embedding"))
    val out = TestSpark.tmpDir("ivf-drift")
    VectorIndex.build(emb, out, k = 16)
    var merged = emb
    val history = (1 to 3).map { g =>
      VectorIndex.append(spark, out, gen(g))
      merged = merged.unionByName(gen(g))
      // query batch drawn from the NEWEST generation — the drifted
      // distribution the frozen quantizer never saw (25 queries × 3
      // ground-truth rows per generation: wide enough that one hit is
      // ~1.3% of the aggregate, not 3.3%)
      val queries = gen(g).where(col("vec_id") < g * nVec + 25)
      val frozen = recallAt3(merged, out, queries)
      val rDir = TestSpark.tmpDir(s"ivf-drift-retrain-$g")
      VectorIndex.compact(spark, out, rDir, retrain = true)
      val retrained = recallAt3(merged, rDir, queries)
      // retrained index must still hold every vector exactly once
      val post = spark.read.parquet(s"$rDir/postings")
      assert(post.count() == merged.count() &&
        post.select(col("vec_id")).distinct().count() == merged.count())
      info(f"gen $g: frozen-quantizer recall@3 = $frozen%.3f, " +
        f"retrained = $retrained%.3f")
      (g, frozen, retrained)
    }
    // the hot-flag trigger: the appended index's balance audit is the
    // q221 relation over the postings tree — finite, k rows, and the
    // hot flag is exact-integer; after 3 drifted generations at least
    // one cell must be non-empty and shares must sum to 1
    val bal = VectorIndex.cellBalance(spark, out).collect()
    assert(bal.length == 16)
    assert(bal.map(_.getLong(1)).sum == merged.count())
    // MEASURED finding, pinned (the whole pipeline is deterministic):
    // on this near-uniform synthetic corpus, recall on drifted GENERIC
    // queries sits near 0.3 at nprobe=2 for BOTH quantizers — q120's
    // 0.97 is a property of its seed-adjacent query batch, not of the
    // index — and retraining is recall-NEUTRAL (aggregate delta is
    // ~1 hit in 225; the round-6 trained-vs-anchors A/B found the same
    // no-cluster-structure effect). The maintenance invariant is that
    // the retraining compact never materially degrades serving while
    // re-balancing cells for appended generations; the effective
    // recall lever on a structureless corpus is nprobe, asserted
    // below.
    history.foreach { case (_, frozen, retrained) =>
      assert(frozen >= 0.0 && frozen <= 1.0 &&
        retrained >= 0.0 && retrained <= 1.0)
    }
    val frozenMean = history.map(_._2).sum / history.size
    val retrainedMean = history.map(_._3).sum / history.size
    info(f"aggregate recall@3: frozen = $frozenMean%.3f, " +
      f"retrained = $retrainedMean%.3f")
    assert(math.abs(retrainedMean - frozenMean) <= 0.02,
      s"retraining compact materially changed aggregate recall " +
        s"($retrainedMean vs $frozenMean) — re-measure and re-pin")
    // the nprobe recovery path: widening the probe set on the SAME
    // frozen-quantizer index must monotonically recover recall on the
    // drifted queries (probing all 16 cells is exact ⇒ recall 1.0)
    val lastQ = gen(3).where(col("vec_id") < 3 * nVec + 25)
    val sweep = Seq(2, 4, 8, 16)
      .map(np => np -> recallAt3(merged, out, lastQ, nprobe = np))
    info(sweep.map { case (np, r) => f"nprobe=$np%2d → $r%.3f" }
      .mkString("recall sweep (frozen index, gen-3 queries): ", ", ", ""))
    assert(sweep.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      s"recall not monotone in nprobe: $sweep")
    assert(sweep.last._2 == 1.0,
      s"nprobe=k must be exact, got ${sweep.last._2}")
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

  /** Deterministic synthetic vectors: ids [lo, hi), coordinate j given
    * by `coordExpr` (SQL over coordinate `j` and row `id`) — sin-based
    * pseudo-noise instead of an RNG, so every run (and the pinned
    * recall numbers) reproduce exactly.
    */
  private def synthVecs(lo: Long, hi: Long, dim: Int,
      coordExpr: String): org.apache.spark.sql.DataFrame =
    spark.range(lo, hi).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}),
        j -> ($coordExpr))""").as("embedding"))

  /** The standard noise stream (amplitude 0.05). */
  private val nz = "0.05d * sin(cast(id * 7919 + j * 104729 as double))"

  test("clustered drift: hot-cell flag fires and the retraining compact wins recall") {
    // The r9 drift measurement ran on a near-uniform corpus where
    // retraining is recall-neutral BY CONSTRUCTION (no cluster
    // structure to re-cover). This fixture has real structure: 8
    // orthogonal build clusters (one-hot directions e_0..e_7,
    // anchors = vec_ids 0..7 land one per cluster), then two NEW modes
    // the frozen quantizer never saw:
    //  - mode A (direction e_8 — orthogonal to EVERY build anchor —
    //    with three 0.3-bias SUB-GROUPS on e_9/e_10/e_11 by id % 3):
    //    which cell a member lands in is decided by its dims-0..7
    //    noise, which is an INDEPENDENT sin stream from the dims-8..15
    //    noise that decides who its nearest neighbors are — so the
    //    frozen quantizer scatters each member's true neighbors across
    //    cells the member's own probe ranking knows nothing about: the
    //    canonical frozen-quantizer drift failure, without the
    //    shared-noise shortcut that made the first fixture look
    //    perfect;
    //  - mode B (direction e_12, strong 0.3 bias toward e_4 only):
    //    members pile into ONE frozen cell — the q221 hot-flag
    //    trigger.
    val dim = 16
    // build noise lives in dims 0..7 ONLY, so the anchors are exactly
    // zero in the drift dims — otherwise each anchor's high-dim noise
    // couples with mode A's sub-group bias and herds each sub-group
    // into one cell, silently undoing the decoupling below
    val build = synthVecs(0L, 240L, dim,
      s"if(j = cast(id % 8 as int), 1.0d, 0.0d) + if(j < 8, $nz, 0.0d)")
    // mode A's dims-0..7 noise (0.02) fully decides its FROZEN cell —
    // the anchors differ by nothing else — but is kept small enough
    // that neighbor similarity is dominated by the independent
    // dims-8..15 stream (0.05): assignment and similarity decouple
    val modeA = synthVecs(1000L, 1300L, dim, s"""
      if(j = 8, 1.0d, 0.0d)
      + if(j = 9 + cast(id % 3 as int), 0.3d, 0.0d)
      + case when j < 8
             then 0.02d * sin(cast(id * 7919 + j * 104729 as double))
             else 0.05d * sin(cast(id * 104729 + j * 7919 as double))
        end""")
    val modeB = synthVecs(2000L, 2200L, dim,
      s"case when j = 12 then 1.0d when j = 4 then 0.3d else 0.0d end" +
        s" + $nz")
    val out = TestSpark.tmpDir("ivf-clustered-drift")
    VectorIndex.build(build, out, k = 8)
    VectorIndex.append(spark, out, modeA)
    VectorIndex.append(spark, out, modeB)
    val merged = build.unionByName(modeA).unionByName(modeB)

    // maintenance TRIGGER: mode B crowds one frozen cell hot
    // (n·k > 2·total — exact integers)
    val bal = VectorIndex.cellBalance(spark, out).collect()
    assert(bal.map(_.getLong(1)).sum == 740L)
    val hot = bal.filter(_.getInt(3) == 1)
    info("cell balance (frozen, post-drift): " +
      bal.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" "))

    val qA = modeA.where(col("vec_id") < 1020L)
    val qB = modeB.where(col("vec_id") < 2020L)
    val qBuild = build.where(col("vec_id") < 20L)
    val frozenA = recallAt3(merged, out, qA, nprobe = 1)
    val frozenB = recallAt3(merged, out, qB, nprobe = 1)
    val frozenBuild = recallAt3(merged, out, qBuild, nprobe = 1)
    val rDir = TestSpark.tmpDir("ivf-clustered-drift-retrain")
    VectorIndex.compact(spark, out, rDir, retrain = true)
    val retrainedA = recallAt3(merged, rDir, qA, nprobe = 1)
    val retrainedB = recallAt3(merged, rDir, qB, nprobe = 1)
    val retrainedBuild = recallAt3(merged, rDir, qBuild, nprobe = 1)
    // MEASURED, pinned (fully deterministic): mode A 0.600 → 0.817,
    // mode B 1.000 → 0.950, build 1.000 → 1.000 — the structured-drift
    // recall win the r9 near-uniform fixture could not show
    info(f"mode A  recall@3 nprobe=1: frozen $frozenA%.3f → retrained $retrainedA%.3f")
    info(f"mode B  recall@3 nprobe=1: frozen $frozenB%.3f → retrained $retrainedB%.3f")
    info(f"build   recall@3 nprobe=1: frozen $frozenBuild%.3f → retrained $retrainedBuild%.3f")
    // maintenance TRIGGER: mode B crowds one frozen cell hot
    // (n·k > 2·total — exact integers)
    assert(hot.nonEmpty, "drifted appends did not trip the hot-cell flag")
    // the WIN the maintenance path exists for: structured drift the
    // frozen quantizer splits, the retrained one re-covers
    assert(retrainedA >= frozenA + 0.2,
      f"retraining did not recover mode-A recall ($frozenA%.3f → $retrainedA%.3f)")
    assert(retrainedB >= frozenB - 0.05,
      f"retraining regressed mode-B recall ($frozenB%.3f → $retrainedB%.3f)")
    // retrained index still holds every vector exactly once
    val post = spark.read.parquet(s"$rDir/postings")
    assert(post.count() == 740L &&
      post.select(col("vec_id")).distinct().count() == 740L)
  }

  /** Recursive (path → (mtime, length)) snapshot for file-level
    * untouched-ness assertions.
    */
  private def snapshot(root: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(root))
      .map(f => f.getPath -> (f.lastModified, f.length)).toMap
  }

  test("hot-cell split: targeted, exact, and every cold file untouched") {
    // same structured fixture as the clustered-drift test: mode B
    // crowds ONE frozen cell hot, and both drifted modes arrive as
    // APPENDS — so the split must fold delta generations too
    val dim = 16
    val build = synthVecs(0L, 240L, dim,
      s"if(j = cast(id % 8 as int), 1.0d, 0.0d) + if(j < 8, $nz, 0.0d)")
    val modeA = synthVecs(1000L, 1300L, dim, s"""
      if(j = 8, 1.0d, 0.0d)
      + if(j = 9 + cast(id % 3 as int), 0.3d, 0.0d)
      + case when j < 8
             then 0.02d * sin(cast(id * 7919 + j * 104729 as double))
             else 0.05d * sin(cast(id * 104729 + j * 7919 as double))
        end""")
    val modeB = synthVecs(2000L, 2200L, dim,
      s"case when j = 12 then 1.0d when j = 4 then 0.3d else 0.0d end" +
        s" + $nz")
    val out = TestSpark.tmpDir("ivf-split")
    VectorIndex.build(build, out, k = 8)
    VectorIndex.append(spark, out, modeA)
    VectorIndex.append(spark, out, modeB)
    val merged = build.unionByName(modeA).unionByName(modeB)

    val balBefore = VectorIndex.cellBalance(spark, out).collect()
    val hotCells = balBefore.filter(_.getInt(3) == 1)
      .map(_.getLong(0)).toSet
    assert(hotCells.nonEmpty, "fixture must trip the hot flag")
    val sizeBefore = balBefore
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val membersBefore = VectorIndex.readPostings(spark, out)
      .where(col("cell").cast("long").isin(hotCells.toSeq: _*))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val preCold = snapshot(s"$out/postings").view.filterKeys(p =>
      !hotCells.exists(c => p.contains(s"cell=$c/"))).toMap
    val preDelta = snapshot(s"$out/postings_delta")

    val report = VectorIndex.splitHotCells(spark, out)
    assert(report.map(_.cell).toSet == hotCells,
      s"split must target exactly the hot cells, got $report")
    report.foreach { r =>
      assert(r.nKept > 0 && r.nMoved > 0 &&
        r.nKept + r.nMoved == sizeBefore(r.cell),
        s"split halves must partition the cell: $r")
    }

    // quantizer grew by exactly the split count; new ids fresh
    val cents = spark.read.parquet(s"$out/centroids").collect()
    assert(cents.length == 8 + report.size)
    assert(report.map(_.newCell).forall(n =>
      !balBefore.map(_.getLong(0)).contains(n)))

    // corpus preserved exactly: every vector once, hot-cell members
    // now split across (old ∪ new) and nowhere else
    val post = VectorIndex.readPostings(spark, out)
    assert(post.count() == 740L &&
      post.select(col("vec_id")).distinct().count() == 740L)
    val afterIds = post.where(col("cell").cast("long").isin(
        (hotCells ++ report.map(_.newCell)).toSeq: _*))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(afterIds == membersBefore,
      "split must move members only between the old and new cell")

    // FILE-LEVEL invariant: every cold cell's files untouched (same
    // paths, mtimes, lengths); the delta tree lost EXACTLY the hot
    // cells' subdirs
    val postCold = snapshot(s"$out/postings").view.filterKeys(p =>
      !hotCells.exists(c => p.contains(s"cell=$c/")) &&
        !report.exists(r => p.contains(s"cell=${r.newCell}/"))).toMap
    assert(postCold == preCold,
      "a cold cell's files changed — the split is not targeted")
    // payload files: exactly the hot cells' removed, others untouched
    // (commit markers of an emptied generation go with it — the
    // schema-inference guard)
    val payload = (m: Map[String, (Long, Long)]) =>
      m.view.filterKeys(_.contains("cell=")).toMap
    val postDelta = snapshot(s"$out/postings_delta")
    val expectedDelta = payload(preDelta).view.filterKeys(p =>
      !hotCells.exists(c => p.contains(s"cell=$c/"))).toMap
    assert(payload(postDelta) == expectedDelta,
      "delta tree must lose exactly the folded hot-cell subdirs")
    // no payload-free generation dirs survive (they would break the
    // delta union's schema inference)
    Option(new java.io.File(s"$out/postings_delta").listFiles())
      .toSeq.flatten.filter(_.getName.startsWith("gen="))
      .foreach { g =>
        assert(g.listFiles().exists(_.getName.startsWith("cell=")),
          s"emptied generation ${g.getName} left behind")
      }

    // full probe over the grown quantizer stays EXACT (recall 1.0) —
    // nothing was lost or duplicated on the serving path
    val qB = modeB.where(col("vec_id") < 2020L)
    assert(recallAt3(merged, out, qB,
      nprobe = 8 + report.size) == 1.0)
    // and the split cell's probe cost halved: the hot cell's share
    // after < before (the O(probed-cell-size) serving win)
    val balAfter = VectorIndex.cellBalance(spark, out).collect()
    assert(balAfter.map(_.getLong(1)).sum == 740L)
    hotCells.foreach { c =>
      val after = balAfter.find(_.getLong(0) == c).get.getLong(1)
      assert(after < sizeBefore(c),
        s"cell $c did not shrink ($after vs ${sizeBefore(c)})")
    }

    // append keeps working against the updated quantizer: new vectors
    // may land in the NEW cell and full probe still finds them
    val late = synthVecs(3000L, 3040L, dim,
      s"case when j = 12 then 1.0d when j = 4 then 0.3d else 0.0d end" +
        s" + $nz")
    VectorIndex.append(spark, out, late)
    val mergedLate = merged.unionByName(late)
    assert(VectorIndex.readPostings(spark, out).count() == 780L)
    assert(recallAt3(mergedLate, out,
      late.where(col("vec_id") < 3010L),
      nprobe = 8 + report.size) == 1.0)

    // a second run over the (no-longer-hot) index is a zero-write
    // no-op — the maintenance loop converges
    val bal2 = VectorIndex.cellBalance(spark, out).collect()
    if (bal2.forall(_.getInt(3) == 0))
      assert(VectorIndex.splitHotCells(spark, out).isEmpty)
  }

  test("hot-cell split heals a fold-then-crash duplicate remnant") {
    // the documented crash window: a previous split died AFTER folding
    // a delta generation's rows into the main cell partition but
    // BEFORE deleting the delta subtree — the same (vec_id, v) rows
    // now exist twice. splitAssignment's duplicate guard must fold
    // them back to one on the next run, so the maintenance loop heals
    // the remnant instead of propagating it.
    val dim = 16
    val build = synthVecs(0L, 240L, dim,
      s"if(j = cast(id % 8 as int), 1.0d, 0.0d) + if(j < 8, $nz, 0.0d)")
    val modeB = synthVecs(2000L, 2200L, dim,
      s"case when j = 12 then 1.0d when j = 4 then 0.3d else 0.0d end" +
        s" + $nz")
    val out = TestSpark.tmpDir("ivf-split-crash")
    VectorIndex.build(build, out, k = 8)
    VectorIndex.append(spark, out, modeB) // lands as a delta generation
    val hot = VectorIndex.cellBalance(spark, out)
      .where(col("hot") === 1).collect().map(_.getLong(0))
    assert(hot.length == 1)
    // simulate the crash remnant: copy the hot cell's delta rows into
    // the MAIN partition (the fold happened) while LEAVING the delta
    // subtree in place (the delete did not)
    val deltaRows = spark.read
      .parquet(s"$out/postings_delta")
      .where(col("cell").cast("long") === hot.head)
      .select(col("vec_id"), col("v"))
    deltaRows.write.mode("append")
      .parquet(s"$out/postings/cell=${hot.head}")
    val dupTotal = VectorIndex.readPostings(spark, out).count()
    assert(dupTotal > 440L, "remnant must introduce duplicates")

    val report = VectorIndex.splitHotCells(spark, out)
    assert(report.nonEmpty)
    val post = VectorIndex.readPostings(spark, out)
    assert(post.count() == 440L &&
      post.select(col("vec_id")).distinct().count() == 440L,
      "split must heal the duplicate remnant back to one row per id")
  }

  test("hot-cell split keeps the PQ tree cell-aligned and ADC-exact") {
    // 64-dim corpus (PQ's subspace layout) + a crowd appended around
    // one vector to force a hot cell on BOTH posting trees
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val out = TestSpark.tmpDir("ivf-split-pq")
    VectorIndex.build(emb, out, k = 16)
    VectorIndex.buildPq(emb, out, k = 16)
    // 300 near-copies of vec 5 (tiny deterministic jitter): all land
    // in vec-5's cell
    val crowd = emb.where(col("vec_id") === 5)
      .crossJoin(spark.range(10000L, 10300L))
      .select(col("id").as("vec_id"),
        expr("""transform(embedding,
          (x, j) -> x + 1.0e-4d * sin(cast(id * 31 + j as double)))""")
          .as("embedding"))
    VectorIndex.append(spark, out, crowd)
    VectorIndex.appendPq(spark, out, crowd)
    val hot = VectorIndex.cellBalance(spark, out)
      .where(col("hot") === 1).collect()
    assert(hot.nonEmpty, "crowd must trip the hot flag")

    // pre-split full-probe ADC ranking — the split must not change it
    val queries = emb.where(col("vec_id") < 6)
    val adcBefore = VectorIndex
      .searchAdc(spark, out, queries, nprobe = 16, topK = 5)
      .orderBy("qid", "rk").collect().toSeq

    val report = VectorIndex.splitHotCells(spark, out)
    assert(report.nonEmpty)

    // raw and PQ trees agree on every vector's cell after the split
    val raw = VectorIndex.readPostings(spark, out)
      .select(col("vec_id"), col("cell").cast("long").as("rc"))
    val pq = spark.read.parquet(s"$out/pq_postings")
      .select(col("vec_id"), col("cell").cast("long").as("pc"))
    assert(pq.count() == 800L)
    assert(raw.join(pq, "vec_id").where(col("rc") =!= col("pc"))
      .count() == 0L, "PQ cell assignment drifted from the raw tree")

    // codes and LUT untouched ⇒ full-probe ADC answers identical
    val adcAfter = VectorIndex
      .searchAdc(spark, out, queries, nprobe = 16 + report.size,
        topK = 5)
      .orderBy("qid", "rk").collect().toSeq
    assert(adcAfter == adcBefore,
      "full-probe ADC ranking changed across the split")
  }
}
