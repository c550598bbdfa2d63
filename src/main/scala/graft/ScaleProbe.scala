package graft

import org.apache.spark.sql.functions._

/** Synthesize an N× blow-up of the sf0.1 documents/embeddings tables —
  * the scale-probe input the round-7 verdict asked for ("turn the 100×
  * arguments into data"): the heavy dedup/similarity family is then
  * benched on the blown-up dir with the UNCHANGED `graft.Bench`
  * harness, and the 1× → 10× wall-time ratio is the measured scaling
  * exponent.
  *
  * Synthesis keeps the per-document/vector STRUCTURE (lengths, token
  * counts, vector norms, seed rows) while decorrelating the copies, so
  * the workload grows ~linearly in rows instead of quadratically in
  * artificial cross-copy duplicates:
  *  - documents copy k > 0 salts EVERY word with `_k` — token/shingle
  *    vocabularies of different copies are disjoint, so no copy pair
  *    shares a fingerprint, a MinHash band (beyond hash luck), an
  *    8-gram span, or a prefix token: dedup outputs stay ~k× the 1×
  *    outputs, which is what "the corpus grew 10×" means for a real
  *    crawl (boilerplate aside).
  *  - embeddings copy k > 0 rotates the vector by k dims — norm and
  *    coordinate distribution preserved, direction decorrelated.
  *  - events copy k > 0 offsets user_id/event_id — "the product grew
  *    10× more users over the same calendar window": per-user event
  *    streams (sessions, funnels, lag joins) are structurally identical
  *    across copies but user-disjoint, so per-user costs stay flat and
  *    per-day densities grow linearly — exactly how a real 10× fleet
  *    scales.
  *  - lineitem/orders copy k > 0 offsets the order/part/supp/cust keys
  *    — the part co-occurrence graph becomes k VERTEX-DISJOINT copies
  *    (triangle/k-core/label-prop work grows in components, not in hub
  *    degree), and l_extendedprice shifts by k cents so global exact
  *    percentiles face k× DISTINCT values, not k× multiplicity of the
  *    same ones (duplicate pile-up would make the refinement search
  *    artificially easy).
  *  - copy 0 is the ORIGINAL rows, ids unchanged, so every seed-id
  *    convention (IVF anchors `vec_id < 16`, PQ codebook seeds) still
  *    holds on the blown-up corpus.
  *  - all other tables copy through unchanged (they keep Tables()
  *    resolvable for queries outside the probed families).
  *
  * Usage: `runMain graft.ScaleProbe [mult] [srcDir] [dstDir]`, then
  * `SPARK_GRAFT_SF_DIR=<dstDir> runMain graft.Bench q111_… q190_… …`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(2).getOrElse(s"/tmp/graft_scaleprobe_x$mult")
    val spark = Sessions.local("graft-scaleprobe", "32")
    val (nd, nv) = generate(spark, mult, src, dst)
    println(s"""{"scaleprobe":"$dst","mult":$mult,"docs":$nd,"vecs":$nv}""")
    spark.stop()
  }

  /** max(id) + 1, null-safe: an EMPTY source table yields 0 (one more
    * than no ids) instead of an opaque NPE off max's null.
    */
  private def idSpan(df: org.apache.spark.sql.DataFrame,
      c: String): Long =
    df.agg(coalesce(max(col(c)), lit(-1L))).head.getLong(0) + 1

  /** The synthesis itself (main minus session lifecycle — spec-callable
    * on a shared session). Returns (blown-up doc count, vec count).
    */
  def generate(spark: org.apache.spark.sql.SparkSession, mult: Int,
      src: String, dst: String): (Long, Long) = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = idSpan(docs, "doc_id")
    val copies = spark.range(mult).select(col("id").as("k"))
    // The salt must SURVIVE the engine's `[a-z]+` tokenizer
    // (TextQueries.wordsExpr) — an earlier `_k` suffix was stripped by
    // tokenization, silently collapsing every copy back onto the same
    // token stream (10 exact-duplicate cliques instead of 10 disjoint
    // vocabularies — the round-10 q245 probe caught it as a 45×
    // candidate-pair blow-up). Letters only: word → word + "q" + two
    // base-26 letters of k, so copy vocabularies are pairwise disjoint
    // AND disjoint from the unsalted copy-0 vocabulary for k < 676.
    val salt = concat(lit("q"),
      expr("substring('abcdefghijklmnopqrstuvwxyz'," +
        " cast(k % 26 as int) + 1, 1)"),
      expr("substring('abcdefghijklmnopqrstuvwxyz'," +
        " cast(k div 26 as int) + 1, 1)"))
    val docCols = Seq(
      (col("doc_id") + col("k") * nDocs).as("doc_id"),
      when(col("k") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          w => concat(w, salt)), " ")).as("text")) ++
      docs.columns.filterNot(Set("doc_id", "text")).map(col)
    docs.crossJoin(copies)
      .select(docCols: _*)
      .repartition(64)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nVec = idSpan(emb, "vec_id")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val embCols = Seq(
      (col("vec_id") + col("k") * nVec).as("vec_id"),
      expr(s"transform(sequence(0, $dim - 1), " +
        s"j -> embedding[cast((j + k) % $dim as int)])")
        .as("embedding")) ++
      emb.columns.filterNot(Set("vec_id", "embedding")).map(col)
    emb.crossJoin(copies)
      .select(embCols: _*)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // events: user-disjoint copies over the same calendar window. ts is
    // carried in its on-disk encoding untouched (nanos-long / NTZ /
    // timestamp all round-trip through Tables.events identically), so
    // copy 0 stays byte-verbatim.
    val ev = spark.read.parquet(s"$src/events.parquet")
    val nEvt = idSpan(ev, "event_id")
    val nUsr = idSpan(ev, "user_id")
    // keep the on-disk column ORDER verbatim (copy 0 is byte-identical)
    val evOver = Map(
      "event_id" -> (col("event_id") + col("k") * nEvt).as("event_id"),
      "user_id" -> (col("user_id") + col("k") * nUsr).as("user_id"))
    val evCols = ev.columns.toSeq.map(c => evOver.getOrElse(c, col(c)))
    ev.crossJoin(copies)
      .select(evCols: _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    // lineitem + orders: key-disjoint copies — the co-occurrence graph
    // gains components, percentile targets gain distinct values (+k
    // cents), and the order→lineitem FK stays consistent per copy.
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val nOrd = idSpan(ord, "o_orderkey")
    val nPart = idSpan(li, "l_partkey")
    val nSupp = idSpan(li, "l_suppkey")
    val nCust = idSpan(ord, "o_custkey")
    val liOver = Map(
      "l_orderkey" -> (col("l_orderkey") + col("k") * nOrd).as("l_orderkey"),
      "l_partkey" -> (col("l_partkey") + col("k") * nPart).as("l_partkey"),
      "l_suppkey" -> (col("l_suppkey") + col("k") * nSupp).as("l_suppkey"),
      "l_extendedprice" -> (col("l_extendedprice") + col("k") * 0.01)
        .as("l_extendedprice"))
    val liCols = li.columns.toSeq.map(c => liOver.getOrElse(c, col(c)))
    li.crossJoin(copies)
      .select(liCols: _*)
      .repartition(64)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    val ordOver = Map(
      "o_orderkey" -> (col("o_orderkey") + col("k") * nOrd).as("o_orderkey"),
      "o_custkey" -> (col("o_custkey") + col("k") * nCust).as("o_custkey"))
    val ordCols = ord.columns.toSeq.map(c => ordOver.getOrElse(c, col(c)))
    ord.crossJoin(copies)
      .select(ordCols: _*)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")

    // remaining tables pass through so Tables() resolves on dstDir.
    // Listed via Hadoop FS (like DeltaIO) so a missing srcDir fails with
    // a clear message instead of listFiles' null-NPE, and non-local
    // filesystems work the same as the spark.read calls above.
    val done = Set("documents.parquet", "embeddings.parquet",
      "events.parquet", "lineitem.parquet", "orders.parquet")
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(srcPath), s"scale-probe srcDir not found: $src")
    fs.listStatus(srcPath).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !done(p.getName))
      .foreach { p =>
        spark.read.parquet(p.toString)
          .write.mode("overwrite").parquet(s"$dst/${p.getName}")
      }
    (nDocs * mult, nVec * mult)
  }
}
