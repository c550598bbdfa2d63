package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler: times the building blocks of the slowest
  * bench queries so optimization effort lands on the real bottleneck
  * (bench times alone don't say WHICH stage dominates).
  *
  * usage: runMain graft.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-profile", "32")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[profile] $label%-28s first=${(t1 - t0) / 1e9}%6.2f  second=${(t2 - t1) / 1e9}%6.2f")
    }

    val W = graft.queries.TextQueries.wordsExpr
    val docs = Tables(spark, sfDir).documents

    time("docs_text_scan") { docs.select(col("doc_id"), col("text")) }
    time("words_split") { docs.select(col("doc_id"), expr(W).as("ws")) }
    time("explode_words") {
      docs.select(col("doc_id"), explode(expr(W)).as("word")) }
    val preagg = docs
      .select(col("doc_id"), explode(expr(W)).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
    time("preagg_doc_word") { preagg }
    time("preagg_plus_md5") {
      preagg.withColumn("h", md5(col("word").cast("binary"))) }
    val withBands = preagg
      .withColumn("h", md5(col("word").cast("binary")))
      .withColumns((0 until 4).map(k => s"h_$k" ->
        expr(s"cast(conv(substring(h, ${4 * k + 1}, 4), 16, 10) as int)"))
        .toMap)
    time("plus_band_ints") { withBands }
    val votes = (0 until 4).flatMap { k =>
      (0 until 16).map { b =>
        val shift = 4 * (3 - b / 4) + (b % 4)
        sum(expr(s"case when (shiftright(h_$k, $shift) & 1) = 1 then c else -c end"))
          .as(s"s_${k}_$b")
      }
    }
    time("vote_agg_64") {
      withBands.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*) }

    time("q58_current") {
      SparkEntry.queries("q58_simhash_neardup")(spark, sfDir) }

    // variant: materialize the 5000-row signature table once, then the
    // band self-join touches only the checkpointed RDD
    val bandExprs = (0 until 4).map { k =>
      (0 until 16)
        .map(b => s"(case when s_${k}_$b >= 0 then ${1L << b} else 0 end)")
        .mkString("cast(", " + ", s" as bigint) as sh_$k")
    }
    time("q58_checkpointed_sh") {
      val sh = withBands.groupBy(col("doc_id"))
        .agg(votes.head, votes.tail: _*)
        .selectExpr("doc_id" +: bandExprs: _*)
        .localCheckpoint()
      val banded = sh.withColumn("band",
        explode(array((0 until 4).map(k =>
          struct(lit(k).as("i"), col(s"sh_$k").as("v"))): _*)))
      val a = banded.alias("a")
      val b = banded.alias("b")
      val ham = (0 until 4)
        .map(k => s"bit_count(a.sh_$k ^ b.sh_$k)").mkString(" + ")
      a.join(b,
          col("a.band.i") === col("b.band.i") &&
          col("a.band.v") === col("b.band.v") &&
          col("a.doc_id") < col("b.doc_id"))
        .where(expr(s"($ham) <= 3"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr(s"cast(($ham) as int)").as("hamming"))
        .distinct()
        .withColumn("est_similarity",
          expr("cast(1.0d - cast(hamming as double) / 64.0d as double)"))
    }

    // jaccardPairs (q24/q54 edge generation): does AQE reuse the shingle
    // exchange across the self-join, or is the Generate computed twice?
    val ex = docs
      .select(col("doc_id"), col("source"),
        graft.functions.Shingles.shingles(col("text"), 3).as("shingle"))
      .withColumn("n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))))
    def pairsFrom(e: org.apache.spark.sql.DataFrame) = {
      val a = e.alias("a")
      val b = e.alias("b")
      a.join(b,
          col("a.source") === col("b.source") &&
          col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))
        .agg(count(lit(1)).as("common"))
        .select(col("doc_a"), col("doc_b"),
          expr("common / (n_a + n_b - common)").as("jaccard"))
    }
    time("jaccard_pairs_current") { pairsFrom(ex) }
    time("jaccard_pairs_ckpt_ex") { pairsFrom(ex.localCheckpoint()) }

    time("q54_current") {
      SparkEntry.queries("q54_dedup_clusters")(spark, sfDir) }
    time("q54_cc_only") {
      graft.core.ConnectedComponents.run(
        pairsFrom(ex.localCheckpoint()).where(col("jaccard") >= 0.02)
          .select(col("doc_a").as("u"), col("doc_b").as("v")))
    }
    time("q59_current") {
      SparkEntry.queries("q59_semantic_dedup")(spark, sfDir) }
    time("q64_current") {
      SparkEntry.queries("q64_metric_correlation")(spark, sfDir) }
    time("q23_current") {
      SparkEntry.queries("q23_minhash_lsh")(spark, sfDir) }
    time("q62_current") {
      SparkEntry.queries("q62_boilerplate_ngrams")(spark, sfDir) }

    spark.stop()
  }
}
