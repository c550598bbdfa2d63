package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-probe generator is measurement infrastructure — if it
  * silently produced correlated copies, the "10× is sublinear" evidence
  * would be measuring an easier workload than claimed. This spec pins
  * the synthesis contract on a small blow-up:
  *  - copy 0 is the ORIGINAL rows (ids, text, vectors untouched), so
  *    seed-id conventions keep holding on the blown-up corpus;
  *  - salted document copies share NO fingerprint (and therefore no
  *    shingle-derived structure) with the originals;
  *  - rotated embedding copies preserve the norm while changing
  *    direction;
  *  - row counts scale exactly by the multiplier.
  */
class ScaleProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val src = "/root/testdata/sf0.001"

  private lazy val dst = {
    val out = TestSpark.tmpDir("scaleprobe-spec")
    ScaleProbe.generate(spark, 3, src, out)
    out
  }

  test("documents: exact 3x rows, copy 0 verbatim, salted copies disjoint") {
    val orig = spark.read.parquet(s"$src/documents.parquet")
    val blown = spark.read.parquet(s"$dst/documents.parquet")
    val n = orig.count()
    assert(blown.count() == 3 * n)
    // copy 0 = the original rows, byte-for-byte
    val copy0 = blown.where(col("doc_id") < n)
      .select(col("doc_id"), col("text"))
    assert(copy0.exceptAll(orig.select(col("doc_id"), col("text")))
      .isEmpty, "copy 0 must be the original rows unchanged")
    // no fingerprint collision between originals and salted copies —
    // the property that keeps dedup workloads ~linear in the blow-up
    val fp = (d: org.apache.spark.sql.DataFrame) =>
      d.select(graft.queries.Q.fingerprint(col("text")).as("fp"))
    val shared = fp(blown.where(col("doc_id") >= n))
      .join(fp(orig), "fp").count()
    assert(shared == 0, s"salted copies share $shared fingerprints")
    // the stronger property the fingerprint check does NOT imply: the
    // salt must survive the `[a-z]+` TOKENIZER, or every word-level
    // query sees the copies as exact duplicates (the round-10 finding:
    // a `_k` salt was stripped at tokenization and the "disjoint
    // vocabularies" contract silently became "10-duplicate cliques")
    val toks = (d: org.apache.spark.sql.DataFrame) => d
      .select(explode(expr(graft.queries.TextQueries.wordsExpr))
        .as("w")).distinct()
    val sharedToks = toks(blown.where(col("doc_id") >= n))
      .join(toks(orig), "w").count()
    assert(sharedToks == 0,
      s"salted copies share $sharedToks tokenizer-visible words")
    // and distinct salted copies must not collapse onto EACH OTHER
    val sharedAcross = toks(blown
        .where(col("doc_id") >= n && col("doc_id") < 2 * n))
      .join(toks(blown.where(col("doc_id") >= 2 * n)), "w").count()
    assert(sharedAcross == 0,
      s"salted copies 1 and 2 share $sharedAcross words")
  }

  test("embeddings: 3x rows, copy 0 verbatim, rotation preserves norms") {
    val orig = spark.read.parquet(s"$src/embeddings.parquet")
    val blown = spark.read.parquet(s"$dst/embeddings.parquet")
    val n = orig.count()
    assert(blown.count() == 3 * n)
    val norm = expr(
      "aggregate(embedding, 0d, (a, x) -> a + cast(x as double) * x)")
    // norms of copy k equal the norms of the originals (a rotation),
    // compared as rounded multisets
    val normsOf = (d: org.apache.spark.sql.DataFrame) =>
      d.select(round(norm, 6).as("n2")).groupBy("n2").count()
        .collect().map(_.toString).sorted.toSeq
    val o = normsOf(orig)
    assert(normsOf(blown.where(col("vec_id") >= n && col("vec_id") < 2 * n))
      == o, "rotated copy must preserve the norm multiset")
    // but directions must differ for non-constant vectors: copy-1
    // vectors equal to their original are (near-)rotation-invariant —
    // require that to be rare (the synthetic corpus has none)
    val same = blown.where(col("vec_id") >= n && col("vec_id") < 2 * n)
      .select((col("vec_id") - n).as("vec_id"),
        col("embedding").as("rot"))
      .join(orig, "vec_id")
      .where(col("rot") === col("embedding"))
      .count()
    assert(same == 0, s"$same rotated vectors identical to the original")
  }

  test("events: 3x rows, copy 0 verbatim, copies user-disjoint, window fixed") {
    val orig = Tables(spark, src).events
    val blown = Tables(spark, dst).events
    val n = spark.read.parquet(s"$src/events.parquet")
      .agg(max(col("event_id"))).head.getLong(0) + 1
    val nU = spark.read.parquet(s"$src/events.parquet")
      .agg(max(col("user_id"))).head.getLong(0) + 1
    assert(blown.count() == 3 * orig.count())
    // copy 0 = the original rows (through the same Tables normalization)
    assert(blown.where(col("event_id") < n).exceptAll(orig).isEmpty,
      "copy 0 must be the original rows unchanged")
    // user populations of distinct copies are disjoint — per-user
    // costs stay flat under the blow-up
    assert(blown.select((col("user_id") / nU).cast("bigint").as("k"),
        col("user_id")).distinct()
      .groupBy("user_id").count().where(col("count") > 1).isEmpty)
    // the calendar window does not stretch: density grows, range doesn't
    val r = (d: org.apache.spark.sql.DataFrame) =>
      d.agg(min(col("ts")), max(col("ts"))).head
    assert(r(blown) == r(orig), "ts range must be copy-invariant")
  }

  test("lineitem/orders: 3x rows, copy 0 verbatim, graph components disjoint") {
    val origLi = spark.read.parquet(s"$src/lineitem.parquet")
    val blownLi = spark.read.parquet(s"$dst/lineitem.parquet")
    val origOrd = spark.read.parquet(s"$src/orders.parquet")
    val blownOrd = spark.read.parquet(s"$dst/orders.parquet")
    val nOrd = origOrd.agg(max(col("o_orderkey"))).head.getLong(0) + 1
    val nPart = origLi.agg(max(col("l_partkey"))).head.getLong(0) + 1
    assert(blownLi.count() == 3 * origLi.count())
    assert(blownOrd.count() == 3 * origOrd.count())
    assert(blownLi.where(col("l_orderkey") < nOrd)
      .exceptAll(origLi).isEmpty, "lineitem copy 0 must be verbatim")
    assert(blownOrd.where(col("o_orderkey") < nOrd)
      .exceptAll(origOrd).isEmpty, "orders copy 0 must be verbatim")
    // copies never share an order or a part: the co-occurrence graph
    // is vertex-disjoint per copy (work grows in components, not hubs)
    val liK = blownLi.select((col("l_orderkey") / nOrd).cast("bigint")
      .as("ko"), (col("l_partkey") / nPart).cast("bigint").as("kp"))
    assert(liK.where(col("ko") =!= col("kp")).isEmpty,
      "order-copy and part-copy of a line must agree")
    // FK consistency: every blown-up line's order exists in blown orders
    assert(blownLi.select(col("l_orderkey").as("o_orderkey")).distinct()
      .join(blownOrd, Seq("o_orderkey"), "left_anti").isEmpty,
      "lineitem→orders FK must hold per copy")
    // percentile targets gain DISTINCT values (no duplicate pile-up):
    // distinct extendedprice count scales ~3x, not 1x
    val d1 = origLi.select(col("l_extendedprice")).distinct().count()
    val d3 = blownLi.select(col("l_extendedprice")).distinct().count()
    assert(d3 > 2 * d1, s"distinct prices must grow with copies ($d1 -> $d3)")
  }
}
