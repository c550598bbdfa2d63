package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The native gram_clip kernel must compute EXACTLY the clipped
  * multiset-overlap integers the relational (explode + count-join)
  * formulation computes — q244's and q251's oracle hashes ride on it.
  * Pinned three ways: an independent Scala model, ScalaCheck over
  * random strings (incl. repeats and non-ASCII), and the composed
  * Spark SQL formulation over the real corpus fixture.
  */
class GramClipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent model: sliding windows + multiset-min overlap. */
  private def model(c: Seq[String], r: Seq[String],
      n: Int): (Long, Long, Long) = {
    def grams(w: Seq[String]) = w.sliding(n).filter(_.length == n)
      .map(_.mkString(" ")).toSeq
    val (cg, rg) = (grams(c), grams(r))
    val rc = rg.groupBy(identity).view.mapValues(_.size).toMap
    val clip = cg.groupBy(identity).map { case (g, occ) =>
      math.min(occ.size, rc.getOrElse(g, 0))
    }.sum
    (clip.toLong, cg.length.toLong, rg.length.toLong)
  }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(120), p)
    assert(res.passed, res.status.toString)
  }

  private def evalChars(c: String, r: String, n: Int): Seq[Long] = {
    import spark.implicits._
    Seq((c, r)).toDF("c", "r")
      .select(expr(s"gram_clip(c, r, $n)")).head.getSeq[Long](0)
  }

  test("char mode: hand cases") {
    // "abab" vs "ab": 1-grams clip = 2 (a, b), 2-grams clip = 1 (ab)
    assert(evalChars("abab", "ab", 1) == Seq(2L, 4L, 2L))
    assert(evalChars("abab", "ab", 2) == Seq(1L, 3L, 1L))
    // identical strings: clip == tot
    assert(evalChars("hello", "hello", 2) == Seq(4L, 4L, 4L))
    // disjoint alphabets: clip 0
    assert(evalChars("aaaa", "bbbb", 2) == Seq(0L, 3L, 3L))
    // shorter than n: zero windows, never negative
    assert(evalChars("ab", "abcd", 3) == Seq(0L, 0L, 2L))
    assert(evalChars("", "abc", 1) == Seq(0L, 0L, 3L))
    // repeats clip at the REFERENCE count (BLEU's "the the the" case)
    assert(evalChars("aaaa", "aa", 1) == Seq(2L, 4L, 2L))
    // supplementary-plane char counts as ONE code point
    assert(evalChars("a😀b", "😀", 1) == Seq(1L, 3L, 1L))
  }

  test("char mode: ScalaCheck vs the independent model") {
    val s = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'é', '日'))
      .map(_.mkString)
    check(Prop.forAll(s, s, Gen.choose(1, 4)) { (c, r, n) =>
      val got = evalChars(c, r, n)
      val want = model(c.toSeq.map(_.toString), r.toSeq.map(_.toString), n)
      got == Seq(want._1, want._2, want._3)
    })
  }

  test("word mode: ScalaCheck vs the independent model") {
    import spark.implicits._
    val w = Gen.listOf(Gen.oneOf("the", "cat", "sat", "mat", "on"))
    check(Prop.forAll(w, w, Gen.choose(1, 4)) { (c, r, n) =>
      val got = Seq((c, r)).toDF("c", "r")
        .select(expr(s"gram_clip(c, r, $n)")).head.getSeq[Long](0)
      val want = model(c, r, n)
      got == Seq(want._1, want._2, want._3)
    })
  }

  test("kernel == relational formulation over the real corpus") {
    // the exact explode + conditional-agg pipeline q244 used before
    // the kernel landed, over the fixture documents paired with their
    // own reversed text (guarantees partial overlap at every n)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id",
        s"${graft.queries.TextQueries.wordsExpr} as rw",
        "reverse(" + graft.queries.TextQueries.wordsExpr + ") as cw")
      .localCheckpoint()
    val viaKernel = docs
      .selectExpr("doc_id", "gram_clip(cw, rw, 2) as g")
      .selectExpr("doc_id", "g[0] as clip", "g[1] as totc", "g[2] as totr")
    val viaSql = docs
      .withColumn("n", lit(2))
      .select(col("doc_id"), col("n"),
        explode(expr("""concat(
            case when size(cw) >= n then
              transform(sequence(0, size(cw) - n),
                j -> struct(concat_ws(' ', slice(cw, j + 1, n)) as g,
                            1L as tc, 0L as tr))
            else array() end,
            case when size(rw) >= n then
              transform(sequence(0, size(rw) - n),
                j -> struct(concat_ws(' ', slice(rw, j + 1, n)) as g,
                            0L as tc, 1L as tr))
            else array() end)""")).as("t"))
      .groupBy(col("doc_id"), col("t.g"))
      .agg(sum(col("t.tc")).as("c"), sum(col("t.tr")).as("r"))
      .groupBy(col("doc_id"))
      .agg(sum(least(col("c"), col("r"))).as("clip"),
        sum(col("c")).as("totc"), sum(col("r")).as("totr"))
    val k = viaKernel.orderBy("doc_id").collect().toSeq
    val s = viaSql.orderBy("doc_id").collect().toSeq
    assert(k.nonEmpty && k == s)
  }

  test("null inputs yield null; analysis rejects bad n and types") {
    import spark.implicits._
    val r = Seq((Option.empty[String], Some("ab")))
      .toDF("c", "r").selectExpr("gram_clip(c, r, 1)").head
    assert(r.isNullAt(0))
    intercept[Exception] {
      spark.sql("select gram_clip('a', 'b', 0)").collect()
    }
    intercept[Exception] {
      spark.sql("select gram_clip(1, 2, 1)").collect()
    }
  }
}
