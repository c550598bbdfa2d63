package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed edges for the round-9 allocation/preference fits —
  * the driver tables exercise q239/q240 at whatever mix the synthetic
  * corpus happens to produce; this spec OWNS a documents table whose
  * token masses and champion scores are chosen so the closed forms are
  * checkable by hand (the EdgeFixtureSpec recipe).
  *
  * Scores are q227's shared prefScore = stopwords×100000 div tokens,
  * so texts are built from 'the' (stop) and 'zz' (non-stop) words to
  * dial exact scores.
  */
class AllocationEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // (doc_id, source, lang, text)
  //   unimax: token masses per source → capacities 40 / 20000 / 200000
  //   bradley-terry: per-(lang, source) champion scores give srcC > srcB
  //   > srcA in every lang → C wins all its games, A loses all
  private def words(stop: Int, other: Int): String =
    (Seq.fill(stop)("the") ++ Seq.fill(other)("zz")).mkString(" ")

  private val rows: Seq[(Long, String, String, String)] = Seq(
    // srcA: 10 tokens total; champion score 0 in both langs
    (0L, "srcA", "en", words(0, 5)),
    (1L, "srcA", "de", words(0, 5)),
    // srcB: 5000 tokens; champion score 25000 (1 stop in 4)
    (2L, "srcB", "en", words(625, 1875)),
    (3L, "srcB", "de", words(625, 1875)),
    // srcC: 50000 tokens; champion score 100000 (all stops)
    (4L, "srcC", "en", words(25000, 0)),
    (5L, "srcC", "de", words(25000, 0)))

  private lazy val dir: String = {
    val d = TestSpark.tmpDir("alloc-edge")
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "source", "lang", "text")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("bigint").as("n_chars"))
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q239: mixed binding — caps bind ascending, residue splits, no leftover") {
    val got = SparkEntry.queries("q239_unimax_allocation")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getLong(6))).toSet
    // B = 100000, cap = 4. capacities 40 / 20000 / 200000 ascending:
    //   srcA: 40·3 = 120 ≤ 100000          → bound, gets 40
    //   srcB: 20000·2 = 40000 ≤ 99960      → bound, gets 20000
    //   srcC: 200000·1 > 79960             → unbound, fair = 79960
    // leftover = 100000 − 40 − 20000 − 79960 = 0
    assert(got == Set(
      ("srcA", 10L, 40L, true, 40L, 0L),
      ("srcB", 5000L, 20000L, true, 20000L, 0L),
      ("srcC", 50000L, 200000L, false, 79960L, 0L)))
  }

  test("q240: dominant source tops the fit; shares normalize; wins exact") {
    val out = SparkEntry.queries("q240_bradley_terry")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(-_._4)
    // per lang: C beats B, C beats A, B beats A → over 2 langs:
    //   srcC 4 wins / 4 games, srcB 2/4, srcA 0/4
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("srcC", 4L, 4L), ("srcB", 2L, 4L), ("srcA", 0L, 4L)),
      s"strength order must track the win order: ${out.toSeq}")
    assert(out.forall(_._4 > 0.0d), "smoothed strengths stay positive")
    val shareSum = out.map(_._5).sum
    assert(math.abs(shareSum - 1.0d) < 1e-5, s"shares sum to $shareSum")
  }
}
