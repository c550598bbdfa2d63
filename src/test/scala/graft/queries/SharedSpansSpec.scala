package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q190's exact-substring span detector: the hot-gram df cap must kill
  * the quadratic boilerplate blast radius (one df=N gram is N²/2 join
  * pairs) without touching genuine shared spans below the cap.
  */
class SharedSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hot-gram cap bounds the boilerplate pair explosion") {
    // 200 docs all opening with the same 8-word navbar; the rest of
    // each doc is unique. Exactly one gram (the navbar) is shared, at
    // df = 200 — uncapped, that single gram alone yields every one of
    // the 200·199/2 pairs.
    val nav = "home about products contact login search help news"
    val d = docs((0L until 200L).map(i =>
      i -> s"$nav unique${i}a unique${i}b unique${i}c unique${i}d"))
    val uncapped = DedupQueries.sharedSpans(d, Int.MaxValue).count()
    assert(uncapped === 200L * 199 / 2) // the explosion the cap prevents
    val capped = DedupQueries.sharedSpans(d, DedupQueries.spanDfCap)
    assert(capped.count() === 0L) // navbar excluded -> no candidate pairs
  }

  test("spans below the cap are exact: longest run and distinct runs") {
    // docs 1 and 2 share a verbatim 10-word run (df = 2 per gram, far
    // below the cap) plus a separate 8-word run; doc 3 shares nothing.
    val run10 = "one two three four five six seven eight nine ten"
    val run8 = "alpha beta gamma delta epsilon zeta eta theta"
    val d = docs(Seq(
      1L -> s"$run10 filler1a filler1b $run8",
      2L -> s"start2a start2b $run10 mid2a mid2b mid2c $run8",
      3L -> "totally different words that overlap with nothing here at all"))
    val out = DedupQueries.sharedSpans(d, DedupQueries.spanDfCap)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getLong(3)))
    // a 10-word run = 3 consecutive gram matches on one diagonal
    // (10 - 7); the 8-word run is its own island on another diagonal
    assert(out.toSeq === Seq((1L, 2L, 10, 2L)))
  }
}
