package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-payload edges for the example-construction queries —
  * the round-8 verdict: the q214 empty-payload oracle guard landed but
  * no fixture row exercised it, and q232's thirds / q236's splice
  * arithmetic were unpinned at n = 0/1/2. The driver testdata is
  * read-only, so this spec materializes its OWN documents table with
  * the edge rows and checks each query against an independent Scala
  * reference model (same role as the DuckDB oracle, which only sees
  * driver data).
  *
  * Rows (ASCII only, so char length == UTF-8 byte length and the md5
  * fingerprints are comparable):
  *   0  ""            q236 haystack n=0, q232 n=0
  *   2  ""            q214 video with an EMPTY payload (the guard)
  *   5  "a"*64        q214 exactly one full frame; also a q236 haystack
  *   8  "a"*65        q214 odd trailing chunk dropped by the stride
  *   10 "a"           q236 n=1, q232 n=1
  *   11 "a"*64+"b"*64+"z"  q214 two sampled frames, jump 25 > threshold
  *   14 "Q"           q214 single 1-char frame
  *   20 "ab"          q236 n=2, q232 n=2 (also a 2-char video)
  */
class EdgeFixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rows: Seq[(Long, String)] = Seq(
    0L -> "",
    2L -> "",
    5L -> "a" * 64,
    8L -> "a" * 65,
    10L -> "a",
    11L -> ("a" * 64 + "b" * 64 + "z"),
    14L -> "Q",
    20L -> "ab")

  private lazy val dir: String = {
    val d = TestSpark.tmpDir("edge-fixture")
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("edge").as("source"), length(col("text")).cast("bigint")
          .as("n_chars"))
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  private def round6(d: Double): Double = BigDecimal(d)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q214: empty video emits no row; 1-frame and stride edges exact") {
    val got = SparkEntry.queries("q214_shot_boundaries")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    // reference model: 64-char chunks, keep chunk index k % 2 == 0,
    // mean byte per frame rounded at 6, boundary where the jump > 1.0
    val expected = rows.filter { case (id, t) => id % 3 == 2 && t.nonEmpty }
      .map { case (id, t) =>
        val frames = t.grouped(64).zipWithIndex
          .filter(_._2 % 2 == 0)
          .map { case (c, _) =>
            round6(c.map(_.toInt).sum.toDouble / c.length) }
          .toSeq
        val jumps = frames.sliding(2).collect {
          case Seq(a, b) => round6(math.abs(b - a)) }.toSeq
        val nb = jumps.count(_ > 1.0d)
        (id, frames.size.toLong, nb.toLong, nb + 1L,
          round6(jumps.foldLeft(0.0d)(math.max)))
      }.toSet
    assert(!got.exists(_._1 == 2L), "empty payload must emit no row")
    assert(got == expected)
  }

  test("q232: FIM thirds arithmetic and rewritten bytes exact at n=0/1/2") {
    val got = SparkEntry.queries("q232_fim_examples")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6))).toSet
    val expected = rows.map { case (id, t) =>
      val n = t.length
      val fim = md5hex(s"fim|$id").charAt(0) < '8'
      val (cut1, cut2) = (n / 3, 2 * n / 3)
      val example = if (fim)
        "<PRE>" + t.substring(0, cut1) + "<SUF>" + t.substring(cut2) +
          "<MID>" + t.substring(cut1, cut2)
      else t
      (id, if (fim) 1L else 0L, n.toLong,
        (if (fim) cut1 else n).toLong,
        (if (fim) cut2 - cut1 else 0).toLong,
        (if (fim) n - cut2 else 0).toLong,
        md5hex(example))
    }.toSet
    // the edge ids must actually land on BOTH coin sides, or the
    // n=0/1/2 fim arithmetic is silently untested
    assert(expected.exists(e => e._2 == 1L && e._3 <= 2L),
      "need a fim-selected doc with n <= 2")
    assert(expected.exists(e => e._2 == 0L), "need a passthrough doc")
    assert(got == expected)
  }

  test("q236: needle splice arithmetic and built bytes exact at n=0/1/2") {
    val got = SparkEntry.queries("q236_needle_suite")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet
    val expected = for {
      (id, t) <- rows if id % 5 == 0
      depth <- Seq(10L, 25L, 50L, 75L, 90L)
    } yield {
      val n = t.length
      val pos = (depth * n / 100).toInt
      val needle = s" The secret code is NEEDLE-$id-$depth. "
      val built = t.substring(0, pos) + needle + t.substring(pos)
      (id, depth, n.toLong, pos.toLong, built.length.toLong,
        md5hex(built))
    }
    assert(got == expected.toSet)
  }
}
