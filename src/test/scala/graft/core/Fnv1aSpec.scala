package graft.core

import graft.TestSpark
import graft.functions.Fnv1a
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Prop, Test => SCTest}

class Fnv1aSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("known FNV-1a 32 values (masked to non-negative, like worker.go:38-42)") {
    // Computed independently from the FNV-1a definition.
    assert(Fnv1a.hash("") == 18652613)
    assert(Fnv1a.hash("a") == 1678518572)
    assert(Fnv1a.hash("abc") == 440920331)
    assert(Fnv1a.hash("hello world") == 1435189159)
    assert(Fnv1a.hash("naïve") == 429525035)
    assert(Fnv1a.hash("日本語") == 6249703)
  }

  test("hash is non-negative and partitioner stays in range") {
    check(Prop.forAll { (s: String, n0: Int) =>
      val n = math.abs(n0 % 64) + 1
      val h = Fnv1a.hash(s)
      val p = new Fnv1aPartitioner(n).getPartition(s)
      h >= 0 && p >= 0 && p < n && p == h % n
    })
  }

  test("property: engine(wc) == oracle(wc) on random inputs") {
    check(Prop.forAll(org.scalacheck.Gen.listOfN(30,
      org.scalacheck.Gen.alphaNumStr)) { words =>
      val text = words.mkString(" ")
      val counted = WordCountOracle.count(text)
      val viaApp = graft.apps.WordCount.map("f", text)
        .groupBy(_.key).map { case (k, kvs) =>
          k -> graft.apps.WordCount.reduce(k, kvs.map(_.value))
        }
      viaApp == counted
    })
  }

  test("catalyst expression fnv1a(col) == scala Fnv1a.hash") {
    val spark = TestSpark.spark
    import spark.implicits._
    val samples = Seq("", "a", "abc", "hello world", "naïve", "日本語",
      "xyzzy", "the", "straße")
    val df = samples.toDF("s")
      .select(org.apache.spark.sql.functions.col("s"),
        Fnv1a.fnv1a(org.apache.spark.sql.functions.col("s")).as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    samples.foreach(s => assert(got(s) == Fnv1a.hash(s), s))
  }

  // Independent trivial word counter used as the ScalaCheck oracle.
  private object WordCountOracle {
    def count(text: String): Map[String, String] =
      text.split("[^\\p{L}]+").filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.length.toString }
  }

  test("byte ordering matches Go string compare on multi-byte runes") {
    // UTF-16 would order ａ (fullwidth a, 3 UTF-8 bytes) before
    // 𐀀 (U+10000, 4 bytes); byte-wise both start 0xEF vs 0xF0.
    assert(ByteOrdering.compare("ａ", new String(Character.toChars(0x10000))) < 0)
    assert(ByteOrdering.compare("abc", "abd") < 0)
    assert(ByteOrdering.compare("ab", "abc") < 0)
    assert(ByteOrdering.compare("b", "aa") > 0)
  }
}
