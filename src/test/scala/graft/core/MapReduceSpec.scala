package graft.core

import graft.TestSpark
import graft.apps.{FaultInjected, Indexer, NoCrash, WordCount}
import org.scalatest.funsuite.AnyFunSuite

/** Golden-output tests replicating the reference lab harness (SURVEY.md
  * §5): the distributed engine must produce the same key→value set as the
  * independent sequential oracle, with each mr-out file sorted by key and
  * keys placed in their FNV-1a shard.
  */
class MapReduceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def books: Seq[String] =
    Seq("whale.txt", "garden.txt", "numbers.txt", "repeat.txt")
      .map(f => TestSpark.resource(s"books/$f"))

  private def edge: Seq[String] =
    Seq("empty.txt", "unicode.txt", "hotkey.txt")
      .map(f => TestSpark.resource(s"edge/$f"))

  private def runBoth(app: MRApp, inputs: Seq[String], nReduce: Int = 10)
      : (Seq[(String, String)], Seq[(String, String)]) = {
    val dOut = TestSpark.tmpDir(s"mr-${app.name}-dist")
    val sOut = TestSpark.tmpDir(s"mr-${app.name}-seq")
    MapReduce.run(spark, inputs, app, nReduce, dOut)
    MapReduce.runSequential(inputs, app, sOut)
    (MapReduce.readOutput(dOut), MapReduce.readOutput(sOut))
  }

  test("wc distributed == sequential oracle (books + edge)") {
    val (dist, seq) = runBoth(WordCount, books ++ edge)
    assert(dist.toMap == seq.toMap)
    assert(dist.size == seq.size) // no duplicate keys across shards
  }

  test("indexer distributed == sequential oracle") {
    val (dist, seq) = runBoth(Indexer, books)
    assert(dist.toMap == seq.toMap)
  }

  test("nocrash distributed == sequential oracle") {
    val (dist, seq) = runBoth(NoCrash, books ++ edge)
    assert(dist.toMap == seq.toMap)
    // reduce output: sorted, space-joined values per key, 4 keys a..d
    assert(dist.map(_._1).sorted == Seq("a", "b", "c", "d"))
  }

  test("each mr-out file is sorted by key and holds only its FNV shard") {
    val out = TestSpark.tmpDir("mr-wc-layout")
    val nReduce = 10
    MapReduce.run(spark, books, WordCount, nReduce, out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("mr-out-"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val shard = f.getName.stripPrefix("mr-out-").toInt
      val keys = scala.io.Source.fromFile(f, "UTF-8").getLines()
        .map(_.split(" ")(0)).toSeq
      assert(keys == keys.sorted(ByteOrdering), s"${f.getName} not sorted")
      keys.foreach { k =>
        assert(graft.functions.Fnv1a.hash(k) % nReduce == shard,
          s"key $k in wrong shard ${f.getName}")
      }
    }
  }

  test("empty input file contributes nothing; empty shards produce no file") {
    val out = TestSpark.tmpDir("mr-empty")
    // Single tiny file with 2 distinct words -> at most 2 of 10 shards
    MapReduce.run(spark, Seq(TestSpark.resource("books/repeat.txt")),
      WordCount, 10, out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("mr-out-"))
    val distinctWords = 5 // echo delta alpha beta gamma
    assert(files.length <= distinctWords)
    val all = MapReduce.readOutput(out).toMap
    assert(all("echo") == "10")
    assert(all("gamma") == "2")
  }

  test("crash app recovers via task retry and matches nocrash golden") {
    val inputs = books
    val golden = TestSpark.tmpDir("mr-golden")
    MapReduce.runSequential(inputs, NoCrash, golden)
    val out = TestSpark.tmpDir("mr-crash")
    MapReduce.run(spark, inputs, FaultInjected(NoCrash, crashProb = 0.6),
      10, out)
    assert(MapReduce.readOutput(out).toMap ==
      MapReduce.readOutput(golden).toMap)
  }

  test("unicode tokenization: digits/punct separate, letters kept") {
    val words = WordCount.tokenize("one1two22three333 naïve-café 日本語!")
    assert(words == Seq("one", "two", "three", "naïve", "café", "日本語"))
  }
}
