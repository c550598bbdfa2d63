package graft.sinks

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ONE parameterized harness for the lifecycle invariants every
  * persisted index sink shares (the [[IndexSink]] contract). Each
  * sink's probe semantics stay pinned in its own spec
  * (DedupIndexSpec / TextIndexSpec / VectorIndexSpec /
  * ContamIndexSpec); this spec asserts, uniformly and for ALL sinks:
  *
  *  1. append ≡ rebuild — build(A) then append(B) yields an index
  *     whose every persisted relation equals build(A ∪ B)'s, row for
  *     row (deltas merge at read time, so the ingest path can never
  *     answer differently than a from-scratch index).
  *  2. compact ≡ identity — consolidating append generations changes
  *     the file layout, never a row.
  *
  * A fifth sink registers one [[IndexSink]] adapter and a fixture row
  * here and inherits the whole contract instead of hand-rolling it.
  */
class SinkContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** (sink, full fixture, batch-split column). Batch A keeps the low
    * ids: every sink's quantizer/sampling convention derives from
    * fixed low-id seed rows (VectorIndex's `vec_id < k` anchors), so
    * the first build must contain them — exactly the production
    * constraint that the quantizer trains on the FIRST corpus
    * generation and later batches only append.
    */
  private def cases: Seq[(IndexSink, DataFrame, String)] = {
    val docs = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    val emb = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding"))
    Seq(
      (IndexSink.dedup, docs, "doc_id"),
      (IndexSink.text, docs, "doc_id"),
      (IndexSink.contam, docs, "doc_id"),
      (IndexSink.span, docs, "doc_id"),
      (IndexSink.lm, docs, "doc_id"),
      (IndexSink.vector(4), emb, "vec_id"))
  }

  /** Canonical row-set image of a relation: sorted stringified rows
    * (arrays stringify element-wise, so positions/vector payloads
    * compare by value).
    */
  private def image(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
  }

  private def assertSameContents(sink: IndexSink, a: String, b: String,
      what: String): Unit = {
    val ca = sink.contents(spark, a)
    val cb = sink.contents(spark, b)
    assert(ca.keySet == cb.keySet, s"${sink.name}: $what relation sets")
    ca.keySet.foreach { rel =>
      val ia = image(ca(rel))
      val ib = image(cb(rel))
      assert(ia.nonEmpty, s"${sink.name}/$rel: contract fixture is empty")
      assert(ia == ib, s"${sink.name}/$rel: $what must match row-for-row")
    }
  }

  test("append ≡ rebuild and compact ≡ identity, for every sink") {
    cases.foreach { case (sink, data, idCol) =>
      val batchA = data.where(col(idCol) < 300)
      val batchB = data.where(col(idCol) >= 300)

      val fullDir = TestSpark.tmpDir(s"contract-full-${sink.name}")
      sink.build(data, fullDir)

      val incDir = TestSpark.tmpDir(s"contract-inc-${sink.name}")
      sink.build(batchA, incDir)
      sink.append(batchB, incDir)
      assertSameContents(sink, incDir, fullDir, "append-then-read ≡ rebuild")

      val cmpDir = TestSpark.tmpDir(s"contract-cmp-${sink.name}")
      sink.compact(spark, incDir, cmpDir)
      assertSameContents(sink, cmpDir, incDir, "compact ≡ identity")
    }
  }

  test("replayed appendDelta ≡ applied once ≡ rebuild, for every sink") {
    // foreachBatch is at-least-once: the same micro-batch can commit
    // twice with the SAME gen. The gen-scoped delta write must make
    // the second commit a no-op rewrite — for every sink, uniformly —
    // and the delta generations must fold away under compact.
    cases.foreach { case (sink, data, idCol) =>
      val batchA = data.where(col(idCol) < 300)
      val batchB = data.where(col(idCol) >= 250 && col(idCol) < 300)
      val batchC = data.where(col(idCol) >= 300)

      val fullDir = TestSpark.tmpDir(s"replay-full-${sink.name}")
      sink.build(data.where(col(idCol) < 300 || col(idCol) >= 300),
        fullDir) // = all rows; spelled to mirror the union below
      val incDir = TestSpark.tmpDir(s"replay-inc-${sink.name}")
      sink.build(batchA.where(col(idCol) < 250), incDir)
      // two streaming generations...
      sink.appendDelta(batchB, incDir, gen = 0L)
      sink.appendDelta(batchC, incDir, gen = 1L)
      // ...and gen 1 REPLAYS (the at-least-once case under test)
      sink.appendDelta(batchC, incDir, gen = 1L)
      assertSameContents(sink, incDir, fullDir,
        "replayed appendDelta ≡ applied once ≡ rebuild")

      // compact folds the delta generations into the main tree and
      // changes nothing a reader sees
      val cmpDir = TestSpark.tmpDir(s"replay-cmp-${sink.name}")
      sink.compact(spark, incDir, cmpDir)
      assertSameContents(sink, cmpDir, fullDir,
        "compact over delta gens ≡ rebuild")
      // the compacted tree carries NO delta subtrees — readers are
      // back to one scan per relation
      val leftover = new java.io.File(cmpDir).listFiles()
        .filter(_.getName.endsWith("_delta"))
      assert(leftover.isEmpty,
        s"${sink.name}: compact left delta trees: ${leftover.mkString(",")}")
    }
  }

  test("plain append commits only its own gen subtree, for every sink") {
    // the O(batch) shape made a FILE-LEVEL invariant: a plain append
    // must not add, remove, or rename a single file of the MAIN tree
    // (a parquet mode-append would — its commit lists + schema-infers
    // the whole tree and drops new files into it, the r9 SinkBench
    // cost class); everything it writes lands under a claimed
    // negative-gen delta subtree. Uniform across all six sinks since
    // round 14 — before it, TextIndex/SpanIndex/ContamIndex still
    // mode-appended.
    def mainFiles(root: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(root)).map(_.getPath.stripPrefix(root))
        .filterNot(p => p.contains("_delta") || p.contains("_gen_claims"))
        .toSet
    }
    cases.foreach { case (sink, data, idCol) =>
      val root = TestSpark.tmpDir(s"append-obatch-${sink.name}")
      sink.build(data.where(col(idCol) < 300), root)
      val before = mainFiles(root)
      sink.append(data.where(col(idCol) >= 300), root)
      assert(mainFiles(root) == before,
        s"${sink.name}: plain append touched the main tree")
      val deltas = new java.io.File(root).listFiles()
        .filter(_.getName.endsWith("_delta"))
      assert(deltas.nonEmpty &&
        deltas.forall(_.listFiles().exists(_.getName.startsWith("gen=-"))),
        s"${sink.name}: plain append must land in the negative-gen " +
          "delta namespace")
    }
  }

  /** 4 claimants × 25 allocations on one index root must yield 100
    * DISTINCT negative gens — the exactly-one-winner contract of
    * whatever [[ClaimPrimitive]] is plugged in.
    */
  private def raceClaimants(root: String,
      claim: Option[ClaimPrimitive]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val fs = scala.concurrent.Future.traverse((1 to 4).toList) { _ =>
      scala.concurrent.Future {
        (1 to 25).map(_ =>
          DeltaIO.nextPlainGen(spark, root, Seq("bigrams", "words"),
            claim))
      }
    }
    val gens = scala.concurrent.Await
      .result(fs, scala.concurrent.duration.Duration(120, "s")).flatten
    pool.shutdown()
    assert(gens.size == 100 && gens.distinct.size == 100,
      s"gen collision: ${gens.groupBy(identity).filter(_._2.size > 1).keys}")
    assert(gens.forall(_ < 0), "plain gens must use the negative namespace")
  }

  test("concurrent plain-gen claimants never share a generation") {
    // the default primitive (hadoopCreate: JDK createNewFile on
    // file://) is the ONLY thing standing between two simultaneous
    // plain appends and a silent mode-overwrite of the same gen=
    // subtree — race it for real
    raceClaimants(TestSpark.tmpDir("gen-claims-race"), None)
  }

  test("a conditional-put ClaimPrimitive passes the same claimant race") {
    // the object-store seam: an atomic put-if-absent (standing in for
    // an S3 If-None-Match PUT — this container has no object store)
    // must satisfy the identical exactly-one-winner contract under
    // real thread contention; claimedGens reads back the fake store's
    // key listing, so the allocation scan path is exercised too
    val store = new java.util.concurrent.ConcurrentHashMap[String, Unit]()
    val claim = ClaimPrimitive.conditionalPut(
      "fake-if-none-match",
      putIfAbsent = k => store.putIfAbsent(k, ()) == null,
      listKeys = prefix => {
        import scala.jdk.CollectionConverters._
        store.keySet.asScala.toSeq.filter(_.startsWith(prefix + "/"))
      })
    raceClaimants(TestSpark.tmpDir("gen-claims-race-condput"),
      Some(claim))
  }

  test("the s3Style status-code adapter passes the same claimant race") {
    // the documented reference wiring (ClaimPrimitive.s3Style scaladoc
    // shows the literal AWS SDK v2 calls): the fake store answers REAL
    // HTTP statuses — 200 created, 412 precondition-failed on an
    // existing key, and every 7th otherwise-winning PUT a 409
    // (concurrent-create, key NOT created) — so the adapter's
    // status→win/loss mapping is what the race exercises, 409-driven
    // gen skips included
    val store = new java.util.concurrent.ConcurrentHashMap[String, Unit]()
    val flakes = new java.util.concurrent.atomic.AtomicLong
    val s3 = ClaimPrimitive.s3Style("fake-s3",
      new ClaimPrimitive.S3ConditionalStore {
        def putIfNoneMatch(key: String): Int =
          if (flakes.incrementAndGet() % 7 == 0) 409
          else if (store.putIfAbsent(key, ()) == null) 200
          else 412
        def listKeys(prefix: String): Seq[String] = {
          import scala.jdk.CollectionConverters._
          store.keySet.asScala.toSeq.filter(_.startsWith(prefix + "/"))
        }
      })
    raceClaimants(TestSpark.tmpDir("gen-claims-race-s3style"), Some(s3))
    // and a status outside the contract is an ERROR, never a loss
    val e = intercept[java.io.IOException](ClaimPrimitive.s3Style(
      "s3-outage", new ClaimPrimitive.S3ConditionalStore {
        def putIfNoneMatch(key: String) = 503
        def listKeys(prefix: String) = Seq.empty
      }).tryClaim("/x", -1L))
    assert(e.getMessage.contains("503"))
  }

  test("plain-gen allocation refuses a non-atomic-create scheme") {
    // an object store implements create-with-overwrite=false as
    // HEAD-then-PUT — last-writer-wins, not a claim — so plain append
    // must FAIL FAST there instead of silently risking a dropped
    // batch (callers go through appendDelta with caller-assigned
    // gens). Simulated with a local FS registered under a foreign
    // scheme, exactly how the library would meet an s3a path.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.fakeobj.impl", classOf[FakeObjectStoreFs].getName)
    val e = intercept[UnsupportedOperationException](
      DeltaIO.nextPlainGen(spark,
        s"fakeobj://${TestSpark.tmpDir("fakeobj-root")}", Seq("bigrams")))
    assert(e.getMessage.contains("fakeobj") &&
      e.getMessage.contains("appendDelta"))
  }
}

/** A local filesystem masquerading under an object-store-like scheme —
  * lets the spec exercise DeltaIO's atomic-create scheme gate without
  * a real remote store. Top-level class: Hadoop instantiates it
  * reflectively via a no-arg constructor.
  */
class FakeObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("fakeobj:///")
}
