package graft.sinks

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("export lays out split=/lang= partitions and the manifest is a receipt") {
    val out = TestSpark.tmpDir("corpus-export")
    val docs = Tables(spark, dir).documents
      .withColumn("split",
        expr(graft.queries.PipelineQueries.splitExprSpark))
    val manifest = CorpusExport.export(docs, out).cache()

    // hive layout on disk
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("split=train", "split=held_out"))

    // the receipt matches an independent recount of the INPUT
    val want = docs.groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = manifest.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(6), r.getLong(7))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (nDocs, nFiles, nBytes)) =>
      assert(nDocs == want(k), s"docs for $k")
      assert(nFiles >= 1 && nBytes > 0, s"files for $k")
    }

    // a split+lang predicate prunes to ONE partition's files at scan
    val k = want.keySet.head
    val pruned = spark.read.parquet(out)
      .where(col("split") === k._1 && col("lang") === k._2)
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty)
    val seen = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(d => (d.values.getString(0), d.values.getString(1))).toSet
    assert(seen == Set(k), s"pruned listing saw partitions $seen")
    assert(pruned.count() == want(k))

    // the in-file doc_id sort actually lands (a bare doc_id
    // sortWithinPartitions would be eliminated by the planner's own
    // partition-column sort — the sort must LEAD with split, lang)
    val aFile = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .filter(_.toString.endsWith(".parquet")).findFirst().get().toString
    import spark.implicits._
    val ids = spark.read.parquet(aFile).select("doc_id").as[Long].collect()
    assert(ids.sameElements(ids.sorted), s"file $aFile not doc_id-sorted")
    manifest.unpersist()
  }

  test("compaction consolidates shards without changing rows or layout") {
    val frag = TestSpark.tmpDir("corpus-frag")
    val compacted = TestSpark.tmpDir("corpus-compact")
    val docs = Tables(spark, dir).documents
      .withColumn("split",
        expr(graft.queries.PipelineQueries.splitExprSpark))
    // fragment: tiny shard bound → many small files per partition
    CorpusExport.write(docs, frag, "overwrite", maxRecordsPerFile = 20)
    def files(root: String) = java.nio.file.Files
      .walk(java.nio.file.Paths.get(root))
      .filter(_.toString.endsWith(".parquet")).count()
    val nFrag = files(frag)
    val manifest = CorpusExport.compact(spark, frag, compacted)
    val nCompact = files(compacted)
    assert(nFrag > nCompact,
      s"expected consolidation, got $nFrag -> $nCompact files")
    // same rows, same hive layout, receipt matches the input recount
    val back = spark.read.parquet(compacted)
      .select(docs.columns.map(col): _*)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    val want = docs.groupBy("split", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = manifest.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("jsonl export round-trips rows, partitions, and gzips shards") {
    val out = TestSpark.tmpDir("corpus-jsonl")
    val docs = Tables(spark, dir).documents
      .withColumn("split",
        expr(graft.queries.PipelineQueries.splitExprSpark))
      .select(col("doc_id"), col("text"), col("lang"), col("split"))
    CorpusExport.writeJsonl(docs, out)

    // hive layout + gzip'd JSONL shards on disk
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("split=train", "split=held_out"))
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .toArray.map(_.toString)
    assert(files.nonEmpty && files.forall(_.endsWith(".json.gz")), files.head)

    // read back: every row survives with identical content (the json
    // reader recovers the hive partition columns)
    val back = spark.read.json(out)
      .select(col("doc_id"), col("text"), col("lang"), col("split"))
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)

    // and a split+lang predicate partition-prunes the jsonl scan too
    val pruned = back.where(col("split") === "train" && col("lang") === "en")
    assert(pruned.count() ==
      docs.where(col("split") === "train" && col("lang") === "en").count())
  }
}
