package graft.sinks

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted decontamination index must (a) reproduce EXACTLY the
  * in-query q56 contamination report when probed with the full train
  * split — the index round-trip can't change a count or ratio,
  * (b) keep append-then-probe ≡ full rebuild (the incremental-
  * maintenance contract shared with DedupIndex/TextIndex), and
  * (c) push gram point-lookups into the postings scan.
  */
class ContamIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def splitDocs(split: String) =
    Tables(spark, dir).documents
      .withColumn("split",
        expr(graft.queries.PipelineQueries.splitExprSpark))
      .where(col("split") === split)
      .select(col("doc_id"), col("text"))

  private lazy val indexDir = {
    val out = TestSpark.tmpDir("contam-index")
    ContamIndex.build(splitDocs("held_out"), out)
    out
  }

  test("probe(full train) == the in-query q56 report") {
    val got = ContamIndex.probe(spark, indexDir, splitDocs("train"))
      .orderBy(col("doc_id")).collect().toSeq
    val want = SparkEntry.queries("q56_decontamination")(spark, dir)
      .orderBy(col("doc_id")).collect().toSeq
    assert(got == want)
  }

  test("append-then-probe == probe over a full rebuild") {
    val held = splitDocs("held_out").localCheckpoint()
    val first = held.where(col("doc_id") % 2 === 0)
    val second = held.where(col("doc_id") % 2 === 1)
    val incDir = TestSpark.tmpDir("contam-index-inc")
    ContamIndex.build(first, incDir)
    ContamIndex.append(second, incDir)
    val batch = splitDocs("train").limit(40).localCheckpoint()
    assert(
      ContamIndex.probe(spark, incDir, batch)
        .orderBy(col("doc_id")).collect().toSeq ==
      ContamIndex.probe(spark, indexDir, batch)
        .orderBy(col("doc_id")).collect().toSeq)
    // compaction changes the file layout, never an answer
    val cDir = TestSpark.tmpDir("contam-index-compacted")
    ContamIndex.compact(spark, incDir, cDir)
    assert(
      ContamIndex.probe(spark, cDir, batch)
        .orderBy(col("doc_id")).collect().toSeq ==
      ContamIndex.probe(spark, incDir, batch)
        .orderBy(col("doc_id")).collect().toSeq)
  }

  test("gram point-lookups push down into the postings scan") {
    val g = spark.read.parquet(s"$indexDir/postings")
      .limit(2).collect().map(_.getString(0)).toSeq
    val scan = spark.read.parquet(s"$indexDir/postings")
      .where(col("g").isin(g: _*))
      .queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get
    assert(scan.dataFilters.nonEmpty, "gram filter must reach the scan")
    assert(scan.metadata("PushedFilters").contains("In(g"),
      s"expected In(g, ...) pushed, got ${scan.metadata("PushedFilters")}")
    val rows = ContamIndex.probeGrams(spark, indexDir, g).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) >= 1L))
  }
}
