package graft.sinks

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF index must (a) serve EXACTLY the answers the
  * in-query q48 plan computes — build/search round-tripping through
  * parquet can't change a single rank or rounded cosine — and (b) lay
  * postings out hive-partitioned by cell so a probe's scan prunes to
  * its cells at the source.
  */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val indexDir = {
    val out = TestSpark.tmpDir("ivf-index")
    VectorIndex.build(
      Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding")),
      out, k = 16)
    out
  }

  test("search over the persisted index == the in-query q48 answers") {
    val queries = Tables(spark, dir).embeddings
      .where(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    val got = VectorIndex
      .search(spark, indexDir, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    val want = SparkEntry.queries("q48_ann_ivf")(spark, dir)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("incremental append serves the same answers as a full rebuild") {
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val out = TestSpark.tmpDir("ivf-index-inc")
    // the first 300 ids include all 16 centroid vectors, so the
    // quantizer is identical to the full build's
    VectorIndex.build(emb.where(col("vec_id") < 300), out, k = 16)
    VectorIndex.append(spark, out, emb.where(col("vec_id") >= 300))
    val queries = emb.where(col("vec_id") < 10)
    val got = VectorIndex.search(spark, out, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    val want = VectorIndex
      .search(spark, indexDir, queries, nprobe = 2, topK = 3)
      .orderBy(col("qid"), col("rk")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("postings are cell-partitioned and a cell filter prunes the scan") {
    val cells = new java.io.File(s"$indexDir/postings").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cells.length > 1, s"expected hive cell dirs, got ${cells.toSeq}")
    val scan = spark.read.parquet(s"$indexDir/postings")
      .where(col("cell") === 3)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scan.nonEmpty)
    // partition filter reached the file source: only cell=3's files
    assert(scan.head.partitionFilters.nonEmpty,
      "cell filter did not reach the scan as a partition filter")
  }
}
