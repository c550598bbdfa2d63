package graft.sinks

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[FreezeManifest]] pins: a committed version carries the literal
  * oracle-gated q200/q279 rows plus the index audit; meta is the
  * commit marker ([[FreezeManifest.latest]] skips torn freezes);
  * versions are immutable (a second freeze allocates, never patches);
  * and the meta arithmetic restates the verdict relation.
  */
class FreezeManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("freeze commits versioned reports with meta as the marker") {
    val out = TestSpark.tmpDir("freeze-manifest")
    val idx = TestSpark.tmpDir("freeze-dedup")
    DedupIndex.build(spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")), idx)

    val v1 = FreezeManifest.write(spark, dir, out,
      Map("DedupIndex" -> idx))
    assert(v1 == 1L && FreezeManifest.latest(spark, out) == 1L)
    val m = FreezeManifest.read(spark, out)
    val img = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy(df.columns.map(col): _*).collect()
        .map(_.toString).toSeq

    // verdicts/health are the LITERAL gated queries
    assert(img(m("verdicts")) == img(graft.SparkEntry
      .queries("q279_curation_closeout")(spark, dir)))
    assert(img(m("health")) == img(graft.SparkEntry
      .queries("q200_corpus_health")(spark, dir)))
    assert(m.contains("audit"))

    // meta restates the verdict relation
    val meta = m("meta").collect().head
    val verd = m("verdicts").collect()
    val nShip = verd.count(r =>
      r.getString(r.fieldIndex("verdict")) == "ship")
    assert(meta.getLong(0) == 1L &&
      meta.getLong(1) == verd.length &&
      meta.getLong(2) == nShip &&
      meta.getLong(3) == verd.length - nShip,
      s"meta row must restate the verdicts: $meta")

    // a second freeze allocates v2 and leaves v1 byte-identical
    val v1Rows = img(m("verdicts"))
    val v2 = FreezeManifest.write(spark, dir, out)
    assert(v2 == 2L && FreezeManifest.latest(spark, out) == 2L)
    assert(img(FreezeManifest.read(spark, out, version = 1L)("verdicts"))
      == v1Rows, "a committed version must be immutable")
    assert(!FreezeManifest.read(spark, out).contains("audit"),
      "v2 carried no index dirs, so no audit relation")

    // a torn freeze (data, no meta) is invisible to latest/read
    new java.io.File(s"$out/v=3/health").mkdirs()
    assert(FreezeManifest.latest(spark, out) == 2L,
      "latest must skip versions without the meta commit marker")
  }
}
