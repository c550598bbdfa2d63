package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink breadth beyond parquet: the engine's results round-trip
  * through CSV, JSON-lines and text sinks losslessly (the reference's
  * only formats were whole-file text in and space-delimited text out —
  * these are engine extensions, SURVEY §2.5).
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def wordCounts = {
    SparkEntry.queries("q17_doc_wordcount")(spark, "/root/testdata/sf0.001")
      .orderBy(col("word"))
  }

  test("csv sink/source round-trip preserves rows and schema") {
    val out = TestSpark.tmpDir("csv-rt")
    val df = wordCounts
    df.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(df.schema).csv(out)
    assert(back.orderBy(col("word")).collect().toSeq ==
      df.collect().toSeq)
  }

  test("json-lines sink/source round-trip preserves rows") {
    val out = TestSpark.tmpDir("json-rt")
    val df = wordCounts
    df.write.mode("overwrite").json(out)
    val back = spark.read.schema(df.schema).json(out)
    assert(back.orderBy(col("word")).collect().toSeq ==
      df.collect().toSeq)
  }

  test("orc sink/source round-trip preserves rows and schema") {
    val out = TestSpark.tmpDir("orc-rt")
    val df = wordCounts
    df.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    // file sources surface every column nullable — compare names/types
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy(col("word")).collect().toSeq ==
      df.collect().toSeq)
  }

  test("events.ts normalizes to TimestampType whatever the file encodes") {
    // the driver has regenerated events.parquet with different physical
    // encodings across rounds (TIMESTAMP(NANOS) → nanos-as-long,
    // timestamp[us] → TIMESTAMP_NTZ); Tables.events must absorb all of
    // them, or every unix_micros()/window query breaks at analysis
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val ev = Tables(spark, s"/root/testdata/$sf").events
      assert(ev.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"$sf: events.ts is ${ev.schema("ts").dataType}")
      assert(ev.select(unix_micros(col("ts"))).limit(1).count() == 1)
    }
  }

  test("text sink writes the reference's 'key value' line format") {
    val out = TestSpark.tmpDir("text-rt")
    wordCounts
      .select(concat_ws(" ", col("word"), col("n_occurrences")))
      .coalesce(1).write.mode("overwrite").text(out)
    val lines = spark.read.text(out).collect().map(_.getString(0))
    assert(lines.nonEmpty)
    assert(lines.forall(_.matches("\\S+ \\d+")))
  }
}
