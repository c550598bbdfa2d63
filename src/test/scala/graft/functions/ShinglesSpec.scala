package graft.functions

import graft.TestSpark
import graft.functions.Shingles.shingles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShinglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(text: String, n: Int = 3): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(shingles(col("text"), n).as("s"))
      .as[String].collect().toSeq
  }

  test("emits sliding word n-grams, lowercased, non-letters as separators") {
    assert(run("The quick brown fox JUMPS") ==
      Seq("the quick brown", "quick brown fox", "brown fox jumps"))
    assert(run("a-b c,d e") == Seq("a b c", "b c d", "c d e"))
  }

  test("deduplicates repeated shingles within a document") {
    assert(run("x y z x y z x y z") ==
      Seq("x y z", "y z x", "z x y"))
  }

  test("short and empty documents emit nothing") {
    assert(run("only two") == Nil)
    assert(run("") == Nil)
    assert(run("!!! 123 ---") == Nil)
  }

  test("n parameter respected") {
    assert(run("a b c d", n = 2) == Seq("a b", "b c", "c d"))
    assert(run("a b c d", n = 4) == Seq("a b c d"))
  }

  test("shinglesWithCount == shingles + count() window, row for row") {
    // the generator-carried n replaced the per-doc count window in
    // jaccardPairsOf/q92/q69/ClusterIndex (r15 optimization) — pin the
    // two formulations identical on real documents, including docs
    // that emit nothing (absent from both)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    val viaGen = docs.select(col("doc_id"),
      Shingles.shinglesWithCount(col("text"), 3).as(Seq("s", "n")))
    val viaWindow = docs
      .select(col("doc_id"), shingles(col("text"), 3).as("s"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
    assert(viaGen.schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(viaGen.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaGen).count() == 0)
    assert(viaGen.count() > 0)
  }

  test("positionedShingles == posexplode(transform(...)), row for row") {
    // the generator replaced the array formulation in positionedGrams
    // (q190/q219/SpanIndex) — pin parity on real documents, including
    // duplicate grams (NOT deduplicated here: positions are payload)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    val viaGen = docs.select(col("doc_id"),
      PositionedShingles.positionedShingles(col("text"), 8)
        .as(Seq("pos", "gram")))
    val viaExpr = docs
      .select(col("doc_id"),
        expr(graft.queries.TextQueries.wordsExpr).as("ws"))
      .where(expr("size(ws) >= 8"))
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, size(ws) - 8),
             i -> array_join(slice(ws, i + 1, 8), ' '))"""))
        .as(Seq("pos", "gram")))
    assert(viaGen.exceptAll(viaExpr).count() == 0)
    assert(viaExpr.exceptAll(viaGen).count() == 0)
    assert(viaGen.count() > 0)
  }

  test("matches the wordsExpr tokenizer contract on real documents") {
    // generator shingle set == set derived from the shared words
    // expression (the two must never drift — q23/q24 vs q17-q21 share it)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val viaGen = docs.select(col("doc_id"), shingles(col("text"), 3).as("s"))
      .groupBy(col("doc_id")).agg(sort_array(collect_set(col("s"))).as("g"))
    val viaExpr = docs
      .withColumn("ws", expr(graft.queries.TextQueries.wordsExpr))
      .select(col("doc_id"), sort_array(array_distinct(expr(
        """transform(sequence(1, size(ws) - 2),
             i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1),
                         ' ', element_at(ws, i + 2)))"""))).as("e"))
    val joined = viaGen.join(viaExpr, "doc_id")
      .filter(not(col("g") === col("e")))
    assert(joined.count() == 0)
  }
}
