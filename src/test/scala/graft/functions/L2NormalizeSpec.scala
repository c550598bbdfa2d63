package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native l2_normalize expression must be BIT-identical to the
  * higher-order-function formulation it replaced — every similarity
  * query's oracle hash rides on the produced doubles.
  */
class L2NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val lambda = """transform(embedding,
    x -> cast(x as double) /
         sqrt(aggregate(embedding, 0D,
           (a, y) -> a + cast(y as double) * cast(y as double))))"""

  test("expression == lambda fold, bit-for-bit, over the real fixture") {
    val rows = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        expr("l2_normalize(embedding)").as("a"),
        expr(lambda).as("b"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val a = r.getSeq[Double](1)
      val b = r.getSeq[Double](2)
      assert(a.length == 64 && b.length == 64)
      a.zip(b).zipWithIndex.foreach { case ((x, y), j) =>
        assert(java.lang.Double.doubleToLongBits(x) ==
          java.lang.Double.doubleToLongBits(y),
          s"vec ${r.getLong(0)} dim $j: $x vs $y")
      }
      // and the result really is unit-norm
      val n = math.sqrt(a.map(v => v * v).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("float and double inputs, zero vectors, and null elements") {
    import spark.implicits._
    // float input (the parquet fixture is float[]; here explicit)
    val f = Seq((1L, Array(3.0f, 4.0f))).toDF("id", "embedding")
      .select(expr("l2_normalize(embedding)").as("v"))
      .collect().head.getSeq[Double](0)
    assert(f == Seq(0.6, 0.8))
    // double input
    val d = Seq((1L, Array(3.0d, 4.0d))).toDF("id", "embedding")
      .select(expr("l2_normalize(embedding)").as("v"))
      .collect().head.getSeq[Double](0)
    assert(d == Seq(0.6, 0.8))
    // zero vector: 0/0 — the same NaN the lambda yields (never a crash)
    val z = Seq((1L, Array(0.0f, 0.0f))).toDF("id", "embedding")
      .select(expr("l2_normalize(embedding)").as("v"))
      .collect().head.getSeq[Double](0)
    assert(z.forall(_.isNaN))
    // a null element nulls the ROW's result (the DotProduct posture)
    val n = Seq((1L, Array[java.lang.Float](1.0f, null)))
      .toDF("id", "embedding")
      .select(expr("l2_normalize(embedding)").as("v"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("interpreted eval matches codegen (the two execution paths)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val in = new GenericArrayData(Array(1.0d, 2.0d, 2.0d))
    val out = L2Normalize(Literal(in, ArrayType(DoubleType)))
      .eval(null).asInstanceOf[ArrayData].toDoubleArray()
    assert(out.toSeq == Seq(1.0 / 3, 2.0 / 3, 2.0 / 3))
  }
}
