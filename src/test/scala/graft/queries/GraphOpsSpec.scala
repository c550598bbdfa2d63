package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic nets for the series/graph operators beyond the single-dataset
  * oracle gate: the distributed formulations must agree with tiny
  * brute-force re-implementations on the same inputs (the oracle proves
  * ONE dataset; these prove the algebra on the gate data via an
  * independent O(n²)/O(n³) path).
  */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q96 skyline == brute-force dominance filter") {
    val parts = graft.Tables(spark, dir).part
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = parts.filter { case (_, pp, ps) =>
      !parts.exists { case (_, qp, qs) =>
        qp <= pp && qs >= ps && (qp < pp || qs > ps)
      }
    }.map(_._1).toSet
    val got = SparkEntry.queries("q96_skyline")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got == brute)
  }

  test("q100 triangle count == brute-force enumeration") {
    val li = graft.Tables(spark, dir).lineitem
      .where(col("l_quantity") >= 40)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size)
        yield (ps(i), ps(j))
    }.toSet
    val adj = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    val brute = edges.toSeq.map { case (a, b) =>
      // third vertex above b keeps each triangle counted once
      adj.getOrElse(a, Set.empty).count(c => c > b && edges((b, c)))
    }.sum
    val row = SparkEntry.queries("q100_triangles")(spark, dir).collect().head
    assert(row.getAs[Long]("n_edges") == edges.size)
    assert(row.getAs[Long]("n_triangles") == brute)
  }

  test("q101 ranks form a probability distribution and match power iteration") {
    val e0 = {
      val li = graft.Tables(spark, dir).lineitem
        .where(col("l_quantity") >= 40)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      li.groupBy(_._1).values.flatMap { grp =>
        val ps = grp.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- (i + 1) until ps.size)
          yield (ps(i), ps(j))
      }.toSet
    }
    val sym = e0.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val out = sym.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    val n = out.size
    var p = out.keys.map(_ -> BigDecimal(1.0 / n)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    for (_ <- 1 to 3) {
      val contrib = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => p(src) / out(src).size }.sum
      }
      p = out.keys.map(v => v -> BigDecimal(0.15 / n + 0.85 * contrib(v))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    }
    val want = p.toSeq.sortBy { case (v, r) => (-r, v) }.take(20)
    val got = SparkEntry.queries("q101_pagerank")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // sequential double sums can differ from Spark's partial-agg order
    // by an ulp before the 9-digit round; compare at 1e-8
    assert(got.map(_._1).toSeq == want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-8)
    }
    // total mass over ALL vertices stays ~1 (symmetric graph: no
    // dangling leakage beyond rounding)
    assert(math.abs(p.values.sum - 1.0) < 1e-4)
  }

  test("q106 sketch path emits all-pass error flags") {
    val rows = SparkEntry.queries("q106_rolling_hll")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("ok_est") == 1,
      s"${r.getString(0)}: HLL estimate outside 5% of exact"))
  }
}
