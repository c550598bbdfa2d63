package graft

import org.scalatest.funsuite.AnyFunSuite

/** Same-engine determinism net: every declared query, run twice at
  * sf0.001, must produce identical normalized output. Catches unstable
  * LIMIT tiebreaks, partition-order-dependent aggregates, and
  * timing-dependent state — the failure class the DuckDB oracle can
  * only catch when the two engines happen to break ties differently.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def fingerprint(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    val cols = df.columns.sorted
    // NUL separator: a bare concat would let adjacent-column splits
    // ("ab","c" vs "a","bc") fingerprint identically
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("\u0000"))
      .sorted.mkString("\n")
  }

  test("every query's output is identical across two runs") {
    val diffs = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      if (fingerprint(name) == fingerprint(name)) None else Some(name)
    }
    assert(diffs.isEmpty, s"nondeterministic queries: ${diffs.mkString(", ")}")
  }

  test("every query's output is invariant to the shuffle partition count") {
    // the 1000-executor property: answers must not depend on
    // parallelism (catches raw double-sum ordering, per-partition
    // limits, anything keyed on physical partition ids)
    val conf = "spark.sql.shuffle.partitions"
    val base = spark.conf.get(conf)
    val diffs = try {
      SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        spark.conf.set(conf, base)
        val a = fingerprint(name)
        spark.conf.set(conf, "7")
        if (a == fingerprint(name)) None else Some(name)
      }
    } finally spark.conf.set(conf, base)
    assert(diffs.isEmpty,
      s"parallelism-dependent queries: ${diffs.mkString(", ")}")
  }
}
