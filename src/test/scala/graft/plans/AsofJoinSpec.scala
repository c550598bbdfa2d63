package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of exec must (1) plan as two shuffles + two sorts +
  * one AsofJoinExec, (2) agree with the composed window formulation
  * (q29) on the real events table, and (3) get the edge cases right:
  * unmatched left rows drop, ties take the latest right row, candidates
  * never leak across keys.
  */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("edge cases on a hand-built dataset") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l-before-any-right"),
      (1L, 25L, "l-matches-20"),
      (1L, 30L, "l-matches-30-tie"),
      (2L, 100L, "l-key-without-rights"),
      (3L, 5L, "l-matches-equal-time")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 20L, "r20"),
      (1L, 30L, "r30a"),
      (1L, 30L, "r30b"), // tie on (k, t): later sort-order row wins
      (3L, 5L, "r5"),
      (4L, 1L, "r-unseen-key")
    ).toDF("k", "t", "name")
    val out = Asof.join(left, right, "k", "k", "t", "t")
      .select(col("tag"), col("name")).as[(String, String)]
      .collect().toMap
    assert(out == Map(
      "l-matches-20" -> "r20",
      "l-matches-30-tie" -> "r30b",
      "l-matches-equal-time" -> "r5"))
  }

  test("plans one AsofJoinExec and matches q29's composed window form") {
    val t = graft.Tables(spark, dir)
    // packed (micros, id) total order so tie resolution is deterministic
    // and identical to the window form's (ts, event_id) ordering
    val packed = (unix_micros(col("ts")) - lit(1704067200000000L)) *
      lit(1048576L) + col("event_id")
    val errors = t.events.where(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("ets"), packed.as("et"))
    val clicks = t.events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cuser"),
        col("ts").as("cts"), packed.as("ct"))
    val joined = Asof.join(errors, clicks, "user_id", "cuser", "et", "ct")

    // AQE wraps the plan in AdaptiveSparkPlanExec, so match the plan
    // string rather than collecting node instances
    assert(joined.queryExecution.executedPlan.toString
      .contains("AsofJoin"), "expected an AsofJoinExec in the plan")

    val got = joined
      .select(col("error_id"), col("user_id"), col("click_id"),
        ((unix_micros(col("ets")) - unix_micros(col("cts"))) / 1000000.0)
          .as("gap_seconds"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = graft.SparkEntry.queries("q29_asof_join")(spark, dir)
      .select(col("error_id"), col("user_id"), col("click_id"),
        col("gap_seconds"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want, "native as-of exec diverged from the window form")
  }

  test("matches a brute-force as-of on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    // duplicate (k, t) pairs on both sides, sparse keys, unmatched rows
    val left = Seq.fill(400)((rnd.nextInt(12).toLong,
      rnd.nextInt(50).toLong, rnd.nextInt(100000)))
      .toDF("k", "t", "id")
    val rightRows = Seq.fill(250)((rnd.nextInt(15).toLong,
      rnd.nextInt(50).toLong, rnd.alphanumeric.take(6).mkString))
    val right = rightRows.toDF("rk", "rt", "name")
    val got = graft.plans.Asof.join(left, right, "k", "rk", "t", "rt")
      .groupBy(col("k"), col("t"), col("id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // brute force: a left row matches iff ANY right row with the same
    // key is at-or-before it (which right row wins is tie-dependent, so
    // compare the matched left-row set, and that each appears once)
    val byKey = rightRows.groupBy(_._1)
    val want = left.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter { case (k, t, _) =>
        byKey.getOrElse(k, Nil).exists(_._2 <= t) }.toSet
    assert(got == want)
  }

  test("answer is invariant to the shuffle partition count") {
    import spark.implicits._
    val left = Seq.tabulate(500)(i => (i % 7L, i.toLong, i))
      .toDF("k", "t", "id")
    val right = Seq.tabulate(300)(i => (i % 11L, i * 2L, s"r$i"))
      .toDF("k", "t", "name")
    def run(): Set[(Int, String)] =
      Asof.join(left, right, "k", "k", "t", "t")
        .select(col("id"), col("name")).as[(Int, String)].collect().toSet
    val base = run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(run() == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(base.nonEmpty)
  }
}
