package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: a join keyed on a pathologically hot key gets
  * its oversized partition split at runtime. This is the engine's answer
  * to key skew at 100 TB — no manual salting needed when AQE can split;
  * salting (SkewAndSketchSpec) remains for skewed AGGREGATIONS.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows on ONE key vs 2k spread over 200 keys
      val big = spark.range(200000).select(
        when($"id" % 100 === 0, ($"id" % 200).cast("long")
          + 1000L).otherwise(7L).as("k"),
        concat(lit("payload-payload-payload-"), $"id").as("pay"))
      val small = spark.range(2000)
        .select(($"id" % 200).cast("long").as("k"), $"id".as("v"))
      // reference `pay` downstream so column pruning can't strip it from
      // the shuffle — the skew detector works on shuffle block sizes
      val joined = big.join(small, "k")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"),
          max(length($"pay")).as("maxlen"))
      val result = joined.collect().head

      val plan = joined.queryExecution.executedPlan
      val finalPlan = plan.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(plan)
      assert(finalPlan.toString.contains("skew=true"),
        s"expected a skew-split join in:\n$finalPlan")

      // correctness under the split: the 198000 hot rows (k=7) each join
      // the 10 small rows with k=7; the 2000 decoy rows carry keys
      // 1000/1100, which the small side doesn't have
      val expectedN = 198000L * 10
      assert(result.getLong(0) == expectedN)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
