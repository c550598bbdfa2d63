package graft
object ShufBudget {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("shuf-budget", "4")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, dir).queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      println(s"""BUDGET "$name" -> $n,""")
    }
    spark.stop()
  }
}
