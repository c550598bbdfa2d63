package graft

/** Dev utility: print the formatted physical plan of one or all queries
  * (operator tree + scan details) for shuffle/pushdown/broadcast review.
  *
  * usage: runMain graft.Plans [queryName] [sfDir]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-plans", "8")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val names = args.headOption match {
      case Some(n) if n != "ALL" => Seq(n)
      case _ => SparkEntry.queries.keys.toSeq.sorted
    }
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, dir)
      // queryExecution gives the plan without executing
      println(df.queryExecution.executedPlan.treeString.take(4000))
    }
    spark.stop()
  }
}
