package graft

/** SQL entry point: run an ad-hoc SQL statement against the test tables
  * with the graft extensions (fnv1a, …) loaded.
  *
  * usage: runMain graft.Sql "<statement>" [sfDir]
  */
object Sql {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Sql \"<statement>\" [sfDir]")
    val stmt = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local("graft-sql", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val t = Tables(spark, dir)
    Seq("region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings)
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }
    spark.sql(stmt).show(100, truncate = false)
    spark.stop()
  }
}
