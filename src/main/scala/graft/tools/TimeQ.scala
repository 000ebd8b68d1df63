package graft.tools

/** Head-to-head SQL timing for local perf iteration:
  *   sbt "runMain graft.tools.TimeQ <sfDir> <sql1> [<sql2> …]"
  * Each statement runs 3× against the full test-table catalog (count()
  * action); prints per-run seconds. Complements Bench (whole-registry,
  * artifact-writing) for single-query A/B comparisons.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQ <sfDir> <sql> [<sql> …]")
    val dir = args(0)
    val spark = graft.GraftSession.create(master = "local[8]", shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.sources.Tables
    val tables = Map(
      "region" -> t.region(spark, dir), "nation" -> t.nation(spark, dir),
      "customer" -> t.customer(spark, dir), "supplier" -> t.supplier(spark, dir),
      "part" -> t.part(spark, dir), "orders" -> t.orders(spark, dir),
      "lineitem" -> t.lineitem(spark, dir), "events" -> t.events(spark, dir),
      "documents" -> t.documents(spark, dir), "embeddings" -> t.embeddings(spark, dir))
    spark.range(1000).selectExpr("sum(id)").collect() // session warmup
    args.drop(1).zipWithIndex.foreach { case (sql, i) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.sql.ZxSql.runCatalog(tables, sql).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] q$i%d: ${times.map(x => f"$x%.3f").mkString(" ")}  |  $sql")
    }
    spark.stop()
  }
}
