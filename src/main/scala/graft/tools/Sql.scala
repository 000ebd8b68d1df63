package graft.tools

/** One-shot dialect runner for local iteration:
  *   sbt "runMain graft.tools.Sql <sfDir> <sql> [--explain]"
  * The FROM clause resolves against the full test-table catalog
  * (runCatalog), so any shipped query string can be pasted verbatim.
  */
object Sql {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Sql <sfDir> <sql> [--explain]")
    val dir = args(0)
    val sql = args(1)
    val spark = graft.GraftSession.create(master = "local[8]", shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.sources.Tables
    val tables = Map(
      "region" -> t.region(spark, dir), "nation" -> t.nation(spark, dir),
      "customer" -> t.customer(spark, dir), "supplier" -> t.supplier(spark, dir),
      "part" -> t.part(spark, dir), "orders" -> t.orders(spark, dir),
      "lineitem" -> t.lineitem(spark, dir), "events" -> t.events(spark, dir),
      "documents" -> t.documents(spark, dir), "embeddings" -> t.embeddings(spark, dir))
    val out = graft.sql.ZxSql.runCatalog(tables, sql)
    out.show(50, truncate = false)
    if (args.contains("--explain")) out.explain("formatted")
    spark.stop()
  }
}
