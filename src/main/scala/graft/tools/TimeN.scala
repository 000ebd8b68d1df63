package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Targeted registry-query timing for optimization iteration:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.TimeN <name> [<name> …]"
  * Times the NAMED SparkEntry.queries rows with exactly Bench's
  * methodology (same session settings, xxhash64-checksum evaluation so
  * every output column is computed, cleanup between runs, 3 runs,
  * median printed with the raw per-run times) — so a number here is
  * directly comparable to a BENCH_r{N} row without paying the whole
  * 300-row sweep per A/B step.
  */
object TimeN {
  private def evaluate(df: DataFrame): Unit = {
    df.select(xxhash64(df.columns.map(col): _*).as("__h"))
      .agg(expr("bit_xor(__h)")).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeN <queryName> [<queryName> …]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.register(spark)
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    catch { case _: Throwable => () }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        evaluate(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        dt
      }
      val med = times.sorted.apply(times.size / 2)
      println(f"[timen] $name%-28s median ${med}%.3f  runs ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
