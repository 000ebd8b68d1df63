package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: prints the formatted physical plan of selected
  * queries and greps for the properties that matter at scale — pushed
  * filters, pruned read schemas, broadcast joins, whole-stage codegen. */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else
      Seq("t1_time_scan", "a8_window", "o1_top_groups", "j1_revenue_nation",
        "q1_pricing", "s1_knn", "s4_ivf_knn", "d2b_minhash_pairs",
        "d3_simhash_pairs", "d6_dup_clusters", "c1_curate", "m3_mm_frames")
    val spark = graft.GraftSession.create(master = "local[4]", shufflePartitions = 4)
    names.foreach { n =>
      println(s"\n================= $n =================")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
