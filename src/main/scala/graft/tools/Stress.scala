package graft.tools

import org.apache.spark.sql.functions._

/** Scale-stress harness: re-runs the dedup family on a dup-concentrated
  * 10× corpus (every document gains 10 exact copies under fresh ids — the
  * adversarial case for LSH bucket sizes and for connected-components edge
  * counts). Prints one `[stress]` line per case; SURVEY §9 records the
  * round's numbers. Run AFTER any bench (never concurrently — CPU
  * contention garbles both). */
object Stress {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    val docs = graft.sources.Tables.documents(spark, dir)
    def rep(k: Int) = (0 until k)
      .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 100000000L)))
      .reduce(_ union _)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress] $name rows=$rows time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("d2b_pairs_1x") {
      graft.operators.Dedup.minhashPairs(docs, 0.5).count()
    }
    time("d2b_pairs_10x") {
      graft.operators.Dedup.minhashPairs(rep(10), 0.5).count()
    }
    time("d6_clusters_1x") {
      graft.operators.Dedup.dupClusters(
        graft.operators.Dedup.minhashPairs(docs, 0.5)).count()
    }
    time("d6_clusters_10x") {
      graft.operators.Dedup.dupClusters(
        graft.operators.Dedup.minhashPairs(rep(10), 0.5)).count()
    }
    // the distributed label-propagation loop on the same 10× graph — the
    // above routes to driver union-find (edge count ≪ threshold); this pins
    // the >threshold path's behavior at the same scale
    time("d6_clusters_10x_distributed") {
      graft.operators.Dedup.dupClusters(
        graft.operators.Dedup.minhashPairs(rep(10), 0.5),
        maxDriverEdges = 0L).count()
    }
    // the arbitrary-id (surrogate dictionary) path on the same 10× graph:
    // global sort + zipWithIndex over paired ids + two dictionary joins on
    // top of d6 — the overhead band to watch is ~1.2-1.5× plain d6
    time("d6b_clusters_str_10x") {
      val p = graft.operators.Dedup.minhashPairs(rep(10), 0.5)
        .select(format_string("doc_%012d", col("id_a")).as("id_a"),
          format_string("doc_%012d", col("id_b")).as("id_b"))
      graft.operators.Dedup.dupClusters(p).count()
    }
    // value-space-bounded simhash pairs: candidates over ≤2^16 distinct
    // hashes; the 10× dup corpus multiplies same-hash groups ×10 (output-
    // bound growth), not the candidate quadratic
    time("d3_simhash_10x") {
      graft.operators.Dedup.simhashPairs(rep(10), maxHamming = 1).count()
    }
    spark.stop()
  }
}
