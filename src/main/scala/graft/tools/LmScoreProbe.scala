package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch A/B for the lmscore formulation crossover (VERDICT r14 #7):
  * literal-map fold (O(tableSize) probe per bigram position) vs the
  * joined form (explode + 2 BHJ + regroup) at growing model sizes — NOT
  * part of the driver contract; feeds the auto-route threshold in
  * ZxSql.compileLmScore (4096, measured r15). Kept as the measurement
  * record behind OPTIMIZATION_r15.md. */
object LmScoreProbe {
  private def evaluate(df: DataFrame): Unit = {
    df.select(xxhash64(df.columns.map(col): _*).as("__h"))
      .agg(expr("bit_xor(__h)")).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus)
    val docs = graft.sources.Tables.documents(spark, dir)
    val ref = docs.filter(col("lang") === "en")
    spark.range(1000).selectExpr("sum(id)").collect()
    val uniReal = graft.operators.Corpus.topUnigrams(ref, k = 100000)
    val bigReal = graft.operators.Corpus.topBigrams(ref, k = 100000)
    println(s"[lmprobe] corpus has uni=${uniReal.size} big=${bigReal.size}")
    // the synthetic corpus maxes out at ~931 real bigrams; pad the table
    // with never-matching entries to probe the literal fold's O(tableSize)
    // scan at production model sizes (misses scan the WHOLE map — the
    // padded entries change no output value, only the probe cost)
    for (k <- Seq(931, 2000, 5000, 20000)) {
      val uni = uniReal
      val big = bigReal ++ (bigReal.size until k).map(i => (s"zzz_pad_$i zz", 1L))
      println(s"[lmprobe] k=$k actual uni=${uni.size} big=${big.size}")
      for ((name, mk) <- Seq(
        "literal" -> (() => graft.operators.Corpus.lmScore(docs, uni, big)),
        "joined " -> (() => graft.operators.Corpus.lmScoreJoined(docs, uni, big)))) {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          evaluate(mk())
          val dt = (System.nanoTime() - t0) / 1e9
          System.gc()
          dt
        }
        println(f"[lmprobe] k=$k $name median ${ts.sorted.apply(1)}%.3f  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}
