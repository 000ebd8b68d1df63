package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

/** The 100 TB alternates: sketch-based aggregates must land near their exact
  * counterparts, and ANN must recover most of the exact top-k. */
class ApproxSpec extends AnyFunSuite {
  import SparkFixture.spark

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct (HLL) within 5% of exact count_distinct") {
    val ev = Tables.events(spark, dir)
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact <= 0.05)
  }

  test("percentile_approx within 2% of exact percentile") {
    val ev = Tables.events(spark, dir)
    val r = ev.agg(
      percentile(col("value"), lit(0.5)).as("exact"),
      percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx")).head()
    assert(math.abs(r.getDouble(1) - r.getDouble(0)) / r.getDouble(0) <= 0.02)
  }

  test("IVF ANN: self is rank 1; probe set recovers most of exact top-10") {
    val emb = Tables.embeddings(spark, dir)
    val exact = Similarity.bruteForceKnn(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfKnn(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0))
    assert(ivf.head == 0L)                       // query's own vector first
    // trained centroids (2 Lloyd iterations): most of the exact top-10
    // survives probing only 2 of 16 cells
    assert((ivf.toSet & exact).size >= 7)
  }

  test("int8-quantized kNN recovers most of the exact top-10 with bounded score error") {
    val emb = Tables.embeddings(spark, dir)
    val exact = Similarity.bruteForceKnn(emb, 0L, 10)
      .select(col("vec_id"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val quant = Similarity.quantizedKnn(emb, 0L, 10)
      .select(col("vec_id"), col("qcos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(quant.head._1 == 0L, "self must stay rank 1 after quantization")
    assert((quant.map(_._1).toSet & exact.keySet).size >= 8,
      "int8 codes should preserve the exact top-10 almost entirely")
    for ((id, qc) <- quant if exact.contains(id))
      assert(math.abs(qc - exact(id)) <= 0.02,
        s"vec $id: quantized cos $qc drifted from exact ${exact(id)}")
  }

  test("IVF centroids round-trip through parquet bit-exactly") {
    val emb = Tables.embeddings(spark, dir)
    val trained = Similarity.ivfTrain(emb, nlist = 8, iters = 1)
    val path = java.nio.file.Files.createTempDirectory("graft-cent").toString + "/cents"
    Similarity.writeCentroids(spark, trained, path)
    val back = Similarity.readCentroids(spark, path)
    assert(back == trained)
    val a1 = Similarity.assignCells(emb, trained).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Similarity.assignCells(emb, back).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2)
  }

  test("embedding stats: counts partition the table, norm bounds ordered, no degenerate vectors") {
    val rows = SparkEntry.queries("s7_embed_stats")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == Tables.embeddings(spark, dir).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("min_norm") <= r.getAs[Double]("mean_norm") + 1e-9)
      assert(r.getAs[Double]("mean_norm") <= r.getAs[Double]("max_norm") + 1e-9)
      assert(r.getAs[Double]("min_norm") > 0) // fixture embeddings are non-degenerate
      assert(r.getAs[Long]("n_near_zero") == 0L)
    }
  }

  test("misconfigured centroid budgets fail loudly before any driver collect") {
    val emb = Tables.embeddings(spark, dir)
    // 1M-centroid train: even at dim=1 this busts the 2^20-slot budget —
    // the require fires BEFORE the seed collect (no Spark job runs)
    val eTrain = intercept[IllegalArgumentException] {
      Similarity.ivfTrain(emb, nlist = 1 << 21)
    }
    assert(eTrain.getMessage.contains("centroid doubles exceeds"))
    // assignment against an over-wide literal centroid set: nlist x dim
    // would serialize 16 MB of literals into every task
    val wide = (0 until 1024).map(c => c -> Seq.fill(2048)(0.5)).toSeq
    val eAssign = intercept[IllegalArgumentException] {
      Similarity.assignCells(emb, wide)
    }
    assert(eAssign.getMessage.contains("assignCells"))
    // the boundary itself is fine: nlist * dim == 2^20 exactly passes the
    // require (budget is inclusive), one more slot fails it — pin both
    // sides of the constant with cheap lazy frames (no job runs; the
    // require fires/passes at plan-build time)
    val dimAt = 1 << 10 // 1024 centroids x 1024 dims == 2^20 slots
    val atBudget = (0 until 1024).map(c => c -> Seq.fill(dimAt)(0.0)).toSeq
    Similarity.assignCells(emb, atBudget) // must not throw
    val overBudget = (0 until 1025).map(c => c -> Seq.fill(dimAt)(0.0)).toSeq
    val eOver = intercept[IllegalArgumentException] {
      Similarity.assignCells(emb, overBudget)
    }
    assert(eOver.getMessage.contains("assignCells"))
    // small sanity case still assigns fine
    Similarity.assignCells(emb, Seq(0 -> Seq.fill(8)(0.1), 1 -> Seq.fill(8)(-0.1)))
  }

  test("cell-partitioned IVF index: probe prunes partitions and matches ivfKnn") {
    val emb = Tables.embeddings(spark, dir)
    val cents = Similarity.ivfTrain(emb, nlist = 16, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString + "/idx"
    Similarity.ivfWriteIndex(emb, cents, path)
    val q = emb.filter(col("vec_id") === 0L)
      .select(graft.functions.VectorFunctions.toDouble(col("embedding")))
      .head().getSeq[Double](0).toIndexedSeq
    val probed = Similarity.ivfProbeIndex(spark, path, cents, q, k = 10)
    // planning-time partition pruning, not a post-scan filter
    val p = probed.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"probe must prune cell partitions:\n$p")
    val viaIndex = probed.select("vec_id").collect().map(_.getLong(0)).toSeq
    val direct = Similarity.ivfKnn(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(viaIndex == direct, "index probe must equal the direct IVF query")
  }

  test("PQ: one-pass training is partition-deterministic; ADC+rerank recovers the exact top-10") {
    val emb = Tables.embeddings(spark, dir)
    val books = Similarity.pqTrain(emb, m = 16, ksub = 16, iters = 1)
    assert(books.size == 16 && books.forall(_.forall(_._2.size == 4)))
    // fixed-point sums make training invariant to physical partitioning —
    // the property that keeps codebooks stable across executor counts
    assert(Similarity.pqTrain(emb.repartition(7), m = 16, ksub = 16, iters = 1) == books)
    // every code is a surviving cell of its own subspace's codebook
    val codes = Similarity.pqEncode(emb, books)
      .select(explode(col("codes"))).distinct().collect().map(_.getInt(0)).toSet
    assert(codes.subsetOf(books.flatMap(_.map(_._1)).toSet))
    // ADC shortlist=100 + exact re-rank == brute force, rank for rank
    val exact = Similarity.bruteForceKnn(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val rr = Similarity.pqKnn(emb, books, 0L, k = 10, shortlist = 100)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(rr == exact, s"rerank $rr != exact $exact")
    // pure ADC (16-byte codes, no rerank) still recovers most of top-10
    val adc = Similarity.pqKnn(emb, books, 0L, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((adc & exact.toSet).size >= 6, s"ADC-only recall too low: $adc")
  }

  test("IVF-PQ: probe prunes cell partitions, self is rank 1, recall matches plain IVF's") {
    val emb = Tables.embeddings(spark, dir)
    val cents = Similarity.ivfTrain(emb, nlist = 16, iters = 2)
    val books = Similarity.ivfPqTrain(emb, cents, m = 16, ksub = 16, iters = 1)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString + "/idx"
    Similarity.ivfPqWriteIndex(emb, cents, books, path)
    // the stored table carries exactly the compressed layout: codes + cell
    val idx = spark.read.parquet(path)
    assert(idx.columns.toSet == Set("vec_id", "label", "embedding", "cell", "codes"))
    val q = emb.filter(col("vec_id") === 0L)
      .select(graft.functions.VectorFunctions.toDouble(col("embedding")))
      .head().getSeq[Double](0).toIndexedSeq
    val probed = Similarity.ivfPqProbe(spark, path, cents, books, q, k = 10)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"probe must prune cell partitions at planning time:\n$plan")
    val got = probed.select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got.head == 0L, "self must be rank 1")
    // the exact re-rank means IVF-PQ can only lose vs plain IVF through
    // ADC shortlist misses; at shortlist=100 over 2 cells it matches the
    // uncompressed probe's recall
    val exact = Similarity.bruteForceKnn(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfKnn(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((got.toSet & exact).size >= (ivf & exact).size - 1,
      s"IVF-PQ recall ${(got.toSet & exact).size} fell behind IVF ${(ivf & exact).size}")
  }

  test("PQ with a full-corpus shortlist is EXACT on random vectors (re-rank subsumes ADC error)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 300
    val vecs = Seq.tabulate(n)(i => (i.toLong, "l" + i % 3,
      Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
    val emb = vecs.toDF("vec_id", "label", "embedding")
    // iters=2 exercises the one-pass trainer's multi-iteration loop
    val books = Similarity.pqTrain(emb, m = 4, ksub = 16, iters = 2)
    val exact = Similarity.bruteForceKnn(emb, 7L, 25)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val got = Similarity.pqKnn(emb, books, 7L, k = 25, shortlist = n)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == exact,
      "shortlist=corpus makes ADC ordering irrelevant; any mismatch is a re-rank bug")
  }

  test("PQ misconfigurations fail loudly before any job") {
    val emb = Tables.embeddings(spark, dir)
    assert(intercept[IllegalArgumentException](
      Similarity.pqTrain(emb, m = 7)).getMessage.contains("subspaces"))
    assert(intercept[IllegalArgumentException](
      Similarity.pqTrain(emb, m = 16, ksub = 1 << 17)).getMessage
      .contains("centroid doubles exceeds"))
    val books = Similarity.pqTrain(emb, m = 4, ksub = 16, iters = 0)
    assert(intercept[IllegalArgumentException](
      Similarity.pqKnn(emb, books, 0L, k = 10, shortlist = 5)).getMessage
      .contains("shortlist"))
  }

  test("sign-LSH ANN keeps the query's bucket only") {
    val emb = Tables.embeddings(spark, dir)
    val got = Similarity.annSignLsh(emb, 0L, k = 5, bits = 4)
    assert(got.select("bucket").distinct().count() == 1)
    assert(got.head().getAs[Long]("vec_id") == 0L)
  }

  test("batched LSH and batched ADC return the same top-k sets as their single-query forms") {
    val emb = Tables.embeddings(spark, dir)
    val qids = Seq(0L, 1L, 2L)
    val lshBatch = Similarity.batchAnnSignLsh(emb, qids, k = 10, bits = 4)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val books = Similarity.pqTrain(emb, m = 16, ksub = 16, iters = 1)
    val adcBatch = Similarity.pqBatchKnn(emb, books, qids, k = 10)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val lshBatch5 = Similarity.batchAnnSignLsh(emb, qids, k = 10, bits = 4, probes = 5)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    for (q <- qids) {
      val lshOne = Similarity.annSignLsh(emb, q, k = 10, bits = 4)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(lshBatch(q) == lshOne, s"batched LSH diverged for query $q")
      // multi-probe parity: the hamming-1 widening picks the same buckets
      // in the same bit order as the single-query form
      val lshOne5 = Similarity.annSignLsh(emb, q, k = 10, bits = 4, probes = 5)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(lshBatch5(q) == lshOne5, s"batched multi-probe LSH diverged for query $q")
      val adcOne = Similarity.pqKnn(emb, books, q, k = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(adcBatch(q) == adcOne, s"batched ADC diverged for query $q")
    }
    // batch economics must survive the optimizer: ONE corpus pass means the
    // per-query fan-out happens via explode, and the per-query top-k stays
    // a WindowGroupLimit (≤ k rows per query leave each partition)
    val plan = Similarity.pqBatchKnn(emb, books, qids, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
    // a query id absent from the corpus fails loudly
    assert(intercept[IllegalArgumentException](
      Similarity.pqBatchKnn(emb, books, Seq(0L, -1L), k = 10)).getMessage
      .contains("query ids"))
  }

  test("s10 recall audit: full spine, exact denominators, IVF recall at least LSH's") {
    val rows = SparkEntry.queries("s10_recall_audit")(spark, dir).collect()
    assert(rows.length == 18, "6 methods x 3 query ids")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 10L)
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0L && ov <= 10L)
    }
    val byMethod = rows.groupBy(_.getAs[String]("method"))
      .map { case (m, rs) => m -> rs.map(_.getAs[Long]("n_overlap")).sum }
    assert(byMethod.keySet ==
      Set("s2_lsh", "s2_lsh5", "s4_ivf", "s8_pq", "s9_ivfpq", "s11_proj"))
    // structural expectations, not tuned thresholds: the partition-pruned
    // exact probes (IVF, IVF-PQ w/ re-rank) must not lose to the
    // compressed/bucketed ones they subsume, and widening the probe set
    // can only add candidates
    assert(byMethod("s4_ivf") >= byMethod("s2_lsh"))
    assert(byMethod("s9_ivfpq") >= byMethod("s8_pq"))
    assert(byMethod("s2_lsh5") >= byMethod("s2_lsh"))
  }

  test("multi-probe LSH widens the candidate set and never loses recall") {
    val emb = Tables.embeddings(spark, dir)
    val exact = Similarity.bruteForceKnn(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    def recall(probes: Int): Int = {
      val got = Similarity.annSignLsh(emb, 0L, k = 10, bits = 4, probes = probes)
      assert(got.select("bucket").distinct().count() <= probes)
      (got.select("vec_id").collect().map(_.getLong(0)).toSet & exact).size
    }
    val r1 = recall(1); val r5 = recall(5)
    assert(r5 >= r1)
    assert(r5 >= 5, s"hamming-1 probing should recover most of top-10, got $r5")
    assertThrows[IllegalArgumentException](
      Similarity.annSignLsh(emb, 0L, k = 5, bits = 4, probes = 6))
  }

  test("MMR re-rank: equal weights demote a near-duplicate below a diverse candidate") {
    import spark.implicits._
    // q = v0 = e_x. v1 ≈ v2 near-parallel high-relevance pair; v3 diverse
    // (orthogonal-ish component). At step 2 every candidate's only picked
    // neighbor is the query itself, so sim == rel and the score ordering
    // equals the relevance ordering → v1. At step 3 with relW = divW:
    // v2's score = (rel2 − sim12)/2 < 0 (near-parallel to v1) while v3's
    // = (rel3 − rel3)/2 = 0 → the DIVERSE v3 jumps the more-relevant v2.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.98f, 0.199f, 0.0f), 1),
      (2L, Array(0.97f, 0.2431f, 0.0f), 2),
      (3L, Array(0.8f, 0.0f, 0.6f), 3))
      .toDF("vec_id", "embedding", "label")
    val diverse = Similarity.mmrRerank(emb, queryId = 0L, k = 4, shortlist = 4,
      relWeight = 0.5, divWeight = 0.5)
      .collect().map(r => r.getLong(1)).toSeq
    assert(diverse == Seq(0L, 1L, 3L, 2L), s"got $diverse")
    // with no diversity pressure the pure-relevance order comes back
    val plain = Similarity.mmrRerank(emb, queryId = 0L, k = 4, shortlist = 4,
      relWeight = 1.0, divWeight = 0.0)
      .collect().map(r => r.getLong(1)).toSeq
    assert(plain == Seq(0L, 1L, 2L, 3L), s"got $plain")
  }

  test("batched MMR: per-query trajectories bit-identical to solo runs; one-pass plan; loud misses") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val batch = Similarity.mmrRerankBatch(emb, Seq(3L, 11L), k = 5, shortlist = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    for (qid <- Seq(3L, 11L)) {
      val solo = Similarity.mmrRerank(emb, qid, k = 5, shortlist = 20)
        .collect()
        .map(r => (qid, r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      assert(batch.filter(_._1 == qid).toSeq == solo.toSeq,
        s"batched MMR diverged from solo mmrRerank for query $qid")
    }
    // the shortlist builder is one corpus pass: per-query rank group-limits
    // before the single exchange; only the corpus + the tiny broadcast
    // query block are scanned
    val plan = Similarity.mmrShortlists(emb, Seq(3L, 11L), 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).length <= 2,
      s"expected at most 2 parquet scans (corpus + query block):\n$plan")
    // a query id absent from the corpus fails loudly, naming it
    assert(intercept[IllegalArgumentException](
      Similarity.mmrRerankBatch(emb, Seq(3L, -99L), k = 5, shortlist = 20))
      .getMessage.contains("-99"))
  }
}
