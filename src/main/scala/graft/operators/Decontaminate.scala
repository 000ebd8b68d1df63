package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Benchmark decontamination: flag training documents sharing word n-grams
  * with an evaluation/benchmark set — the step every LLM training pipeline
  * runs so eval answers don't leak into the training corpus (the classic
  * recipe is 13-gram overlap; the n is a parameter here).
  *
  * Scale (100 TB corpus, small benchmark — the realistic asymmetry):
  *  - the benchmark's distinct shingle-hash set is computed once and is
  *    tiny (eval suites are MBs, not TBs) — AQE broadcasts it, so the
  *    corpus side never shuffles to find its hits;
  *  - corpus shingles are 64-bit hashes, exploded AFTER per-doc
  *    array_distinct — the join moves longs, never n-gram text;
  *  - the only full shuffle is the per-doc hit count, keyed on doc_id.
  * Everything is built-in codegen'd expressions (md5-derived integer
  * hashing shared with the MinHash family, same constants both engines).
  */
object Decontaminate {

  /** Per-corpus-doc overlap report vs the benchmark slice: n-gram count,
    * hit count, and the contamination verdict (any ≥ minHits shared
    * n-grams). `benchPred` splits one table into benchmark vs corpus;
    * a two-table variant is the same plan with the filters dropped.
    *
    * Plan shape: ONE pass over the corpus (shingle → explode_outer →
    * broadcast-probe → count per doc, with n_shingles riding the grouping
    * key — no second corpus scan to recover it), plus one scan of the
    * (filtered, tiny) benchmark slice to build the broadcast set. */
  def overlapReport(docs: DataFrame, benchPred: Column, shingleN: Int = 5,
                    minHits: Int = 1, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    def shingled(pred: Column) = docs.filter(pred)
      .select(col(idCol), tokenHashes(tokens(col(textCol))).as("__th"))
      .select(col(idCol), array_distinct(hashedShingles(col("__th"), shingleN)).as("__sh"))
    // explicit broadcast, not AQE inference: a benchmark set is small BY
    // DEFINITION (eval suites are MBs against a TB corpus) and the hint
    // keeps the corpus side shuffle-free even on a cold-stats first run
    // explode_OUTER + null-filter on the generator OUTPUT, not a plain
    // explode: InferFiltersFromGenerate would synthesize `size(sh) > 0`
    // under a non-outer explode, and predicate pushdown then inlines the
    // whole shingle pipeline into that filter — recomputing the md5 pass
    // per element_at in interpreted mode (a measured 30× blowup). The
    // outer variant infers nothing; the null row is dropped post-generate.
    val bench = broadcast(shingled(benchPred)
      .select(explode_outer(col("__sh")).as("__h"))
      .filter(col("__h").isNotNull).distinct()
      .withColumn("__hit", lit(1)))
    // explode_outer keeps shingle-less docs (they report 0 hits); per-doc
    // arrays are distinct'd so a hit counts once per doc
    shingled(!benchPred)
      .select(col(idCol), size(col("__sh")).as("n_shingles"),
        explode_outer(col("__sh")).as("__h"))
      .join(bench, Seq("__h"), "left")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(count(col("__hit")).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }

  /** The decontaminated corpus: input rows minus benchmark rows minus
    * contaminated rows — what actually ships to training. */
  def clean(docs: DataFrame, benchPred: Column, shingleN: Int = 5,
            minHits: Int = 1, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val bad = overlapReport(docs, benchPred, shingleN, minHits, textCol, idCol)
      .filter(col("contaminated")).select(col(idCol))
    docs.filter(!benchPred).join(bad, Seq(idCol), "left_anti")
  }

  /** Plan-resident benchmark budget for the streaming probe: 2^20 hashes
    * (8 MB of longs) rides comfortably as a literal array in every task;
    * a set past it belongs on the batch broadcast-join path instead. */
  private val MaxStreamBenchHashes = 1 << 20

  /** Collect the benchmark slice's distinct shingle hashes to the driver —
    * the one-time prep for [[overlapStream]]/[[cleanStream]]. Bounded by
    * [[MaxStreamBenchHashes]] so a mis-scoped "benchmark" fails loudly
    * before the collect is attempted (count first, collect after). */
  def benchShingleSet(docs: DataFrame, benchPred: Column, shingleN: Int = 5,
                      textCol: String = "text"): Seq[Long] = {
    val hashes = docs.filter(benchPred)
      .select(explode(array_distinct(hashedShingles(
        tokenHashes(tokens(col(textCol))), shingleN))).as("__h"))
      .distinct()
    val n = hashes.count()
    require(n <= MaxStreamBenchHashes,
      s"benchShingleSet: $n distinct benchmark shingles exceeds the " +
        s"plan-literal budget of $MaxStreamBenchHashes (8 MB) — use the " +
        "batch overlapReport/clean broadcast path for benchmarks this large")
    hashes.collect().map(_.getLong(0)).toSeq.sorted
  }

  /** Ingest-time decontamination verdicts — the STATELESS streaming face of
    * [[overlapReport]]: per-doc distinct-shared-shingle count via
    * `array_intersect` against the driver-held benchmark set (same verdict
    * arithmetic as the batch explode/join/count, spec-pinned equal), zero
    * aggregation state, so it runs on an unbounded source with any sink.
    * At 100 TB/day this flags leaks at WRITE time instead of re-scanning
    * the stored corpus nightly. */
  def overlapStream(stream: DataFrame, benchHashes: Seq[Long], shingleN: Int = 5,
                    minHits: Int = 1, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(benchHashes.size <= MaxStreamBenchHashes,
      s"overlapStream: ${benchHashes.size} benchmark hashes exceeds the " +
        s"plan-literal budget of $MaxStreamBenchHashes")
    stream
      .select(col(idCol), array_distinct(hashedShingles(
        tokenHashes(tokens(col(textCol))), shingleN)).as("__sh"))
      .select(col(idCol), size(col("__sh")).as("n_shingles"),
        size(array_intersect(col("__sh"), typedLit(benchHashes))).cast("long")
          .as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }

  /** The shippable stream: rows whose shared-shingle count stays below
    * `minHits` — [[clean]]'s verdict, applied as one narrow filter with the
    * caller's columns untouched. */
  def cleanStream(stream: DataFrame, benchHashes: Seq[Long], shingleN: Int = 5,
                  minHits: Int = 1, textCol: String = "text"): DataFrame = {
    require(benchHashes.size <= MaxStreamBenchHashes,
      s"cleanStream: ${benchHashes.size} benchmark hashes exceeds the " +
        s"plan-literal budget of $MaxStreamBenchHashes")
    stream.filter(size(array_intersect(
      array_distinct(hashedShingles(tokenHashes(tokens(col(textCol))), shingleN)),
      typedLit(benchHashes))) < minHits)
  }
}
