package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for the training-data pipeline operators
  * (BASELINE.json north star): tokenization, language-ID, quality scoring,
  * fingerprinting, shingling, MinHash, SimHash.
  *
  * Design rules:
  *  - everything is a composition of codegen'd built-ins (split/transform/
  *    filter/aggregate/md5) — no UDFs, so whole-stage codegen and column
  *    pruning survive, and the work distributes as a narrow map at 100 TB;
  *  - all hashing is md5-hex-based so the DuckDB oracle can reproduce results
  *    bit-for-bit (both engines emit identical lowercase hex);
  *  - integer-ratio outputs (jaccard, ratios) divide exact ints/longs in
  *    DOUBLE — deterministic across engines without rounding.
  */
object TextFunctions {

  /** Whitespace tokenization (documents are single-space word soup). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style pre-tokenizer pattern (the public BPE splitting rule):
    * contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs, then whitespace. Deliberately lookahead-free so the
    * leftmost-first match count is identical under Java regex (Spark) and
    * RE2 (DuckDB) — the cross-engine-safe subset of the original rule. */
  val BpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish token-count estimate: how many pre-tokenizer pieces the text
    * splits into — the budget-planning proxy for real tokenizer counts
    * (true BPE merges only subdivide these pieces further, so this lower
    * bound tracks linearly). One codegen'd regexp scan per row. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpePattern))

  // ------------------------------------------------------------ language id

  /** Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
    * Order matters: argmax ties resolve to the earlier language. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "los", "las", "y", "en", "que", "un", "una"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "des", "et", "un", "une", "est", "dans", "pour"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "you", "wo", "ta", "men", "zhe"))

  /** Stopword hits for one language over a token array. */
  def langScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Argmax language with first-wins tie-breaking — mirrors the CASE chain in
    * the DuckDB oracle exactly. Prefer [[langIdFromTokens]] over a
    * pre-materialized token column: inlining `tokens(text)` here re-splits
    * the text once per language score. */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  def langIdFromTokens(toks: Column): Column = {
    val scores = langStopwords.map { case (l, ws) => l -> langScore(toks, ws) }
    def pick(rest: List[(String, Column)]): Column = rest match {
      case (l, _) :: Nil => lit(l)
      case (l, s) :: tail =>
        when(tail.map { case (_, s2) => s >= s2 }.reduce(_ && _), lit(l))
          .otherwise(pick(tail))
      case Nil => lit(null)
    }
    pick(scores.toList)
  }

  /** DuckDB rendering of the same argmax (identical tie-breaking). */
  def langIdSql(textExpr: String): String = {
    def score(words: Seq[String]): String =
      s"len(list_filter(string_split($textExpr, ' '), t -> list_contains([${words.map(w => s"'$w'").mkString(",")}], t)))"
    val scores = langStopwords.map { case (l, ws) => l -> score(ws) }
    val cases = scores.toList.init.zipWithIndex.map { case ((l, s), i) =>
      val rest = scores.toList.drop(i + 1).map(_._2)
      s"WHEN ${rest.map(r => s"$s >= $r").mkString(" AND ")} THEN '$l'"
    }
    s"CASE ${cases.mkString(" ")} ELSE '${langStopwords.last._1}' END"
  }

  // -------------------------------------------------------- quality scoring

  val punctChars = ".,!?;:"

  /** punctuation chars / total chars, as an exact int ratio in DOUBLE. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, s"[$punctChars]", "")))
      .cast(DoubleType) / length(text).cast(DoubleType)

  /** english-stopword tokens / total tokens. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    langScore(toks, langStopwords.head._2).cast(DoubleType) /
      size(toks).cast(DoubleType)
  }

  /** Boolean quality gate in the C4/Gopher style: long enough, not
    * punctuation-soup, has some function words. */
  def qualityOk(text: Column): Column =
    (length(text) >= 100) && (tokenCount(text) >= 20) &&
      (punctRatio(text) <= 0.1) && (stopwordRatio(text) >= 0.01)

  // ------------------------------------------------------------- repetition

  /** Duplicate-n-gram fraction from a MATERIALIZED shingle-hash array:
    * (total − distinct) / total — exact int arithmetic, identical bits on
    * every engine; 0.0 for docs too short to have an n-gram. The Gopher
    * repetition signal (its "duplicate n-gram fraction" family). */
  def dupRatioFromShingles(hs: Column): Column =
    when(size(hs) > 0,
      (size(hs) - size(array_distinct(hs))).cast(DoubleType) /
        size(hs).cast(DoubleType))
      .otherwise(lit(0.0))

  /** Occurrences of the most frequent token — max over distinct tokens of
    * the token's count. O(distinct × n) per doc via codegen'd HOFs (docs
    * are short; no shuffle, no mode() tie-break ambiguity across engines —
    * the max COUNT is unique even when the argmax token is not). */
  def topTokenCount(toks: Column): Column =
    aggregate(array_distinct(toks), lit(0),
      (acc, t) => greatest(acc, size(filter(toks, x => x === t))))

  /** Most-frequent-token fraction of the doc (Gopher's "top word" gate). */
  def topTokenRatio(toks: Column): Column =
    when(size(toks) > 0,
      topTokenCount(toks).cast(DoubleType) / size(toks).cast(DoubleType))
      .otherwise(lit(0.0))

  // -------------------------------------------------------------- redaction

  /** Denylist scrubbing — the PII/secret-removal pass every training
    * pipeline runs before sharding, shaped as word-boundary regex
    * replacement. Each term is wrapped in `\b…\b` so `key` never bites
    * `keys` or `monkey`. A pure codegen'd narrow map (`regexp_replace`
    * chain) — zero shuffles at any scale, and the Java/RE2 subset used
    * (ASCII word boundaries, literal words) evaluates identically in the
    * DuckDB oracle. Terms are interpolated into the pattern verbatim:
    * callers pass literal words (or deliberately, regex fragments). */
  def redactTerms(text: Column, terms: Seq[String], tag: String = "<PII>"): Column =
    terms.foldLeft(text)((t, term) => regexp_replace(t, s"\\b$term\\b", tag))

  /** Occurrences a [[redactTerms]] pass would replace for one term. */
  def termCount(text: Column, term: String): Column =
    size(regexp_extract_all(text, lit(s"\\b$term\\b"), lit(0)))

  // --------------------------------------------------------- fingerprinting

  /** 64-bit content fingerprint: first 16 md5 hex chars (exact-dup key). */
  def fingerprint(text: Column): Column = substring(md5(text), 1, 16)

  // ----------------------------------------------------- shingles + minhash

  /** n-word shingles joined with a single space; empty array if the document
    * has fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast(ArrayType(StringType)))

  /** MinHash scheme: ONE md5 per shingle → 32-bit base hash → k affine
    * permutations `(a·h + b) mod P` (fixed LCG-style coefficients, P prime >
    * 2^32). Hashing cost is 1/k of the salted-md5-per-permutation approach —
    * the dominant cost of MinHash at corpus scale — and the integer
    * arithmetic is engine-portable (no 64-bit overflow: a < 2^31, h < 2^32).
    * NULL signature for shingle-less docs (mirrors list_min([]) = NULL). */
  val MinhashP: Long = 4294967311L
  val minhashCoeffs: Seq[(Long, Long)] = Seq(
    (1664525L, 1013904223L), (22695477L, 1L), (69069L, 362437L),
    (1103515245L, 12345L), (134775813L, 1L), (214013L, 2531011L),
    (16807L, 0L), (48271L, 0L))

  /** 32-bit base hash: first 8 md5 hex chars as a long. */
  def shingleHash(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast(LongType)

  /** Per-token base hashes — materialize as a column, then shingle hashes
    * and permutations are pure integer folds with no string churn. */
  def tokenHashes(toks: Column): Column = transform(toks, shingleHash _)

  /** n-gram shingle hashes via Horner combination of token hashes mod
    * [[MinhashP]] — avoids building shingle STRINGS (the allocation-heavy
    * part of shingling a corpus) and keeps every value < 2^33, so the affine
    * permutations stay overflow-free. */
  val ShingleB: Long = 1000003L
  def hashedShingles(tokHashes: Column, n: Int): Column =
    when(size(tokHashes) >= n,
      transform(sequence(lit(0), size(tokHashes) - n), i =>
        (1 until n).foldLeft(element_at(tokHashes, i + 1))((acc, j) =>
          (acc * ShingleB + element_at(tokHashes, i + j + 1)) % MinhashP)))
      .otherwise(array().cast(ArrayType(LongType)))

  /** i-th MinHash signature over a materialized base-hash array — the
    * native codegen'd loop (graft.expressions.AffineMinHash); identical
    * integer arithmetic to the `array_min(transform(...))` form. */
  def minhashFromHashes(hashes: Column, i: Int): Column = {
    val (a, b) = minhashCoeffs(i)
    graft.expressions.AffineMinHash.affine_minhash(hashes, a, b, MinhashP)
  }

  /** Band key for LSH: md5 over the concatenation of a contiguous signature
    * slice — docs sharing any band key are near-dup candidates. */
  def bandKey(sigs: Seq[Column], bandIdx: Int, rowsPerBand: Int): Column = {
    val slice = sigs.slice(bandIdx * rowsPerBand, (bandIdx + 1) * rowsPerBand)
      .map(_.cast(StringType))
    // concat (not concat_ws): a NULL signature (shingle-less doc) must
    // propagate to a NULL band key, matching SQL `||` semantics
    md5(concat(slice.flatMap(s => Seq(s, lit("|"))).dropRight(1): _*))
  }

  /** Exact Jaccard over two string arrays (distinct semantics), as an exact
    * int/int division — engine-deterministic. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val union = size(array_union(a, b)).cast(DoubleType)
    inter / union
  }

  // ---------------------------------------------------------------- simhash

  /** Per-token md5 nibble lists (4 small ints via hex `conv`) — the shared
    * input of the 16 SimHash bit-sums. ALWAYS materialize this as its own
    * projected column before calling [[simhash16FromNibbles]]: the bit-sum
    * expression references it 16 times, and Catalyst's CollapseProject keeps
    * a non-cheap multi-referenced alias in its own project, so the md5 pass
    * runs once per token instead of sixteen times. */
  def simhashNibbles(text: Column): Column =
    transform(tokens(text), t =>
      transform(sequence(lit(0), lit(3)),
        p => conv(substring(md5(t), 1, 4).substr(p + 1, lit(1)), 16, 10).cast(LongType)))

  /** 16-bit SimHash from materialized nibbles: per bit, Σ(±1) over tokens;
    * fingerprint bit = (sum > 0). One native codegen'd pass over the tokens
    * (graft.expressions.SimHash16) — the HOF composition folded the nibble
    * array sixteen times through the lambda interpreter. */
  def simhash16FromNibbles(nibbles: Column): Column =
    graft.expressions.SimHash16.simhash16(nibbles)

  /** Single-expression form — the native one-digest-per-token pass
    * (graft.expressions.SimHash16FromTokens), bit-identical to the nibble
    * composition above (spec-pinned) without its 4-md5-strings-per-token
    * HOF cost. The nibble pair stays exported for the pin itself and the
    * oracle CTE rendering. */
  def simhash16(text: Column): Column =
    graft.expressions.SimHash16.simhash16FromTokens(tokens(text))

  /** DuckDB renderings of the same SimHash, split for CTE use:
    * `simhashNibblesSql` computes the per-token nibble lists (alias it as
    * `nibs`), `simhashBitsSql` folds them to the 16-bit fingerprint. */
  def simhashNibblesSql(textExpr: String): String =
    s"list_transform(string_split($textExpr, ' '), t -> " +
      "list_transform(range(1, 5), p -> instr('0123456789abcdef', substr(md5(t), p::INT, 1)) - 1))"

  def simhashBitsSql(nibsExpr: String): String =
    (0 until 16).map { j =>
      val idx = j / 4 + 1; val shift = j % 4; val weight = 1L << j
      s"(CASE WHEN list_sum(list_transform($nibsExpr, a -> ((a[$idx] >> $shift) & 1) * 2 - 1)) > 0 THEN $weight ELSE 0 END)"
    }.mkString(" + ")
}
