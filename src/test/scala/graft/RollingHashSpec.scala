package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.RollingHash

/** Custom codegen expression: values pinned against an independent BigInt
  * model, exercised through both the Column API (whole-stage codegen) and
  * the registered SQL function. */
class RollingHashSpec extends AnyFunSuite {
  import SparkFixture.spark

  private val M = BigInt(2).pow(61) - 1
  private def model(s: String): Long =
    s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) => (h * 257 + (b & 0xff)) % M).toLong

  test("matches the BigInt model through codegen") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "Σ unicode ✓", "x" * 1000)
    val got = inputs.toDF("s")
      .select(RollingHash.rolling_hash(col("s"))).collect().map(_.getLong(0))
    assert(got.toSeq == inputs.map(model))
  }

  test("registered SQL function and NULL propagation") {
    RollingHash.register(spark)
    val r = spark.sql("SELECT rolling_hash('abc'), rolling_hash(CAST(NULL AS STRING))").head()
    assert(r.getLong(0) == model("abc") && r.isNullAt(1))
  }

  test("rolling property: h(s+c) = h(s)*B + c (mod 2^61-1)") {
    val s = "prefix string"
    val extended = RollingHash.mulMod(model(s), RollingHash.Base) + 'z'.toLong
    val norm = if (extended >= RollingHash.Mod) extended - RollingHash.Mod else extended
    assert(norm == model(s + "z"))
  }

  test("rolling_hash_ngrams ≡ rolling_hash over the concat_ws-joined window, all positions") {
    import spark.implicits._
    import graft.expressions.RollingHashNgrams.rolling_hash_ngrams
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "one", "", "x y z x y z x y",
      "Σ unicode ✓ mixed € tokens here now ok").toDF("text")
    val toks = split(col("text"), " ")
    for (n <- Seq(2, 3, 5)) {
      val composition = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => RollingHash.rolling_hash(concat_ws(" ", slice(toks, i, lit(n))))))
        .otherwise(array().cast("array<bigint>"))
      val rows = docs.select(rolling_hash_ngrams(toks, n).as("native"),
        composition.as("comp")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"n=$n native=${r.getSeq[Long](0)} comp=${r.getSeq[Long](1)}")
      }
      // short docs (< n tokens) yield the composition's empty array
      assert(rows.forall(r => r.getSeq[Long](0) != null))
    }
  }

  test("in_sorted_long_set ≡ array_contains over the literal set, incl. null probe") {
    import spark.implicits._
    import graft.expressions.InSortedLongSet.in_sorted_long_set
    // unsorted, duplicated set + probes around every boundary
    val set = Seq(17L, -3L, Long.MaxValue, 0L, 17L, Long.MinValue, 42L)
    val probes = Seq(Some(17L), Some(-3L), Some(18L), Some(0L), Some(1L),
      Some(Long.MaxValue), Some(Long.MinValue), Some(Long.MinValue + 1), None)
    val df = probes.toDF("x")
    val rows = df.select(
      in_sorted_long_set(col("x"), set).as("native"),
      array_contains(typedLit(set), col("x")).as("comp")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getBoolean(0) == r.getBoolean(1)),
        s"native=${r.get(0)} comp=${r.get(1)}")
    }
    // and the null probe really is null, as array_contains defines it
    assert(rows.last.isNullAt(0))
  }
}
