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
}
