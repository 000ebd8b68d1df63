package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector primitives over `array<float>` columns — pure
  * higher-order-function compositions (zip_with/aggregate), codegen'd, no
  * UDFs. All arithmetic is promoted to DOUBLE and folded strictly
  * left-to-right; the DuckDB mirrors use `list_reduce` with the same fold
  * order, so dot products agree bit-for-bit across engines ((0+x1)+x2+… ≡
  * (x1+x2)+… in IEEE because 0+x = x). */
object VectorFunctions {

  def toDouble(a: Column): Column = transform(a, x => x.cast(DoubleType))

  /** Left-fold dot product in DOUBLE — the native codegen'd expression
    * (graft.expressions.DotProduct); same fold, bit-identical results to
    * [[dotHof]] and to the DuckDB `list_reduce` mirror. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.DotProduct.dot_product(a, b)

  /** The higher-order-function formulation (interpreted lambdas) — kept as
    * the independent reference implementation the native expression is
    * pinned against in tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH bucket: bit d = (v[d] > 0), giving 2^bits buckets. The
    * cheapest useful LSH for unit vectors — deterministic, engine-portable,
    * and a real partition key at scale (bucket = shuffle key, so ANN probes
    * touch one partition). */
  def signBucket(a: Column, bits: Int): Column =
    (0 until bits).map { d =>
      when(element_at(a, d + 1) > lit(0f), lit(1L << d)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic ±1 matrix for [[randomProject]]: cell (j,i) is the low
    * bit of an integer avalanche (xorshift-multiply) of the flat index —
    * no RNG state, so every executor, every run, and the SQL mirror all
    * hold the exact same matrix as plan literals. */
  def projSigns(dim: Int, p: Int): Seq[Seq[Double]] =
    (0 until p).map { j =>
      (0 until dim).map { i =>
        var x = (j.toLong * dim + i) + 0x9E3779B97F4A7C15L
        x ^= x >>> 16; x *= 0x85EBCA6BL; x ^= x >>> 13
        x *= 0xC2B2AE35L; x ^= x >>> 16
        if ((x & 1L) == 0L) 1.0 else -1.0
      }
    }

  /** Johnson-Lindenstrauss sign random projection to `signs.size` output
    * dims — the dimensionality-reduction step ahead of ANN indexing (a
    * 64→8 projection cuts index bytes AND probe arithmetic 8× while JL
    * keeps relative distances). One narrow codegen'd map per row: each
    * output dim is the same left-fold the dot products use, against a ±1
    * literal row of [[projSigns]] — no shuffle, no join, streams
    * unchanged. */
  def randomProject(a: Column, signs: Seq[Seq[Double]]): Column =
    array(signs.map { sj =>
      aggregate(zip_with(toDouble(a), typedLit(sj), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
    }: _*)

  // ------------------------------------------------------------ SQL mirrors

  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (acc, x) -> acc + x)"

  def cosineSql(a: String, b: String, dim: Int): String =
    s"(${dotSql(a, b, dim)} / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)})))"

  def signBucketSql(a: String, bits: Int): String =
    (0 until bits).map(d => s"(CASE WHEN $a[${d + 1}] > 0 THEN ${1L << d} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** One SQL expression per output dim of [[randomProject]] — the matrix
    * rows ride as list literals, the fold is the [[dotSql]] shape. */
  def projectSql(a: String, signs: Seq[Seq[Double]]): Seq[String] =
    signs.map { sj =>
      val lits = sj.map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      s"list_reduce(list_transform(range(1, ${sj.size + 1}), i -> $a[i]::DOUBLE * ($lits)[i]), (acc, x) -> acc + x)"
    }
}
