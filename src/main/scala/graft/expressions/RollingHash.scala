package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin polynomial rolling hash of a string's UTF-8 bytes:
  * `h = Σ b_i · B^(n-1-i)  (mod 2^61 − 1)`, base B = 257.
  *
  * A native Catalyst `Expression` with `doGenCode`, so it fuses into
  * whole-stage codegen like a built-in — no UDF serialization, no codegen
  * fence in the middle of a 100 TB scan. The rolling property
  * (`h(s[1..n]) = (h(s[0..n-1]) − b_0·B^(n-1))·B + b_n`) is what MinHash
  * shingles and content-defined chunking want that md5 can't give: O(1)
  * window slides instead of O(window) re-hashes.
  *
  * The interpreted path ([[nullSafeEval]]) and the generated code share the
  * same static helper so the two can never drift.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Mersenne prime 2^61 − 1: reduction is two shifts+adds, no division. */
  final val Mod: Long = (1L << 61) - 1
  final val Base: Long = 257L

  /** Called from both the interpreted path and generated Java. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulMod(h, Base) + (bytes(i) & 0xff)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  /** (a·b) mod (2^61−1) without overflow, via 128-bit split multiply. */
  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product into 61 bits: value = hi·2^64 + lo;
    // 2^64 ≡ 2^3 (mod 2^61−1) and lo = lo61 + loTop·2^61 with 2^61 ≡ 1
    var r = (lo & Mod) + (lo >>> 61) + (hi << 3 & Mod) + (hi >>> 58)
    while (r >= Mod) r -= Mod
    r
  }

  /** Column API face. */
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  /** Register as SQL function `rolling_hash(expr)` in a session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
}
