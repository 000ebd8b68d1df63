package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 16-bit SimHash from per-token md5 nibble lists, as one native pass.
  *
  * The expression-composition form folds the nibble array SIXTEEN times
  * (one interpreted `aggregate` per bit). This walks the tokens once,
  * updating all 16 ±1 counters per token, then assembles the fingerprint —
  * identical integer arithmetic, so fingerprints stay bit-identical to the
  * composition and to the DuckDB `list_sum(list_transform(...))` oracle.
  *
  * Input: `array<array<bigint>>` — 4 nibbles (md5 hex digits 1-4) per
  * token, the [[graft.functions.TextFunctions.simhashNibbles]] shape.
  * Empty token list → fingerprint 0 (all bit-sums are 0, no bit set),
  * matching the composition's behavior.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(LongType, _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<array<bigint>>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash16.fromNibbles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash16.fromNibbles($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** 16-bit SimHash STRAIGHT from the token array — one native pass that
  * md5-hashes each token once (MessageDigest over the raw UTF-8 bytes) and
  * feeds the same ±1 bit-sums as [[SimHash16]].
  *
  * Exists because the nibble-materializing composition
  * ([[graft.functions.TextFunctions.simhashNibbles]] → [[SimHash16]]) pays
  * for its oracle-portability in the hot path: the nibble pass is a nested
  * `transform` HOF — interpreted lambda calls, four md5 STRING renderings
  * per token (`md5()` SQL returns lowercase hex, then substring/conv
  * re-parse it) and an allocated array<array<long>> per row. Here the
  * digest's first TWO BYTES are used directly — md5 hex digit k IS nibble
  * k of the digest bytes, so fingerprints are bit-identical to the
  * composition and to the DuckDB replay (spec-pinned), at one digest and
  * zero string/array materialization per token.
  *
  * Input: `array<string>` whitespace tokens ([[TextFunctions.tokens]]).
  * Null tokens inside the array are skipped (split() never produces them;
  * defensive). Empty array → 0, like the composition. */
case class SimHash16FromTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash16.fromTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash16.fromTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16FromTokens =
    copy(child = newChild)
}

object SimHash16 {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Shared by [[SimHash16FromTokens]]'s interpreted path and its generated
    * Java. md5's first 4 hex digits map to digest bytes 0-1: hex digit k is
    * the (high, low)-alternating nibble of byte k/2 — the exact values the
    * nibble composition feeds [[fromNibbles]], in the exact bit order. */
  def fromTokens(toks: ArrayData): Long = {
    val digest = md5.get()
    val sums = new Array[Long](16)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        digest.reset()
        val d = digest.digest(
          toks.getUTF8String(t).getBytes)
        // nibbles in md5-hex order: d0 = hex[0], d1 = hex[1], …
        val nib = Array[Long]((d(0) >> 4) & 0xF, d(0) & 0xF,
          (d(1) >> 4) & 0xF, d(1) & 0xF)
        var j = 0
        while (j < 16) {
          val bit = (nib(j / 4) >> (j % 4)) & 1L
          sums(j) += bit * 2L - 1L
          j += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 16) {
      if (sums(j) > 0L) fp |= 1L << j
      j += 1
    }
    fp
  }

  def simhash16FromTokens(tokens: Column): Column =
    ColumnBridge.column(SimHash16FromTokens(ColumnBridge.expression(tokens)))

  /** Shared by the interpreted path and generated Java (same trick as
    * RollingHash.hashBytes) — the two can never drift. */
  def fromNibbles(nibbles: ArrayData): Long = {
    val sums = new Array[Long](16)
    val n = nibbles.numElements()
    var t = 0
    while (t < n) {
      val nibs = nibbles.getArray(t)
      var j = 0
      while (j < 16) {
        val bit = (nibs.getLong(j / 4) >> (j % 4)) & 1L
        sums(j) += bit * 2L - 1L
        j += 1
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 16) {
      if (sums(j) > 0L) fp |= 1L << j
      j += 1
    }
    fp
  }

  def simhash16(nibbles: Column): Column =
    ColumnBridge.column(SimHash16(ColumnBridge.expression(nibbles)))
}
