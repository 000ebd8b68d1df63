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

object SimHash16 {
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
