package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One MinHash signature: `min((h·a + b) mod m)` over an array of shingle
  * hashes, as a native codegen'd expression.
  *
  * The `array_min(transform(hs, h => (h*a + b) % m))` composition allocates
  * an intermediate array and evaluates the lambda through the HOF
  * interpreter per element — ×k signatures per document, it is the hot loop
  * of MinHash dedup at corpus scale. This generates the fused loop (no
  * allocation, no interpreter) with identical integer arithmetic, so
  * signatures are bit-identical to the HOF form and the DuckDB
  * `list_min(list_transform(...))` oracle.
  *
  * Empty array → NULL (matching `array_min([])` and `list_min([])`).
  */
case class AffineMinHash(child: Expression, a: Long, b: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "affine_minhash"
  // empty input arrays produce null even when the array itself is non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) null
    else {
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (hs.getLong(i) * a + b) % mod
        if (v < best) best = v
        i += 1
      }
      best
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $best = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $v = ($c.getLong($i) * ${a}L + ${b}L) % ${mod}L;
         |    if ($v < $best) $best = $v;
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AffineMinHash =
    copy(child = newChild)
}

object AffineMinHash {
  def affine_minhash(c: Column, a: Long, b: Long, mod: Long): Column =
    ColumnBridge.column(AffineMinHash(ColumnBridge.expression(c), a, b, mod))
}
