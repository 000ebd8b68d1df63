package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All n-token window hashes of a token array in ONE native pass —
  * element i is [[RollingHash]] of the STRING `tok(i) ⧺ " " ⧺ … ⧺
  * tok(i+n-1)` (single-space joined), bit-identical to
  * `rolling_hash(concat_ws(" ", slice(toks, i+1, n)))` because the hash
  * runs over exactly the bytes that join would produce — without ever
  * materializing the span strings.
  *
  * Exists for the span-mining count pass ([[graft.operators.Corpus
  * .repeatedSpansHashed]]): the composition form allocates one n-token
  * STRING per window position (≈ n × the corpus text, the allocation
  * bill of shingling at 100 TB) only to hash-and-discard it. Here the
  * per-window work reads token bytes in place. Windows shorter than n
  * don't exist (fewer than n tokens → empty array, matching the
  * composition's `when(size >= n, …) otherwise array()` guard).
  *
  * Null tokens inside the array are impossible from `split()` and
  * rejected loudly (a silent skip would diverge from concat_ws, which
  * DROPS nulls — better to fail than to hash differently). */
case class RollingHashNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 2 && n <= 1024, s"rolling_hash_ngrams: n must be in 2..1024, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHashNgrams.windowHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.RollingHashNgrams.windowHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashNgrams =
    copy(child = newChild)
}

object RollingHashNgrams {
  import RollingHash.{Mod, Base, mulMod}

  /** Shared by the interpreted path and generated Java (house rule: one
    * helper, the two paths can never drift). */
  def windowHashes(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var h = 0L
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        require(t != null,
          "rolling_hash_ngrams: null token (concat_ws would drop it; refusing to hash differently)")
        if (j > 0) { // the single joining space, exactly as concat_ws writes it
          h = mulMod(h, Base) + ' '.toInt
          if (h >= Mod) h -= Mod
        }
        h = hashInto(h, t)
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fold a UTF8String's bytes into a running [[RollingHash]] state —
    * byte-for-byte what [[RollingHash.hashBytes]] does over the
    * concatenated span. */
  private def hashInto(h0: Long, s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = h0
    var i = 0
    while (i < bytes.length) {
      h = mulMod(h, Base) + (bytes(i) & 0xff)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  /** Column API face. */
  def rolling_hash_ngrams(toks: Column, n: Int): Column =
    ColumnBridge.column(RollingHashNgrams(ColumnBridge.expression(toks), n))
}
