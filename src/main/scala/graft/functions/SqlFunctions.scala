package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions.col

/** SQL faces for the pipeline functions: `spark.sql` users get the same
  * engine surface as the Column API. Each registration builds the COMPOSED
  * Catalyst expression from the input expression via the bridge — these are
  * expression-tree rewrites, not UDFs, so they stay codegen'd and
  * optimizer-visible (pushdown/pruning still see through them). */
object SqlFunctions {

  def register(s: SparkSession): Unit = {
    def arity(name: String, exprs: Seq[_], n: Int): Unit =
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
    def reg1(name: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => {
          arity(name, exprs, 1)
          ColumnBridge.resolvedExpression(f(ColumnBridge.column(exprs(0))))
        }, "built-in")
    reg1("fingerprint", TextFunctions.fingerprint)
    reg1("simhash16", TextFunctions.simhash16)
    reg1("lang_id", TextFunctions.langId)
    reg1("quality_ok", TextFunctions.qualityOk)
    reg1("token_count", TextFunctions.tokenCount)
    reg1("quantize_int8", c => graft.operators.Similarity.quantize(c))
    // hash_bucket(key, buckets) — the deterministic sampling primitive
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash_bucket", exprs => {
        arity("hash_bucket", exprs, 2)
        val buckets = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hash_bucket buckets must be an int literal, got $other")
        }
        ColumnBridge.resolvedExpression(
          graft.operators.Corpus.hashBucket(ColumnBridge.column(exprs(0)), buckets))
      }, "built-in")
  }
}
