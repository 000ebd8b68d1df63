package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ir._

/** Compiles the reference's aggregates (lib.rs:560-732) to Catalyst `Column`
  * compositions — every one stays inside whole-stage codegen with map-side
  * partial aggregation; no UDF, no custom physical operator (SURVEY §4).
  *
  * Reference semantics reproduced exactly:
  *  - every aggregate is weighted by `__sample_rate` (default 1 when the
  *    column/value is absent — lib.rs:563-566);
  *  - Sum treats a missing value as 0 (`unwrap_or("0")`, lib.rs:566-572);
  *  - Count sums the sample rate over rows where the column is present
  *    (lib.rs:608-623);
  *  - CountDistinct counts NULL as one extra distinct bucket (lib.rs:626-635)
  *    — unlike ANSI COUNT(DISTINCT);
  *  - Mean is the sample-rate-weighted mean (lib.rs:637-657, golden value
  *    571.428… in test.rs:452).
  *
  * Documented divergences (SURVEY §7.4): empty-input Max/Min return NULL, not
  * f64::MIN/MAX (lib.rs:578, 593); values that fail numeric parse become NULL
  * via try_cast instead of panicking (lib.rs:566-572 parse().unwrap()).
  *
  * P50/Raw/Heatmap are declared but `unimplemented!()` in the reference
  * (lib.rs:659-661); we implement P50 as exact `percentile` here, and
  * Raw/Heatmap at the pipeline level (Compiler.scala).
  */
object Aggregates {

  val SampleRateCol = "__sample_rate" // lib.rs:58

  /** Weight = coalesce(__sample_rate, 1). If the dataset has no sample-rate
    * column at all, the weight is the literal 1 and Catalyst folds the
    * multiplications away — unweighted data pays nothing. */
  def weight(schema: StructType): Column =
    if (schema.fieldNames.contains(SampleRateCol))
      coalesce(col(SampleRateCol).try_cast(DoubleType), lit(1.0))
    else lit(1.0)

  /** Numeric view of a column: parse-on-demand for string storage
    * (lib.rs:566-572), pass-through for native numerics. */
  def numeric(column: String, schema: StructType): Column = {
    val c = col(column)
    schema.fields.find(_.name == column).map(_.dataType) match {
      case Some(_: NumericType) => c.cast(DoubleType)
      case _                    => c.try_cast(DoubleType)
    }
  }

  /** Compile one Select to an aliased aggregate Column. */
  def compile(sel: Select, schema: StructType): Column = {
    val w = weight(schema)
    val v = numeric(sel.column, schema)
    val present = col(sel.column).isNotNull
    val agg: Column = sel.agg match {
      case Agg.Sum   => coalesce(sum(w * coalesce(v, lit(0.0))), lit(0.0))
      case Agg.Max   => max(v)
      case Agg.Min   => min(v)
      case Agg.Count => coalesce(sum(when(present, w).otherwise(lit(0.0))), lit(0.0))
      case Agg.CountDistinct =>
        countDistinct(col(sel.column)) +
          coalesce(max(when(present, lit(0L)).otherwise(lit(1L))), lit(0L))
      case Agg.Mean =>
        try_divide(sum(when(present, w * v).otherwise(lit(0.0))),
                   sum(when(present, w).otherwise(lit(0.0))))
      case Agg.P50 => percentile(v, lit(0.5))
      case Agg.Raw | Agg.Heatmap =>
        throw new IllegalArgumentException(
          s"${sel.agg.name} is handled at the pipeline level, not as an aggregate")
    }
    agg.as(sel.key)
  }

  def compileAll(sels: Seq[Select], schema: StructType): Seq[Column] =
    sels.map(compile(_, schema))
}
