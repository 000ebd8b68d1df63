package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** One-pass table profiling — the data-QA front door of a curation
  * pipeline: per-column non-null/null/distinct counts and typed bounds,
  * computed in a SINGLE aggregation job over the table (Spark plans the
  * multi-column distinct counts as one Expand + aggregate — still one
  * scan, one shuffle of partial states, never one job per column).
  *
  * The wide single-row aggregate is unpivoted to one row per column with
  * a zero-shuffle explode, so the output is the long format every
  * profiling UI expects. Engine-portable value discipline: numeric bounds
  * leave as fixed-point `floor(v·2^20)` longs, timestamp bounds as
  * formatted strings, string bounds as the raw values — nothing is
  * engine-formatted floating point.
  */
object Profile {

  /** Long-format profile: one row per listed column with
    * `(column, n_nonnull, n_null, n_distinct, min_s, max_s, min_fp,
    * max_fp)`; `_s` bounds populate for string/timestamp columns, `_fp`
    * for numerics. */
  def profile(df: DataFrame, numeric: Seq[String], strings: Seq[String],
              timestamps: Seq[String]): DataFrame =
    profileImpl(df, numeric, strings, timestamps, rsd = None)

  /** Sketch-mode [[profile]] — the shape a 100 TB profile run actually
    * takes. Exact mode's multi-column `countDistinct` plans one Expand
    * whose aggregate carries FULL distinct state per column (every
    * distinct value in flight through the shuffle); this variant swaps
    * each `n_distinct` for `approx_count_distinct` (HLL++, relative sd
    * `rsd`), whose state is a fixed few-KB register set per column — the
    * profile stays one scan + one ordinary partial-merge aggregation at
    * any cardinality, Expand-free (plan-pinned).
    *
    * Exact/approx CONTRACT: every field except `n_distinct_approx` is
    * bit-exact and engine-portable (same values as [[profile]]);
    * `n_distinct_approx` is Spark's HLL++ estimate — DETERMINISTIC for a
    * given dataset and rsd (no randomness; small cardinalities fall into
    * HLL++'s exact regime), but implementation-defined, so it has no
    * cross-engine mirror and carries ≈rsd standard error by design. */
  def profileSketch(df: DataFrame, numeric: Seq[String], strings: Seq[String],
                    timestamps: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(rsd > 0.0 && rsd < 0.4,
      s"profileSketch: rsd must be in (0, 0.4), got $rsd")
    profileImpl(df, numeric, strings, timestamps, rsd = Some(rsd))
  }

  private def profileImpl(df: DataFrame, numeric: Seq[String],
                          strings: Seq[String], timestamps: Seq[String],
                          rsd: Option[Double]): DataFrame = {
    val all = numeric ++ strings ++ timestamps
    require(all.nonEmpty, "profile: no columns listed")
    require(all.distinct.size == all.size, s"profile: duplicate columns in $all")
    def fp(c: Column) = floor(c.cast("double") * lit(1048576.0)).cast(LongType)
    val ndName = if (rsd.isDefined) "n_distinct_approx" else "n_distinct"
    def counts(c: String) = Seq(
      count(col(c)).as(s"__nn_$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nu_$c"),
      rsd.fold(countDistinct(col(c)))(r => approx_count_distinct(col(c), r))
        .as(s"__nd_$c"))
    val aggs: Seq[Column] =
      numeric.flatMap(c => counts(c) ++ Seq(
        fp(min(col(c))).as(s"__lo_$c"), fp(max(col(c))).as(s"__hi_$c"))) ++
      strings.flatMap(c => counts(c) ++ Seq(
        min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c"))) ++
      timestamps.flatMap(c => counts(c) ++ Seq(
        date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"__lo_$c"),
        date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"__hi_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    def entry(c: String, isNum: Boolean) = struct(
      lit(c).as("column"),
      col(s"__nn_$c").as("n_nonnull"), col(s"__nu_$c").as("n_null"),
      col(s"__nd_$c").as(ndName),
      (if (isNum) lit(null).cast("string") else col(s"__lo_$c")).as("min_s"),
      (if (isNum) lit(null).cast("string") else col(s"__hi_$c")).as("max_s"),
      (if (isNum) col(s"__lo_$c") else lit(null).cast(LongType)).as("min_fp"),
      (if (isNum) col(s"__hi_$c") else lit(null).cast(LongType)).as("max_fp"))
    val entries = numeric.map(entry(_, isNum = true)) ++
      (strings ++ timestamps).map(entry(_, isNum = false))
    wide.select(explode(array(entries: _*)).as("__e")).select(col("__e.*"))
  }
}
