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
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nu_$c"))
    def aggsWithNd(nd: String => Option[Column]): Seq[Column] = {
      def block(c: String, lo: Column, hi: Column) =
        counts(c) ++ nd(c).toSeq ++ Seq(lo.as(s"__lo_$c"), hi.as(s"__hi_$c"))
      numeric.flatMap(c => block(c, fp(min(col(c))), fp(max(col(c))))) ++
        strings.flatMap(c => block(c, min(col(c)), max(col(c)))) ++
        timestamps.flatMap(c => block(c,
          date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss"),
          date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss")))
    }
    val wide = rsd match {
      case Some(r) =>
        // sketch mode: HLL++ state is a fixed register set per column, so
        // every aggregate rides ONE ordinary partial-merge pass — Expand-free
        val aggs = aggsWithNd(c =>
          Some(approx_count_distinct(col(c), r).as(s"__nd_$c")))
        df.agg(aggs.head, aggs.tail: _*)
      case None =>
        // exact mode, Expand-free (r15): multiple countDistinct columns in
        // one agg plan an Expand that replays EVERY input row once per
        // column through the aggregate (|columns|× the rows in flight, full
        // distinct state through one exchange). Instead each column's exact
        // distinct runs as its OWN two-phase sub-aggregation — partial
        // dedup map-side, only distinct values cross the wire — and the
        // non-distinct counts/bounds share one ordinary pass. The 1-row
        // results crossJoin back into the wide row; the subtrees are
        // independent, so the scheduler runs their stages concurrently in
        // the one action, and each scan prunes to a single column.
        val aggs = aggsWithNd(_ => None)
        val base = df.agg(aggs.head, aggs.tail: _*)
        all.foldLeft(base) { (acc, c) =>
          acc.crossJoin(df.select(col(c))
            .agg(countDistinct(col(c)).as(s"__nd_$c")))
        }
    }
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
