package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Seasonal-baseline anomaly detection — the monitoring staple on top of
  * the engine's aggregation family: learn a per-(group, hour-of-day)
  * baseline from a training period, then flag later events that exceed a
  * multiple of their seasonal mean.
  *
  * Numeric discipline: values enter as fixed-point `floor(v·2^20)` longs,
  * the baseline is kept as the exact integer pair `(n, sum_fp)` — never a
  * divided mean — and the anomaly test cross-multiplies
  * (`v_fp·n > factor·sum_fp`), so every comparison is exact integer
  * arithmetic any engine replays bit-for-bit (no mean rounding, no
  * epsilon).
  *
  * Plan shape: one aggregation over the training slice produces a baseline
  * bounded by |groups|·24 rows — and |groups| is ENFORCED, not assumed:
  * the baseline is checkpointed (one training scan, not two), counted
  * against `maxBaselineRows`, and only then broadcast, so a
  * high-cardinality group column (URLs, SKUs) fails loudly instead of
  * OOMing the driver mid-broadcast. Scoring is then a narrow broadcast
  * hash join over the scoring slice plus one final (group, day)
  * aggregation. Two small shuffles total at any scale; the events table
  * is never self-joined or re-sorted.
  */
object Anomaly {

  /** Flag scoring-period events whose value exceeds `factor`× their
    * (group, hour-of-day) training mean; emit per (group, day) totals.
    *
    * @param splitDate  ISO date; days before it train, days ≥ it score
    * @param factor     anomaly threshold multiple of the seasonal mean
    * @param minSupport baseline cells with fewer training rows never flag
    *                   (an unseen (group, hour) is "no baseline", not an
    *                   anomaly)
    * @param maxBaselineRows hard cap on (group, hour) baseline cells —
    *                   the broadcast-safety guard; exceeded → loud error
    *                   naming the group column, BEFORE the broadcast
    */
  def seasonalAnomalies(ev: DataFrame, splitDate: String, factor: Long = 2L,
                        minSupport: Long = 30L, groupCol: String = "event_type",
                        tsCol: String = "ts", valCol: String = "value",
                        maxBaselineRows: Int = 100000)
      : DataFrame = {
    require(factor >= 1 && minSupport >= 1,
      s"seasonalAnomalies: factor/minSupport must be ≥ 1, got $factor/$minSupport")
    val rows = ev.filter(col(valCol).isNotNull)
      .select(col(groupCol), to_date(col(tsCol)).as("__d"),
        hour(col(tsCol)).as("__h"),
        floor(col(valCol) * lit(1048576.0)).cast(LongType).as("__vfp"))
    // checkpoint BEFORE the guard so the training slice is scanned once:
    // the bounded count and the broadcast both read the materialized
    // blocks (executor-side — the hazard being guarded is the DRIVER copy
    // a broadcast makes)
    val baseline = rows.filter(col("__d") < to_date(lit(splitDate)))
      .groupBy(col(groupCol), col("__h"))
      .agg(count(lit(1)).as("__bn"), sum(col("__vfp")).as("__bs"))
      .localCheckpoint()
    val nb = baseline.limit(maxBaselineRows + 1).count()
    require(nb <= maxBaselineRows,
      s"seasonalAnomalies: group column '$groupCol' yields more than " +
        s"$maxBaselineRows (group, hour) baseline cells — not a " +
        "broadcastable baseline; raise maxBaselineRows or reduce the " +
        "group column's cardinality (bucket/hash it) first")
    rows.filter(col("__d") >= to_date(lit(splitDate)))
      .join(broadcast(baseline), Seq(groupCol, "__h"), "left")
      .groupBy(col(groupCol), date_format(col("__d"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__bn") >= minSupport &&
          col("__vfp") * col("__bn") > lit(factor) * col("__bs"), 1L)
          .otherwise(0L)).as("n_anomalies"))
  }
}
