package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation.
  *
  * A hot group key (one service emitting 90% of events) turns the single
  * shuffle of a groupBy into one straggler reducer. Salting splits each key
  * into `salts` sub-keys for the first (heavy) aggregation so the hot key's
  * rows spread across `salts` reducers, then a second (tiny — one row per
  * key×salt) aggregation merges the partials. AQE's skew handling covers
  * joins; this is the aggregation-side counterpart, usable on any
  * decomposable aggregate. The salt is `pmod(hash(all columns…), salts)` —
  * deterministic per row, uniform across them.
  *
  * Result is EXACTLY the unsalted aggregate (sum/count/min/max are
  * associative; for mean, salt sum+count then divide) — pinned by the
  * g2_salted_agg oracle equivalence.
  */
object Salted {

  /** Sum + weighted count + mean of `valueCol` per `keyCols`, skew-safe. */
  def aggregate(df: DataFrame, keyCols: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    val v = col(valueCol)
    val salt = pmod(hash(df.columns.map(col): _*), lit(salts)).as("__salt")
    val partial = df
      .groupBy((keyCols.map(col) :+ salt): _*)
      .agg(
        sum(coalesce(v, lit(0.0))).as("__psum"),
        count(v).as("__pcnt"),
        min(v).as("__pmin"),
        max(v).as("__pmax"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as(s"count_$valueCol"),
        min(col("__pmin")).as(s"min_$valueCol"),
        max(col("__pmax")).as(s"max_$valueCol"),
        (sum(col("__psum")) / sum(col("__pcnt"))).as(s"mean_$valueCol"))
  }
}
