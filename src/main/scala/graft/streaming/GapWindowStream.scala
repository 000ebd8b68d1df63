package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.ir._
import graft.compile.{Aggregates, Compiler}

/** Streaming version of the reference's data-anchored gap windows
  * (lib.rs:665-732) as custom state over `flatMapGroupsWithState` — the
  * operator Spark's built-in `window()`/`session_window()` cannot express.
  *
  * Ordering is handled STRUCTURALLY: incoming events are buffered in state
  * and only folded into the walk once the watermark has passed them — at
  * which point Spark's late-row filter guarantees nothing earlier can still
  * arrive. Cross-batch disorder within the watermark delay therefore
  * produces exactly the batch operator's result over the same rows; rows
  * older than the watermark are dropped by Spark before they reach the
  * operator, never folded wrongly.
  *
  * State per group = the one OPEN window (running aggregate buffers + the
  * dropped-breacher anchor, same walk as [[graft.operators.GapWindows]])
  * plus the not-yet-final buffer. State is O(#groups × (#aggs + events
  * within one watermark delay)) — bounded by the configured delay, not by
  * stream length.
  *
  * Emission: a window closes the moment a finalized event breaches it.
  * Additionally, once the watermark passes a window's admission deadline
  * (`w_start + granularity`) it is flushed — no admissible event can exist
  * anymore. A post-deadline event then starts a fresh window rather than
  * being dropped as a breacher: the watermark flush plays the role of the
  * batch walk's end-of-input for that window (documented divergence; the
  * reference's breacher-drop applies within one walk segment).
  *
  * Aggregates are limited to the streaming-friendly Sum/Count/Mean/Max/Min
  * (CountDistinct needs a set, P50 needs all values — use the batch
  * operator for those).
  */
object GapWindowStream {

  /** `eventTime` carries the watermarked TimestampType attribute through the
    * projection — event-time timeout requires a watermarked column to remain
    * visible below flatMapGroupsWithState. `id` is the same-second tiebreak
    * (0 when no `idCol` is given). */
  final case class GwEvent(key: Seq[String], ts: Long, id: Long, sr: Double,
                           values: Array[Double], eventTime: java.sql.Timestamp)
  /** A buffered event awaiting watermark finalization. Part of the
    * checkpointed state schema — adding `id` (round 10) trips Spark's
    * state-schema compatibility check on old checkpoints LOUDLY, by design. */
  final case class GwPend(ts: Long, id: Long, sr: Double, values: Array[Double])
  // per-select buffer: (a, b) — Sum/Max/Min/Count use a; Mean uses (mean=a, n=b)
  final case class GwState(wStart: Long, wEnd: Long, anchor: Long,
                           hasWindow: Boolean, a: Array[Double], b: Array[Double],
                           pending: Seq[GwPend])
  final case class GwOut(key: Seq[String], w_start: Long, w_end: Long, values: Array[Double])

  private val allowed: Set[Agg] = Set(Agg.Sum, Agg.Count, Agg.Mean, Agg.Max, Agg.Min)

  /** @param idCol optional same-second tiebreak column (the batch walk's
    *   `idCol`): with it, events tied on the same whole second fold in
    *   (ts, id) order — the exact order [[graft.operators.GapWindows]] and
    *   the DuckDB replay use, making the IEEE fold bit-identical to batch
    *   even under tied timestamps. Without it ties fold in arrival order
    *   (fine for rounded outputs, not for unrounded hash parity). */
  def apply(stream: DataFrame, q: ZxQuery, watermark: String = "10 minutes",
            tsCol: String = Compiler.DefaultTsCol,
            idCol: Option[String] = None): Dataset[GwOut] = {
    require(q.selects.nonEmpty && q.selects.forall(s => allowed(s.agg)),
      s"streaming gap windows support ${allowed.map(_.name).mkString("/")} only")
    require(q.selects.forall(_.expr.isEmpty),
      "the exact gap walk aggregates storage columns only — compute the " +
        "expression into a column upstream, or use tumbling/session/hopping " +
        "windows (expression measures compose there)")
    val spark = stream.sparkSession
    import spark.implicits._

    val schema = stream.schema
    val hasSr = schema.fieldNames.contains(Aggregates.SampleRateCol)
    val selects = q.selects
    val gran = q.granularitySec

    // STRUCTURAL key: the group values ride as an array<string>, one element
    // per group column — no separator exists, so no value can merge or
    // mis-split two groups (the failure class any joined-string encoding
    // carries). Because the key type is part of the checkpointed state
    // schema, this also makes encoding changes FAIL LOUDLY: restarting on a
    // checkpoint written under the old joined-string key (or any future
    // re-encoding) trips Spark's state-schema compatibility check instead
    // of silently misgrouping open-window state. Nulls are already
    // __nil-coalesced by Compiler.groupKeys, so elements are never null.
    val keyExpr =
      if (q.groupBy.isEmpty) array(lit("__all"))
      else array(Compiler.groupKeys(q, schema): _*)
    // The SAME pre-aggregation filter the batch walk gets via
    // Compiler.scanFilter (time bounds + conjunct list + boolean `where`
    // tree): a filtered-out event can neither open a window nor act as a
    // breacher, exactly as in batch. Watermark first — the stream clock
    // advances on every source event (see EventStream.preFilter).
    val prepared = EventStream
      .preFilter(stream.withWatermark(tsCol, watermark), q, tsCol)
      .select(
        keyExpr.as("key"),
        col(tsCol).cast(LongType).as("ts"),
        idCol.map(c => Compiler.colRef(c).cast(LongType))
          .getOrElse(lit(0L)).as("id"),
        (if (hasSr) coalesce(col(Aggregates.SampleRateCol).try_cast(DoubleType), lit(1.0))
         else lit(1.0)).as("sr"),
        array(selects.map(s =>
          coalesce(Aggregates.numeric(s.column, schema), lit(Double.NaN))): _*).as("values"),
        col(tsCol).as("eventTime"))
      .as[GwEvent]

    def freshBufs(): (Array[Double], Array[Double]) = {
      val a = selects.map(_.agg match {
        case Agg.Max => Double.MinValue // lib.rs:578
        case Agg.Min => Double.MaxValue // lib.rs:593
        case _       => 0.0
      }).toArray
      (a, Array.fill(selects.size)(0.0))
    }

    def fold(a: Array[Double], b: Array[Double], e: GwPend): Unit =
      selects.zipWithIndex.foreach { case (sel, i) =>
        val v = e.values(i); val present = !v.isNaN
        sel.agg match {
          case Agg.Sum   => a(i) += e.sr * (if (present) v else 0.0)
          case Agg.Count => if (present) a(i) += e.sr
          case Agg.Max   => if (present && v > a(i)) a(i) = v
          case Agg.Min   => if (present && v < a(i)) a(i) = v
          case Agg.Mean  => if (present) { // incremental, lib.rs:643-651
            var rep = e.sr.toLong
            while (rep > 0) { b(i) += 1; a(i) += (v - a(i)) / b(i); rep -= 1 }
          }
          case other => throw new IllegalStateException(other.toString)
        }
      }

    def emit(key: Seq[String], st: GwState): GwOut =
      GwOut(key, st.wStart, st.wEnd, st.a.clone())

    def walk(key: Seq[String], events: Iterator[GwEvent],
             state: GroupState[GwState]): Iterator[GwOut] = {
      val wmMs = state.getCurrentWatermarkMs()
      val prev = state.getOption.getOrElse {
        val (a, b) = freshBufs(); GwState(-1L, -1L, -1L, hasWindow = false, a, b, Nil)
      }
      // finalized = strictly below the watermark: Spark's late-row filter
      // guarantees no earlier event can still arrive, so the fold order is
      // exactly the batch operator's
      val (ready, still) = (prev.pending ++
        events.map(e => GwPend(e.ts, e.id, e.sr, e.values)))
        .partition(_.ts * 1000L < wmMs)
      val outs = Seq.newBuilder[GwOut]
      var st = prev
      ready.sortBy(e => (e.ts, e.id)).foreach { e =>
        if (!st.hasWindow && st.anchor < 0L) { // first event of a fresh walk
          val (a, b) = freshBufs(); fold(a, b, e)
          st = GwState(e.ts, e.ts, -1L, hasWindow = true, a, b, Nil)
        } else if (!st.hasWindow) { // anchored by a dropped breacher
          if (e.ts - st.anchor <= gran) {
            val (a, b) = freshBufs(); fold(a, b, e)
            st = GwState(st.anchor, e.ts, -1L, hasWindow = true, a, b, Nil)
          } else st = st.copy(anchor = e.ts) // re-anchor, still empty
        } else if (e.ts - st.wStart <= gran) {
          fold(st.a, st.b, e)
          st = st.copy(wEnd = e.ts)
        } else { // breach: emit, drop breacher, anchor next window at its ts
          outs += emit(key, st)
          val (a, b) = freshBufs()
          st = GwState(-1L, -1L, e.ts, hasWindow = false, a, b, Nil)
        }
      }
      // watermark past the admission deadline → the window can never admit
      // another event: flush it (end-of-segment); a dead anchor just clears
      if (st.hasWindow && (st.wStart + gran) * 1000L < wmMs) {
        outs += emit(key, st)
        val (a, b) = freshBufs()
        st = GwState(-1L, -1L, -1L, hasWindow = false, a, b, Nil)
      } else if (!st.hasWindow && st.anchor >= 0L && (st.anchor + gran) * 1000L < wmMs) {
        st = st.copy(anchor = -1L)
      }
      val next = st.copy(pending = still)
      if (!next.hasWindow && next.anchor < 0L && next.pending.isEmpty) {
        state.remove()
      } else {
        state.update(next)
        // wake when the watermark passes the next actionable instant: the
        // earliest buffered event, or the open window's/anchor's deadline
        val wake = (next.pending.map(_.ts) ++
          (if (next.hasWindow) Seq(next.wStart + gran) else Nil) ++
          (if (next.anchor >= 0L) Seq(next.anchor + gran) else Nil)).min
        state.setTimeoutTimestamp(wake * 1000L + 1L)
      }
      outs.result().iterator
    }

    prepared
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(walk)
  }
}
