package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ir._
import graft.compile.Compiler

/** Exact replay of the reference's data-anchored, variable-width windows
  * (lib.rs:665-732) — the one operator whose semantics Spark's built-in
  * `window()` / `session_window()` cannot express (SURVEY §7.3/7.4):
  *
  *  - a window opens at the first event's ts and admits rows while
  *    `ts - window_start <= granularity`;
  *  - the first row that breaches the bound closes the window; the emitted
  *    `w_end` is the ts of the LAST ADMITTED row (not start+size);
  *  - the breaching row itself is dropped — it anchors the next window's
  *    start timestamp but is excluded from its contents (lib.rs:710-714);
  *    the next window only materializes if a later row lands within
  *    `granularity` of that anchor;
  *  - trailing rows are emitted as a final window (lib.rs:717-726).
  *
  * Documented divergence (SURVEY §7.4 "do not reproduce bugs"): when two
  * consecutive rows both breach, the reference emits an EMPTY window slice
  * whose end timestamp is stale from the previous window (lib.rs:702-707 with
  * window_end_timestamp never reset) — we emit nothing for empty windows.
  *
  * Scale design: instead of `groupByKey(...).flatMapGroups` (which
  * materializes each group on the heap), we repartition on the group key and
  * do a secondary sort within partitions — `repartition(keys)` +
  * `sortWithinPartitions(keys, ts, id)` + a single-pass `mapPartitions` that
  * detects group boundaries. Spill-friendly (Spark's external sorter handles
  * partitions bigger than memory), one shuffle, no per-group buffering beyond
  * the current open window. For SKEWED keys (one group holding the whole
  * timeline) see [[parallel]] — the exact run-decomposed walk.
  *
  * Aggregate arithmetic replays lib.rs:560-657 exactly, including the
  * incremental sample-rate-repeated mean (lib.rs:643-651) and the
  * f64::MIN/MAX empty-window sentinels (lib.rs:578, 593) — this operator is
  * the bit-parity path; the idiomatic calendar-tumbling path is
  * [[graft.compile.Compiler.runUnsorted]].
  */
object GapWindows {

  /** Everything the executor-side walk needs — scalars and plans only,
    * never the DataFrame (the closure ships this). */
  private final case class WalkPlan(nKeys: Int, tsIdx: Int, srIdx: Int,
                                    numIdx: Map[String, Int],
                                    strIdx: Map[String, Int],
                                    selects: Seq[Select], gran: Long)
      extends Serializable

  /** The shared scan/projection: group keys (nil-coalesced strings),
    * epoch-second ts, the ordering id, sample rate, then each aggregate
    * input twice — numeric view (parse-on-demand) and string view
    * (count_distinct groups string values, lib.rs:626-635). */
  private def layout(df: DataFrame, q: ZxQuery, tsCol: String,
                     idCol: Option[String]): (DataFrame, WalkPlan, StructType) = {
    require(q.selects.nonEmpty, "gap windows need at least one aggregate select")
    require(q.selects.forall(_.expr.isEmpty),
      "the exact gap walk aggregates storage columns only — compute the " +
        "expression into a column upstream, or drop `exact` (expression " +
        "measures compose with tumbling/session/hopping windows)")
    // reject at PLAN time, not inside an executor task — the per-window
    // fold below supports exactly the reference's aggregate set (+ p50)
    val walkAggs: Set[Agg] = Set(Agg.Sum, Agg.Max, Agg.Min, Agg.Count,
      Agg.CountDistinct, Agg.Mean, Agg.P50)
    q.selects.find(s => !walkAggs(s.agg)).foreach { s =>
      throw new IllegalArgumentException(
        s"gap windows: unsupported agg ${s.agg.name} — the exact walk " +
          "replays the reference's aggregate set (sum/max/min/count/" +
          "count_distinct/mean) plus p50; drop `exact` for the rest")
    }
    val filtered = Compiler.scanFilter(df, q, tsCol)
    val keys = Compiler.groupKeys(q, df.schema)

    val aggCols: Seq[String] = q.selects.map(_.column).distinct
    val hasSr = df.schema.fieldNames.contains("__sample_rate")

    val idOrder = idCol.map(graft.compile.Compiler.colRef).getOrElse(monotonically_increasing_id())
    val proj = filtered.select(
      keys ++
        Seq(col(tsCol).cast(LongType).as("__ts_sec"), idOrder.as("__row_id"),
          (if (hasSr) coalesce(col("__sample_rate").try_cast(DoubleType), lit(1.0))
           else lit(1.0)).as("__sr")) ++
        aggCols.map(c => graft.compile.Aggregates.numeric(c, df.schema).as(s"__num_$c")) ++
        aggCols.map(c => (if (c == "*") lit("1") // count(*): every row present
                          else graft.compile.Compiler.colRef(c).cast(StringType)).as(s"__str_$c")): _*)

    val nKeys = q.groupBy.size
    val plan = WalkPlan(nKeys, tsIdx = nKeys, srIdx = nKeys + 2,
      numIdx = aggCols.zipWithIndex.map { case (c, i) => c -> (nKeys + 3 + i) }.toMap,
      strIdx = aggCols.zipWithIndex.map { case (c, i) => c -> (nKeys + 3 + aggCols.size + i) }.toMap,
      selects = q.selects, gran = q.granularitySec)
    val outSchema = StructType(
      q.groupBy.map(StructField(_, StringType)) ++
        Seq(StructField("w_start", LongType), StructField("w_end", LongType)) ++
        q.selects.map(s => StructField(s.key, DoubleType)))
    (proj, plan, outSchema)
  }

  /** One closed window → one output row. Replays lib.rs:560-657. */
  private def aggWindow(p: WalkPlan, keyVals: Seq[String],
                        wStartTs: Long, wEndTs: Long, rows: Seq[Row]): Row = {
    val vals = p.selects.map { sel =>
      val ni = p.numIdx(sel.column); val si = p.strIdx(sel.column)
      sel.agg match {
        case Agg.Sum =>
          rows.foldLeft(0.0)((acc, r) =>
            acc + r.getDouble(p.srIdx) * (if (r.isNullAt(ni)) 0.0 else r.getDouble(ni)))
        case Agg.Max =>
          rows.foldLeft(Double.MinValue)((acc, r) =>
            if (!r.isNullAt(ni) && r.getDouble(ni) > acc) r.getDouble(ni) else acc)
        case Agg.Min =>
          rows.foldLeft(Double.MaxValue)((acc, r) =>
            if (!r.isNullAt(ni) && r.getDouble(ni) < acc) r.getDouble(ni) else acc)
        case Agg.Count =>
          rows.foldLeft(0.0)((acc, r) => if (r.isNullAt(si)) acc else acc + r.getDouble(p.srIdx))
        case Agg.CountDistinct =>
          val distinct = rows.collect { case r if !r.isNullAt(si) => r.getString(si) }.toSet
          val nil = if (rows.exists(_.isNullAt(si))) 1 else 0
          (distinct.size + nil).toDouble
        case Agg.Mean =>
          // incremental mean applied sample_rate(as int) times — lib.rs:643-651
          var count = 0L; var mean = 0.0
          rows.foreach { r =>
            if (!r.isNullAt(ni)) {
              val v = r.getDouble(ni)
              var rep = r.getDouble(p.srIdx).toLong
              while (rep > 0) { count += 1; mean += (v - mean) / count; rep -= 1 }
            }
          }
          mean
        case Agg.P50 =>
          // exact interpolated median (the reference declares p50 but
          // panics, lib.rs:659-661 — we implement it)
          val vs = rows.collect { case r if !r.isNullAt(ni) => r.getDouble(ni) }
            .sorted.toIndexedSeq
          if (vs.isEmpty) Double.NaN
          else {
            val pos = 0.5 * (vs.size - 1)
            val lo = pos.toInt; val frac = pos - lo
            if (lo + 1 < vs.size) vs(lo) * (1 - frac) + vs(lo + 1) * frac
            else vs(lo)
          }
        case other => throw new IllegalArgumentException(s"gap windows: unsupported agg $other")
      }
    }
    Row.fromSeq(keyVals ++ Seq(wStartTs, wEndTs) ++ vals)
  }

  /** The sequential walk over one sorted partition, instantiated ON the
    * executor inside `mapPartitions`. `groupOf` defines the walk's restart
    * boundary — the group key alone ([[apply]]) or (key, run)
    * ([[parallel]]); `initAnchor` says whether a group's FIRST row enters
    * as the dropped breacher-anchor (a gap run's first event) instead of
    * opening a window (a key's first event). */
  private final class Walk(p: WalkPlan, it: Iterator[Row],
                           groupOf: Row => Any,
                           initAnchor: Row => Boolean) extends Iterator[Row] {
    private val results = mutable.Queue.empty[Row]

    // state of the open window within the current group
    private var curGroup: Any = null
    private var curKey: Seq[String] = null
    private val winRows = mutable.ArrayBuffer.empty[Row]
    private var wStartTs = -1L
    private var wEndTs = -1L
    // pending anchor from a breaching row (lib.rs:710-714): the next
    // window starts at this ts but the breaching row is NOT included
    private var anchorTs = -1L

    private def closeWindow(): Unit = {
      if (winRows.nonEmpty)
        results.enqueue(aggWindow(p, curKey, wStartTs, wEndTs, winRows.toSeq))
      winRows.clear()
    }

    private def push(r: Row): Unit = {
      val g = groupOf(r)
      val ts = r.getLong(p.tsIdx)
      if (curGroup == null || g != curGroup) {
        closeWindow()
        curGroup = g; curKey = (0 until p.nKeys).map(r.getString)
        if (initAnchor(r)) { anchorTs = ts; wStartTs = -1L; wEndTs = -1L }
        else { wStartTs = ts; wEndTs = ts; anchorTs = -1L; winRows += r }
      } else if (anchorTs >= 0L) {
        // previous row breached; this window is anchored at its ts
        if (ts - anchorTs <= p.gran) { wStartTs = anchorTs; wEndTs = ts; winRows += r; anchorTs = -1L }
        else { anchorTs = ts } // breaches again: re-anchor, still empty
      } else if (ts - wStartTs <= p.gran) {
        wEndTs = ts; winRows += r
      } else {
        closeWindow()
        anchorTs = ts
      }
    }

    def hasNext: Boolean = {
      while (results.isEmpty && it.hasNext) push(it.next())
      if (results.isEmpty && !it.hasNext) { closeWindow(); curGroup = null }
      results.nonEmpty
    }
    def next(): Row = { if (!hasNext) throw new NoSuchElementException; results.dequeue() }
  }

  def apply(df: DataFrame, q: ZxQuery, tsCol: String = Compiler.DefaultTsCol,
            idCol: Option[String] = None): DataFrame = {
    val (proj, plan, outSchema) = layout(df, q, tsCol, idCol)
    val keyIdx = 0 until plan.nKeys
    val sortCols = keyIdx.map(i => col(proj.columns(i))) ++ Seq(col("__ts_sec"), col("__row_id"))
    // SCALE WARNING — empty groupBy serializes the walk: a global gap window
    // is inherently sequential (every event's window assignment depends on
    // its predecessor's), so the no-group path coalesces to ONE partition
    // and walks the whole filtered range on a single task. Fine for the
    // reference's single-store semantics and for bounded time ranges; at
    // 100 TB an ungrouped walk over an unbounded range is a driver-adjacent
    // bottleneck BY CONSTRUCTION — add group keys (the walk parallelizes
    // per group), bound the scan with tStart/tEnd, or use [[parallel]]
    // (the global walk then parallelizes across gap runs).
    val arranged =
      if (plan.nKeys > 0)
        proj.repartition(keyIdx.map(i => col(proj.columns(i))): _*)
          .sortWithinPartitions(sortCols: _*)
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "GapWindows with no group keys runs the ENTIRE range on one task " +
            "(a global gap walk is sequential by definition); add group-by " +
            "columns or tight time bounds at scale, or use GapWindows.parallel")
        proj.coalesce(1).sortWithinPartitions(sortCols: _*)
      }
    val nk = plan.nKeys
    val out = arranged.mapPartitions { it =>
      new Walk(plan, it, groupOf = r => (0 until nk).map(r.getString),
        initAnchor = _ => false)
    }(RowEncoder.encoderFor(outSchema))
    out.toDF()
  }

  /** The SAME walk, distributed across gap RUNS — the exact skew
    * mitigation for the windowed family's last sequential stage (the
    * session analogue is the two-level interval merge, SURVEY §9).
    *
    * A run is a maximal same-key stretch in which consecutive events are
    * at most `granularity` apart. Any event whose predecessor gap EXCEEDS
    * the granularity is provably an ANCHOR in the serial walk no matter
    * what came before it: every open window's start is at or before the
    * predecessor's ts, so the bound `start + granularity` is already
    * behind — the event breaches (or re-anchors) unconditionally. Runs
    * are therefore independent, and a walk restarted at each run boundary
    * reproduces the serial walk bit-for-bit: a gap run's first event
    * enters as the dropped breacher-anchor, a key's first run opens a
    * window at its first event (oracle row a8b pins equality with [[apply]]
    * at every SF; GapWindowPropSpec pins it against the brute-force model).
    *
    * Cost shape at scale: run assignment is `lag` + a running count over
    * `(key | ts, id)` — one exchange and a STREAMING O(1)-per-row window
    * scan (no per-window buffering; Spark's window sorter spills) — then
    * the walk repartitions on (key, run), so the expensive half (window
    * row buffers, count_distinct sets, p50 sorts) fans out across runs
    * instead of serializing per key. A hot key with 10^8 events over N
    * runs walks as N independent tasks. The honest bound: a key that
    * never pauses longer than the granularity is ONE run — data-anchored
    * windows have no synchronization point without a gap, so such a
    * stream stays sequential (bound it with tStart/tEnd or coarsen the
    * granularity). Parallelism is data-given, never speculative. */
  def parallel(df: DataFrame, q: ZxQuery, tsCol: String = Compiler.DefaultTsCol,
               idCol: Option[String] = None): DataFrame = {
    val (proj, plan, outSchema) = layout(df, q, tsCol, idCol)
    val keyCols = (0 until plan.nKeys).map(i => col(proj.columns(i)))
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__ts_sec"), col("__row_id"))
    val prev = lag(col("__ts_sec"), 1).over(w)
    val startIdx = proj.columns.length
    val runIdx = startIdx + 1
    val tagged = proj
      // 1 = key's first event (opens a window), 2 = gap anchor (dropped
      // breacher), 0 = run interior
      .withColumn("__run_start",
        when(prev.isNull, lit(1))
          .when(col("__ts_sec") - prev > lit(plan.gran), lit(2))
          .otherwise(lit(0)))
      .withColumn("__run",
        sum(when(col("__run_start") > lit(0), lit(1L)).otherwise(lit(0L)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val arranged = tagged
      .repartition(keyCols :+ col("__run"): _*)
      .sortWithinPartitions(keyCols ++ Seq(col("__run"), col("__ts_sec"), col("__row_id")): _*)
    val nk = plan.nKeys
    val out = arranged.mapPartitions { it =>
      new Walk(plan, it,
        groupOf = r => ((0 until nk).map(r.getString), r.getLong(runIdx)),
        initAnchor = r => r.getInt(startIdx) == 2)
    }(RowEncoder.encoderFor(outSchema))
    out.toDF()
  }
}
