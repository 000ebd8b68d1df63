package graft.compile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ir._

/** Compiles a [[ZxQuery]] to declarative DataFrame transformations.
  *
  * The reference's hand-rolled pipeline (lib.rs:190: scan → filter → project
  * → group → aggregate) maps 1:1 onto a Catalyst logical plan; every
  * optimization it hard-codes (time pruning lib.rs:305-331, late
  * materialization lib.rs:197-200, column pruning lib.rs:202-211, zone maps
  * lib.rs:786-799) is subsumed by predicate pushdown, ColumnPruning and
  * Parquet row-group stats (SURVEY §4). At cluster scale the only shuffle is
  * the exchange on the group keys — scan + filter + partial aggregation are
  * narrow and map-side.
  *
  * Two execution paths, as in the reference:
  *  - [[runUnsorted]] — windowed time-series (lib.rs:191-218);
  *  - [[runSorted]]  — whole-range aggregate + multi-key sort, the "top
  *    groups" query (lib.rs:222-246). The reference never wires this to SQL
  *    (dead `order_by`, lib.rs:840); we do.
  */
object Compiler {

  /** Group sentinel for rows missing a group-by column — lib.rs:56, 547-551. */
  val NilSentinel = "__nil"

  val DefaultTsCol = "ts"

  /** Column reference by FLAT name: backtick-quoted so reference-style
    * dotted column names (`repo.name` — README.md:17; the schemaless store
    * allows any string as a column) resolve as plain columns rather than
    * struct-field paths. Identical to `col` for dot-free names. A name
    * CONTAINING a backtick is rejected loudly: the schemaless store admits
    * any string as a column name, and silently stripping the quote char
    * would resolve a different column than the one named. */
  def colRef(name: String): Column = {
    require(!name.contains("`"),
      s"column name '$name' contains a backtick — the quoting character " +
        "cannot itself be referenced; rename the column")
    col("`" + name + "`")
  }

  /** Scan + time range + conjunctive filter (lib.rs:195-200). The time bound
    * lands directly on the timestamp column so Parquet row-group min/max
    * stats (and directory partition pruning, when the table is date-
    * partitioned) prune the scan. */
  def scanFilter(df: DataFrame, q: ZxQuery, tsCol: String = DefaultTsCol): DataFrame = {
    val ts = col(tsCol)
    // When the source kept a raw epoch-nanos column (Tables.TsNanosCol), add
    // equivalent bounds on it: the TimestampType `ts` is a derived expression
    // the Parquet reader can't see, but the raw INT64 range predicate pushes
    // down to row-group min/max stats. floor(ns/1000)-truncation makes
    // [s*1e9, e*1e9 + 999] exactly equivalent to the µs-level bounds.
    val nsBounds: Seq[Column] =
      if (tsCol == DefaultTsCol &&
          df.schema.fieldNames.contains(graft.sources.Tables.TsNanosCol)) {
        val ns = col(graft.sources.Tables.TsNanosCol)
        q.tStart.map(s => ns >= s * 1000000000L).toSeq ++
          q.tEnd.map(e => ns <= e * 1000000000L + 999L).toSeq
      } else Nil
    // Same mirror for the TIMESTAMP_NTZ raw column: LocalDateTime literals
    // compare as plain wall clock (data is UTC), so the bound is exactly the
    // µs-level `ts` bound and pushes to Parquet row-group stats.
    val ntzBounds: Seq[Column] =
      if (tsCol == DefaultTsCol &&
          df.schema.fieldNames.contains(graft.sources.Tables.TsNtzCol)) {
        val ntz = col(graft.sources.Tables.TsNtzCol)
        def at(sec: Long) = lit(java.time.LocalDateTime.ofEpochSecond(
          sec, 0, java.time.ZoneOffset.UTC))
        q.tStart.map(s => ntz >= at(s)).toSeq ++
          q.tEnd.map(e => ntz <= at(e)).toSeq
      } else Nil
    val tsBounds: Seq[Column] =
      q.tStart.map(s => ts >= timestamp_seconds(lit(s))).toSeq ++
        q.tEnd.map(e => ts <= timestamp_seconds(lit(e))).toSeq
    val timeBounded = (tsBounds ++ nsBounds ++ ntzBounds).reduceOption(_ && _)
      .map(df.filter).getOrElse(df)
    val preds = Predicates.compileAll(q.conditions, df.schema).toSeq ++
      q.where.map(Predicates.compileTree(_, df.schema)).toSeq
    preds.reduceOption(_ && _).map(timeBounded.filter).getOrElse(timeBounded)
  }

  /** One sort key: direction plus the explicit `nulls first/last`
    * placement when the query spelled one (p106). Without a spelling the
    * engine default applies (Spark: ASC nulls first / DESC nulls last —
    * DuckDB's default is the opposite, so nullable sort keys should
    * always spell it; the engine's own keys are non-null by
    * construction). */
  def orderCol(c: Column, ob: OrderBy): Column =
    (ob.dir, ob.nullsFirst) match {
      case (SortDir.Asc, None)         => c.asc
      case (SortDir.Desc, None)        => c.desc
      case (SortDir.Asc, Some(true))   => c.asc_nulls_first
      case (SortDir.Asc, Some(false))  => c.asc_nulls_last
      case (SortDir.Desc, Some(true))  => c.desc_nulls_first
      case (SortDir.Desc, Some(false)) => c.desc_nulls_last
    }

  /** Group keys with the reference's `__nil` sentinel for missing values
    * (lib.rs:547-551). Rendered as strings, as the reference does. */
  def groupKeys(q: ZxQuery, schema: StructType): Seq[Column] =
    q.groupBy.map { g =>
      val c = colRef(g)
      val s = schema.fields.find(_.name == g).map(_.dataType) match {
        case Some(StringType) | None => c
        case _                       => c.cast(StringType)
      }
      coalesce(s, lit(NilSentinel)).as(g)
    }

  /** Pipeline A — windowed time-series aggregation (lib.rs:191-218).
    *
    * Windows are calendar-aligned tumbling buckets (`w_start` = epoch seconds
    * floored to the granularity), the idiomatic + oracle-checkable shape. The
    * reference's windows are data-anchored and gap-based (lib.rs:689-714);
    * exact replay lives in [[graft.operators.GapWindows]]. Bucketing via
    * integer floor keeps the whole plan in whole-stage codegen and makes the
    * group key a cheap LONG.
    */
  /** HAVING conjuncts → one post-aggregation filter Column. Runs on the
    * UNROUNDED aggregate outputs (map-side partials already merged), so at
    * scale it prunes groups before any sort/limit stage. Numeric-literal
    * comparators only — an aggregate output is always numeric. */
  private[graft] def havingFilter(df: DataFrame, having: Seq[Having],
                                  tree: Option[HavingTree] = None): DataFrame = {
    def leaf(h: Having): Column = {
      val c = colRef(h.select.key)
      val v = h.value.toDoubleOption.map(lit).getOrElse(throw new IllegalArgumentException(
        s"having ${h.select.key}: numeric literal required, got '${h.value}'"))
      h.cmp match {
        case Cmp.Eq  => c === v
        case Cmp.Ne  => c =!= v
        case Cmp.Gt  => c > v
        case Cmp.Lt  => c < v
        case Cmp.Gte => c >= v
        case Cmp.Lte => c <= v
        case other => throw new IllegalArgumentException(
          s"having supports numeric comparators, got ${other.name}")
      }
    }
    // boolean HAVING structure (p110): same three-valued semantics as
    // WHERE — NOT(NULL) stays NULL, the group drops
    def treeCol(t: HavingTree): Column = t match {
      case HavingTree.Leaf(h)  => leaf(h)
      case HavingTree.And(cs)  => cs.map(treeCol).reduce(_ && _)
      case HavingTree.Or(cs)   => cs.map(treeCol).reduce(_ || _)
      case HavingTree.Not(c)   => !treeCol(c)
    }
    val preds = having.map(leaf) ++ tree.map(treeCol)
    preds.reduceOption(_ && _).map(df.filter).getOrElse(df)
  }

  /** Every aggregate a query's HAVING references — conjunct vector plus
    * boolean-tree leaves. These ride the same hash aggregate as visible
    * selects and are pruned from the output. */
  private[graft] def havingSelects(q: ZxQuery): Seq[Select] =
    q.having.map(_.select) ++
      q.havingTree.map(HavingTree.selects).getOrElse(Nil)

  /** Component aggregates the post-aggregate selects need — they ride the
    * SAME hash aggregate (and salted decomposition) as visible selects,
    * under parser-assigned `__pa<n>` aliases that the final projection
    * always drops. */
  private[graft] def postComponents(q: ZxQuery): Seq[Select] =
    q.postSelects.flatMap(_.components).distinct

  /** Materialize post-aggregate expression columns on the aggregated
    * frame — BEFORE HAVING, so `having <alias> > x` and `order by <alias>`
    * bind the computed column like any select alias. Scalar projection
    * only: zero exchanges. */
  private[graft] def withPostSelects(df: DataFrame, q: ZxQuery): DataFrame =
    q.postSelects.foldLeft(df)((d, p) =>
      d.withColumn(p.alias, Aggregates.postCol(p.expr)))

  def runUnsorted(df: DataFrame, q: ZxQuery, tsCol: String = DefaultTsCol): DataFrame = {
    if (q.slideSec.nonEmpty) return runHopping(df, q, tsCol)
    val filtered = scanFilter(df, q, tsCol)
    val wStart = (floor(col(tsCol).cast(LongType) / q.granularitySec) *
      q.granularitySec).cast(LongType).as("w_start")
    val keys = groupKeys(q, df.schema) :+ wStart
    val extraSels = (havingSelects(q) ++ postComponents(q))
      .filterNot(s => q.selects.contains(s) || s.agg == Agg.Raw).distinct
    val grouped = withPostSelects(
      Aggregates.groupedAgg(filtered, keys, q.groupBy :+ "w_start",
        q.selects ++ extraSels, df.schema, q.skewSalt), q)
    val kept = havingFilter(grouped, q.having, q.havingTree)
    val pruned = if (extraSels.nonEmpty || q.postSelects.nonEmpty)
      kept.select((q.groupBy.map(colRef) :+ col("w_start")) ++
        q.selects.map(s => colRef(s.key)) ++
        q.postSelects.map(p => colRef(p.alias)): _*)
    else kept
    pruned.withColumn("w_end", (col("w_start") + q.granularitySec).cast(LongType))
  }

  /** Pipeline A''' — HOPPING (sliding) windows (extension): windows of
    * `granularitySec` length starting every `slideSec` seconds, via Spark's
    * native sliding `window()` (the Expand operator emits size/slide rows
    * per event before the one aggregation shuffle — the idiomatic rolling
    * time-series: "hourly error rate, updated every 15 minutes"). Window
    * starts align to epoch multiples of the slide, identical on both
    * engines over whole-second times. */
  def runHopping(df: DataFrame, q: ZxQuery, tsCol: String = DefaultTsCol): DataFrame = {
    val slide = q.slideSec.getOrElse(
      throw new IllegalArgumentException("runHopping needs slideSec"))
    require(slide > 0, s"slide must be positive, got $slide")
    val filtered = scanFilter(df, q, tsCol)
    val win = window(timestamp_seconds(col(tsCol).cast(LongType)),
      s"${q.granularitySec} seconds", s"$slide seconds")
    val keys = groupKeys(q, df.schema) :+ win.as("__w")
    val extraSels = (havingSelects(q) ++ postComponents(q))
      .filterNot(s => q.selects.contains(s) || s.agg == Agg.Raw).distinct
    val grouped = withPostSelects(
      Aggregates.groupedAgg(filtered, keys, q.groupBy :+ "__w",
        q.selects ++ extraSels, df.schema, q.skewSalt), q)
    havingFilter(grouped, q.having, q.havingTree)
      .select((q.groupBy.map(colRef) ++ Seq(
        col("__w.start").cast(LongType).as("w_start"),
        col("__w.end").cast(LongType).as("w_end")) ++
        q.selects.map(s => colRef(s.key)) ++
        q.postSelects.map(p => colRef(p.alias))): _*)
  }

  /** Pipeline A'' — gap-based SESSION windows (extension): Spark's native
    * `session_window` merges events whose gap to the previous event is
    * < gapSec; `w_start` = first event's second, `w_end` = last event's
    * second + gap. The calendar-independent cousin of [[runUnsorted]]'s
    * tumbling buckets, and the built-in (merging, watermark-compatible)
    * counterpart of the reference-parity walk in
    * [[graft.operators.GapWindows]] — note the semantic difference: the
    * reference anchors the bound at the FIRST event of a window
    * (lib.rs:689-714), session windows at the PREVIOUS event. One shuffle;
    * session merging happens inside the aggregation, so `skewSalt` is
    * rejected (salted partial sessions cannot merge). */
  def runSession(df: DataFrame, q: ZxQuery, tsCol: String = DefaultTsCol): DataFrame = {
    val gap = q.sessionGapSec.getOrElse(
      throw new IllegalArgumentException("runSession needs sessionGapSec"))
    // naive salting would break sessions (salted partials would never
    // merge) — but the TWO-LEVEL plan merges partial-session INTERVALS
    // exactly, so a salted session query routes there
    if (q.skewSalt.nonEmpty) return runSessionTwoLevel(df, q, q.skewSalt.get, tsCol)
    val filtered = scanFilter(df, q, tsCol)
    // whole-second times on both engines (the oracle replays lag/cumsum over
    // BIGINT seconds), so session boundaries can never straddle a sub-second
    val sw = session_window(
      timestamp_seconds(col(tsCol).cast(LongType)), s"$gap seconds")
    val keys = groupKeys(q, df.schema) :+ sw.as("__sw")
    val extraSels = (havingSelects(q) ++ postComponents(q))
      .filterNot(s => q.selects.contains(s) || s.agg == Agg.Raw).distinct
    val grouped = withPostSelects(
      Aggregates.groupedAgg(filtered, keys, q.groupBy :+ "__sw",
        q.selects ++ extraSels, df.schema, None), q)
    havingFilter(grouped, q.having, q.havingTree)
      .select((q.groupBy.map(colRef) ++ Seq(
        col("__sw.start").cast(LongType).as("w_start"),
        col("__sw.end").cast(LongType).as("w_end")) ++
        q.selects.map(s => colRef(s.key)) ++
        q.postSelects.map(p => colRef(p.alias))): _*)
  }

  /** Two-level SESSION windows — the skew mitigation for the one-hot-group
    * straggler (Stress: a 10^7-event group walks 2× slower than the same
    * volume balanced, growing linearly). Naive salting is wrong for
    * sessions (salted partials never merge); this plan is exact:
    *
    * LEVEL 1 groups on (keys, salt, session_window) — the hot group's
    * events spread over `salts` reducers, each salt slice sessionizes its
    * own events. A partial session is a gap-chain within its slice, so its
    * span [first, last+gap) equals the UNION of its members' event
    * intervals [t, t+gap) (consecutive chain intervals overlap) — which is
    * the property level 2 needs.
    *
    * LEVEL 2 re-sessionizes the partial sessions with a DYNAMIC gap of
    * (end − start) per row, making each partial occupy exactly its own
    * span: Spark's session merge then computes connected components of the
    * interval union — by the span property, exactly the event-level
    * sessions, regardless of how the salt sliced them. Aggregates merge
    * through the same partial/final decomposition the salted tumbling path
    * uses ([[Aggregates.saltPhases]]); level 2 moves one row per partial
    * session, so the sequential per-group work shrinks by the average
    * events-per-partial-session factor — the 100 TB lever.
    *
    * Decomposable aggregates only (Sum/Count/Max/Min/Mean). Reachable from
    * the IR: `session N` + `skewSalt` routes here via [[runSession]]. */
  def runSessionTwoLevel(df: DataFrame, q: ZxQuery, salts: Int,
                         tsCol: String = DefaultTsCol): DataFrame = {
    val gap = q.sessionGapSec.getOrElse(
      throw new IllegalArgumentException("runSessionTwoLevel needs sessionGapSec"))
    require(salts > 0, s"salts must be positive, got $salts")
    val extraSels = (havingSelects(q) ++ postComponents(q))
      .filterNot(s => q.selects.contains(s) || s.agg == Agg.Raw).distinct
    val sels = q.selects ++ extraSels
    val (partials, finals) = sels.zipWithIndex
      .map { case (s, i) => Aggregates.saltPhases(s, i, df.schema) }.unzip
    val filtered = scanFilter(df, q, tsCol)
    val sw = session_window(
      timestamp_seconds(col(tsCol).cast(LongType)), s"$gap seconds")
    val saltCol = pmod(hash(df.columns.map(col): _*), lit(salts)).as("__salt")
    val pcols = partials.flatten
    val level1 = filtered
      .groupBy(groupKeys(q, df.schema) :+ saltCol :+ sw.as("__sw"): _*)
      .agg(pcols.head, pcols.tail: _*)
      .withColumn("__s", col("__sw.start").cast(LongType))
      .withColumn("__e", col("__sw.end").cast(LongType))
    // the dynamic gap must be CalendarIntervalType (SessionWindowing's
    // contract); make_interval(secs = __e - __s) builds it per row
    val sw2 = session_window(timestamp_seconds(col("__s")),
      expr("make_interval(0, 0, 0, 0, 0, 0, __e - __s)"))
    val merged = withPostSelects(level1
      .groupBy(q.groupBy.map(colRef) :+ sw2.as("__sw2"): _*)
      .agg(finals.head, finals.tail: _*), q)
    havingFilter(merged, q.having, q.havingTree)
      .select((q.groupBy.map(colRef) ++ Seq(
        col("__sw2.start").cast(LongType).as("w_start"),
        col("__sw2.end").cast(LongType).as("w_end")) ++
        q.selects.map(s => colRef(s.key)) ++
        q.postSelects.map(p => colRef(p.alias))): _*)
  }

  /** Pipeline B — whole-range aggregate + multi-key sort ("top groups",
    * lib.rs:222-246, sort_group lib.rs:735-784). Group keys are appended as
    * final tie-breakers so the output order is total (the reference breaks
    * ties by GroupKey lexicographic order, lib.rs:768-779). Sort keys naming
    * aggregates outside the select list are computed for the sort and
    * dropped from the output (the reference's order_by keys come from the
    * same aggregate map). With `limit`, sort+limit compiles to Spark's
    * TakeOrderedAndProject — per-partition top-k, no global sort. */
  def runSorted(df: DataFrame, q: ZxQuery, tsCol: String = DefaultTsCol,
                sortOutput: Boolean = true): DataFrame = {
    val filtered = scanFilter(df, q, tsCol)
    val keys = groupKeys(q, df.schema)
    val extraSels = (q.orderBy.map(_.select) ++ havingSelects(q) ++
        postComponents(q))
      .filterNot(s => q.selects.contains(s) || s.agg == Agg.Raw || s.agg == Agg.Heatmap)
      .distinct
    val grouped = havingFilter(withPostSelects(
      if (q.rollup || q.cube || q.groupingSets.nonEmpty)
        rollupAgg(filtered, keys, q, q.selects ++ extraSels, df.schema)
      else Aggregates.groupedAgg(filtered, keys, q.groupBy,
        q.selects ++ extraSels, df.schema, q.skewSalt), q), q.having, q.havingTree)
    val ordCols = q.orderBy.map(ob => orderCol(colRef(ob.select.key), ob)) ++
      q.groupBy.map(colRef(_).asc)
    // `sortOutput = false` (derived-table inner whose ORDER BY was
    // stripped): the frame feeds an outer aggregate, so the total-order
    // contract buys nothing — skip the range shuffle entirely
    val sorted = if (ordCols.nonEmpty && sortOutput) grouped.orderBy(ordCols: _*)
                 else grouped
    val limited = (q.limit, q.limitPer) match {
      case (Some(k), Some(per)) =>
        // top-k per group: rank window + rn<=k filter — Spark's
        // InferWindowGroupLimit turns this into per-partition
        // WindowGroupLimit (each task forwards ≤ k rows per group to the
        // one window exchange); the trailing orderBy restores the sorted
        // path's total output order
        require(q.groupBy.contains(per),
          s"limit per '$per' must be a group by key")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(colRef(per)).orderBy(ordCols: _*)
        grouped.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= k).drop("__rn")
          .orderBy(ordCols: _*)
      case (Some(k), None) =>
        // pagination (p105): LIMIT n OFFSET m = rows m+1 … m+n of the
        // ordered output. Spark folds offset+limit into ONE
        // CollectLimit/TakeOrdered boundary — the page costs what the
        // first m+n rows cost, never a full materialization.
        q.offset.map(m => sorted.offset(m)).getOrElse(sorted).limit(k)
      case (None, None) if q.offset.nonEmpty => sorted.offset(q.offset.get)
      case _ => sorted
    }
    if (extraSels.nonEmpty || q.postSelects.nonEmpty)
      limited.select((q.groupBy.map(colRef) ++ q.selects.map(s => colRef(s.key)) ++
        q.postSelects.map(p => colRef(p.alias))): _*)
    else limited
  }

  /** ROLLUP / CUBE aggregation for the sorted path: every groupBy-key
    * prefix — or, for cube, every key SUBSET — aggregates in ONE pass:
    * Spark's Expand emits one row per level per input row ahead of the
    * single hash aggregate, so subtotals cost one plan, not N
    * re-aggregations.
    *
    * Sentinel discipline: group keys arrive already `__nil`-coalesced
    * ([[groupKeys]]), so they are NON-NULL by construction — any null a
    * rollup/cube level emits can only mean "rolled up", and renders as the
    * distinct `__all` marker. A data-missing key therefore stays `__nil`
    * and can never collide with a subtotal row. */
  private def rollupAgg(filtered: DataFrame, keys: Seq[Column], q: ZxQuery,
                        sels: Seq[Select], schema: StructType): DataFrame = {
    require(q.groupBy.nonEmpty, "rollup/cube needs group by columns")
    require(q.skewSalt.isEmpty,
      "rollup/cube with salt is unsupported: the Expand levels already " +
        "spread a hot key's rows across (level × key) groups")
    val aggs = Aggregates.compileAll(sels, schema)
    if (q.groupingSets.nonEmpty) {
      // caller-chosen levels: the coalesced keys materialize as TEMP
      // columns first, so each set's plain column refs match the grouping
      // columns STRUCTURALLY (aliased expressions re-analyze to fresh
      // exprIds inside groupingSets and silently match nothing — every
      // key would render rolled-up); measures still see the originals
      val tmp = q.groupBy.map(g => g -> s"__gs_$g").toMap
      val prepped = q.groupBy.zip(keys).foldLeft(filtered) {
        case (d, (g, k)) => d.withColumn(tmp(g), k)
      }
      return prepped
        .groupingSets(q.groupingSets.map(_.map(g => col(tmp(g)))),
          q.groupBy.map(g => col(tmp(g))): _*)
        .agg(aggs.head, aggs.tail: _*)
        .select(q.groupBy.map(g =>
          coalesce(col(tmp(g)), lit("__all")).as(g)) ++
          sels.map(s => colRef(s.key)): _*)
    }
    val leveled =
      if (q.cube) filtered.cube(keys: _*).agg(aggs.head, aggs.tail: _*)
      else filtered.rollup(keys: _*).agg(aggs.head, aggs.tail: _*)
    leveled
      .select(q.groupBy.map(g => coalesce(colRef(g), lit("__all")).as(g)) ++
        sels.map(s => colRef(s.key)): _*)
  }

  /** Select-list projection for a raw query: plain columns by reference
    * semantics; computed expression projections (extension —
    * `select price * (1 - discount) as net`) through the measure
    * compiler, so row-wise arithmetic codegens identically whether it
    * feeds a filter, an aggregate, or the projection itself. Only the
    * referenced storage columns reach the scan (column pruning sees
    * through the expressions). */
  def rawProjection(selects: Seq[Select],
                    schema: org.apache.spark.sql.types.StructType): Seq[Column] =
    selects.map {
      case s if s.agg == Agg.Raw && s.expr.nonEmpty =>
        Aggregates.measureCol(s.expr.get, schema).as(s.key)
      case s => colRef(s.column)
    }

  /** Raw projection — what a bare `SELECT col` parses to (expr.rs:120-125);
    * `unimplemented!()` in the reference (lib.rs:659-661). Columns are pruned
    * to the select list, so the Parquet scan reads only what is projected. */
  def runRaw(df: DataFrame, q: ZxQuery, tsCol: String = DefaultTsCol): DataFrame = {
    val filtered = scanFilter(df, q, tsCol)
    val cols = rawProjection(q.selects, filtered.schema)
    val projected = if (cols.nonEmpty) filtered.select(cols: _*) else filtered
    q.limit.map(projected.limit).getOrElse(projected)
  }

  /** Heatmap with data-adaptive value bounds: one tiny min/max pre-aggregate
    * (two doubles to the driver) sizes the buckets — the SQL-surface form
    * where the caller can't supply bounds. */
  def adaptiveHeatmap(df: DataFrame, q: ZxQuery, valueCol: String,
                      buckets: Int = 20, tsCol: String = DefaultTsCol): DataFrame = {
    val filtered = scanFilter(df, q, tsCol)
    val v = Aggregates.numeric(valueCol, df.schema)
    val bounds = filtered.agg(min(v), max(v)).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0.0, 1.0)
      else (bounds.getDouble(0), bounds.getDouble(1))
    heatmap(df, q, valueCol, lo, if (hi > lo) math.nextUp(hi) else lo + 1.0,
      buckets, tsCol)
  }

  /** Heatmap — 2-D time × value histogram (declared lib.rs:133-143,
    * unimplemented lib.rs:659-661). `buckets` equal-width value buckets over
    * [lo, hi); bucket ids clamp at the edges. One shuffle on the compound
    * (t_bucket, v_bucket) key; counts are weighted like Count (A4). */
  def heatmap(df: DataFrame, q: ZxQuery, valueCol: String,
              lo: Double, hi: Double, buckets: Int,
              tsCol: String = DefaultTsCol): DataFrame = {
    val filtered = scanFilter(df, q, tsCol)
    val v = Aggregates.numeric(valueCol, df.schema)
    val w = Aggregates.weight(df.schema)
    val tBucket = (floor(col(tsCol).cast(LongType) / q.granularitySec) *
      q.granularitySec).cast(LongType).as("t_bucket")
    val width = (hi - lo) / buckets
    val vBucket = least(greatest(floor((v - lo) / width), lit(0.0)),
      lit((buckets - 1).toDouble)).cast(LongType).as("v_bucket")
    filtered
      .filter(v.isNotNull)
      .groupBy(tBucket, vBucket)
      .agg(sum(w).as("weight"), count(lit(1)).as("n"))
  }
}
