package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the time-series enrichment the
  * reference's observability domain wants: attach to each left event the
  * latest right row whose time is ≤ the event's time, per key.
  *
  * Spark has no ASOF JOIN operator; the naive encodings are a range
  * non-equi join (O(events × versions) explosion, BroadcastNestedLoop at
  * worst) or a per-row probe. This is the scalable formulation: UNION both
  * sides tagged by origin, then ONE window sort per key carries the last
  * non-null right payload forward onto each left row.
  *
  * Scale (100 TB): the whole operator is a single hash Exchange on the key
  * (the union is narrow; both inputs co-shuffle into the window) + one
  * in-partition sort — no join explosion, no per-row probes, and skew is
  * bounded by the hottest key's row count (same bound any per-key
  * sessionization has). Payload columns ride in ONE struct so every
  * attached value provably comes from the SAME matched right row.
  *
  * Requires right rows unique per (key, time) — the caller pins tie-break
  * semantics by pre-deduping (see [[latestPerKeyTime]]); with duplicates
  * the carried row among same-instant versions would be sort-order luck.
  */
object AsofJoin {

  /** One right row per (key, time): the max-`tieCol` version wins — the
    * deterministic "latest version at this instant" rule both engines can
    * replay. One shuffle on (key, time); at scale this is the same exchange
    * shape as the asof window itself. */
  def latestPerKeyTime(right: DataFrame, keyCol: String, timeCol: String,
                       tieCol: String): DataFrame =
    latestPerKeysTime(right, Seq(keyCol), timeCol, tieCol)

  /** Composite-key face of [[latestPerKeyTime]] — one right row per
    * (key tuple, time), same max-`tieCol` rule, same single exchange. */
  def latestPerKeysTime(right: DataFrame, keyCols: Seq[String],
                        timeCol: String, tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "latestPerKeysTime needs at least one key")
    val w = Window.partitionBy(keyCols.map(col) :+ col(timeCol): _*)
      .orderBy(col(tieCol).desc)
    right.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Trailing range join: for each left row, aggregates over the right rows
    * of the same key whose time lies in [t − windowLen, t] (both ends
    * inclusive) — "orders in the last 30 days", "errors in the last hour".
    *
    * The naive encoding is a non-equi join (`l.k = r.k AND r.t BETWEEN
    * l.t − W AND l.t`) — Spark plans that as a per-key nested loop and the
    * result re-aggregates right back down. This is the window form: union
    * both sides, ONE range-frame window per key computes every trailing
    * aggregate in a single sort — same single-exchange shape as [[asof]].
    *
    * `aggs` maps output name → aggregate expression over RIGHT columns
    * (e.g. `sum(col("o_totalprice"))`). Left rows carry nulls in right
    * columns, so null-skipping aggregates (sum/count(col)/min/max/avg)
    * see only right rows; don't use `count(lit(1))` (it would count left
    * rows in the frame too). Right column names (beyond key/time) must not
    * collide with left's. */
  def trailingWindow(left: DataFrame, right: DataFrame,
                     keyL: String, keyR: String, timeL: String, timeR: String,
                     windowLen: Long,
                     aggs: Map[String, org.apache.spark.sql.Column]): DataFrame = {
    val leftCols = left.columns.toSeq
    val overlap = (right.columns.toSet - keyR - timeR) & leftCols.toSet
    require(overlap.isEmpty, s"right columns collide with left: $overlap")
    val clobbered = (leftCols.toSet ++ aggs.keySet) & Reserved.toSet
    require(clobbered.isEmpty, s"columns collide with join internals: $clobbered")
    val dupAgg = aggs.keySet & (leftCols.toSet ++ right.columns.toSet)
    require(dupAgg.isEmpty, s"aggregate names collide with input columns: $dupAgg")
    val l = left
      .withColumn("__k", col(keyL)).withColumn("__t", col(timeL))
      .withColumn("__side", lit(1))
    val r = right
      .withColumn("__k", col(keyR)).withColumn("__t", col(timeR))
      .withColumn("__side", lit(0))
      .drop(keyR, timeR)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rangeBetween(-windowLen, 0)
    val withAggs = aggs.foldLeft(u) { case (df, (name, agg)) =>
      df.withColumn(name, agg.over(w))
    }
    withAggs.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ aggs.keys.toSeq.sorted.map(col): _*)
  }

  /** Streaming face of [[trailingWindow]]: evaluate each micro-batch of a
    * streaming left against a STATIC right side and hand the enriched
    * batch to `consume`. Sound without any state because a trailing
    * aggregate is a per-left-row function of (row, right table) — left
    * rows never interact — so per-micro-batch evaluation produces exactly
    * the rows the batch operator would for those events, regardless of how
    * the stream is chopped (spec-pinned on a two-batch feed). A streaming
    * RIGHT side genuinely needs stream-stream state and is rejected.
    *
    * Each micro-batch pays one window exchange over (batch ∪ right) — at
    * 100 TB/day this bounds the per-trigger shuffle to the trigger's
    * events + the dimension table, the same economics as the batch form.
    * Returns the unstarted writer: callers pick trigger/checkpoint and
    * `.start()`. */
  def trailingWindowStream(left: DataFrame, right: DataFrame,
                           keyL: String, keyR: String, timeL: String, timeR: String,
                           windowLen: Long,
                           aggs: Map[String, org.apache.spark.sql.Column])
                          (consume: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(left.isStreaming, "trailingWindowStream: left side must be a stream " +
      "(for a batch left use trailingWindow directly)")
    require(!right.isStreaming, "trailingWindowStream: right side must be static " +
      "— a streaming right needs a stateful stream-stream join")
    left.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        consume(trailingWindow(batch, right, keyL, keyR, timeL, timeR, windowLen, aggs))
    }
  }

  /** Left rows + `payload` columns of the as-of matched right row (null
    * payload where no right row precedes). `timeL`/`timeR` may be any
    * mutually comparable orderable type; equality on time MATCHES (≤, not
    * <). Right rows must be unique per (key, time). */
  /** Working column names the union/window plumbing claims — a left frame
    * using any of them would be silently clobbered by withColumn. */
  private val Reserved = Seq("__k", "__t", "__side", "__pay", "__last")

  /** Broadcast ASOF: the stateless, shuffle-free formulation for a SMALL
    * right side — the sorted version history of every key rides as a
    * plan-resident LocalRelation that BROADCAST-HASH-joins onto the left
    * (one broadcast, zero shuffles; the hash relation probes O(1) where
    * the earlier map-literal probe was a linear scan per row — the
    * st_asof per-micro-batch instrumentation caught that at 3k keys ×
    * 100k rows). Each left row then applies codegen'd higher-order
    * functions to its key's history: `filter(v.t ≤ t)` keeps the visible
    * prefix and `try_element_at(arr, -1)` takes its last (= latest ≤ t)
    * element. Missing key or no visible version → null payload, exactly
    * [[asof]]'s left-outer semantics; same-instant versions are visible
    * (≤, like [[asof]]'s right-sorts-first tie rule).
    *
    * Because no window, shuffle, or state is involved (a stream-static
    * left join is append-mode legal), the SAME call works on a STREAMING
    * left side — this is the streaming face of the asof family (j2) for
    * dimension enrichment: at 100 TB/day of events and a bounded
    * dimension (service catalog, deploy history), the probe is a narrow
    * hash lookup over the stream. The right side is require-bounded at
    * `maxRightRows` plan-resident rows; a bigger right side belongs in the
    * single-exchange [[asof]] (batch) or a stateful stream-stream join.
    *
    * Same uniqueness contract as [[asof]]: one right row per (key, time)
    * ([[latestPerKeyTime]]) — enforced loudly here because the collected
    * histories would otherwise carry sort-order luck into every probe.
    *
    * A right side that outgrows `maxRightRows` DEGRADES, it doesn't crash:
    * on a batch left the call falls back to the single-exchange [[asof]]
    * (same output, windowed plan) with a loud warning — a dimension table
    * crossing 10k rows must not turn a working job into a failure. A
    * STREAMING left keeps the hard error: [[asof]] needs a window sort, so
    * no equivalent plan exists and failing loudly beats hanging. */
  def asofBroadcast(left: DataFrame, right: DataFrame,
                    keyL: String, keyR: String, timeL: String, timeR: String,
                    payload: Seq[String], maxRightRows: Int = 10000): DataFrame =
    asofBroadcastKeys(left, right, Seq(keyL), Seq(keyR), timeL, timeR,
      payload, maxRightRows)

  /** Composite-key face of [[asofBroadcast]] — the (user, device)-style
    * pair key a real session store versions on. Composite keys are plain
    * MULTI-CONDITION equi-join keys on the broadcast hash relation (no
    * struct packing); a left row with ANY null key component matches
    * nothing (SQL equality per condition), and right rows with any null
    * component are dropped like the scalar path's null keys. Same
    * plan-resident bound, same loud contracts, same STREAMING soundness
    * (no window, shuffle, or state — the probe is a hash lookup). */
  def asofBroadcastKeys(left: DataFrame, right: DataFrame,
                        keysL: Seq[String], keysR: Seq[String],
                        timeL: String, timeR: String,
                        payload: Seq[String], maxRightRows: Int = 10000): DataFrame = {
    require(keysL.nonEmpty && keysL.length == keysR.length,
      s"asofBroadcast needs matched key lists, got $keysL vs $keysR")
    val nK = keysL.length
    require(payload.nonEmpty, "asofBroadcast needs at least one payload column")
    require(!payload.contains("__vt"), "payload name __vt is reserved")
    val dup = payload.toSet & left.columns.toSet
    require(dup.isEmpty, s"payload names collide with left columns: $dup")
    val rows = right.select(keysR.map(col) ++ (col(timeR) +: payload.map(col)): _*)
      .limit(maxRightRows + 1).collect()
    if (rows.length > maxRightRows) {
      require(!left.isStreaming,
        s"asofBroadcast: right side exceeds $maxRightRows rows and the left is " +
          "a STREAM — the windowed asof() fallback needs a batch left; bound " +
          "the right side (latestPerKeyTime / filter) or use a stateful " +
          "stream-stream join")
      // The fallback enforces the SAME contract the collected path does
      // below — duplicate (key, time) versions and null version times must
      // fail loudly on BOTH sides of the maxRightRows boundary, or dirty
      // input flips from a clear error to sort-order luck (asof()'s window
      // breaks right-side ties arbitrarily) the moment the dimension
      // grows. One audit job over the right side, distributed; the
      // (null-key, null-time) corner mirrors the collected path, which
      // drops null keys before the null-time check.
      val allKeysNotNull = keysR.map(col(_).isNotNull).reduce(_ && _)
      val bad = right
        .select(keysR.zipWithIndex.map { case (k, i) => col(k).as(s"__k$i") }
          :+ col(timeR).as("__t"): _*)
        .groupBy((0 until nK).map(i => col(s"__k$i")) :+ col("__t"): _*)
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1 || (col("__t").isNull &&
          (0 until nK).map(i => col(s"__k$i").isNotNull).reduce(_ && _)))
        .limit(1).collect()
      bad.headOption.foreach { r =>
        if (r.getLong(nK + 1) > 1) throw new IllegalArgumentException(
          s"asofBroadcast: duplicate (key, time) right rows at " +
            s"(${(0 to nK).map(r.get).mkString(", ")}) — pre-dedupe with " +
            "latestPerKeyTime")
        else throw new IllegalArgumentException(
          s"asofBroadcast: right rows have a null $timeR — a null version " +
            "time can never match; filter them out or fix the source")
      }
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"asofBroadcast: right side exceeds $maxRightRows rows — falling back " +
          "to the single-exchange asof() (same output, windowed plan); " +
          "broadcast economics are lost, raise maxRightRows deliberately if " +
          "the plan-resident size is acceptable")
      // null-key right rows match nothing in the broadcast probe (SQL
      // equality); asof()'s window would group them WITH null-key left
      // rows, so drop them to keep the boundary behavior identical
      val keyedRight = right.filter(allKeysNotNull)
      require(!keyedRight.isEmpty, "asofBroadcast: every right row has a null key")
      if (nK == 1)
        return asof(left, keyedRight, keysL.head, keysR.head, timeL, timeR, payload)
      // composite fallback: ONE struct key per side (positional field
      // names — asof() unions the sides by name), dropped after; same
      // single-exchange plan the batch SQL face compiles to
      def keyStruct(cols: Seq[String]) = struct(cols.zipWithIndex.map {
        case (c, i) => col(c).as(s"k$i") }: _*)
      return asof(left.withColumn("__bkl", keyStruct(keysL)),
        keyedRight.withColumn("__bkr", keyStruct(keysR)),
        "__bkl", "__bkr", timeL, timeR, payload).drop("__bkl")
    }
    require(rows.nonEmpty, "asofBroadcast: right side is empty")
    val dupKT = rows.groupBy(r => (0 to nK).map(r.get))
      .filter(_._2.length > 1).keys
    require(dupKT.isEmpty,
      s"asofBroadcast: duplicate (key, time) right rows at ${dupKT.take(3)
        .map(_.mkString("(", ", ", ")")).mkString(", ")} — " +
        "pre-dedupe with latestPerKeyTime")
    // SQL equality semantics: a null key (any component) matches nothing
    // (DuckDB's ASOF JOIN agrees) — and a null map-literal key would
    // throw at runtime anyway
    val keyed = rows.filter(r => (0 until nK).forall(i => !r.isNullAt(i)))
    require(keyed.nonEmpty, "asofBroadcast: every right row has a null key")
    // a null version time could NEVER match (__vt <= t is null-false in the
    // probe) but would sort by luck among its key's history — reject loudly,
    // mirroring the null-key rule's explicitness rather than its silence:
    // a null key is standard SQL match-nothing, a null version TIME is
    // almost certainly upstream data corruption
    val nullT = keyed.filter(_.isNullAt(nK))
    require(nullT.isEmpty,
      s"asofBroadcast: ${nullT.length} right rows have a null $timeR — a null " +
        "version time can never match; filter them out or fix the source")
    val ord = new Ordering[Any] {
      def compare(a: Any, b: Any): Int = (a, b) match {
        case (x: java.lang.Comparable[_], y: java.lang.Comparable[_])
            if x.getClass.isInstance(y) || y.getClass.isInstance(x) =>
          x.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
        case (x, y) => throw new IllegalArgumentException(
          s"asofBroadcast: $timeR values are not mutually comparable " +
            s"(${x.getClass.getName} vs ${y.getClass.getName})")
      }
    }
    // PROBE PLAN (round 14): a BROADCAST HASH JOIN against the collected
    // histories, not a plan-literal map — GetMapValue on a map literal is
    // a LINEAR SCAN per probe (O(|keys|) comparisons per row; st_asof's
    // per-micro-batch instrumentation showed ~9 s/batch at 3k keys ×
    // 100k rows), where the broadcast hash relation probes O(1). The
    // history rows are built on the DRIVER from the already-collected,
    // already-validated rows (a LocalRelation — the right source is
    // never re-scanned and NOTHING aggregates in the plan, so the only
    // exchange is the broadcast itself), composite keys are plain
    // multi-condition equi-join keys (no struct packing needed — null
    // components match nothing by SQL equality), and the stream stays
    // stateless: a stream-static left-outer join is append-mode legal.
    // Semantics unchanged: missing key → null history → null payload;
    // per-row visibility filter + last element exactly as before.
    val spark = right.sparkSession
    val selSchema = right
      .select(keysR.map(col) ++ (col(timeR) +: payload.map(col)): _*).schema
    val bk = keysR.indices.map(i => s"__bk$i")
    val clash = (bk :+ "__hist").toSet & left.columns.toSet
    require(clash.isEmpty, s"left columns collide with asof internals: $clash")
    val histSchema = org.apache.spark.sql.types.StructType(
      keysR.indices.map(i => selSchema(i).copy(name = bk(i))) :+
        org.apache.spark.sql.types.StructField("__hist",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StructType(
              selSchema(nK).copy(name = "__vt") +:
                payload.zipWithIndex.map { case (p, i) =>
                  selSchema(nK + 1 + i).copy(name = p)
                }))))
    val histRows = keyed.groupBy(r => (0 until nK).map(r.get)).toSeq.map {
      case (k, vs) =>
        org.apache.spark.sql.Row.fromSeq(k ++ Seq(
          vs.sortBy(_.get(nK))(ord).toSeq.map { r =>
            org.apache.spark.sql.Row.fromSeq(
              r.get(nK) +: payload.indices.map(i => r.get(nK + 1 + i)))
          }))
    }
    import scala.jdk.CollectionConverters._
    val hist = spark.createDataFrame(histRows.asJava, histSchema)
    val cond = keysL.zip(bk).map { case (l, b) => col(l) === col(b) }
      .reduce(_ && _)
    val joined = left.join(broadcast(hist), cond, "left")
    val visible = filter(col("__hist"), v => v.getField("__vt") <= col(timeL))
    val matched = try_element_at(visible, lit(-1))
    payload.foldLeft(joined) { case (df, p) =>
      df.withColumn(p, matched.getField(p))
    }.drop("__hist").drop(bk: _*)
  }

  def asof(left: DataFrame, right: DataFrame,
           keyL: String, keyR: String, timeL: String, timeR: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "asof needs at least one payload column")
    val clobbered = leftCols.toSet & Reserved.toSet
    require(clobbered.isEmpty, s"left columns collide with asof internals: $clobbered")
    val dup = payload.toSet & leftCols.toSet
    require(dup.isEmpty, s"payload names collide with left columns: $dup")
    // left side: payload struct absent; right side: left columns absent.
    // unionByName(allowMissingColumns) null-fills both directions.
    val l = left
      .withColumn("__k", col(keyL)).withColumn("__t", col(timeL))
      .withColumn("__side", lit(1))
    val r = right
      .select(col(keyR).as("__k"), col(timeR).as("__t"),
        struct(payload.map(col): _*).as("__pay"))
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // same (key, time): the right row sorts first (side 0 < 1), so an
    // exactly-simultaneous version is visible to the event — ASOF is ≤
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("__last", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    filled.select(leftCols.map(col) ++
      payload.map(p => col(s"__last.$p").as(p)): _*)
  }
}
