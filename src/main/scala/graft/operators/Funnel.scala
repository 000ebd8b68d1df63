package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Funnel / journey mining over event streams — the ordered-sequence
  * analytics a pure aggregation engine can't express: which event-type
  * paths do entities actually walk?
  *
  * Determinism is the whole design: every ordering ties back to a total
  * order (time, then id), so the SAME paths come out of any partitioning,
  * any engine. Plan shape: ONE window exchange on (entity, day) assigns
  * ranks (streaming O(1)/row window — no buffering), the path builds in
  * the same exchange's aggregation, and the final pattern count is a tiny
  * second shuffle + TakeOrderedAndProject. Path length is capped BEFORE
  * the path string materializes, so a hot entity contributes a bounded
  * row, not an unbounded string — the 100 TB guard. */
object Funnel {

  /** Top journey patterns: per (entity, day), the first `maxSteps` events
    * in (time, id) order joined as "a>b>c", then pattern counts ranked
    * (count DESC, path ASC). */
  def topJourneys(ev: DataFrame, maxSteps: Int = 8, topK: Int = 20,
                  keyCol: String = "user_id", tsCol: String = "ts",
                  idCol: String = "event_id", stepCol: String = "event_type")
      : DataFrame = {
    require(maxSteps >= 1 && topK >= 1,
      s"topJourneys: need maxSteps/topK ≥ 1, got $maxSteps/$topK")
    val day = to_date(col(tsCol)).as("__d")
    val w = Window.partitionBy(col(keyCol), col("__d"))
      .orderBy(col(tsCol), col(idCol))
    ev.filter(col(keyCol).isNotNull)
      .select(col(keyCol), day, col(tsCol), col(idCol), col(stepCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxSteps)
      // array_sort on (ts, id, step) structs = the window's total order,
      // so the collected path is deterministic under any shuffle
      .groupBy(col(keyCol), col("__d"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col(tsCol), col(idCol),
          col(stepCol).as("s")))), x => x.getField("s")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_journeys"))
      .orderBy(col("n_journeys").desc, col("path").asc)
      .limit(topK)
  }

  /** Exponential half-life smoothing per (entity, day): fold the
    * (time, id)-ordered values as `acc = acc·0.5 + v` — each event's
    * weight halves with every later event, the streaming-friendly recency
    * bias. The multiplier is EXACTLY 0.5 on purpose: the fold stays in
    * IEEE +,* (engine-portable bit-for-bit) where a general `pow(λ, k)`
    * would drift across libm implementations. Only the LAST `maxEvents`
    * events are folded — a 2^-64 weight is below any double's resolution,
    * so the cap changes nothing numerically while bounding a hot entity's
    * collected array (the 100 TB guard); the cap is part of the operator
    * contract so any replay applies the same truncation. */
  def decayedValues(ev: DataFrame, maxEvents: Int = 64,
                    keyCol: String = "user_id", tsCol: String = "ts",
                    idCol: String = "event_id", valCol: String = "value")
      : DataFrame = {
    require(maxEvents >= 1, s"decayedValues: maxEvents must be ≥1, got $maxEvents")
    val day = to_date(col(tsCol)).as("__d")
    val wDesc = Window.partitionBy(col(keyCol), col("__d"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val sortedVals = transform(array_sort(collect_list(struct(col(tsCol),
      col(idCol), coalesce(col(valCol), lit(0.0)).as("v")))), x => x.getField("v"))
    ev.filter(col(keyCol).isNotNull)
      .select(col(keyCol), day, col(tsCol), col(idCol), col(valCol))
      .withColumn("__rn", row_number().over(wDesc))
      .filter(col("__rn") <= maxEvents)
      .groupBy(col(keyCol), col("__d"))
      // fixed-point floor(x·2^20), not round(x, 6): the folds are
      // bit-identical across engines, but decimal ROUNDING of a double is
      // not (BigDecimal half-up vs float-mul rounding diverge on boundary
      // values — one sf0.01 row sat exactly on a 6dp tie)
      .agg(floor(aggregate(sortedVals, lit(0.0),
        (acc, v) => acc * lit(0.5) + v) * lit(1048576.0))
        .cast(org.apache.spark.sql.types.LongType).as("decayed_fp"),
        count(lit(1)).as("n_events"))
  }

  /** Time-bounded funnel (a17): like [[funnelStages]], but later steps
    * only count within `windowSec` seconds of the entity's ANCHOR — its
    * FIRST step-1 event of the day ("first-touch" attribution: the anchor
    * never re-arms, so the verdict is a deterministic fold both engines
    * replay identically). Same plan as [[funnelStages]]: only
    * funnel-relevant events collect, the fold is one codegen'd
    * `aggregate` with a (stage, anchor-time) struct accumulator, one
    * exchange + a tiny stage-count shuffle. Ordering and the time
    * arithmetic both use whole-second timestamps with the id tiebreak, so
    * the walk is engine-exact. */
  def funnelStagesWithin(ev: DataFrame, steps: Seq[String], windowSec: Long,
                         keyCol: String = "user_id", tsCol: String = "ts",
                         idCol: String = "event_id", stepCol: String = "event_type")
      : DataFrame = {
    require(steps.nonEmpty && steps.size <= 16, "funnel needs 1-16 steps")
    require(windowSec > 0, s"funnelStagesWithin: windowSec must be > 0, got $windowSec")
    val day = to_date(col(tsCol)).as("__d")
    val tSec = col(tsCol).cast(org.apache.spark.sql.types.LongType)
    val sorted = transform(array_sort(collect_list(struct(tSec.as("t"),
      col(idCol).as("i"), col(stepCol).as("s")))),
      x => struct(x.getField("t").as("t"), x.getField("s").as("s")))
    def st(k: Column, t0: Column) = struct(
      k.cast(org.apache.spark.sql.types.IntegerType).as("k"),
      t0.cast(org.apache.spark.sql.types.LongType).as("t0"))
    val reached = aggregate(sorted, st(lit(0), lit(0L)), (acc, e) => {
      val anchor = when(acc.getField("k") === 0 &&
        e.getField("s") === lit(steps.head), st(lit(1), e.getField("t")))
      (1 until steps.size).foldLeft(anchor) { (w, i) =>
        w.when(acc.getField("k") === i &&
          e.getField("s") === lit(steps(i)) &&
          e.getField("t") - acc.getField("t0") <= windowSec,
          st(lit(i + 1), acc.getField("t0")))
      }.otherwise(acc)
    }).getField("k")
    ev.filter(col(keyCol).isNotNull)
      .filter(col(stepCol).isin(steps: _*))
      .select(col(keyCol), day, col(tsCol), col(idCol), col(stepCol))
      .groupBy(col(keyCol), col("__d"))
      .agg(reached.as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_entity_days"))
  }

  /** Funnel conversion: how many entities reach each prefix of `steps` in
    * order (loose containment — other events may interleave)? One pass:
    * the reached stage per entity-day is the longest prefix matched by a
    * running scan, computed with ONE window + one aggregation. */
  def funnelStages(ev: DataFrame, steps: Seq[String],
                   keyCol: String = "user_id", tsCol: String = "ts",
                   idCol: String = "event_id", stepCol: String = "event_type")
      : DataFrame = {
    require(steps.nonEmpty && steps.size <= 16, "funnel needs 1-16 steps")
    val day = to_date(col(tsCol)).as("__d")
    // stage reached = fold over the (time, id)-sorted step sequence:
    // advance the cursor when the next funnel step appears
    val sorted = transform(array_sort(collect_list(struct(col(tsCol),
      col(idCol), col(stepCol).as("s")))), x => x.getField("s"))
    val stepsArr = array(steps.map(lit): _*)
    val reached = aggregate(sorted, lit(0),
      (acc, s) => when(acc < steps.size &&
        s === element_at(stepsArr, acc + 1), acc + 1).otherwise(acc))
    // only funnel-relevant events are collected — loose containment means
    // interleaved other events can't change the fold, and the per-group
    // array stays bounded by funnel traffic, not total traffic
    val perEntity = ev.filter(col(keyCol).isNotNull)
      .filter(col(stepCol).isin(steps: _*))
      .select(col(keyCol), day, col(tsCol), col(idCol), col(stepCol))
      .groupBy(col(keyCol), col("__d"))
      .agg(reached.as("stage"))
    perEntity.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_entity_days"))
  }

  /** Last-touch attribution (a18): credit each conversion event to the
    * LAST preceding non-conversion event by the same entity within
    * `lookbackSec` seconds — the marketing-analytics staple the funnel
    * family can't express (funnels count reach; attribution assigns
    * credit). Plan: ONE window exchange on the entity carries the most
    * recent non-conversion (t, type) forward with `last(..., ignoreNulls)
    * ROWS UNBOUNDED PRECEDING → 1 PRECEDING` — an O(1)/row running
    * window, no buffering, no self-join — then a tiny per-touch-type
    * aggregation. Ordering is whole-second time with the id tiebreak
    * (the family's total order), credited value is fixed-point
    * floor(v·2^20) so the sum is an order-free integer. Conversions with
    * no in-window touch credit the `__none` sentinel, so the output
    * partitions ALL conversions. */
  def lastTouchAttribution(ev: DataFrame, convType: String,
                           lookbackSec: Long, keyCol: String = "user_id",
                           tsCol: String = "ts", idCol: String = "event_id",
                           stepCol: String = "event_type",
                           valCol: String = "value"): DataFrame = {
    require(lookbackSec > 0,
      s"lastTouchAttribution: lookbackSec must be > 0, got $lookbackSec")
    val tSec = col(tsCol).cast(org.apache.spark.sql.types.LongType)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = last(when(col(stepCol) =!= convType,
      struct(col("__t").as("t"), col(stepCol).as("s"))), ignoreNulls = true)
      .over(w)
    ev.filter(col(keyCol).isNotNull)
      .select(col(keyCol), tSec.as("__t"), col(idCol), col(stepCol),
        floor(coalesce(col(valCol), lit(0.0)) * lit(1048576.0))
          .cast(org.apache.spark.sql.types.LongType).as("__vfp"))
      .withColumn("__touch", touch)
      .filter(col(stepCol) === convType)
      .select(
        when(col("__touch").isNotNull &&
          col("__t") - col("__touch.t") <= lookbackSec,
          col("__touch.s")).otherwise(lit("__none")).as("touch_type"),
        col("__vfp"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"), sum(col("__vfp")).as("credited_fp"))
  }

  /** Cohort retention (a16): users bucketed by their FIRST-seen day, then
    * activity counted per (cohort, day-offset) — the product-analytics
    * staple. The per-user first day rides a window over the user exchange
    * (no self-join back), then one (cohort, offset) aggregation with
    * exact distinct users: two exchanges total at any scale. */
  def cohortRetention(ev: DataFrame, keyCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val base = ev.filter(col(keyCol).isNotNull)
      .select(col(keyCol), to_date(col(tsCol)).as("__d"))
    val w = Window.partitionBy(col(keyCol))
    base.withColumn("__cohort", min(col("__d")).over(w))
      .groupBy(date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("__d"), col("__cohort")).as("day_offset"))
      .agg(countDistinct(col(keyCol)).as("n_users"),
        count(lit(1)).as("n_events"))
  }

  /** Event-type transition counts: how often does type A immediately
    * precede type B in an entity's (time, id)-ordered stream? ONE window
    * exchange on the entity (lag is an O(1)/row running window) plus a
    * tiny (prev, next) count shuffle — the input to Markov-chain
    * modelling of user behaviour. */
  def typeTransitions(ev: DataFrame, keyCol: String = "user_id",
                      tsCol: String = "ts", idCol: String = "event_id",
                      stepCol: String = "event_type"): DataFrame = {
    val tSec = col(tsCol).cast(org.apache.spark.sql.types.LongType)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col(idCol))
    ev.filter(col(keyCol).isNotNull)
      .select(col(keyCol), tSec.as("__t"), col(idCol), col(stepCol))
      .withColumn("__prev", lag(col(stepCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(stepCol).as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
  }

  /** Exact linear trend of `valCol` over day-of-month, per `groupCol` —
    * "is this metric drifting?" without a float regression: the slope is
    * reported as the integer PAIR (num, den) = (n·Σxy − Σx·Σy,
    * n·Σx² − (Σx)²) over fixed-point `floor(v·2^10)` values, so the
    * entire computation is order-free BIGINT sums in ONE aggregation
    * (map-side partials, one tiny exchange — PlanSpec-pinned) and any
    * engine reproduces it bit-for-bit; the consumer divides num/den when
    * it wants the float. The 2^10 scale keeps n·Σxy under 2^63 through
    * ~10^6 rows/group — beyond that, drop the scale a few bits (same
    * algebra). */
  def linearTrend(ev: DataFrame, valCol: String = "value",
                  groupCol: String = "event_type",
                  tsCol: String = "ts"): DataFrame = {
    val longT = org.apache.spark.sql.types.LongType
    val e = ev.filter(col(valCol).isNotNull)
      .select(col(groupCol),
        dayofmonth(col(tsCol)).cast(longT).as("__x"),
        floor(col(valCol) * lit(1024.0)).cast(longT).as("__y"))
    e.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"), sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col(groupCol), col("n"),
        (col("n") * col("__sxy") - col("__sx") * col("__sy")).as("slope_num"),
        (col("n") * col("__sxx") - col("__sx") * col("__sx")).as("slope_den"))
  }

  /** Stationary distribution of the [[typeTransitions]] Markov chain by
    * `iters` power iterations — "where does user attention settle?".
    *
    * The heavy work is distributed (the transition counts); the iteration
    * runs driver-side on the collected matrix, a BOUNDED artifact — the
    * collect itself is capped at `maxStates² + 1` rows by a `limit` INSIDE
    * the distributed plan, so a high-cardinality step column (URLs, SKUs
    * as event types) fails loudly BEFORE the driver ever holds the K²
    * matrix, not after. ENGINE-EXACT fixed point: mass starts
    * at 2^36 per state and each step moves `(p·cnt) div rowsum` in pure
    * BIGINT arithmetic — floor-per-edge, summed — so any engine replays
    * the trajectory bit-for-bit (no float stochastic matrix, no
    * convergence epsilon). States with no outgoing edges leak their mass
    * (the walk ends there), stated and replayed identically. Long-range
    * bound: mass ≤ K·2^36 < 2^43 and per-edge products stay ≤ p·cnt <
    * 2^43+log2(cnt) — safe while transition counts stay below 2^20, now
    * ENFORCED by a loud `require` (silent Long overflow would make the
    * "engine-exact" result quietly wrong); at true 100 TB counts, drop
    * the seed to 2^30 (same algebra, wider headroom). */
  def stationaryDistribution(ev: DataFrame, iters: Int = 20,
                             maxStates: Int = 64, keyCol: String = "user_id",
                             tsCol: String = "ts", idCol: String = "event_id",
                             stepCol: String = "event_type"): DataFrame = {
    require(iters >= 1 && iters <= 100,
      s"stationaryDistribution: iters must be in [1,100], got $iters")
    // bounded collect: limit() rides INSIDE the distributed plan, so at
    // most maxStates²+1 rows ever reach the driver — the cardinality guard
    // fires before the K² matrix materializes, not after the OOM it
    // prevents. (K states can also hide under maxStates² sparse rows, so
    // the distinct-state check below still runs on the bounded block.)
    val cap = maxStates * maxStates
    val trans = typeTransitions(ev, keyCol, tsCol, idCol, stepCol)
      .limit(cap + 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(trans.length <= cap,
      s"stationaryDistribution: step column '$stepCol' yields more than " +
        s"$cap distinct (prev, next) transitions (maxStates=$maxStates) — " +
        "a state space this wide needs the distributed path")
    val states = (trans.map(_._1) ++ trans.map(_._2)).distinct.sorted
    require(states.size <= maxStates,
      s"stationaryDistribution: ${states.size} states exceeds maxStates=" +
        s"$maxStates — a state space this wide needs the distributed path")
    // enforce the scaladoc's stated headroom: p(i)·c must stay inside a
    // Long (mass ≤ K·2^36, so counts < 2^20 keep products < 2^63) — out-of-
    // headroom inputs fail loudly instead of silently wrapping
    require(trans.forall(_._3 < (1L << 20)),
      s"stationaryDistribution: a transition count reaches 2^20 — the " +
        "2^36 fixed-point seed would overflow Long; re-seed at 2^30 " +
        "(reduced precision) or pre-aggregate the stream")
    val rowSum = trans.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var p: Map[String, Long] = states.map(_ -> (1L << 36)).toMap
    for (_ <- 1 to iters) {
      val next = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      trans.foreach { case (i, j, c) =>
        next(j) += p(i) * c / rowSum(i)
      }
      p = states.map(s => s -> next(s)).toMap
    }
    val spark = ev.sparkSession
    import spark.implicits._
    states.map(s => (s, p(s), rowSum.getOrElse(s, 0L))).toSeq
      .toDF("event_type", "p_fp", "n_out")
  }

  /** DISTRIBUTED stationary distribution — the path
    * [[stationaryDistribution]]'s cardinality guard points at: for step
    * columns whose state space outgrows any driver matrix (URLs, SKUs as
    * event types), the transition table stays a DataFrame and each power
    * iteration is one broadcast-or-shuffle join + aggregation over it —
    * no K² rows ever reach the driver, K is unbounded.
    *
    * SAME fixed-point algebra, bit-for-bit (spec-pinned equal to the
    * driver walk on a shared input): mass seeds at 2^36 per state and
    * each edge moves `(p·c) DIV rowsum` — Spark's `IntegralDivide` on
    * Longs, the exact floor-per-edge the driver loop and the DuckDB `//`
    * replay compute — then sums per target state. States with no
    * incoming edges hold mass 0; states with no outgoing edges leak,
    * identically to the driver path. Long headroom is ENFORCED, never
    * assumed, in two layers: BEFORE the loop, counts must satisfy
    * `2^36 · maxCount < 2^63` (otherwise iteration 1's seed products wrap
    * before any after-the-fact check could see them) — and because total
    * fixed-point mass is NON-INCREASING under this algebra (every edge
    * moves `floor(p·c / rowsum)` and Σ_j c_ij = rowsum_i, so Σ next ≤
    * Σ p), per-state mass is bounded by the seed total K·2^36 at EVERY
    * iteration: when that bound already fits the headroom the whole run
    * is overflow-free by construction and the loop performs zero
    * per-iteration driver checks. Only when K·2^36 could exceed the
    * headroom does each iteration spend ONE driver action max/min-
    * checking the (tiny, K-row) state — `max` against the product
    * headroom, `min ≥ 0` so a wrapped per-state SUM (negative, invisible
    * to a max check) also fails loudly with the re-seed advice.
    *
    * Plan shape per iteration: state (K rows, localCheckpoint'd — lineage
    * cut, so iteration i never replays iterations 1..i−1) joins the
    * checkpointed transition table on prev, aggregates on next, left
    * joins back to the state spine: 3 bounded shuffles × `iters`, each
    * over O(|transitions|) rows — never the events table, which is read
    * exactly once to build the counts. */
  def stationaryDistributionDistributed(ev: DataFrame, iters: Int = 20,
                                        keyCol: String = "user_id",
                                        tsCol: String = "ts",
                                        idCol: String = "event_id",
                                        stepCol: String = "event_type")
      : DataFrame = {
    require(iters >= 1 && iters <= 100,
      s"stationaryDistributionDistributed: iters must be in [1,100], got $iters")
    stationaryIterate(
      typeTransitions(ev, keyCol, tsCol, idCol, stepCol)
        .select(col("prev_type"), col("next_type"), col("n_trans")),
      iters)
  }

  /** The power-iteration core behind [[stationaryDistributionDistributed]]
    * — takes the (prev_type, next_type, n_trans) transition table
    * directly, so the overflow contract is testable at its exact
    * boundaries without materializing 2^27 events. */
  private[graft] def stationaryIterate(transIn: DataFrame, iters: Int)
      : DataFrame = {
    val trans = transIn.localCheckpoint()
    val maxC = trans.agg(max(col("n_trans"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val headroom = if (maxC > 0) Long.MaxValue / maxC else Long.MaxValue
    // iteration 1's products are exactly 2^36·c — this must hold BEFORE
    // the loop (a post-iteration check would only see the already-wrapped
    // garbage)
    require((1L << 36) <= headroom,
      s"stationaryDistributionDistributed: max transition count $maxC " +
        "reaches 2^27 — the 2^36 fixed-point seed would overflow Long on " +
        "the first iteration; re-seed below 2^36 (reduced precision) or " +
        "pre-aggregate the stream")
    val rs = trans.groupBy(col("prev_type"))
      .agg(sum(col("n_trans")).as("__rc"))
    val tr = trans.join(rs, "prev_type").localCheckpoint()
    val states = trans.select(col("prev_type").as("st"))
      .union(trans.select(col("next_type").as("st")))
      .distinct().localCheckpoint()
    // total mass never increases (see scaladoc), so per-state mass is
    // ≤ K·2^36 forever: when that fits the headroom, no iteration can
    // overflow and the loop spends NO driver actions on checks
    val safeForever = states.count() <= headroom / (1L << 36)
    var p = states.withColumn("__p", lit(1L << 36)).localCheckpoint()
    // Checkpoint CADENCE (r14, opt guide §1.2 "remove passes"): each
    // iteration references its predecessor exactly once (join → agg →
    // spine join), so lineage grows LINEARLY — materializing every round
    // made the loop job-latency-bound (one eager job per iteration over a
    // tiny table). In the safeForever regime, cut lineage every 4 rounds:
    // identical fixpoint (pure restructuring of when plans materialize),
    // ~¼ the driver roundtrips. The !safeForever regime keeps per-round
    // materialization — its overflow checks must act on each round.
    var sinceCkpt = 0
    for (i <- 1 to iters) {
      val moved = tr.join(p, tr("prev_type") === p("st"))
        .select(col("next_type").as("st"),
          expr("(__p * n_trans) DIV __rc").as("__m"))
        .groupBy(col("st"))
        .agg(sum(col("__m")).as("__p"))
      val next = states.join(moved, Seq("st"), "left")
        .select(col("st"), coalesce(col("__p"), lit(0L)).as("__p"))
      sinceCkpt += 1
      p = if (!safeForever || sinceCkpt >= 4 || i == iters) {
        sinceCkpt = 0; next.localCheckpoint()
      } else next
      if (!safeForever) {
        // one action: max guards the next iteration's products, min
        // catches a per-state SUM that wrapped negative this iteration
        val r = p.agg(max(col("__p")), min(col("__p"))).head()
        val pMax = if (r.isNullAt(0)) 0L else r.getLong(0)
        val pMin = if (r.isNullAt(1)) 0L else r.getLong(1)
        require(pMin >= 0L,
          s"stationaryDistributionDistributed: after iteration $i a " +
            s"state's mass sum overflowed Long (min mass $pMin); re-seed " +
            "below 2^36 (reduced precision) or pre-aggregate the stream")
        // the max guard protects the NEXT step's products — the final
        // iteration has none, and its (legal) mass is simply returned
        require(i == iters || pMax <= headroom,
          s"stationaryDistributionDistributed: after iteration $i a state " +
            s"holds mass $pMax with max transition count $maxC — the next " +
            "step would overflow Long; re-seed below 2^36 (reduced " +
            "precision) or pre-aggregate the stream")
      }
    }
    p.join(rs, p("st") === rs("prev_type"), "left")
      .select(col("st").as("event_type"), col("__p").as("p_fp"),
        coalesce(col("__rc"), lit(0L)).as("n_out"))
  }
}
