package graft.ir

/** Typed query IR mirroring the reference's query model.
  *
  * Reference: /root/reference/src/lib.rs:51-188 — `Query`/`QueryFields`
  * (lib.rs:51-69), `Select`+`Aggregate` (lib.rs:127-143), `Condition`+`Cmp`
  * (lib.rs:145-176), `OrderBy`+`Order` (lib.rs:178-188). The IR is the only
  * piece of the reference architecture we keep: everything downstream is
  * compiled to declarative DataFrame transformations so Catalyst owns
  * optimization and Tungsten owns execution.
  */

/** The 12 filter comparators — lib.rs:162-176. */
sealed abstract class Cmp(val name: String)
object Cmp {
  case object Eq            extends Cmp("eq")
  case object Ne            extends Cmp("ne")
  case object Gt            extends Cmp("gt")
  case object Lt            extends Cmp("lt")
  case object Gte           extends Cmp("gte")
  case object Lte           extends Cmp("lte")
  case object Exists        extends Cmp("exists")
  case object NotExists     extends Cmp("notexists")
  case object StartsWith    extends Cmp("startswith")
  case object NotStartsWith extends Cmp("notstartswith")
  case object Contains      extends Cmp("contains")
  case object NotContains   extends Cmp("notcontains")
  /** Full SQL LIKE (extension beyond the reference's 12): `%`/`_`
    * anywhere in the pattern; the parser still DESUGARS edge-only
    * patterns to Contains/StartsWith/Eq (tighter parquet pushdown), so
    * these two carry only genuinely positional patterns. */
  case object Like          extends Cmp("like")
  case object NotLike       extends Cmp("notlike")
  /** `col [not] regexp 'pattern'` (extension, p125): full regular-
    * expression match anywhere in the value (regexp_like semantics on
    * both engines). The parser enforces the PORTABLE subset — no
    * lookaround, no backreferences (Spark runs java.util.regex, DuckDB
    * runs RE2; the portable subset behaves identically, the rest
    * differs or fails on one engine only). Three-valued: NULL column →
    * NULL → row drops, negated too. Never pushes into a parquet scan
    * (no regex row-group stats exist) — spell prefix/contains gates
    * with LIKE when pushdown matters. */
  case object Regexp        extends Cmp("regexp")
  case object NotRegexp     extends Cmp("notregexp")
  val all: Seq[Cmp] = Seq(Eq, Ne, Gt, Lt, Gte, Lte, Exists, NotExists,
    StartsWith, NotStartsWith, Contains, NotContains, Like, NotLike,
    Regexp, NotRegexp)
}

/** One conjunct; conditions AND-chain (lib.rs:197-200, expr.rs:75-80). */
final case class Condition(cmp: Cmp, column: String, value: String = "")

/** Boolean condition tree — extension: the reference's WHERE is AND-only
  * (expr.rs:75-80; every other `BinaryOperator` hits `unimplemented!()`,
  * expr.rs:99), yet the first real observability query a user writes
  * (`where type = 'error' or type = 'panic'`) needs disjunction. Spark
  * `Column`s compose with `||`/`!` for free, so only the IR and SQL surface
  * ever gated this. NOT follows SQL three-valued logic: `not(NULL)` is
  * NULL, so rows where the inner predicate is undefined are dropped —
  * consistent with how the negated comparators already behave
  * (Predicates.scala semantics note). */
sealed trait ConditionTree
object ConditionTree {
  final case class Leaf(cond: Condition) extends ConditionTree
  final case class And(children: Seq[ConditionTree]) extends ConditionTree
  final case class Or(children: Seq[ConditionTree]) extends ConditionTree
  final case class Not(child: ConditionTree) extends ConditionTree
  /** Expression predicate (extension): numeric comparison of two
    * row-wise [[MeasureExpr]]s — `where price * (1 - discount) > 1000`,
    * or column-vs-column as `a - b > 0`. Engaged only when the LEFT side
    * carries arithmetic (a bare `col cmp value` keeps the reference's
    * Condition semantics, including bare-identifier string values), so
    * every legacy WHERE parses unchanged. Numeric comparators only;
    * three-valued logic: a null side drops the row. Arithmetic cannot
    * push into a Parquet scan, so these evaluate post-scan — but the
    * scan still prunes columns, and sibling plain conjuncts still push. */
  final case class ExprLeaf(l: MeasureExpr, cmp: Cmp, r: MeasureExpr)
      extends ConditionTree

  /** `col in (select <col'> from <table> …)` / `not in` (extension): a
    * relational membership test — a SEMI (or ANTI) join, not a row
    * predicate, so it is only legal as a TOP-LEVEL AND conjunct (a
    * semi-join under OR has no join rendering; the parser rejects it).
    * After parse these leaves are lifted out of the WHERE tree into
    * [[ZxQuery.semiJoins]] and applied to the scanned frame BEFORE
    * aggregation. NOT IN follows ANTI-JOIN ("not matched") semantics:
    * subquery NULLs are ignored rather than vetoing every row — the
    * practical decontamination contract, documented divergence from ANSI
    * NOT IN three-valued logic (oracles replay with NOT EXISTS). */
  final case class InSubquery(column: String, sub: ZxQuery, anti: Boolean)
      extends ConditionTree

  /** `col cmp (select <agg>(…) from <table> [where …])` (extension): a
    * SCALAR subquery — one aggregate over a bounded table, resolved at
    * plan-build time to a literal and substituted as a plain
    * [[Condition]] leaf (`where value > (select mean(value) from t)`
    * becomes `value > 41.37`), so the comparison pushes into the scan
    * like any literal predicate and composes anywhere in the boolean
    * tree (under or/not too — it IS a row predicate once resolved).
    * Also legal on STREAMS: the scalar resolves once against the static
    * table at stream construction. A NULL scalar (empty subquery input)
    * fails loudly — there is nothing to compare against. */
  final case class ScalarSubquery(column: String, cmp: Cmp, sub: ZxQuery)
      extends ConditionTree

  /** Columns the tree reads — for pseudo-column guards and pruning. */
  def columns(t: ConditionTree): Set[String] = t match {
    case Leaf(c)            => Set(c.column)
    case And(cs)            => cs.flatMap(columns).toSet
    case Or(cs)             => cs.flatMap(columns).toSet
    case Not(c)             => columns(c)
    case ExprLeaf(l, _, r)  => MeasureExpr.columns(l) ++ MeasureExpr.columns(r)
    case InSubquery(c, _, _)     => Set(c)
    case ScalarSubquery(c, _, _) => Set(c)
  }
}

/** Aggregates — lib.rs:133-143. The reference leaves P50/Raw/Heatmap
  * `unimplemented!()` (lib.rs:659-661); we implement all of them. */
sealed abstract class Agg(val name: String)
object Agg {
  case object Sum           extends Agg("sum")
  case object Max           extends Agg("max")
  case object Min           extends Agg("min")
  case object Count         extends Agg("count")
  case object CountDistinct extends Agg("count_distinct")
  case object Mean          extends Agg("mean")
  case object P50           extends Agg("p50")
  // higher tail percentiles (extension — the observability staples the
  // reference declares nothing for; same exact-percentile machinery as P50)
  case object P90           extends Agg("p90")
  case object P99           extends Agg("p99")
  case object Raw           extends Agg("raw")
  case object Heatmap       extends Agg("heatmap")
  // 100 TB-scale sketch variants (extensions; no reference counterpart):
  // HLL distinct and a bounded-memory quantile sketch
  case object ApproxCountDistinct extends Agg("approx_count_distinct")
  case object P50Approx           extends Agg("p50_approx")
  // dispersion aggregates (extensions): SAMPLE stddev/variance with plain
  // ANSI semantics — unweighted by design, like the percentile family, so
  // the oracle is the direct stddev_samp/var_samp call; NULL when a group
  // has fewer than two non-null values (both engines agree since the
  // legacy-NaN behavior was retired). Not salt-decomposable (re-merging
  // partial variances is numerically a different algorithm) — the salted
  // path rejects them loudly like count_distinct/p50.
  case object Stddev   extends Agg("stddev")
  case object Variance extends Agg("variance")
  // two-argument dispersion (extensions): Pearson correlation and SAMPLE
  // covariance — plain ANSI semantics (pairs with either side NULL are
  // skipped on both engines); unweighted like stddev; aliases REQUIRED
  // (no canonical name for a two-argument call); not salt-decomposable.
  case object Corr      extends Agg("corr")
  case object CovarSamp extends Agg("covar_samp")
  // least-squares regression of y on x (extensions, same two-argument
  // contract as corr): `regr_slope(y, x)` / `regr_intercept(y, x)` —
  // identical argument order and NULL-pair skipping on both engines
  case object RegrSlope     extends Agg("regr_slope")
  case object RegrIntercept extends Agg("regr_intercept")
  // argmax/argmin as AGGREGATES (extensions): `max_by(x, y)` = the x of
  // the row with the largest y — DETERMINISTIC by contract, unlike ANSI:
  // ties in y break toward the larger x (max_by) / smaller x (min_by),
  // so two engines (and two shuffle orders) always agree. Rows whose y
  // is NULL are skipped (ANSI arg_max parity); x may be a string column
  // (the dedup-keep-best carrier) or any numeric measure. Compiled as a
  // single struct-ordered max/min — one hash aggregate, map-side
  // partials, no window, no second pass.
  case object MaxBy extends Agg("max_by")
  case object MinBy extends Agg("min_by")
  // `string_agg(col, 'sep')` (extension): concatenate a group's values —
  // SORTED ascending by the value itself (deterministic by contract;
  // ANSI leaves the order undefined, which no oracle can verify). NULLs
  // are skipped; a group with no non-null values yields NULL (DuckDB
  // string_agg parity). The separator is a string literal riding expr2.
  case object StringAgg extends Agg("string_agg")
  // `count(distinct x)` — the ANSI spelling: NULL is NOT counted (unlike
  // the reference's count_distinct +1-nil convention, lib.rs:626-635,
  // which keeps its own name). Accepts string expressions like the other
  // distinct-counting aggregates.
  case object DistinctCount extends Agg("distinct_count")
  // `percentile(x, q)` (extension): the ARBITRARY exact interpolated
  // quantile — p50/p90/p99 generalize to any q ∈ [0, 1] (the q rides
  // Select.expr2 as a parse-enforced numeric literal). Same exact
  // percentile machinery as P50 (DuckDB: quantile_cont); alias required
  // — two quantiles of one column would otherwise collide on a default
  // name. Unweighted like the whole percentile family; not
  // salt-decomposable.
  case object Percentile extends Agg("percentile")
  // `bool_and(<pred>)` / `bool_or(<pred>)` (extensions, p120): boolean
  // quantifiers over a full WHERE-grammar predicate — "every row
  // satisfies" / "some row satisfies". Three-valued like ANSI: rows
  // whose predicate is NULL (e.g. a comparison over a NULL column) are
  // SKIPPED, not counted false — the parser desugars to a CASE carrying
  // 1 for true, 0 for not-true-and-not-null, NULL otherwise, and the
  // compile is min/max over that indicator compared to 1, so the result
  // is BOOLEAN and an empty/all-null group is NULL (DuckDB parity).
  // Alias required (the predicate has no canonical name).
  case object BoolAnd extends Agg("bool_and")
  case object BoolOr  extends Agg("bool_or")
  // `mode(x)` (extension, p124): the most frequent value, DETERMINISTIC
  // by contract — ties between equally-frequent values break toward the
  // SMALLEST value (ANSI/DuckDB leave ties undefined, which no oracle
  // can verify; Spark's mode(expr, deterministic=true) implements
  // exactly this contract). NULLs are skipped; an empty/all-null group
  // is NULL. Takes numeric measures, string expressions (a CASE label,
  // upper(...)), and truncated timestamps — the classic categorical
  // profile per group. Not salt-decomposable (the value histogram does
  // not merge through re-aggregation of partial modes).
  case object Mode extends Agg("mode")
  // `skewness(x)` / `kurtosis(x)` (extensions): POPULATION skewness and
  // EXCESS kurtosis over a numeric measure — Spark's native formulas
  // ((M3/n)/(M2/n)^1.5 and (M4/n)/(M2/n)²−3 over central-moment sums);
  // the DuckDB oracle spells the same central-moment formula explicitly
  // (its own skewness()/kurtosis() are the bias-corrected SAMPLE forms
  // — a semantic difference, not noise). Unweighted like the dispersion
  // family; not salt-decomposable.
  case object Skewness extends Agg("skewness")
  case object Kurtosis extends Agg("kurtosis")

  /** The two-argument aggregates — parsed as `agg(x, y) as name`. */
  val twoArg: Set[Agg] = Set(Corr, CovarSamp, RegrSlope, RegrIntercept,
    MaxBy, MinBy)
}

/** Arithmetic measure expression (extension — the reference aggregates
  * single columns only, lib.rs:560-657, and its SQL surface cannot spell
  * `sum(price * (1 - discount))`, the single most common computed measure
  * in analytics). Columns read through the engine's numeric view
  * (parse-on-demand string storage, Aggregates.numeric), literals are
  * doubles, operators are IEEE `+ - * /` — division by zero yields null
  * (Spark `try_divide`; DuckDB's `/` NULLs natively). Evaluated ROW-WISE
  * before the aggregate, so expression measures stay inside whole-stage
  * codegen and map-side partial aggregation exactly like plain columns. */
sealed trait MeasureExpr
object MeasureExpr {
  final case class Col(name: String)                               extends MeasureExpr
  final case class Lit(value: Double)                              extends MeasureExpr
  final case class Bin(op: String, l: MeasureExpr, r: MeasureExpr) extends MeasureExpr
  final case class Neg(e: MeasureExpr)                             extends MeasureExpr
  /** `case when <cond> then <expr> [when …]* [else <expr>] end` — the
    * conditional measure (extension): branch predicates are full WHERE
    * condition trees (comparators, like, in, between, boolean grouping),
    * reusing [[ConditionTree]] semantics verbatim; a fall-through without
    * `else` is SQL NULL (the row contributes nothing to a sum/mean).
    * Compiled to Catalyst `when(…).otherwise(…)` — pure Column
    * composition, so conditional measures codegen and partial-aggregate
    * map-side like every other measure. */
  final case class Case(branches: Seq[(ConditionTree, MeasureExpr)],
                        orElse: Option[MeasureExpr]) extends MeasureExpr
  /** Scalar function call (extension, p76): `abs(x - y)`, `round(p, 2)`,
    * `sqrt(v)`, `length(text)`, … — row-wise numeric functions with
    * IDENTICAL IEEE semantics on Spark and DuckDB, usable anywhere the
    * measure grammar reaches (inside aggregates, WHERE/QUALIFY expression
    * predicates, raw expression projections). Arity and literal-argument
    * constraints are parse-enforced; see ZxSql's `scalarFuncs`. */
  final case class Func(name: String, args: Seq[MeasureExpr]) extends MeasureExpr
  /** String literal (p79) — the value side of string-expression
    * comparisons (`lower(lang) = 'en'`) and string CASE labels
    * (`then 'long'`). Parse guards keep strings out of arithmetic and
    * aggregate measures. */
  final case class StrLit(value: String) extends MeasureExpr

  /** Columns the expression reads — for projection pruning and guards. */
  def columns(e: MeasureExpr): Set[String] = e match {
    case Col(n)        => Set(n)
    case Lit(_)        => Set.empty
    case StrLit(_)     => Set.empty
    case Bin(_, l, r)  => columns(l) ++ columns(r)
    case Neg(x)        => columns(x)
    case Func(_, as)   => as.flatMap(columns).toSet
    case Case(bs, el)  =>
      bs.flatMap { case (c, v) => ConditionTree.columns(c) ++ columns(v) }.toSet ++
        el.map(columns).getOrElse(Set.empty)
  }

  /** String-returning function names (p79; p85 adds `json_str(col,
    * 'key')` — a schemaless-event store lives on JSON props extraction,
    * and the string form joins the p79 discipline: project, label, = / !=
    * compare). */
  val stringFuncs: Set[String] = Set("lower", "upper", "trim", "substr",
    "json_str",
    // regexp_extract (p125): the capture group's text, '' on no match
    // on BOTH engines; portable-subset pattern enforced at parse
    "regexp_extract",
    // concat (p93): NULL-propagating concatenation (any NULL piece →
    // NULL — Spark concat; the oracle spells it `||`, which DuckDB also
    // NULL-propagates, unlike DuckDB's own concat())
    "concat",
    // string-surgery functions (p101): literal search/replace, 1-based
    // field extraction, padding (truncates when the input is already
    // longer — both engines), and byte-order reversal — all identical
    // row-wise semantics on Spark and DuckDB; search/separator/pad
    // arguments are parse-enforced non-empty string literals so
    // engine-specific empty-pattern conventions never engage
    "replace", "split_part", "lpad", "rpad", "reverse")

  /** Timestamp-RETURNING functions (p107): `date_trunc('<unit>', <ts
    * col>)` — the calendar-rollup key. The result is a real TIMESTAMP
    * under the engine-wide UTC contract: it projects, groups (via a
    * derived table, like every computed key), and feeds max/min/
    * count_distinct; it never enters arithmetic (extract fields with
    * year/month/… for that) and never labels CASE branches. */
  val timestampFuncs: Set[String] = Set("date_trunc")

  /** Units both engines truncate identically (ISO weeks start Monday on
    * both; quarters align to Jan/Apr/Jul/Oct). */
  val dateTruncUnits: Set[String] =
    Set("year", "quarter", "month", "week", "day", "hour", "minute")

  /** True when the expression is TIMESTAMP-typed by construction. */
  def isTimestamp(e: MeasureExpr): Boolean = e match {
    case Func(f, _) => timestampFuncs(f)
    case _          => false
  }

  /** Calendar field extractors (p82): `year/month/day/hour/minute(<col>)`
    * over a RAW timestamp (or date) column — BIGINT fields, identical on
    * both engines under the engine-wide UTC contract (Tables.events pins
    * the session zone). The argument must be a bare column: the numeric
    * measure view would destroy a timestamp. */
  val timeFuncs: Set[String] = Set("year", "month", "day", "hour", "minute",
    // p111: second (integer seconds, fraction truncated on both engines)
    // and isodow (ISO day-of-week, 1 = Monday … 7 = Sunday — DuckDB's
    // isodow; Spark spells it weekday()+1) — the day-of-week profile key
    "second", "isodow")

  /** True when the expression is STRING-typed by construction: string
    * literals, string functions, and CASE whose branch values are
    * strings. Columns are untyped at parse (schemaless store) — a bare
    * Col stays "numeric" and the legacy condition grammar handles its
    * string comparisons. */
  def isString(e: MeasureExpr): Boolean = e match {
    case StrLit(_)    => true
    case Func(f, _)   => stringFuncs(f)
    case Case(bs, el) => bs.exists(b => isString(b._2)) || el.exists(isString)
    case _            => false
  }
}

final case class Select(agg: Agg, column: String,
                        expr: Option[MeasureExpr] = None,
                        alias: Option[String] = None,
                        /** SECOND argument of a two-argument aggregate
                          * (corr/covar_samp) — both arguments ride the
                          * measure grammar. */
                        expr2: Option[MeasureExpr] = None) {
  /** Stable output-column name — the reference's `aggregate_key`
    * "$$sum(foo)" scheme (lib.rs:801-813) made identifier-safe;
    * `count(*)` lands as `count_star`. An `as` alias (extension)
    * overrides the scheme; expression measures REQUIRE one (enforced at
    * parse — there is no canonical name for `sum(a * (1 - b))`). */
  def key: String = alias.getOrElse(agg match {
    case Agg.Raw            => column
    case a if column == "*" => s"${a.name}_star"
    case a                  => s"${a.name}_${column}"
  })
}

/** Arithmetic over AGGREGATES (extension — the layer above [[MeasureExpr]]):
  * `100 * sum(promo_rev) / sum(rev) as promo_pct`. Leaves are aggregate
  * calls (each a [[Select]] carrying a parser-assigned internal alias) and
  * numeric literals; operators are the measure grammar's `+ - * /` with
  * `/` as null-on-zero-divisor division. Compiled AFTER the one
  * aggregation exchange as a scalar projection over the component
  * aggregate columns — a ratio of sums costs zero extra shuffles and the
  * components ride the same hash aggregate (and the same salted two-phase
  * decomposition) as visible selects. */
sealed trait AggExpr
object AggExpr {
  final case class Call(sel: Select)                         extends AggExpr
  final case class Lit(value: Double)                        extends AggExpr
  final case class Bin(op: String, l: AggExpr, r: AggExpr)   extends AggExpr
  final case class Neg(e: AggExpr)                           extends AggExpr

  /** The aggregate calls the expression contains, in occurrence order. */
  def calls(e: AggExpr): Seq[Select] = e match {
    case Call(s)      => Seq(s)
    case Lit(_)       => Nil
    case Bin(_, l, r) => calls(l) ++ calls(r)
    case Neg(x)       => calls(x)
  }
}

/** One post-aggregate select item: `<agg arithmetic> as <alias>`. The
  * alias is REQUIRED (there is no canonical name for `sum(a)/sum(b)`), and
  * HAVING / ORDER BY reference it by bare name like any select alias. */
final case class PostSelect(expr: AggExpr, alias: String) {
  /** Component aggregates to compute (deduped); each already carries its
    * internal `__pa<n>` alias so outputs never collide with user columns. */
  def components: Seq[Select] = AggExpr.calls(expr).distinct
}

/** As-of / trailing-range join clause (extension — the reference has no
  * joins at all, SURVEY §2 "Explicitly absent"; these are the engine's two
  * time-series joins, [[graft.operators.AsofJoin]], surfaced in SQL).
  * `table` is resolved from the runner's caller-provided catalog.
  *  - `trailingSec = None`: as-of — carry `payload` columns of the latest
  *    right row at-or-before each left row (per key). Right-side versions
  *    at the same (key, time) are deduped to the max-`payload.head` row so
  *    the carried version is deterministic.
  *  - `trailingSec = Some(w)`: trailing range join — `aggs` aggregates over
  *    right rows in [t − w, t] per key. */
final case class JoinSpec(
    table: String, keyL: String, keyR: String, timeL: String, timeR: String,
    payload: Seq[String] = Nil,
    trailingSec: Option[Long] = None,
    aggs: Seq[Select] = Nil,
    /** additional ON pairs for COMPOSITE keys (p61) — `on a = ra and b =
      * rb`: the sides compile into ONE struct key column per side, so the
      * operator keeps its single exchange (a real events store keys
      * sessions on (user, device) pairs). Every left key must be selected,
      * like `keyL`. */
    moreKeys: Seq[(String, String)] = Nil)

/** Plain equi-join clause (extension — the single most common analytics
  * shape, `fact join dim on key`, which the reference cannot express at
  * all and this dialect previously reached only via the time-series
  * joins). Chains: each clause joins one catalog table onto the frame
  * built so far, so star/snowflake pipelines (fact → orders → customer →
  * nation) are a clause sequence. Compiles to the plain Catalyst join —
  * AQE picks broadcast vs sort-merge from the ACTUAL post-filter sizes,
  * and WHERE is applied over the JOINED frame so the optimizer pushes
  * each predicate to whichever side it references (filters on a joined
  * table's columns prune that table's scan, not the join output). SQL
  * face: `[left] join <table> on <keyL> = <keyR>`, repeatable.
  *
  * `sub` (extension): the right side may be a DERIVED aggregate —
  * `join (select <agg>… from <table> [where …] group by <key>) on kl =
  * <key>` — the CORRELATED-threshold shape (TPC-H q17's "compare each
  * row to its group's average"): the subquery builds a per-key aggregate
  * frame ONCE (group keys stay native-typed so the join key matches in
  * its own type; its key column is renamed to an internal unique name so
  * self-joins never hit ambiguity and is dropped after the join), and
  * the outer WHERE's expression predicates compare fact columns against
  * the joined aggregates. When `sub` is set, `table` is empty. */
final case class EquiJoin(
    table: String, keyL: String, keyR: String,
    /** Spark join-type name: `inner` (default), `left_outer`,
      * `right_outer`, or `full_outer` (p62 — the reconciliation shape:
      * "which dim rows matched nothing"). Unmatched-side group keys are
      * genuine SQL NULLs out of the join, so they surface through the
      * aggregate paths' standard `__nil` rendering. */
    joinType: String = "inner",
    sub: Option[ZxQuery] = None,
    /** additional ON pairs for COMPOSITE keys — `on a = ra and b = rb`;
      * catalog tables only (a derived side's group-by is its single key). */
    moreKeys: Seq[(String, String)] = Nil)

/** `semi join` / `anti join` (extension, p72): EXISTS / NOT EXISTS at the
  * front door as relational FILTERS — keep (semi) or drop (anti) the left
  * rows with a right match on ALL key equalities; right columns never
  * surface and duplicate right keys never multiply rows. Applied to the
  * scanned frame BEFORE every other construct (generalizing the
  * single-column membership subqueries to composite keys and derived key
  * sets), so aggregates, windows, sequence ops, and set-op branches all
  * compose on the filtered frame. Compiles to Spark `left_semi` /
  * `left_anti` — AQE broadcasts a small key set; otherwise the composite
  * key rides one hash exchange. NULL semantics are EXISTS's: a null key
  * never matches (semi drops it, anti keeps it) — unlike NOT IN's
  * three-valued trap, which is why the oracle replays with EXISTS. A
  * stream-static semi/anti join is stateless (each micro-batch probes the
  * static key set), so the clause streams. */
final case class FilterJoin(table: String, anti: Boolean,
    keys: Seq[(String, String)], sub: Option[ZxQuery] = None)

/** Whole-operator sequence-analytics clause (extension; no reference
  * counterpart — the reference's algebra is pure aggregation and cannot
  * express order-dependent semantics). Each variant routes the parsed
  * query's scan/filter front half into the [[graft.operators.Funnel]]
  * family (or the deterministic-argmax aggregate), so WHERE and
  * `$t_start`/`$t_end` compose with sequence mining for free.
  * SQL faces (round 10, per VERDICT r9 #3):
  *   `select journeys top <k> steps <n> [where …]`
  *   `select funnel <step>, <step>, … [where …]`
  *   `select decay(<col>) [last <n>] [where …]`
  *   `select argmax(<valueCol>, <idCol>) [where …] group by <cols>` */
sealed trait SeqOp
object SeqOp {
  /** Top `topK` per-(entity, day) event-type paths, `maxSteps` deep. */
  final case class Journeys(topK: Int, maxSteps: Int) extends SeqOp
  /** Entity-days reaching each prefix of `steps` (greedy subsequence). */
  final case class FunnelSteps(steps: Seq[String]) extends SeqOp
  /** Per-(entity, day) half-life fold over the last `last` values. */
  final case class Decay(valCol: String, last: Int) extends SeqOp
  /** Per-group row at the maximum of `valCol`, `idCol` the total tiebreak. */
  final case class Argmax(valCol: String, idCol: String) extends SeqOp
  /** Top repeated `size`-token spans across documents (x15's miner) —
    * the dialect's reach into the documents table. SQL:
    * `select spans top <k> size <n> [where …]`. */
  final case class Spans(topK: Int, size: Int) extends SeqOp
  /** Cohort retention (a16): users bucketed by first-seen day, activity
    * per (cohort, day-offset). SQL: `select retention [where …]`. */
  case object Retention extends SeqOp
  /** Last-touch attribution (a18): conversions credited to the most
    * recent preceding non-conversion within the lookback. SQL:
    * `select attribution <convType> [within <seconds>] [where …]`. */
  final case class Attribution(convType: String, lookbackSec: Long) extends SeqOp
  /** Markov stationary distribution (a20) of the event-type transition
    * chain, `iters` fixed-point power iterations; `distributed` routes
    * to the unbounded-state DataFrame iteration (a20b). SQL:
    * `select markov [iters <n>] [distributed] [where …]`. */
  final case class Markov(iters: Int, distributed: Boolean = false) extends SeqOp
  /** Seasonal-baseline anomaly counts (a19). SQL:
    * `select anomaly split <'date'> [factor <n>] [support <n>] [where …]`. */
  final case class AnomalySplit(split: String, factor: Long,
                                support: Long) extends SeqOp
  /** One-pass column profile (c13); columns classified numeric / string /
    * timestamp from the input schema at run time. SQL:
    * `select profile <col>, <col>, … [where …]`. */
  final case class ProfileCols(cols: Seq[String]) extends SeqOp
  /** TF-IDF similar document pairs (x18) over a documents frame. SQL:
    * `select similar [top <k>] [mindf <n>] [maxdf <n> | maxdfpct <p>]
    * [where …]` — `maxdfpct` scales the cap with the (filtered) corpus. */
  final case class Similar(topK: Int, minDf: Long, maxDf: Long,
                           maxDfPct: Option[Int]) extends SeqOp
  /** MinHash-LSH near-duplicate pairs (d2b) over a documents frame,
    * verified at `thresholdPct`/100 jaccard. SQL:
    * `select neardup [threshold <pct>] [where …]`. */
  final case class NearDup(thresholdPct: Int) extends SeqOp
  /** Brute-force cosine kNN (s1) over an embeddings frame. SQL:
    * `select knn [top <k>] [query <vecId>] [where …]`. */
  final case class Knn(topK: Int, queryId: Long) extends SeqOp
  /** INDEX-BACKED kNN (p58): probe a PREBUILT cell-partitioned IVF index
    * resolved from the catalog — a stateless read (nProbe/nlist of
    * storage at planning time), never training. The front door's answer
    * to "don't silently brute-force a 100 TB corpus". `centroids` names
    * the trained-centroid table; None → `<index>_centroids`. The query
    * vector resolves by id from the gated FROM frame; WHERE also gates
    * the index scan (filtered ANN, the s12 shape). SQL:
    * `select knn using <index> [centroids <table>] [top <k>]
    *  [query <vecId>] [probe <n>] [from <emb>] [where …]`.
    * An IVF-PQ index (rows carry residual `codes` — the ivfPqWriteIndex
    * artifact) resolves through the same clause: the probe detects the
    * codes column, additionally resolves the codebook table (`books
    * <table>`; None → `<index>_books`, the booksToDF artifact) and runs
    * the ADC scan + exact re-rank of a `shortlist <n>` (default 100)
    * instead of full-vector cosine over the pruned cells. books/
    * shortlist on a plain IVF index (or the brute face) fail loudly. */
  final case class KnnIndex(index: String, centroids: Option[String],
                            topK: Int, queryId: Long, nProbe: Int,
                            books: Option[String] = None,
                            shortlist: Option[Int] = None) extends SeqOp
  /** MMR diverse re-rank (s13) over an embeddings frame, default
    * 0.7/0.3 weights. SQL:
    * `select mmr [top <k>] [query <vecId>] [shortlist <n>] [where …]`. */
  final case class Mmr(topK: Int, queryId: Long, shortlist: Int) extends SeqOp
  /** INDEX-BACKED MMR (p65): shortlist from a cell-pruned probe of a
    * PREBUILT IVF index (the [[KnnIndex]] resolution rules: catalog
    * index + `<index>_centroids`, loud failures, no training), greedy
    * identical to [[Mmr]]. SQL:
    * `select mmr using <index> [centroids <t>] [top <k>] [query <id>]
    *  [shortlist <n>] [probe <n>] [from <emb>] [where …]`. */
  final case class MmrIndex(index: String, centroids: Option[String],
                            topK: Int, queryId: Long, shortlist: Int,
                            nProbe: Int) extends SeqOp
  /** Exact integer linear-trend slope pair (a21) of `valCol` over
    * day-of-month, per event type. SQL:
    * `select trend [(<col>)] [where …]`. */
  final case class Trend(valCol: String) extends SeqOp
  /** Batched MMR re-rank (s13b): every listed query re-ranked from ONE
    * corpus pass. SQL:
    * `select mmr [top <k>] queries <id>,<id>,… [shortlist <n>] [where …]`. */
  final case class MmrBatch(topK: Int, queryIds: Seq[Long],
                            shortlist: Int) extends SeqOp
  /** Audio near-duplicate pairs (m7) over a documents frame: WAV pack →
    * energy-envelope fingerprint → banded-Hamming join. SQL:
    * `select neardup audio [hamming <n>] [where …]`. */
  final case class NearDupAudio(maxHamming: Int) extends SeqOp
  /** Image near-duplicate pairs (m6) over a documents frame: BMP pack →
    * dHash → banded-Hamming join at `maxHamming`. SQL:
    * `select neardup images [hamming <n>] [where …]`. */
  final case class NearDupImages(maxHamming: Int) extends SeqOp
  /** Frame-set (video-shaped) near-duplicate pairs (m8) over a documents
    * frame: binary pack → frame sampling → digest-equality blocking →
    * pairs sharing ≥ `minShared` distinct frames. SQL:
    * `select neardup video [shared <n>] [where …]`. */
  final case class NearDupVideo(minShared: Int) extends SeqOp
  /** Scene-change detection (m9) over a documents frame: binary pack →
    * frame sampling → per-document digest-transition count + first change
    * index. SQL: `select scenes [where …]`. */
  case object Scenes extends SeqOp
  /** Token-budget mixture over the documents table —
    * [[graft.operators.Corpus.mixtureByTokenBudget]]. WHERE composes as a
    * pre-mixture quality gate (budgets then fill from the SURVIVORS). SQL:
    * `select mixture <src>=<tokens>, <src>=<tokens>, … [where …]`. */
  final case class Mixture(budgets: Seq[(String, Long)],
                           /** quality-ordered fill (x23): budgets fill
                             * best-first under score `col/scale` clamped
                             * to [0,1] instead of the deterministic hash
                             * order. SQL: `select mixture score <col>
                             * [scale <n>] <src>=<tokens>, …`. */
                           score: Option[(String, Long)] = None) extends SeqOp
  /** Deterministic hash sampling over a documents frame —
    * [[graft.operators.Corpus.sampleByHash]] /
    * [[graft.operators.Corpus.sampleStratified]]. `strata` overrides the
    * default rate per source value. WHERE composes as a pre-sample gate.
    * SQL: `select sample pct <n> [by <src>=<pct>, …] [where …]`. */
  final case class SampleRows(defaultPct: Int,
                              strata: Seq[(String, Int)],
                              /** hash-key column — `doc_id` by default;
                                * `key <col>` points the face at any
                                * table's stable id (events, embeddings). */
                              keyCol: String = "doc_id") extends SeqOp
  /** Weighted deterministic sampling (x20) —
    * [[graft.operators.Corpus.sampleByWeight]] with acceptance
    * probability `col / scale`, clamped to [0, 1]. SQL:
    * `select sample weight <col> [scale <n>] [where …]`. */
  final case class SampleWeight(col: String, scale: Long,
                                keyCol: String = "doc_id") extends SeqOp
  /** EXACT-count deterministic sample (p66) —
    * [[graft.operators.Corpus.sampleExactN]]: the n smallest hash coins,
    * key-tiebroken; nested across sizes. Batch-only (a global rank needs
    * the bounded frame). SQL:
    * `select sample exact <n> [key <col>] [where …]`.
    * With `per <col>` (p88): exactly n rows from EVERY group of `col` —
    * the stratified-split staple ("1k eval docs per source"). Compiles to
    * a rank window over the hash coin with per-partition WindowGroupLimit,
    * so unlike the global form the cut is never driver-resident and n is
    * unbounded — the 100 TB-safe exact stratified sample. */
  final case class SampleExact(n: Int, keyCol: String = "doc_id",
                               per: Option[String] = None) extends SeqOp
  /** Token-budget sequence packing (x7) —
    * [[graft.operators.Corpus.packByTokenBudget]]: contiguous ~budget-token
    * chunks per source via one window (stateful — batch only). SQL:
    * `select pack budget <n> [where …]`. */
  final case class Pack(budget: Long) extends SeqOp
  /** Overlapping context-window chunking (x12) —
    * [[graft.operators.Corpus.chunkByWindow]]: window k covers tokens
    * [k·stride, k·stride + size). A stateless narrow explode, so it
    * streams like `sample`. SQL:
    * `select chunks [size <n>] [stride <m>] [where …]`. */
  final case class Chunks(size: Int, stride: Int) extends SeqOp
  /** Bigram-LM fluency scoring (x21) over a documents frame — train
    * [[graft.operators.Corpus.topUnigrams]] / topBigrams tables on the
    * `ref`-selected slice of the WHERE-gated frame (the whole gated frame
    * when no ref), then score every gated row via the broadcast-map fold.
    * With `train <table>` the tables train on that STATIC catalog table
    * instead (ref slices it) — which also makes the op streamable: the
    * scoring fold is stateless, so a live document stream scores against
    * the fixed reference model in append mode. SQL:
    * `select lmscore [train <table>] [ref <col> = <value>] [vocab <n>]
    * [table <n>] [where …]`. */
  final case class LmScore(ref: Option[(String, String)], vocab: Int,
                           table: Int, train: Option[String] = None) extends SeqOp
  /** Curriculum sharding (x22) —
    * [[graft.operators.Corpus.curriculumShards]] under score `col/scale`
    * clamped to [0,1]. SQL:
    * `select curriculum score <col> [scale <n>] [shards <n>] [where …]`. */
  final case class Curriculum(col: String, scale: Long,
                              shards: Int) extends SeqOp
  /** Exact dedup groups (d1) over a documents frame —
    * [[graft.operators.Dedup.exactGroups]]: text fingerprint → keeper
    * (min id) + multiplicity. SQL: `select dedup [where …]`. */
  case object DedupExact extends SeqOp
  /** Exact dedup groups over NORMALIZED text (d1b) —
    * [[graft.operators.Dedup.exactGroupsNormalized]]. SQL:
    * `select dedup normalized [where …]`. */
  case object DedupNormalized extends SeqOp
  /** Decontamination overlap report (d7) —
    * [[graft.operators.Decontaminate.overlapReport]]: shingle overlap of
    * the corpus against the benchmark slice named by source values (both
    * drawn from the WHERE-gated frame). SQL:
    * `select decontaminate <src>[, <src> …] [shingle <n>] [hits <n>]
    * [where …]`. */
  final case class Decontaminate(sources: Seq[String], shingleN: Int,
                                 minHits: Int) extends SeqOp
  /** Per-document quality metrics (x2) — token count, punctuation and
    * stopword ratios, C4-style gate. Stateless narrow map, so it streams
    * like `sample`/`chunks`. SQL: `select quality [where …]`. */
  case object Quality extends SeqOp
  /** Term redaction report (x11) — per-term \b-literal counts + the md5
    * fingerprint of the scrubbed text. Stateless, streams. SQL:
    * `select redact <term>[, <term> …] [where …]`. */
  final case class Redact(terms: Seq[String]) extends SeqOp
  /** Language identification (x1) — stopword-profile n-gram heuristic
    * vs the labeled lang. Stateless, streams. SQL: `select langid [where …]`. */
  case object LangId extends SeqOp
  /** Embedding near-duplicate pairs (d5) over an embeddings frame —
    * [[graft.operators.Dedup.embeddingPairs]]: label-blocked cosine at
    * `thresholdPct`/100, maxBlock-capped. SQL:
    * `select neardup embeddings [threshold <pct>] [where …]`. */
  final case class NearDupEmbeddings(thresholdPct: Int) extends SeqOp
}

sealed trait SortDir
object SortDir { case object Asc extends SortDir; case object Desc extends SortDir }

/** Sort key for the runSorted path — lib.rs:178-188.
  *
  * `nullsFirst` (extension): explicit SQL `nulls first` / `nulls last`.
  * `None` keeps each engine's default — which DIFFERS (Spark ASC puts
  * nulls first, DuckDB ASC puts nulls last), so any sort key that can be
  * NULL should spell the placement explicitly; the engine's own sort
  * keys (group keys, aggregate outputs under the `__nil` discipline) are
  * non-null by construction and never need it. */
final case class OrderBy(select: Select, dir: SortDir,
                         nullsFirst: Option[Boolean] = None)

/** Post-aggregation group filter (extension — SQL HAVING; the reference has
  * no aggregate filtering at all). `select` names the aggregate, `cmp` must
  * be a numeric comparator or Eq/Ne, `value` a numeric literal. An
  * aggregate named only in HAVING is computed for the filter and dropped
  * from the output, like sort-only aggregates. */
final case class Having(select: Select, cmp: Cmp, value: String)

/** Boolean STRUCTURE over HAVING comparisons (extension, p110): `having
  * (sum(a) > 100 or count(*) > 50) and not min(b) < 3` — the same
  * OR/AND/NOT/parens grammar WHERE has, with aggregate comparisons as
  * leaves. A plain AND-chain keeps parsing to the legacy `Seq[Having]`
  * (identical plans); only a query that actually spells OR/NOT carries a
  * tree. NOT is three-valued like SQL: NOT(NULL) is NULL, the group
  * drops. */
sealed trait HavingTree
object HavingTree {
  final case class Leaf(h: Having) extends HavingTree
  final case class And(children: Seq[HavingTree]) extends HavingTree
  final case class Or(children: Seq[HavingTree]) extends HavingTree
  final case class Not(child: HavingTree) extends HavingTree

  /** Every aggregate comparison in the tree — the selects the
    * aggregation must compute for the filter (then prune). */
  def selects(t: HavingTree): Seq[Select] = t match {
    case Leaf(h)      => Seq(h.select)
    case And(cs)      => cs.flatMap(selects)
    case Or(cs)       => cs.flatMap(selects)
    case Not(c)       => selects(c)
  }

  /** A pure AND-of-leaves flattens to the legacy conjunct vector. */
  def flatten(t: HavingTree): Option[Seq[Having]] = t match {
    case Leaf(h) => Some(Seq(h))
    case And(cs) =>
      val fs = cs.map(flatten)
      if (fs.forall(_.nonEmpty)) Some(fs.flatten.flatten) else None
    case _ => None
  }
}

/** Whole query — lib.rs:51-69. Time bounds are epoch seconds, inclusive,
  * defaulting to (epoch 0, now) (expr.rs:107-108); granularity defaults to
  * the reference's hard-coded 5 minutes (expr.rs:226).
  *
  * `skewSalt` (extension; no reference counterpart) opts the aggregation
  * into a salted two-phase plan: partial aggregation on (keys, salt)
  * spreads a hot group key across that many reducers, a second tiny
  * aggregation merges the partials. With `sessionGapSec` it routes to the
  * exact two-level session plan (partial sessions per salt slice, interval
  * merge — [[graft.compile.Compiler.runSessionTwoLevel]]). Decomposable
  * aggregates only (sum/count/max/min/mean). SQL face: `salt <n>`.
  *
  * `exact` routes the windowed path through the reference-parity
  * data-anchored gap windows ([[graft.operators.GapWindows]]) instead of
  * calendar tumbling — the SQL surface sets it via a trailing `exact`
  * keyword. */
final case class ZxQuery(
    selects: Seq[Select],
    conditions: Seq[Condition] = Nil,
    groupBy: Seq[String] = Nil,
    orderBy: Seq[OrderBy] = Nil,
    tStart: Option[Long] = None,
    tEnd: Option[Long] = None,
    granularitySec: Long = 300L,
    limit: Option[Int] = None,
    /** `offset <m>` (extension): skip the first m rows of the final
      * ordered output — the pagination clause. Requires ORDER BY (an
      * unordered offset is nondeterministic) and composes with `limit`
      * as LIMIT n OFFSET m (rows m+1 … m+n). Deterministic only when the
      * ORDER BY is a total order, same contract as `limit`. Batch-only;
      * mutually exclusive with `limit per`. */
    offset: Option[Int] = None,
    skewSalt: Option[Int] = None,
    exact: Boolean = false,
    /** The `from <table>` name, when the query spelled one. `run(df, …)`
      * keeps ignoring it (reference parity — expr.rs never reads FROM);
      * [[graft.sql.ZxSql.runCatalog]] resolves the base frame from it. */
    fromTable: Option[String] = None,
    /** `from (select …)` — a DERIVED TABLE (extension): the outer query
      * scans the inner query's result frame instead of a base table. The
      * inner query is a full dialect query (any batch path — it scans the
      * real table, so windows/joins/subqueries all compose); the OUTER
      * runs over an aggregate frame with no timestamp column, so it is
      * restricted to the time-free paths: raw projection or the sorted
      * (non-windowed) aggregate — time ranges, granularity windows,
      * session/slide/exact, sequence ops, asof and equi joins are all
      * rejected loudly on the outer level. This is the two-level
      * aggregation shape ("orders-per-customer histogram", TPC-H q13) at
      * the front door. Mutually exclusive with [[fromTable]]. */
    fromSub: Option[ZxQuery] = None,
    /** Boolean WHERE tree (OR/NOT/parens — extension over the reference's
      * AND-only surface); ANDed with [[conditions]] when both are set. */
    where: Option[ConditionTree] = None,
    /** As-of / trailing join clause (extension); selects must be Raw and
      * include the clause's left key and time columns. */
    asofJoin: Option[JoinSpec] = None,
    /** Plain equi-join clauses (extension), applied in order to the
      * scanned left frame before WHERE/aggregation — see [[EquiJoin]].
      * Aggregation queries only (group by + aggregate selects); routes
      * through the sorted aggregate path (no time windows — the join
      * shape is the analytics roll-up, not a time series). */
    equiJoins: Seq[EquiJoin] = Nil,
    /** HAVING conjuncts applied after aggregation (extension). */
    having: Seq[Having] = Nil,
    /** Boolean HAVING structure (p110): set ONLY when the query spells
      * OR / NOT / parens — a plain AND-chain stays in [[having]]. ANDed
      * with [[having]] when both are set (they never are today). */
    havingTree: Option[HavingTree] = None,
    /** Session windows (extension): group events whose gap to the previous
      * event is < this many seconds into one window (sessionization), in
      * place of fixed tumbling buckets. Mutually exclusive with `exact`
      * and `orderBy`. With `skewSalt`, sessionization runs through the
      * exact two-level plan (naive salting would split sessions; the
      * two-level interval merge does not). */
    sessionGapSec: Option[Long] = None,
    /** Hopping (sliding) windows (extension): windows of `granularitySec`
      * length starting every `slideSec` seconds — an event lands in every
      * window covering it (size/slide rows per event). Mutually exclusive
      * with `exact`, `orderBy`, and `sessionGapSec`. */
    slideSec: Option[Long] = None,
    /** Sequence-analytics clause (extension): journeys / funnel / decay /
      * argmax riding the same scan+filter front half. When set, `selects`
      * is empty and only `groupBy` (argmax) of the remaining clauses
      * applies. */
    seqOp: Option[SeqOp] = None,
    /** ROLLUP over the groupBy keys (extension — explicitly absent in the
      * reference, SURVEY §2): every key prefix aggregates in ONE pass
      * (Spark Expand), the staple of "top groups with subtotals"
      * observability UIs that otherwise costs N passes through O1.
      * Sentinel-consistent rendering: data-missing keys stay `__nil`,
      * rolled-up (subtotal) levels render `__all` — distinguishable
      * because keys are coalesced BEFORE the rollup, so an output null
      * can only mean a rolled-up level. Routes through the sorted path;
      * mutually exclusive with session/slide/exact/salt. SQL face:
      * `group by rollup <col, …>`. */
    rollup: Boolean = false,
    /** CUBE over the groupBy keys (extension): every key SUBSET (2^n
      * levels, n ≤ 4 enforced at parse), same Expand plan and the same
      * `__nil`/`__all` sentinel discipline as [[rollup]]. SQL face:
      * `group by cube <col, …>`. */
    cube: Boolean = false,
    /** GROUPING SETS over the groupBy keys (extension): caller-chosen
      * subtotal levels — the general form [[rollup]]/[[cube]] specialize.
      * `groupBy` is the ordered union of all set columns; the same ONE
      * Expand pass and `__nil`/`__all` sentinel discipline. SQL face:
      * `group by sets (<col, …>), (<col, …>), …` (an empty `()` is the
      * grand total). */
    groupingSets: Seq[Seq[String]] = Nil,
    /** Post-aggregate expression selects (extension):
      * `100 * sum(a) / sum(b) as pct` — arithmetic OVER aggregates,
      * computed as a scalar projection after the one aggregation exchange
      * (components ride the same hash aggregate as visible selects; zero
      * extra shuffles). Output columns surface after [[selects]], in
      * select-list order; HAVING / ORDER BY bind the alias by name. */
    postSelects: Seq[PostSelect] = Nil,
    /** Relational membership conjuncts lifted from WHERE (extension):
      * each compiles to a LEFT SEMI (in) or LEFT ANTI (not in) join of
      * the scanned frame against the subquery's single-column result,
      * applied BEFORE aggregation — so every downstream path (windows,
      * sorted, joins, sequence ops) composes unchanged. The subquery is
      * a full dialect query (scan/filter/group/having) whose FROM
      * resolves from the caller's table catalog. */
    semiJoins: Seq[ConditionTree.InSubquery] = Nil,
    /** `semi join` / `anti join` clauses (extension, p72) — see
      * [[FilterJoin]]. Row FILTERS, applied with [[semiJoins]] before
      * everything else. */
    filterJoins: Seq[FilterJoin] = Nil,
    /** `limit <k> per <col>` (extension): keep the top-k rows of each
      * partition of `col` under the ORDER BY ranking (ties broken by the
      * remaining keys, so the cut is total). Compiles to a rank window
      * whose `rn <= k` filter Spark rewrites to per-partition
      * WindowGroupLimit — each input partition forwards at most k rows
      * per group to the single window exchange, the 100 TB-safe
      * top-N-per-group. Requires ORDER BY and `limit`; `col` must be a
      * group key (aggregate path) or a selected column (raw path). */
    limitPer: Option[String] = None,
    /** `select [distinct] *` (extension, p98): project EVERY column of
      * the base frame, expanded at compile time against the concrete
      * base (runParsed / runStream) — `selects` is empty while this is
      * set. Scan/filter/distinct/order/limit/membership shapes only
      * (parse-guarded): anything that reshapes the column set spells its
      * columns. */
    star: Boolean = false,
    /** True iff the query SPELLED a `granularity` clause (the parser sets
      * it; `granularitySec` alone can't distinguish an explicit 300 from
      * the reference default). Routing reads it for derived-table inners:
      * an aggregate inner with no ORDER BY and no explicit window clause
      * takes the sorted (per-key totals) path — defaulting it into 300 s
      * tumbling windows would hand the outer query per-(key, window) rows
      * it has no way to see (ADVICE r12). */
    granSet: Boolean = false,
    /** `select distinct` (extension, p59): dedup the raw projection —
      * one shuffle on the projected columns, the relational primitive
      * corpus-slice composition needs next to `union`. Raw-projection
      * queries only (parse-guarded); ORDER BY / LIMIT apply AFTER the
      * dedup. Batch-only (a streaming distinct is unbounded state). */
    distinctRows: Boolean = false,
    /** Analytic window functions (extension, p68):
      * `row_number()/rank()/dense_rank()/lag(col[,n])/lead(col[,n])
      * over (partition by … order by …) as name`. Raw-projection queries
      * only; `partition by` is REQUIRED (an unpartitioned window is a
      * single-partition global sort — the curriculum operator is the
      * scale path for global ranks); exactly ONE exchange on the
      * partition keys serves every window item sharing that partition
      * list. Batch-only. */
    winSelects: Seq[WinSelect] = Nil,
    /** Output column names in select-list order when [[winSelects]] is
      * non-empty (raw names and window aliases interleave — the windowed
      * projection re-orders by this). */
    winOutOrder: Seq[String] = Nil,
    /** `qualify <boolexpr>` (extension): the post-window row filter —
      * SQL's "keep rank 1 of each group" primitive (dedup-keep-best).
      * Binds window aliases and selected columns; requires
      * [[winSelects]]. Same condition-tree grammar as WHERE, evaluated
      * AFTER the window projection (never pushed into the scan). */
    qualify: Option[ConditionTree] = None,
    /** `explode(<col>, '<sep>') as <name>` (p85, extension): the
      * GENERATOR select item — split a delimited string column and emit
      * one row per element (the reference's `tag` column holds "t1,t2"
      * lists it can only CONTAINS-probe; this unnests them). Raw-path
      * queries only, one per query; other selected columns repeat per
      * element. Applied AFTER the WHERE gate (SQL visibility: WHERE
      * cannot see the alias), BEFORE distinct/order/limit, so
      * `select distinct explode(…)` dedups elements and an aggregating
      * OUTER query over a derived exploded table is the word/tag-count
      * shape. The separator is a LITERAL (regex-quoted on Spark; DuckDB's
      * string_split is literal-only) — both engines agree on the edge
      * cases: NULL input → zero rows, '' → one ''-element row, a
      * trailing separator → a trailing '' element. A stateless narrow
      * explode (zero shuffles), so it also STREAMS. */
    explodeCol: Option[(String, String, String)] = None)

/** One analytic window select item — see [[ZxQuery.winSelects]].
  * Functions: ranks (row_number/rank/dense_rank), offsets (lag/lead —
  * `offset` is the lookback/lookahead, default 1), AGGREGATE windows
  * (sum/mean/min/max/count — plain SQL row semantics, unweighted; with
  * `orderBy` the RUNNING form under SQL's default RANGE frame, without
  * it the whole-partition total), navigation (first_value/last_value —
  * last_value over the full-partition frame, or it would be the current
  * row) and bucketing (ntile — `offset` carries the bucket count).
  * `orderBy` is required at parse for every order-SENSITIVE function;
  * only aggregate windows may omit it. */
final case class WinSelect(
    func: String,
    arg: Option[String],
    offset: Int,
    partitionBy: Seq[String],
    orderBy: Seq[(String, SortDir)],
    alias: String,
    /** `rows <n> preceding` (p87): a MOVING frame — ROWS BETWEEN n
      * PRECEDING AND CURRENT ROW, the k-row moving average/sum staple.
      * Aggregate window functions with ORDER BY only. Standard-SQL
      * caveat applies on BOTH engines: a ROWS frame over a non-total
      * ORDER BY is tie-order-dependent — spell a unique tiebreak. */
    rowsPreceding: Option[Int] = None,
    /** `rows between <m> preceding and <n> following` (p115): the
      * TWO-SIDED frame — the centered moving average/smoother. Set
      * together with [[rowsPreceding]]; same aggregate-window +
      * ORDER BY + unique-tiebreak discipline. */
    rowsFollowing: Option[Int] = None)
