package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ir._

/** Compiles the reference's aggregates (lib.rs:560-732) to Catalyst `Column`
  * compositions — every one stays inside whole-stage codegen with map-side
  * partial aggregation; no UDF, no custom physical operator (SURVEY §4).
  *
  * Reference semantics reproduced exactly:
  *  - every aggregate is weighted by `__sample_rate` (default 1 when the
  *    column/value is absent — lib.rs:563-566);
  *  - Sum treats a missing value as 0 (`unwrap_or("0")`, lib.rs:566-572);
  *  - Count sums the sample rate over rows where the column is present
  *    (lib.rs:608-623);
  *  - CountDistinct counts NULL as one extra distinct bucket (lib.rs:626-635)
  *    — unlike ANSI COUNT(DISTINCT);
  *  - Mean is the sample-rate-weighted mean (lib.rs:637-657, golden value
  *    571.428… in test.rs:452).
  *
  * Documented divergences (SURVEY §7.4): empty-input Max/Min return NULL, not
  * f64::MIN/MAX (lib.rs:578, 593); values that fail numeric parse become NULL
  * via try_cast instead of panicking (lib.rs:566-572 parse().unwrap()).
  *
  * P50/Raw/Heatmap are declared but `unimplemented!()` in the reference
  * (lib.rs:659-661); we implement P50 as exact `percentile` here, and
  * Raw/Heatmap at the pipeline level (Compiler.scala).
  */
object Aggregates {

  val SampleRateCol = "__sample_rate" // lib.rs:58

  /** Weight = coalesce(__sample_rate, 1). If the dataset has no sample-rate
    * column at all, the weight is the literal 1 and Catalyst folds the
    * multiplications away — unweighted data pays nothing. */
  def weight(schema: StructType): Column =
    if (schema.fieldNames.contains(SampleRateCol))
      coalesce(col(SampleRateCol).try_cast(DoubleType), lit(1.0))
    else lit(1.0)

  /** Numeric view of a column: parse-on-demand for string storage
    * (lib.rs:566-572), pass-through for native numerics. `*` (the count(*)
    * pseudo-column) reads as the constant 1. */
  def numeric(column: String, schema: StructType): Column =
    if (column == "*") lit(1.0)
    else {
      val c = Compiler.colRef(column)
      schema.fields.find(_.name == column).map(_.dataType) match {
        case Some(_: NumericType) => c.cast(DoubleType)
        case _                    => c.try_cast(DoubleType)
      }
    }

  /** Row-wise value of a [[MeasureExpr]] — columns through [[numeric]]
    * (parse-on-demand string storage preserved), literals as doubles,
    * IEEE arithmetic. `/` is `try_divide`: division by zero is null, not
    * an ANSI error — a computed measure over dirty data must degrade to
    * "this row contributes nothing", never kill the job. DuckDB's `/`
    * returns NULL on a zero divisor natively, so oracles match with a
    * plain division. Pure `Column`
    * composition, so expression measures codegen like plain columns. */
  def measureCol(e: MeasureExpr, schema: StructType): Column = e match {
    case MeasureExpr.Col(n)       => numeric(n, schema)
    case MeasureExpr.Lit(v)       => lit(v)
    case MeasureExpr.StrLit(v)    => lit(v)
    case MeasureExpr.Neg(x)       => -measureCol(x, schema)
    case MeasureExpr.Bin(op, l, r) =>
      val a = measureCol(l, schema); val b = measureCol(r, schema)
      op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => try_divide(a, b)
        // `%` (p108): C-style remainder — sign of the DIVIDEND, computed
        // in double like every measure; DuckDB's `%` agrees exactly
        // (sign of dividend, NULL on a zero divisor — its fmod() is the
        // FLOORED variant and must never appear in an oracle). The
        // when-guard pins the zero case to null on dirty data.
        case "%" => when(b === lit(0.0), lit(null)).otherwise(a % b)
        case other => throw new IllegalArgumentException(s"bad measure op '$other'")
      }
    case MeasureExpr.Func(name, args) =>
      // scalar functions (p76): IDENTICAL IEEE semantics on both engines.
      // floor/ceil cast back to double (Spark returns LONG, DuckDB
      // DOUBLE); length reads the RAW column (a numeric cast would
      // destroy the string) and casts to LONG (DuckDB BIGINT). round's
      // digit count is a parse-enforced integer literal (Spark's scale
      // is a plan constant).
      def a(i: Int) = measureCol(args(i), schema)
      name match {
        case "abs"   => abs(a(0))
        case "floor" => floor(a(0)).cast(DoubleType)
        case "ceil"  => ceil(a(0)).cast(DoubleType)
        case "sqrt"  => sqrt(a(0))
        case "exp"   => exp(a(0))
        case "ln"    => log(a(0))
        case "log10" => log10(a(0))
        case "pow"   => pow(a(0), a(1))
        case "round" =>
          val d = args.lift(1) match {
            case Some(MeasureExpr.Lit(v)) => v.toInt
            case None                     => 0
            case other => throw new IllegalArgumentException(
              s"round digits must be an integer literal, got $other")
          }
          round(a(0), d)
        case "length" => args.head match {
          case MeasureExpr.Col(n) =>
            length(Compiler.colRef(n)).cast(LongType)
          case other => throw new IllegalArgumentException(
            s"length takes a string column, got $other")
        }
        // calendar field extractors (p82): read the RAW timestamp/date
        // column (the numeric view would destroy it) and cast the field
        // to LONG — DuckDB's year()/month()/… return BIGINT. Both engines
        // extract the same wall-clock field under the UTC contract.
        // datediff(end, start) (p90): whole day-boundary crossings — both
        // engines truncate to the date under the UTC contract and diff
        // days, so timestamps with time-of-day agree; BIGINT result
        case "datediff" =>
          val cs = args.map {
            case MeasureExpr.Col(n) => Compiler.colRef(n)
            case other => throw new IllegalArgumentException(
              s"datediff takes timestamp (or date) columns, got $other")
          }
          datediff(cs(0), cs(1)).cast(LongType)
        case f if MeasureExpr.timeFuncs(f) =>
          val c = args.head match {
            case MeasureExpr.Col(n) => Compiler.colRef(n)
            case other => throw new IllegalArgumentException(
              s"$f takes a timestamp (or date) column, got $other")
          }
          (f match {
            case "year"   => year(c)
            case "month"  => month(c)
            case "day"    => dayofmonth(c)
            case "hour"   => hour(c)
            case "minute" => minute(c)
            // p111: integer seconds (fraction truncated, both engines)
            case "second" => second(c)
            // p111: ISO day-of-week 1=Monday…7=Sunday — Spark's weekday()
            // is 0=Monday; DuckDB's isodow is already 1-based
            case _        => weekday(c) + lit(1)
          }).cast(LongType)
        // null-handling scalars (p84): identical semantics on both
        // engines — coalesce takes the first non-null, nullif(x, y) nulls
        // x when it equals y, greatest/least SKIP nulls (null only when
        // every argument is null; DuckDB agrees)
        case "coalesce" => coalesce(args.indices.map(a): _*)
        // ifnull/nvl (p118): two-argument coalesce aliases
        case "ifnull" | "nvl" => coalesce(a(0), a(1))
        case "nullif"   => nullif(a(0), a(1))
        case "greatest" => greatest(args.indices.map(a): _*)
        case "least"    => least(args.indices.map(a): _*)
        // JSON props extraction (p85): the schemaless-event staple. The
        // key is a parse-enforced simple identifier (no dots/quotes —
        // path-syntax differences between engines never engage); a
        // missing key is NULL on both engines. json_num try_casts the
        // extracted scalar (dirty data degrades to NULL, never kills the
        // job); json_str is the STRING form under the p79 discipline.
        // Malformed-JSON divergence documented at the SQL face: we yield
        // NULL (get_json_object), DuckDB errors — the oracle's input is
        // valid JSON by construction.
        case "json_num" | "json_str" =>
          val src = args.head match {
            case MeasureExpr.Col(nm) => Compiler.colRef(nm)
            case other => throw new IllegalArgumentException(
              s"$name takes a JSON string column, got $other")
          }
          val key = args(1) match {
            case MeasureExpr.StrLit(k) => k
            case other => throw new IllegalArgumentException(
              s"$name key must be a string literal, got $other")
          }
          val ex = get_json_object(src, "$." + key)
          if (name == "json_num") ex.try_cast(DoubleType) else ex
        // sign (p108): signum in double — DuckDB's sign() returns an
        // integer-typed -1/0/1, so oracles cast (sign(x)::DOUBLE)
        case "sign" => signum(a(0))
        // mod(x, y) (p108): the named spelling of `%` — same C-style
        // remainder, same null-on-zero-divisor discipline
        case "mod" => when(a(1) === lit(0.0), lit(null)).otherwise(a(0) % a(1))
        // date_trunc (p107): calendar truncation to a real TIMESTAMP
        // under the UTC contract — the monthly/weekly rollup key. Spark
        // and DuckDB agree on every accepted unit (ISO weeks start
        // Monday on both) — but DuckDB RETURNS DATE for day-and-coarser
        // units, so oracles spell CAST(date_trunc(…) AS TIMESTAMP).
        // Unit is a parse-enforced literal from the shared vocabulary;
        // the argument is a bare timestamp column.
        case "date_trunc" =>
          val unit = args.head match {
            case MeasureExpr.StrLit(u) => u
            case other => throw new IllegalArgumentException(
              s"date_trunc unit must be a string literal, got $other")
          }
          val c = args(1) match {
            case MeasureExpr.Col(n) => Compiler.colRef(n)
            case other => throw new IllegalArgumentException(
              s"date_trunc takes a timestamp (or date) column, got $other")
          }
          date_trunc(unit, c)
        // strpos (p101): 1-based position of a literal substring, 0 when
        // absent — BIGINT on both engines, so it enters arithmetic and
        // predicates (`strpos(url, '://') > 0`)
        case "strpos" =>
          val sub = args(1) match {
            case MeasureExpr.StrLit(v) => v
            case other => throw new IllegalArgumentException(
              s"strpos search must be a string literal, got $other")
          }
          val src = args.head match {
            case MeasureExpr.Col(n) => Compiler.colRef(n)
            case e if MeasureExpr.isString(e) => measureCol(e, schema)
            case other => throw new IllegalArgumentException(
              s"strpos takes a string column/expression, got $other")
          }
          instr(src, sub).cast(LongType)
        // string functions (p79): the argument is a RAW column or a
        // nested string expression — never the numeric view
        case "lower" | "upper" | "trim" | "substr" | "concat" |
             "replace" | "split_part" | "lpad" | "rpad" | "reverse" |
             "regexp_extract" =>
          def strArg(x: MeasureExpr): Column = x match {
            case MeasureExpr.Col(n) => Compiler.colRef(n)
            case other if MeasureExpr.isString(other) => measureCol(other, schema)
            case other => throw new IllegalArgumentException(
              s"$name takes a string column/expression, got $other")
          }
          name match {
            case "lower" => lower(strArg(args.head))
            case "upper" => upper(strArg(args.head))
            case "trim"  => trim(strArg(args.head))
            // concat (p93): NULL-PROPAGATING (any NULL piece → NULL) —
            // Spark's concat; the oracle spells `a || b`, which DuckDB
            // also NULL-propagates (DuckDB's own concat() skips NULLs,
            // so oracles must never use it)
            case "concat" => concat(args.map(strArg): _*)
            // p101 string surgery — literal search/separator/pad
            // arguments are parse-enforced (non-empty string literals),
            // so both engines see the same well-defined edge behavior
            case "replace" =>
              val MeasureExpr.StrLit(se) = args(1): @unchecked
              val MeasureExpr.StrLit(re) = args(2): @unchecked
              // LITERAL search/replace (StringReplace, codegen'd) —
              // never a regex, so '.'/'%' need no escaping
              org.apache.spark.sql.functions.replace(
                strArg(args.head), lit(se), lit(re))
            case "split_part" =>
              val MeasureExpr.StrLit(sp) = args(1): @unchecked
              val MeasureExpr.Lit(ix) = args(2): @unchecked
              // 1-based; an out-of-range index yields '' on BOTH engines
              split_part(strArg(args.head), lit(sp), lit(ix.toInt))
            // regexp_extract (p125): portable-subset pattern and a
            // parse-validated group index; '' on no match (BOTH engines)
            case "regexp_extract" =>
              val MeasureExpr.StrLit(pt) = args(1): @unchecked
              val MeasureExpr.Lit(gi) = args(2): @unchecked
              regexp_extract(strArg(args.head), pt, gi.toInt)
            case "lpad" | "rpad" =>
              val MeasureExpr.Lit(len) = args(1): @unchecked
              val MeasureExpr.StrLit(pad) = args(2): @unchecked
              if (name == "lpad") lpad(strArg(args.head), len.toInt, pad)
              else rpad(strArg(args.head), len.toInt, pad)
            case "reverse" => reverse(strArg(args.head))
            case _ => // substr(s, start, len) — 1-based on both engines
              val st = args(1).asInstanceOf[MeasureExpr.Lit].value.toInt
              val ln = args(2).asInstanceOf[MeasureExpr.Lit].value.toInt
              substring(strArg(args.head), st, ln)
          }
        case other => throw new IllegalArgumentException(
          s"unknown scalar function '$other'")
      }
    case MeasureExpr.Case(branches, orElse) =>
      // conditional measure: branch predicates reuse the WHERE compiler
      // verbatim (same comparator/like/in/between semantics as filters),
      // values recurse through this measure compiler. SQL CASE semantics:
      // first true branch wins, no match → else, no else → NULL (the row
      // contributes nothing to a sum/mean). A NULL predicate is not-true,
      // so it falls through — three-valued logic, same as DuckDB.
      val chained = branches.foldLeft(Option.empty[Column]) { case (acc, (c, v)) =>
        val p = Predicates.compileTree(c, schema)
        val w = measureCol(v, schema)
        Some(acc.map(_.when(p, w)).getOrElse(when(p, w)))
      }.getOrElse(throw new IllegalArgumentException("case needs at least one when branch"))
      orElse.map(e2 => chained.otherwise(measureCol(e2, schema))).getOrElse(chained)
  }

  /** RAW-preserving view of a measure expression: a bare column reads
    * its STORAGE type (string/timestamp survive — the numeric view would
    * destroy them), anything else compiles through [[measureCol]]. The
    * value/ordering arguments of max_by/min_by/string_agg, where "the
    * value" means the stored value, not its numeric parse. */
  def rawish(e: MeasureExpr, schema: StructType): Column = e match {
    case MeasureExpr.Col(n) => Compiler.colRef(n)
    case other              => measureCol(other, schema)
  }

  /** Post-aggregate expression column ([[AggExpr]]): a scalar projection
    * over component aggregate outputs — each leaf call reads the column
    * its internal alias named in the same aggregation; `/` keeps the
    * null-on-zero-divisor contract. Runs AFTER the aggregation exchange,
    * so a ratio of sums costs zero extra shuffles. */
  def postCol(e: AggExpr): Column = e match {
    case AggExpr.Call(sel)       => Compiler.colRef(sel.key)
    case AggExpr.Lit(v)          => lit(v)
    case AggExpr.Neg(x)          => -postCol(x)
    case AggExpr.Bin(op, l, r) =>
      val a = postCol(l); val b = postCol(r)
      op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => try_divide(a, b)
        case "%" => when(b === lit(0.0), lit(null)).otherwise(a % b)
        case other => throw new IllegalArgumentException(s"bad post-aggregate op '$other'")
      }
  }

  /** Value / presence pair for one Select: plain columns keep the
    * reference's semantics (presence = the STORAGE column is non-null,
    * even if it fails numeric parse, lib.rs:608-623); expression measures
    * define presence as "the expression evaluates" (non-null result). */
  private def valueAndPresence(sel: Select, schema: StructType): (Column, Column) =
    sel.expr match {
      case Some(e) =>
        val v = measureCol(e, schema)
        (v, v.isNotNull)
      case None =>
        (numeric(sel.column, schema),
          if (sel.column == "*") lit(true) else Compiler.colRef(sel.column).isNotNull)
    }

  /** Compile one Select to an aliased aggregate Column. */
  def compile(sel: Select, schema: StructType): Column = {
    val w = weight(schema)
    // count(*) counts every row (weighted); a named column counts presence
    val (v, present) = valueAndPresence(sel, schema)
    val agg: Column = sel.agg match {
      case Agg.Sum   => coalesce(sum(w * coalesce(v, lit(0.0))), lit(0.0))
      case Agg.Max   => max(v)
      case Agg.Min   => min(v)
      case Agg.Count => coalesce(sum(when(present, w).otherwise(lit(0.0))), lit(0.0))
      case Agg.CountDistinct =>
        // distinct over the STORAGE column for plain selects (string
        // identity, lib.rs:626-635); over the computed value for
        // expression measures
        countDistinct(sel.expr.map(_ => v).getOrElse(Compiler.colRef(sel.column))) +
          coalesce(max(when(present, lit(0L)).otherwise(lit(1L))), lit(0L))
      case Agg.ApproxCountDistinct =>
        // HLL sketch with the reference's +1-nil convention (lib.rs:626-635)
        // preserved, so approx→exact swaps don't shift null handling
        approx_count_distinct(sel.expr.map(_ => v).getOrElse(Compiler.colRef(sel.column))) +
          coalesce(max(when(present, lit(0L)).otherwise(lit(1L))), lit(0L))
      case Agg.Mean =>
        try_divide(sum(when(present, w * v).otherwise(lit(0.0))),
                   sum(when(present, w).otherwise(lit(0.0))))
      case Agg.P50       => percentile(v, lit(0.5))
      case Agg.P90       => percentile(v, lit(0.9))
      case Agg.P99       => percentile(v, lit(0.99))
      // arbitrary exact quantile (p109): q rides expr2 as a parse-
      // enforced literal; same interpolated machinery as P50 (DuckDB:
      // quantile_cont)
      case Agg.Percentile =>
        val q = sel.expr2 match {
          case Some(MeasureExpr.Lit(d)) => d
          case other => throw new IllegalArgumentException(
            s"percentile fraction must be a literal, got $other")
        }
        percentile(v, lit(q))
      case Agg.P50Approx => percentile_approx(v, lit(0.5), lit(10000))
      // dispersion (extensions): SAMPLE forms with plain ANSI semantics —
      // unweighted like the percentile family (a weighted stddev has no
      // standard definition and no oracle counterpart); NULL when the
      // group has < 2 non-null values on both engines
      case Agg.Stddev    => stddev_samp(v)
      case Agg.Variance  => var_samp(v)
      // two-argument dispersion: pairs with either side NULL are skipped
      // on both engines; arguments ride the measure grammar
      case Agg.Corr =>
        corr(measureCol(sel.expr.get, schema),
          measureCol(sel.expr2.get, schema))
      case Agg.CovarSamp =>
        covar_samp(measureCol(sel.expr.get, schema),
          measureCol(sel.expr2.get, schema))
      case Agg.RegrSlope =>
        regr_slope(measureCol(sel.expr.get, schema),
          measureCol(sel.expr2.get, schema))
      case Agg.RegrIntercept =>
        regr_intercept(measureCol(sel.expr.get, schema),
          measureCol(sel.expr2.get, schema))
      // max_by/min_by (p102): ONE struct-ordered max/min — the ordering
      // value leads the struct, the carried value follows, so ties in y
      // break toward the larger (max_by) / smaller (min_by) x and the
      // result is DETERMINISTIC (ANSI leaves ties undefined — an oracle
      // cannot verify that). Rows with NULL y are skipped via the when-
      // guard (the struct itself goes NULL and max/min ignore NULLs).
      // Bare columns keep their RAW type (a string x is the dedup-keep-
      // best carrier; a timestamp y is "latest value"); expressions ride
      // the measure grammar. One hash aggregate, map-side partials.
      case Agg.MaxBy | Agg.MinBy =>
        val x = rawish(sel.expr.get, schema)
        val y = rawish(sel.expr2.get, schema)
        val pair = when(y.isNotNull, struct(y.as("o"), x.as("v")))
        (if (sel.agg == Agg.MaxBy) max(pair) else min(pair)).getField("v")
      // string_agg (p103): the group's values, NULLs skipped, SORTED
      // ascending by value (deterministic contract — ANSI's undefined
      // order has no oracle), joined by the literal separator. A group
      // with zero non-null values yields NULL (DuckDB string_agg
      // parity — concat_ws alone would yield ''). collect_list is the
      // one non-codegen aggregate in the registry: output size is the
      // group's value payload, the same scale class as the result row.
      case Agg.StringAgg =>
        val c = rawish(sel.expr.getOrElse(MeasureExpr.Col(sel.column)), schema)
        val sep = sel.expr2 match {
          case Some(MeasureExpr.StrLit(v)) => v
          case other => throw new IllegalArgumentException(
            s"string_agg separator must be a string literal, got $other")
        }
        when(count(c) === lit(0L), lit(null).cast(StringType))
          .otherwise(concat_ws(sep, array_sort(collect_list(c.cast(StringType)))))
      // count(distinct x) (p104): the ANSI spelling — NULL is NOT
      // counted, unlike the reference's +1-nil count_distinct. Plain
      // selects count distinct STORAGE values (string identity, like
      // count_distinct); expression measures count the computed value.
      case Agg.DistinctCount =>
        sel.expr2 match {
          // multi-key distinct (p122): the PAIR is the key; Spark's
          // countDistinct skips rows where ANY argument is NULL (ANSI)
          // — the oracle filters both-non-null before its distinct.
          // rawish keeps bare columns in STORAGE type (string identity).
          case Some(e2) =>
            countDistinct(rawish(sel.expr.get, schema), rawish(e2, schema))
          case None =>
            countDistinct(sel.expr.map(_ => v).getOrElse(Compiler.colRef(sel.column)))
        }
      // boolean quantifiers (p120): min/max over the parser's 1/0/NULL
      // indicator, compared to 1 — BOOLEAN result, NULL-skipping
      // three-valued semantics, empty/all-null group → NULL (both via
      // min/max's own null handling). One codegen'd hash aggregate.
      case Agg.BoolAnd => min(v) === lit(1.0)
      case Agg.BoolOr  => max(v) === lit(1.0)
      // population skewness / excess kurtosis (p121): Spark-native
      // central-moment aggregates; NULL when the moments degenerate
      // (fewer than the defining count of distinct values)
      case Agg.Skewness => skewness(v)
      case Agg.Kurtosis => kurtosis(v)
      // deterministic mode (p124): Spark's mode(expr, deterministic) —
      // among equally-frequent values the SMALLEST wins, so two engines
      // (and two shuffle orders) always agree; the oracle spells the
      // same contract as ORDER BY count DESC, value ASC
      case Agg.Mode => mode(v, deterministic = true)
      case Agg.Raw | Agg.Heatmap =>
        throw new IllegalArgumentException(
          s"${sel.agg.name} is handled at the pipeline level, not as an aggregate")
    }
    agg.as(sel.key)
  }

  /** The literal fraction of a quantile Select, when it is one. */
  private def quantileFraction(sel: Select): Option[Double] = sel.agg match {
    case Agg.P50 => Some(0.5)
    case Agg.P90 => Some(0.9)
    case Agg.P99 => Some(0.99)
    case Agg.Percentile => sel.expr2 match {
      case Some(MeasureExpr.Lit(d)) => Some(d)
      case _                        => None
    }
    case _ => None
  }

  def compileAll(sels: Seq[Select], schema: StructType): Seq[Column] = {
    // r15: EXACT quantiles over the same measure share ONE value buffer.
    // k separate `percentile(v, q)` aggregates each buffer the full
    // column (an ObjectHashAggregate counts-map per aggregate — the whole
    // column's distinct values held and shuffled k times); compiled as
    // `element_at(percentile(v, array(q1..qk)), i)` every select carries
    // a semantically IDENTICAL aggregate, which physical aggregation
    // deduplicates into a single function (plan-pinned) — one buffer,
    // identical per-fraction results (Spark evaluates each fraction of
    // the array form from the same counts map with the same interpolation
    // arithmetic as the scalar form). p109's q1/q3 on l_extendedprice and
    // a11's p50/p90/p99 collapse this way.
    val fused: Map[(String, Option[MeasureExpr]), Seq[Double]] = sels
      .filter(s => quantileFraction(s).isDefined)
      .groupBy(s => (s.column, s.expr))
      .filter(_._2.size >= 2)
      .map { case (k, ss) => k -> ss.map(s => quantileFraction(s).get).distinct }
    sels.map { sel =>
      quantileFraction(sel) match {
        case Some(q) if fused.contains((sel.column, sel.expr)) =>
          val qs = fused((sel.column, sel.expr))
          val (v, _) = valueAndPresence(sel, schema)
          element_at(percentile(v, array(qs.map(lit): _*)),
            qs.indexOf(q) + 1).as(sel.key)
        case _ => compile(sel, schema)
      }
    }
  }

  /** Aggregates a salted two-phase plan can decompose. CountDistinct needs
    * the value set and P50 the full distribution — re-aggregating their
    * partials is wrong, so they are rejected loudly. */
  val decomposable: Set[Agg] = Set(Agg.Sum, Agg.Count, Agg.Max, Agg.Min, Agg.Mean)

  /** Partial-phase columns and the final-phase merge for one Select under
    * salting. The composition (final ∘ partial) reproduces [[compile]]'s
    * semantics exactly: sums/counts re-sum, extremes re-extreme, mean keeps
    * weighted (value-sum, weight-sum) partials and divides once at the end. */
  private[compile] def saltPhases(sel: Select, i: Int, schema: StructType): (Seq[Column], Column) = {
    val w = weight(schema)
    val (v, present) = valueAndPresence(sel, schema)
    val pa = s"__p${i}a"; val pb = s"__p${i}b"
    sel.agg match {
      case Agg.Sum =>
        (Seq(sum(w * coalesce(v, lit(0.0))).as(pa)),
          coalesce(sum(col(pa)), lit(0.0)).as(sel.key))
      case Agg.Count =>
        (Seq(sum(when(present, w).otherwise(lit(0.0))).as(pa)),
          coalesce(sum(col(pa)), lit(0.0)).as(sel.key))
      case Agg.Max => (Seq(max(v).as(pa)), max(col(pa)).as(sel.key))
      case Agg.Min => (Seq(min(v).as(pa)), min(col(pa)).as(sel.key))
      case Agg.Mean =>
        (Seq(sum(when(present, w * v).otherwise(lit(0.0))).as(pa),
          sum(when(present, w).otherwise(lit(0.0))).as(pb)),
          try_divide(sum(col(pa)), sum(col(pb))).as(sel.key))
      case other => throw new IllegalArgumentException(
        s"skewSalt supports decomposable aggregates (${decomposable.map(_.name).mkString("/")}), not ${other.name}")
    }
  }

  /** Group-and-aggregate, optionally through the salted two-phase plan.
    *
    * Plain path: one hash aggregate (with Spark's own map-side partials).
    * Salted path (`skewSalt = Some(n)`): the first — heavy — aggregation
    * groups on (keys, salt) so a hot key's rows spread across `n` reducers
    * instead of one straggler; the second input is key-cardinality × n rows.
    * The salt is `pmod(hash(every column), n)` — deterministic per row,
    * uniform across a hot key's rows. AQE's skew handling covers joins;
    * this is the aggregation-side counterpart, now reachable from the IR
    * instead of a side entry point. */
  def groupedAgg(df0: org.apache.spark.sql.DataFrame, keys: Seq[Column],
                 keyNames: Seq[String], sels0: Seq[Select], schema: StructType,
                 skewSalt: Option[Int]): org.apache.spark.sql.DataFrame = {
    // Two-argument aggregates (corr/covar_samp/regr_*) are Declarative-
    // Aggregates that expand each input into SEVERAL update terms, and
    // Catalyst does not CSE across aggregate buffers — an expensive scalar
    // argument (get_json_object) would re-evaluate AND re-codegen per term
    // (p92 measured 4.7 s/plan vs 0.9 s pre-extracted at sf0.1).
    // Materialize both arguments ONCE in a projection below the aggregate;
    // the rewritten args are plain numeric column reads, semantically
    // identical by construction.
    val (df, sels) =
      if (!sels0.exists(s => Agg.twoArg(s.agg))) (df0, sels0)
      else {
        var d = df0
        val out = sels0.zipWithIndex.map { case (s, i) =>
          if (!Agg.twoArg(s.agg)) s
          else {
            val (ca, cb) = (s"__mx$i", s"__my$i")
            // max_by/min_by carry RAW values (string/timestamp survive);
            // the numeric pre-materialization would destroy them
            val mat: MeasureExpr => Column =
              if (s.agg == Agg.MaxBy || s.agg == Agg.MinBy)
                rawish(_, df0.schema)
              else measureCol(_, df0.schema)
            d = d.withColumn(ca, mat(s.expr.get))
              .withColumn(cb, mat(s.expr2.get))
            s.copy(expr = Some(MeasureExpr.Col(ca)),
              expr2 = Some(MeasureExpr.Col(cb)))
          }
        }
        (d, out)
      }
    skewSalt match {
      case None =>
        val aggs = compileAll(sels, schema)
        if (keys.nonEmpty) df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
        else df.agg(aggs.head, aggs.tail: _*)
      case Some(salts) =>
        require(salts > 0, s"skewSalt must be positive, got $salts")
        val (partials, finals) = sels.zipWithIndex
          .map { case (s, i) => saltPhases(s, i, schema) }.unzip
        val saltCol = pmod(hash(df.columns.map(col): _*), lit(salts)).as("__salt")
        val pcols = partials.flatten
        val partial = df.groupBy(keys :+ saltCol: _*).agg(pcols.head, pcols.tail: _*)
        if (keyNames.nonEmpty)
          partial.groupBy(keyNames.map(col): _*).agg(finals.head, finals.tail: _*)
        else partial.agg(finals.head, finals.tail: _*)
    }
  }
}
