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
            case "year"  => year(c)
            case "month" => month(c)
            case "day"   => dayofmonth(c)
            case "hour"  => hour(c)
            case _       => minute(c)
          }).cast(LongType)
        // null-handling scalars (p84): identical semantics on both
        // engines — coalesce takes the first non-null, nullif(x, y) nulls
        // x when it equals y, greatest/least SKIP nulls (null only when
        // every argument is null; DuckDB agrees)
        case "coalesce" => coalesce(args.indices.map(a): _*)
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
        // string functions (p79): the argument is a RAW column or a
        // nested string expression — never the numeric view
        case "lower" | "upper" | "trim" | "substr" | "concat" =>
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
      case Agg.Raw | Agg.Heatmap =>
        throw new IllegalArgumentException(
          s"${sel.agg.name} is handled at the pipeline level, not as an aggregate")
    }
    agg.as(sel.key)
  }

  def compileAll(sels: Seq[Select], schema: StructType): Seq[Column] =
    sels.map(compile(_, schema))

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
            d = d.withColumn(ca, measureCol(s.expr.get, df0.schema))
              .withColumn(cb, measureCol(s.expr2.get, df0.schema))
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
