package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ir._

/** Compiles the reference's 12 filter comparators (lib.rs:411-500) to
  * Catalyst `Column` predicates.
  *
  * All outputs are built-in expressions, so Catalyst can push them into the
  * Parquet scan (predicate pushdown + row-group min/max pruning) — the
  * distributed equivalent of the reference's filter-before-materialize
  * pipeline (lib.rs:197-200) and `max_range` zone-map trick (lib.rs:786-799).
  *
  * Semantics notes vs the reference:
  *  - GT/LT/GTE/LTE: the reference parses both sides as `isize` and panics on
  *    non-numeric input (lib.rs:443-444). We use `try_cast(DOUBLE)` — a row
  *    whose value does not parse becomes NULL and is filtered out (ANSI-safe,
  *    no job-killing exception at 100 TB).
  *  - Negated predicates (Ne/NotStartsWith/NotContains) only match rows where
  *    the column is present, because the reference iterates stored column
  *    values (lib.rs:426-430). Spark's three-valued logic gives the same
  *    result for free: NULL input → NULL predicate → row dropped.
  *  - SQL `!=` in the reference is a parser bug mapping to equality
  *    (expr.rs:66-74); we implement real inequality (SURVEY §7.4).
  */
object Predicates {

  def compile(cond: Condition, schema: StructType): Column = {
    val c = Compiler.colRef(cond.column)
    val fieldType: Option[DataType] =
      schema.fields.find(_.name == cond.column).map(_.dataType)

    // Numeric view of the column: native numerics stay as-is (keeps the
    // comparison unwrappable for parquet pushdown); strings get try_cast.
    // TIMESTAMP_NTZ has no double cast — it routes through TimestampType
    // first (sessions run UTC, and the NTZ storage contract IS UTC wall
    // clock — sources/Tables.scala), landing on the same epoch seconds.
    def numC: Column = fieldType match {
      case Some(_: NumericType) => c
      case Some(_: TimestampType) | Some(_: DateType) => c.cast(DoubleType)
      case Some(_: TimestampNTZType) => c.cast(TimestampType).cast(DoubleType)
      case _ => c.try_cast(DoubleType)
    }
    // unparseable numeric literal → NULL comparison → no rows match (the
    // try_cast philosophy; the reference panics, lib.rs:443-444)
    def numV: Column = cond.value.toDoubleOption
      .map(lit).getOrElse(lit(null).cast(DoubleType))
    // INTEGRAL columns with an exactly-integral literal compare in the
    // COLUMN'S OWN type, so the bound pushes into the Parquet scan
    // (row-group min/max pruning + filter pushdown). The double view
    // would wrap the column in an implicit cast — unpushable, and lossy
    // above 2^53 where native comparison also matches the oracle
    // exactly. A literal outside the column type's range keeps the
    // double path (row-wise correct; such a bound selects all-or-none
    // rows anyway).
    def nativeIntCmp: Option[(Column, Column)] = fieldType.flatMap {
      case t @ (ByteType | ShortType | IntegerType | LongType) =>
        cond.value.toLongOption.flatMap { v =>
        val fits = t match {
          case ByteType    => v >= Byte.MinValue && v <= Byte.MaxValue
          case ShortType   => v >= Short.MinValue && v <= Short.MaxValue
          case IntegerType => v >= Int.MinValue && v <= Int.MaxValue
          case _           => true
        }
        if (fits) Some((c, lit(v).cast(t))) else None
      }
      case _ => None
    }
    // Temporal columns take DATE / DATETIME literals ('1995-03-15',
    // '1995-03-15 10:30:00') on the range comparators, compared in the
    // COLUMN'S OWN type so the bound pushes into the Parquet scan:
    // TimestampType against the UTC instant, TIMESTAMP_NTZ against the
    // wall-clock LocalDateTime (the NTZ contract is UTC — exactly the
    // ntzBounds mirror Compiler.scanFilter uses for the time range).
    def temporalCmp: Option[(Column, Column)] = fieldType.flatMap {
      case _: TimestampType =>
        Predicates.dateLiteralEpochSec(cond.value).map(e =>
          (c, timestamp_seconds(lit(e.toLong))))
      case _: TimestampNTZType =>
        Predicates.dateLiteralEpochSec(cond.value).map(e =>
          (c, lit(java.time.LocalDateTime.ofEpochSecond(
            e.toLong, 0, java.time.ZoneOffset.UTC))))
      case _ => None
    }
    def strC: Column = fieldType match {
      case Some(StringType) | None => c
      case _ => c.cast(StringType)
    }

    // Equality: string columns compare as strings (reference storage is all
    // strings, lib.rs:31); numeric columns compare numerically, and an
    // unparseable literal can never match (instead of an ANSI coercion error).
    def numLit: Option[Double] = cond.value.toDoubleOption
    def eqC: Column = fieldType match {
      case Some(_: NumericType) =>
        nativeIntCmp.map { case (a, b) => a === b }.getOrElse(
          numLit.map(v => c === lit(v)).getOrElse(lit(false)))
      case Some(StringType) | None => c === lit(cond.value)
      case _                       => c.cast(StringType) === lit(cond.value)
    }
    def neC: Column = fieldType match {
      case Some(_: NumericType) =>
        // every present value differs from an unparseable literal
        nativeIntCmp.map { case (a, b) => a =!= b }.getOrElse(
          numLit.map(v => c =!= lit(v)).getOrElse(c.isNotNull))
      case Some(StringType) | None => c =!= lit(cond.value)
      case _                       => c.cast(StringType) =!= lit(cond.value)
    }
    def rangeCmp: Option[(Column, Column)] = temporalCmp.orElse(nativeIntCmp)

    cond.cmp match {
      case Cmp.Eq            => eqC
      case Cmp.Ne            => neC
      case Cmp.Gt            => rangeCmp.map { case (a, b) => a > b }.getOrElse(numC > numV)
      case Cmp.Lt            => rangeCmp.map { case (a, b) => a < b }.getOrElse(numC < numV)
      case Cmp.Gte           => rangeCmp.map { case (a, b) => a >= b }.getOrElse(numC >= numV)
      case Cmp.Lte           => rangeCmp.map { case (a, b) => a <= b }.getOrElse(numC <= numV)
      case Cmp.Exists        => c.isNotNull
      case Cmp.NotExists     => c.isNull
      case Cmp.StartsWith    => strC.startsWith(cond.value)
      case Cmp.NotStartsWith => !strC.startsWith(cond.value)
      case Cmp.Contains      => strC.contains(cond.value)
      case Cmp.NotContains   => !strC.contains(cond.value)
      // SQL LIKE semantics on both engines (%/_ wildcards, three-valued:
      // NULL column → NULL → row drops, negated too)
      case Cmp.Like          => strC.like(cond.value)
      case Cmp.NotLike       => !strC.like(cond.value)
      // regexp (p125): substring-match semantics (regexp_like — anchor
      // with ^$ for a full match) over the parser-enforced portable
      // subset; evaluates post-scan (no regex pushdown exists)
      case Cmp.Regexp        => regexp_like(strC, lit(cond.value))
      case Cmp.NotRegexp     => !regexp_like(strC, lit(cond.value))
    }
  }

  /** `'1995-03-15'` / `'1995-03-15 10:30:00'` → UTC epoch seconds, for
    * range comparisons against timestamp columns (whose double cast IS
    * epoch seconds — instants, session-timezone-independent). Returns
    * None for anything that parses as neither, falling back to the
    * matches-nothing NULL literal. */
  private[compile] def dateLiteralEpochSec(v: String): Option[Double] =
    try Some(java.time.LocalDate.parse(v)
        .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond.toDouble)
    catch { case _: java.time.format.DateTimeParseException =>
      try Some(java.time.LocalDateTime.parse(v.replace(' ', 'T'))
          .toEpochSecond(java.time.ZoneOffset.UTC).toDouble)
      catch { case _: java.time.format.DateTimeParseException => None }
    }

  /** AND-fold a conjunct list (the reference applies conditions sequentially,
    * lib.rs:197-200; Catalyst re-orders and compacts the conjunction). */
  def compileAll(conds: Seq[Condition], schema: StructType): Option[Column] =
    conds.map(compile(_, schema)).reduceOption(_ && _)

  /** Recursive compile of the boolean [[ConditionTree]] (OR/NOT/parens —
    * extension; the reference punts at expr.rs:99). Spark `Column`s compose
    * natively, and Catalyst still splits the top-level conjunction for
    * pushdown (`BooleanSimplification` + `PushDownPredicates`), so a
    * disjunction costs exactly what the data demands, no more plumbing. */
  def compileTree(tree: ConditionTree, schema: StructType): Column = tree match {
    case _: ConditionTree.InSubquery =>
      // membership subqueries are lifted into ZxQuery.semiJoins at parse
      // and compiled as joins — one reaching this compiler is a bug
      throw new IllegalArgumentException(
        "in (select …) compiles as a semi join, never as a row predicate")
    case _: ConditionTree.ScalarSubquery =>
      // scalar subqueries resolve to literal leaves at run() — one
      // reaching this compiler means resolution was skipped
      throw new IllegalArgumentException(
        "unresolved scalar subquery — ZxSql resolves these before compile")
    case ConditionTree.Leaf(c)      => compile(c, schema)
    case ConditionTree.And(cs)      => cs.map(compileTree(_, schema)).reduce(_ && _)
    case ConditionTree.Or(cs)       => cs.map(compileTree(_, schema)).reduce(_ || _)
    case ConditionTree.Not(c)       => !compileTree(c, schema)
    case ConditionTree.ExprLeaf(l, cmp, r) =>
      // row-wise measure comparison (IR scaladoc): both sides through the
      // same numeric view as expression measures; null side → null
      // predicate → row dropped (three-valued logic)
      val a = Aggregates.measureCol(l, schema)
      val b = Aggregates.measureCol(r, schema)
      cmp match {
        case Cmp.Eq  => a === b
        case Cmp.Ne  => a =!= b
        case Cmp.Gt  => a > b
        case Cmp.Lt  => a < b
        case Cmp.Gte => a >= b
        case Cmp.Lte => a <= b
        case other => throw new IllegalArgumentException(
          s"expression predicates support numeric comparators, got ${other.name}")
      }
  }
}
