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
    def numC: Column = fieldType match {
      case Some(_: NumericType) => c
      case Some(_: TimestampType) | Some(_: DateType) => c.cast(DoubleType)
      case _ => c.try_cast(DoubleType)
    }
    // unparseable numeric literal → NULL comparison → no rows match (the
    // try_cast philosophy; the reference panics, lib.rs:443-444)
    def numV: Column = cond.value.toDoubleOption
      .map(lit).getOrElse(lit(null).cast(DoubleType))
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
        numLit.map(v => c === lit(v)).getOrElse(lit(false))
      case Some(StringType) | None => c === lit(cond.value)
      case _                       => c.cast(StringType) === lit(cond.value)
    }
    def neC: Column = fieldType match {
      case Some(_: NumericType) =>
        // every present value differs from an unparseable literal
        numLit.map(v => c =!= lit(v)).getOrElse(c.isNotNull)
      case Some(StringType) | None => c =!= lit(cond.value)
      case _                       => c.cast(StringType) =!= lit(cond.value)
    }

    cond.cmp match {
      case Cmp.Eq            => eqC
      case Cmp.Ne            => neC
      case Cmp.Gt            => numC > numV
      case Cmp.Lt            => numC < numV
      case Cmp.Gte           => numC >= numV
      case Cmp.Lte           => numC <= numV
      case Cmp.Exists        => c.isNotNull
      case Cmp.NotExists     => c.isNull
      case Cmp.StartsWith    => strC.startsWith(cond.value)
      case Cmp.NotStartsWith => !strC.startsWith(cond.value)
      case Cmp.Contains      => strC.contains(cond.value)
      case Cmp.NotContains   => !strC.contains(cond.value)
    }
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
    case ConditionTree.Leaf(c)      => compile(c, schema)
    case ConditionTree.And(cs)      => cs.map(compileTree(_, schema)).reduce(_ && _)
    case ConditionTree.Or(cs)       => cs.map(compileTree(_, schema)).reduce(_ || _)
    case ConditionTree.Not(c)       => !compileTree(c, schema)
  }
}
