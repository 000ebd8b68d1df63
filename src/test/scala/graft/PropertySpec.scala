package graft

import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.ir._
import graft.sql.ZxSql

/** ScalaCheck properties. The parser round-trip is the load-bearing one:
  * any IR query rendered to its SQL surface must parse back identical —
  * covers every aggregate, comparator, and clause combination the dialect
  * admits, far beyond the hand-written SqlSpec cases. */
object ParserProps extends Properties("ZxSql") {

  private val identGen: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar, Gen.const('_')))
  } yield (h :: t).mkString

  private val aggGen: Gen[Agg] = Gen.oneOf(Agg.Sum, Agg.Max, Agg.Min,
    Agg.Count, Agg.CountDistinct, Agg.Mean, Agg.P50, Agg.P90, Agg.P99,
    Agg.ApproxCountDistinct, Agg.P50Approx)

  private val selectGen: Gen[Select] = Gen.frequency(
    9 -> (for { a <- aggGen; c <- identGen } yield Select(a, c)),
    1 -> Gen.const(Select(Agg.Count, "*")))

  private val condGen: Gen[Condition] = for {
    cmp <- Gen.oneOf(Cmp.Eq, Cmp.Ne, Cmp.Gt, Cmp.Lt, Cmp.Gte, Cmp.Lte)
    c <- identGen
    v <- Gen.choose(-1000000, 1000000).map(_.toString)
  } yield Condition(cmp, c, v)

  private val queryGen: Gen[ZxQuery] = for {
    sels <- Gen.nonEmptyListOf(selectGen).map(_.take(4))
    conds <- Gen.listOf(condGen).map(_.take(4))
    gb <- Gen.listOf(identGen).map(_.take(3).distinct)
    ob <- Gen.listOf(for {
      s <- selectGen
      d <- Gen.oneOf(SortDir.Asc, SortDir.Desc)
      // p106: explicit nulls placement round-trips; None = engine default
      nf <- Gen.oneOf(None, Some(true), Some(false))
    } yield OrderBy(s, d, nf)).map(_.take(2))
    ts <- Gen.option(Gen.choose(0L, 2000000000L))
    te <- Gen.option(Gen.choose(0L, 2000000000L))
    g <- Gen.choose(1L, 86400L)
    lim <- Gen.option(Gen.choose(1, 10000))
    // p105: offset requires ORDER BY (parse-enforced)
    off <- if (ob.isEmpty) Gen.const(None) else Gen.option(Gen.choose(0, 10000))
    // HAVING conjuncts (AND-chains stay in the legacy vector — p110's
    // boolean trees only engage when OR/NOT is spelled); leaves must be
    // aggregate comparisons, so reuse the aggregate select generator
    hv <- Gen.listOf(for {
      s <- aggGen.suchThat(_ != Agg.Heatmap).flatMap(a =>
        identGen.map(c => Select(a, c)))
      cmp <- Gen.oneOf(Cmp.Eq, Cmp.Ne, Cmp.Gt, Cmp.Lt, Cmp.Gte, Cmp.Lte)
      v <- Gen.choose(0, 1000000)
    } yield Having(s, cmp, v.toString)).map(_.take(3))
    ex <- Gen.oneOf(true, false)
    // salt composes with aggregation but not with the exact gap walk
    salt <- if (ex) Gen.const(None) else Gen.option(Gen.choose(1, 4096))
    // render() always spells the granularity clause, and the parser
    // records an explicitly-spelled clause in granSet (round 13) — the
    // generated IR must say so for the round-trip to be exact
  } yield ZxQuery(sels, conds, gb, ob, ts, te, g, lim, offset = off,
    exact = ex, skewSalt = salt, granSet = true, having = hv)

  private def render(q: ZxQuery): String = {
    def sel(s: Select): String = s"${s.agg.name}(${s.column})"
    val opName: Cmp => String = {
      case Cmp.Eq => "="; case Cmp.Ne => "!="; case Cmp.Gt => ">"
      case Cmp.Lt => "<"; case Cmp.Gte => ">="; case Cmp.Lte => "<="
      case other => throw new IllegalArgumentException(other.toString)
    }
    val conds = q.conditions.map(c => s"${c.column} ${opName(c.cmp)} ${c.value}") ++
      q.tStart.map(t => s"$$t_start = $t") ++ q.tEnd.map(t => s"$$t_end = $t")
    Seq(
      Some(s"select ${q.selects.map(sel).mkString(", ")}"),
      if (conds.nonEmpty) Some(s"where ${conds.mkString(" and ")}") else None,
      if (q.groupBy.nonEmpty) Some(s"group by ${q.groupBy.mkString(", ")}") else None,
      if (q.having.nonEmpty) Some("having " + q.having.map(h =>
        s"${sel(h.select)} ${opName(h.cmp)} ${h.value}").mkString(" and ")) else None,
      if (q.orderBy.nonEmpty) Some("order by " + q.orderBy.map(o =>
        sel(o.select) + (if (o.dir == SortDir.Desc) " desc" else " asc") +
          (o.nullsFirst match {
            case Some(true)  => " nulls first"
            case Some(false) => " nulls last"
            case None        => ""
          })).mkString(", ")) else None,
      q.limit.map(n => s"limit $n"),
      q.offset.map(n => s"offset $n"),
      Some(s"granularity ${q.granularitySec}"),
      q.skewSalt.map(n => s"salt $n"),
      if (q.exact) Some("exact") else None
    ).flatten.mkString(" ")
  }

  property("render → parse round-trips the IR") = forAll(queryGen) { q =>
    ZxSql.parse(render(q)) == q
  }

  // the parser is a TOTAL function of its input: any token soup either
  // parses or raises the named ParseError — never a MatchError/NPE/
  // IndexOutOfBounds from walking off the token stream
  private val sqlTokenGen: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("select", "from", "where", "group", "by", "order",
      "limit", "granularity", "session", "slide", "salt", "exact",
      "having", "and", "or", "not", "like", "in", "between", "asof",
      "trailing", "join", "on", "sum", "count", "mean", "count_distinct",
      // round-13 surface: set ops, outer joins, index faces, distinct
      "distinct", "union", "all", "except", "intersect", "left", "right",
      "full", "using", "centroids", "probe", "knn", "mmr", "per", "carry",
      "at", "within", "agg",
      // round-14 surface: pagination, null placement, argmax/string
      // aggregates, quantiles, string surgery, calendar truncation
      "offset", "nulls", "first", "last", "max_by", "min_by",
      "string_agg", "percentile", "replace", "split_part", "lpad",
      "strpos", "sign", "mod", "date_trunc", "isodow", "second", "%",
      "'month'", "0.5",
      // round-14 third-session surface: filtered aggregation, boolean
      // quantifiers, moments, pivot, mode, regexp, ordinals
      "filter", "bool_and", "bool_or", "every", "any", "skewness",
      "kurtosis", "mode", "pivot", "regexp", "regexp_extract",
      "'[0-9]+'", "view",
      "(", ")", ",", "=", "!=", ">", "<", ">=", "<=", "*", "'a b'",
      "'%x%'", "$t_start", "$t_end"),
    3 -> identGen,
    1 -> Gen.choose(-100000, 100000).map(_.toString))

  property("parser is total: token soup parses or raises ParseError only") =
    forAll(Gen.listOf(sqlTokenGen).map(_.take(24))) { toks =>
      try { ZxSql.parse(toks.mkString(" ")); true }
      catch {
        case _: ZxSql.ParseError => true
        case _: Throwable => false
      }
    }

  // …and the COMPOUND front doors are total too: run/runCatalog route
  // through parseCompound (set operators), which must keep the same
  // contract — plan-build exceptions from compile steps are fine, but
  // never a parser MatchError/NPE/IndexOutOfBounds
  property("compound parser is total on token soup") =
    forAll(Gen.listOf(sqlTokenGen).map(_.take(24))) { toks =>
      try {
        ZxSql.runCatalog(Map.empty, toks.mkString(" "))
        true
      } catch {
        case _: ZxSql.ParseError => true
        case _: Throwable => false
      }
    }

  // '_' is the single-char SQL wildcard the parser rejects inside patterns
  private val wordGen: Gen[String] =
    Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString)

  property("LIKE patterns map to the matching comparator") =
    forAll(wordGen, Gen.oneOf(true, false)) { (w, neg) =>
      w.isEmpty || { // empty pattern degenerates to bare '%' — out of scope
      val not = if (neg) "not " else ""
      val contains = ZxSql.parse(s"select count(x) where c ${not}like '%$w%'").conditions.head
      val starts = ZxSql.parse(s"select count(x) where c ${not}like '$w%'").conditions.head
      contains.cmp == (if (neg) Cmp.NotContains else Cmp.Contains) &&
        starts.cmp == (if (neg) Cmp.NotStartsWith else Cmp.StartsWith) &&
        contains.value == w && starts.value == w
      }
    }
}

/** Boolean-condition-tree properties: the grammar round-trip and a full
  * semantic differential of [[graft.compile.Predicates.compileTree]]
  * against an independent three-valued-logic evaluator — covers every
  * OR/AND/NOT nesting × null-column × unparseable-literal combination far
  * beyond the hand-written SqlSpec cases. */
object ConditionTreeProps extends Properties("ConditionTree") {
  import graft.compile.Predicates
  import ConditionTree._

  private val leafGen: Gen[ConditionTree] = for {
    cmp <- Gen.oneOf(Cmp.Eq, Cmp.Ne, Cmp.Gt, Cmp.Lt, Cmp.Gte, Cmp.Lte,
      Cmp.Exists, Cmp.NotExists)
    c <- Gen.oneOf("x", "y")
    v <- Gen.oneOf("0", "1", "2", "3", "zz") // zz: the unparseable literal
    // Exists/NotExists take no value — the SQL surface has none to carry
  } yield Leaf(Condition(cmp, c,
    if (cmp == Cmp.Exists || cmp == Cmp.NotExists) "" else v))

  private def treeGen(depth: Int): Gen[ConditionTree] =
    if (depth == 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> Gen.listOfN(2, treeGen(depth - 1)).map(And(_)),
      2 -> Gen.listOfN(2, treeGen(depth - 1)).map(Or(_)),
      1 -> treeGen(depth - 1).map(Not(_)))

  private def render(t: ConditionTree): String = {
    def leaf(c: Condition): String = c.cmp match {
      case Cmp.Eq        => s"${c.column} = ${c.value}"
      case Cmp.Ne        => s"${c.column} != ${c.value}"
      case Cmp.Gt        => s"${c.column} > ${c.value}"
      case Cmp.Lt        => s"${c.column} < ${c.value}"
      case Cmp.Gte       => s"${c.column} >= ${c.value}"
      case Cmp.Lte       => s"${c.column} <= ${c.value}"
      case Cmp.Exists    => s"${c.column} exists"
      case Cmp.NotExists => s"${c.column} notexists"
      case other => throw new IllegalArgumentException(other.toString)
    }
    def sub(c: ConditionTree): String = c match {
      case Leaf(cd) => leaf(cd)
      case other    => s"(${render(other)})"
    }
    t match {
      case Leaf(c)  => leaf(c)
      case And(cs)  => cs.map(sub).mkString(" and ")
      case Or(cs)   => cs.map(sub).mkString(" or ")
      case Not(c)   => s"not ${sub(c)}"
    }
  }

  /** The parser's top-level conjunct split: flatten Ands, leaves → flat
    * condition list, anything else stays in the tree. */
  private def normalize(t: ConditionTree): (Seq[Condition], Option[ConditionTree]) = {
    def conj(t: ConditionTree): Seq[ConditionTree] = t match {
      case And(cs) => cs.flatMap(conj)
      case other   => Seq(other)
    }
    val (leaves, complex) = conj(t).partition(_.isInstanceOf[Leaf])
    (leaves.map { case Leaf(c) => c },
      complex match {
        case Seq()  => None
        case Seq(c) => Some(c)
        case cs     => Some(And(cs))
      })
  }

  property("render → parse round-trips the tree (modulo conjunct split)") =
    forAll(treeGen(3)) { t =>
      val q = ZxSql.parse(s"select count(x) where ${render(t)}")
      (q.conditions, q.where) == normalize(t)
    }

  // ---- semantic differential vs an independent Kleene evaluator ----

  private lazy val spark = SparkFixture.spark
  private lazy val rowsDomain: Seq[(Int, Option[Int], Option[Int])] = {
    val vals = None +: (0 to 3).map(Some(_))
    for ((x, i) <- vals.zipWithIndex; (y, j) <- vals.zipWithIndex)
      yield (i * 10 + j, x, y)
  }
  private lazy val df = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", IntegerType, nullable = false),
      StructField("x", IntegerType), StructField("y", IntegerType)))
    val rows = rowsDomain.map { case (id, x, y) =>
      org.apache.spark.sql.Row(id, x.map(Integer.valueOf).orNull,
        y.map(Integer.valueOf).orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  /** SQL three-valued logic, mirroring Predicates' documented semantics for
    * numeric columns: comparisons with NULL (missing column value, or an
    * unparseable numeric literal) are unknown; Eq against an unparseable
    * literal is false for every row; Ne against it matches present rows;
    * Exists/NotExists never return unknown. */
  private def evalLeaf(c: Condition, x: Option[Int], y: Option[Int]): Option[Boolean] = {
    val cv = if (c.column == "x") x else y
    val num = c.value.toDoubleOption
    c.cmp match {
      case Cmp.Exists    => Some(cv.isDefined)
      case Cmp.NotExists => Some(cv.isEmpty)
      case Cmp.Eq  => num.fold[Option[Boolean]](Some(false))(v => cv.map(_.toDouble == v))
      case Cmp.Ne  => num.fold[Option[Boolean]](Some(cv.isDefined))(v => cv.map(_.toDouble != v))
      case Cmp.Gt  => num.flatMap(v => cv.map(_.toDouble > v))
      case Cmp.Lt  => num.flatMap(v => cv.map(_.toDouble < v))
      case Cmp.Gte => num.flatMap(v => cv.map(_.toDouble >= v))
      case Cmp.Lte => num.flatMap(v => cv.map(_.toDouble <= v))
      case other => throw new IllegalArgumentException(other.toString)
    }
  }

  private def evalTree(t: ConditionTree, x: Option[Int], y: Option[Int]): Option[Boolean] =
    t match {
      case Leaf(c) => evalLeaf(c, x, y)
      case And(cs) =>
        val vs = cs.map(evalTree(_, x, y))
        if (vs.contains(Some(false))) Some(false)
        else if (vs.contains(None)) None else Some(true)
      case Or(cs) =>
        val vs = cs.map(evalTree(_, x, y))
        if (vs.contains(Some(true))) Some(true)
        else if (vs.contains(None)) None else Some(false)
      case Not(c) => evalTree(c, x, y).map(!_)
    }

  property("compileTree matches the Kleene evaluator on every null/literal combo") =
    forAll(treeGen(3)) { t =>
      val got = df.filter(Predicates.compileTree(t, df.schema))
        .select("id").collect().map(_.getInt(0)).toSet
      val want = rowsDomain.collect {
        case (id, x, y) if evalTree(t, x, y).contains(true) => id
      }.toSet
      got == want
    }
}

object StringBoundsProps extends Properties("TruncatedStringBounds") {
  import graft.sources.ZOrder.truncatedStringBounds

  private val asciiStr: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar)).map(_.mkString))

  // the ONLY property pruning needs: bounds are conservative — the pinned
  // lower never exceeds the true min, the pinned upper never undercuts the
  // true max — in the same string order Spark's row filter uses on ASCII
  property("bounds are conservative for any ASCII pair and any cut") =
    forAll(asciiStr, asciiStr, Gen.chooseNum(1, 8)) { (a, b, cut) =>
      val (mn, mx) = if (a <= b) (a, b) else (b, a)
      truncatedStringBounds(mn, mx, cut) match {
        case Some((lo, hi)) => lo <= mn && hi >= mx
        case None           => true // unrepresentable — file stays admitted
      }
    }

  property("short bounds pass through exactly; non-ASCII refuses to pin") =
    forAll(asciiStr, asciiStr) { (a, b) =>
      val (mn, mx) = if (a <= b) (a, b) else (b, a)
      val exact = truncatedStringBounds(mn, mx, 64)
      exact.contains((mn, mx)) &&
        truncatedStringBounds(mn + "\u00e9", mx + "\u00e9", 64).isEmpty
    }
}

/** Round-13 grammar equivalences: the engine's row-wise expression
  * compiler against an INDEPENDENT Scala interpreter, and two structural
  * invariants (semi/anti partition, running-vs-total windows). Small
  * case counts — every case runs a Spark job. */
object GrammarEquivProps extends Properties("ZxSqlGrammar") {
  import MeasureExpr._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(25)

  private lazy val spark = SparkFixture.spark

  private lazy val exprDf = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", DoubleType, nullable = false),
      StructField("w", DoubleType, nullable = false)))
    val rows = (0 until 12).map { i =>
      org.apache.spark.sql.Row(i, (i - 6) * 1.5, (i % 4).toDouble)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  // expressions over v/w with non-negative literals and the always-total
  // functions (abs/floor/ceil/round2) — sqrt/ln diverge from the plain
  // Scala interpreter only on domain errors, which is Spark-vs-Java
  // semantics, not grammar semantics; keep the differential total
  private def exprGen(depth: Int): Gen[MeasureExpr] =
    if (depth == 0) Gen.oneOf(Gen.const(Col("v")), Gen.const(Col("w")),
      Gen.choose(0, 20).map(n => Lit(n / 2.0)))
    else Gen.frequency(
      2 -> exprGen(0),
      3 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/")
        l <- exprGen(depth - 1); r <- exprGen(depth - 1)
      } yield Bin(op, l, r)),
      1 -> exprGen(depth - 1).map(Neg(_)),
      2 -> (for {
        f <- Gen.oneOf("abs", "floor", "ceil")
        a <- exprGen(depth - 1)
      } yield Func(f, Seq(a))),
      1 -> exprGen(depth - 1).map(a => Func("round", Seq(a, Lit(2)))))

  private def rend(e: MeasureExpr): String = e match {
    case Col(n)        => n
    case Lit(x)        => x.toString
    case Bin(op, l, r) => s"(${rend(l)} $op ${rend(r)})"
    case Neg(x)        => s"(- ${rend(x)})"
    case Func("round", Seq(a, Lit(d))) => s"round(${rend(a)}, ${d.toInt})"
    case Func(f, as)   => s"$f(${as.map(rend).mkString(", ")})"
    case other         => throw new IllegalArgumentException(other.toString)
  }

  /** The independent interpreter: IEEE doubles, None on zero divisor
    * (try_divide), HALF_UP rounding through Double.toString — the same
    * contracts the scaladoc promises. */
  private def ev(e: MeasureExpr, v: Double, w: Double): Option[Double] = e match {
    case Col("v") => Some(v)
    case Col("w") => Some(w)
    case Lit(x)   => Some(x)
    case Neg(x)   => ev(x, v, w).map(d => -d)
    case Bin("/", l, r) =>
      for (a <- ev(l, v, w); b <- ev(r, v, w); q <- if (b == 0.0) None else Some(a / b)) yield q
    case Bin(op, l, r) =>
      for (a <- ev(l, v, w); b <- ev(r, v, w)) yield op match {
        case "+" => a + b; case "-" => a - b; case "*" => a * b
      }
    case Func("abs", Seq(a))   => ev(a, v, w).map(math.abs)
    case Func("floor", Seq(a)) => ev(a, v, w).map(math.floor)
    case Func("ceil", Seq(a))  => ev(a, v, w).map(math.ceil)
    case Func("round", Seq(a, Lit(d))) => ev(a, v, w).map(x =>
      BigDecimal(x.toString).setScale(d.toInt, BigDecimal.RoundingMode.HALF_UP).toDouble)
    case other => throw new IllegalArgumentException(other.toString)
  }

  // the driver's compare semantics: NaN ≡ NaN, and ±0.0 are equal (the
  // engine's floor/ceil round-trip through LONG drops a negative zero's
  // sign — invisible to the oracle, so invisible here)
  private def sameVal(a: Option[Double], b: Option[Double]): Boolean = (a, b) match {
    case (None, None)       => true
    case (Some(x), Some(y)) => x == y || (x.isNaN && y.isNaN)
    case _                  => false
  }

  property("expression projections match the independent interpreter") =
    forAll(exprGen(3)) { e0 =>
      // the select list needs at least one column read and a non-trivial
      // expression (a bare column keeps its name, no alias)
      val e = e0 match {
        case c if MeasureExpr.columns(c).isEmpty => Bin("+", c, Col("v"))
        case c: Col                              => Bin("*", c, Lit(1.0))
        case c                                   => c
      }
      val got = ZxSql.run(exprDf, s"select id, ${rend(e)} as x order by id")
        .collect().map(r => r.getInt(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val want = exprDf.select("id", "v", "w").collect().map(r =>
        r.getInt(0) -> ev(e, r.getDouble(1), r.getDouble(2))).toMap
      got.keySet == want.keySet && got.keys.forall(k => sameVal(got(k), want(k)))
    }

  private lazy val fjLeft = {
    import spark.implicits._
    Seq((0, "a", "x"), (1, "a", "y"), (2, "b", "x"), (3, "b", "y"),
      (4, null.asInstanceOf[String], "x"), (5, "c", "z")).toSeq
      .toDF("id", "k1", "k2")
  }

  property("semi and anti joins PARTITION the left frame, any key set") =
    forAll(Gen.listOf(Gen.zip(Gen.oneOf("a", "b", "c", null), Gen.oneOf("x", "y", "z")))) { pairs =>
      import spark.implicits._
      val right = (pairs :+ (("seed", "seed"))).toDF("r1", "r2") // never empty
      val tabs = Map("keys" -> right)
      def ids(anti: String): Set[Int] =
        ZxSql.run(fjLeft, s"select id from facts $anti join keys on k1 = r1 and k2 = r2",
          tables = tabs).collect().map(_.getInt(0)).toSet
      val (semi, anti) = (ids("semi"), ids("anti"))
      semi.intersect(anti).isEmpty && (semi ++ anti) == (0 to 5).toSet &&
        (!anti.isEmpty || pairs.nonEmpty) && anti.contains(4) // null never matches
    }

  property("running window sum reaches the partition total at the last row") =
    forAll(Gen.listOfN(12, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(-9, 9)))) { kvs =>
      import spark.implicits._
      val df = kvs.zipWithIndex.map { case ((k, x), i) => (i.toLong, k, x.toDouble) }
        .toDF("id", "k", "x")
      val out = ZxSql.run(df,
        "select id, k, sum(x) over (partition by k order by id) as running, " +
          "sum(x) over (partition by k) as total order by id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      // whole-valued doubles: addition exact, any order
      val lastPerK = out.groupBy(_._2).values.map(_.maxBy(_._1))
      kvs.isEmpty || lastPerK.forall(r => r._3 == r._4)
    }

  property("explode matches an independent split on random strings/seps") =
    forAll(
      Gen.listOfN(8, Gen.listOf(Gen.oneOf("a", "bb", "", "c d", ","))
        .map(_.mkString("|"))),
      Gen.oneOf("|", ",", ".", " ")) { (texts, sep) =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "tag")
      val got = ZxSql.run(df, s"select id, explode(tag, '$sep') as t order by id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      // the documented contract: LITERAL separator split keeping ALL
      // empty elements (string_split parity) — independent reference
      // implementation via a manual scan, no regex anywhere
      def refSplit(s: String): Seq[String] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var cur = new StringBuilder; var i = 0
        while (i < s.length) {
          if (s.startsWith(sep, i)) { out += cur.result(); cur = new StringBuilder; i += sep.length }
          else { cur += s(i); i += 1 }
        }
        out += cur.result(); out.toSeq
      }
      val want = texts.zipWithIndex.flatMap { case (t, i) =>
        refSplit(t).map(e => (i.toLong, e)) }
      got == want
    }

  property("per-group exact sample is partitioning-invariant and nested") =
    forAll(Gen.choose(1, 6), Gen.choose(1, 7)) { (n, parts) =>
      import spark.implicits._
      val docs = (1L to 30L).map(i => (i, s"t$i", if (i % 3 == 0) "a" else "b"))
        .toDF("doc_id", "text", "source")
      def cut(d: org.apache.spark.sql.DataFrame, k: Int): Set[Long] =
        ZxSql.run(d, s"select sample exact $k per source")
          .collect().map(_.getLong(0)).toSet
      val base = cut(docs, n)
      base == cut(docs.repartition(parts), n) && base.subsetOf(cut(docs, n + 1))
    }
}
