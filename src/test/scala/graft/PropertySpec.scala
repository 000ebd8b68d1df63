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
    Agg.Count, Agg.CountDistinct, Agg.Mean, Agg.P50,
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
    ob <- Gen.listOf(Gen.zip(selectGen, Gen.oneOf(SortDir.Asc, SortDir.Desc))
      .map { case (s, d) => OrderBy(s, d) }).map(_.take(2))
    ts <- Gen.option(Gen.choose(0L, 2000000000L))
    te <- Gen.option(Gen.choose(0L, 2000000000L))
    g <- Gen.choose(1L, 86400L)
    lim <- Gen.option(Gen.choose(1, 10000))
    ex <- Gen.oneOf(true, false)
  } yield ZxQuery(sels, conds, gb, ob, ts, te, g, lim, exact = ex)

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
      if (q.orderBy.nonEmpty) Some("order by " + q.orderBy.map(o =>
        sel(o.select) + (if (o.dir == SortDir.Desc) " desc" else " asc")).mkString(", ")) else None,
      q.limit.map(n => s"limit $n"),
      Some(s"granularity ${q.granularitySec}"),
      if (q.exact) Some("exact") else None
    ).flatten.mkString(" ")
  }

  property("render → parse round-trips the IR") = forAll(queryGen) { q =>
    ZxSql.parse(render(q)) == q
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
