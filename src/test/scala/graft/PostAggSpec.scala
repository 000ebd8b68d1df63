package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.ir._
import graft.sql.ZxSql
import graft.compile.Compiler

/** CASE-WHEN conditional measures and post-aggregate expressions
  * (`sum(a)/sum(b) as r`) — the two layers that let TPC-H q12/q14-style
  * queries run at the SQL front door. Golden values hand-computed from
  * the canonical 10-row fixture (fixtures/test.cmd). */
class PostAggSpec extends AnyFunSuite {
  import SparkFixture._

  // ------------------------------------------------------------- parsing

  test("post-aggregate expressions parse; component calls dedupe to one internal alias") {
    val q = ZxSql.parse("select sum(foo) / count(*) as a, sum(foo) * 2 as b group by y")
    assert(q.selects.isEmpty && q.postSelects.map(_.alias) == Seq("a", "b"))
    // sum(foo) appears in both expressions but is ONE component
    val comps = q.postSelects.flatMap(_.components).distinct
    assert(comps.size == 2)
    assert(comps.forall(_.alias.exists(_.startsWith("__pa"))))
    // plain selects and posts coexist
    val q2 = ZxSql.parse("select count(*) as n, 100 * sum(foo) / count(*) as pct group by y")
    assert(q2.selects == Seq(Select(Agg.Count, "*", alias = Some("n"))))
    assert(q2.postSelects.size == 1)
  }

  test("case-when parses inside measures, with like/in/between and boolean grouping") {
    val q = ZxSql.parse(
      "select sum(case when tag like '%t1%' and x > 2 then foo else 0 end) as s")
    assert(q.selects.head.expr.exists(_.isInstanceOf[MeasureExpr.Case]))
    val q2 = ZxSql.parse(
      "select sum(case when y in (1, 9) then 1 when x between 2 and 4 then 2 else 0 end) as s")
    val MeasureExpr.Case(branches, orElse) = q2.selects.head.expr.get: @unchecked
    assert(branches.size == 2 && orElse.nonEmpty)
  }

  test("grammar guards fail loudly") {
    // post expressions need `as`
    assertThrows[ZxSql.ParseError](ZxSql.parse("select sum(foo) / count(*) group by y"))
    // raw columns cannot ride post-aggregate arithmetic
    assertThrows[ZxSql.ParseError](ZxSql.parse("select sum(foo) * x as a group by y"))
    // literal-only expression has nothing to aggregate
    assertThrows[ZxSql.ParseError](ZxSql.parse("select 1 + 2 as a group by y"))
    // heatmap is not a scalar aggregate
    assertThrows[ZxSql.ParseError](ZxSql.parse("select heatmap(foo) / 2 as a"))
    // duplicate output name / shadowing a select key
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select sum(foo)/2 as a, count(*)/2 as a group by y"))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select sum(foo) as a, count(*)/2 as a group by y"))
    // engine-internal prefix
    assertThrows[ZxSql.ParseError](ZxSql.parse("select sum(foo)/2 as __pa0 group by y"))
    // bare columns do not mix with posts (dimensions go in group by)
    assertThrows[ZxSql.ParseError](ZxSql.parse("select y, sum(foo)/2 as a"))
    // exact gap windows reject posts
    assertThrows[ZxSql.ParseError](ZxSql.parse("select sum(foo)/2 as a group by y exact"))
    // asof joins select bare left columns only
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select k, t, sum(v)/2 as a asof join d on k = dk at t >= dt carry p"))
    // case needs at least one when; $t pseudo-columns refuse inside case
    assertThrows[ZxSql.ParseError](ZxSql.parse("select sum(case else 1 end) as s"))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select sum(case when $t_start = 1 then 1 end) as s"))
  }

  // ------------------------------------------------------- case semantics

  test("sum(case when x > 4 then foo else 0 end): branch picks rows 1,6,7,8,9") {
    val got = ZxSql.run(fixture,
      "select sum(case when x > 4 then foo else 0 end) as s_hi granularity 15")
      .collect().head.getAs[Double]("s_hi")
    assert(got == 3100.0) // 100+600+700+800+900
  }

  test("case without else: fall-through is NULL — sum unchanged, mean excludes") {
    val s = ZxSql.run(fixture,
      "select sum(case when x > 4 then foo end) as s granularity 15")
      .collect().head.getAs[Double]("s")
    assert(s == 3100.0)
    val m = ZxSql.run(fixture,
      "select mean(case when x > 4 then foo end) as m granularity 15")
      .collect().head.getAs[Double]("m")
    assert(m == 620.0) // 3100 / 5 matched rows, not / 10
  }

  test("case rides WHERE expression predicates too") {
    val n = ZxSql.run(fixture,
      "select count(*) where case when y = 1 then 1 else 0 end > 0 granularity 15")
      .collect().head.getAs[Double]("count_star")
    assert(n == 1.0) // only row 1 has y = 1
  }

  // ----------------------------------------------- post-agg semantics

  private def byY(sql: String, out: String): Map[String, Double] =
    ZxSql.run(fixture, sql).collect()
      .map(r => r.getString(0) -> r.getAs[Double](out)).toMap

  test("ratio of aggregates per group (tumbling path)") {
    val got = byY("select 100 * sum(foo) / count(*) as pct group by y granularity 15", "pct")
    assert(got("1") == 10000.0)           // 100*100/1
    assert(got("9") == 70000.0)           // 100*1400/2
    assert(math.abs(got(Compiler.NilSentinel) - 100.0 * 4000 / 7) < 1e-9)
  }

  test("posts coexist with plain selects; salted two-phase plan agrees") {
    val plain = byY("select count(*) as n, sum(foo) / count(*) as avg_foo " +
      "group by y granularity 15", "avg_foo")
    val salted = byY("select count(*) as n, sum(foo) / count(*) as avg_foo " +
      "group by y granularity 15 salt 4", "avg_foo")
    assert(plain == salted)
    assert(plain("9") == 700.0)
  }

  test("having and order by bind a post alias") {
    val kept = byY("select count(*) as n, sum(foo)/count(*) as avg_foo " +
      "group by y having avg_foo > 200 granularity 15", "avg_foo")
    assert(kept.keySet == Set("9", Compiler.NilSentinel))
    val ordered = ZxSql.run(fixture,
      "select sum(foo) as s, sum(foo)/count(*) as avg_foo group by y order by avg_foo desc")
      .collect().map(_.getString(0)).toSeq
    assert(ordered == Seq("9", Compiler.NilSentinel, "1"))
  }

  test("division by zero yields null, not an error (both layers)") {
    val r = ZxSql.run(fixture,
      "select sum(case when x > 99 then foo else 0 end) / " +
        "sum(case when x > 99 then 1 else 0 end) as bad granularity 15")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("bad")))
  }

  test("posts ride session and hopping windows") {
    val s = ZxSql.run(fixture,
      "select sum(foo)/count(*) as r session 20").collect()
    assert(s.length == 1 && s.head.getAs[Double]("r") == 550.0) // one session, mean of 100..1000
    val h = ZxSql.run(fixture,
      "select sum(foo)/count(*) as r granularity 10 slide 5").collect()
    assert(h.nonEmpty && h.forall(r => !r.isNullAt(r.fieldIndex("r"))))
  }

  test("equi-join global roll-up (no group by) now runs — the q14 shape") {
    import spark.implicits._
    val fact = Seq((1L, 10L, 5.0), (2L, 20L, 7.0), (3L, 10L, 2.0))
      .toDF("fid", "k1", "qty")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_seconds(col("fid")))
    val dim = Seq((10L, "PROMO x"), (20L, "plain y")).toDF("k1r", "ptype")
    val got = ZxSql.run(fact,
      "select 100 * sum(case when ptype like 'PROMO%' then qty else 0 end) " +
        "/ sum(qty) as promo_pct join d on k1 = k1r",
      tables = Map("d" -> dim)).collect()
    assert(got.length == 1)
    assert(math.abs(got.head.getAs[Double]("promo_pct") - 100.0 * 7 / 14) < 1e-9)
  }

  test("limit per: top-k per partition on aggregate and raw paths; guards fail loudly") {
    // aggregate path: top-1 y-group per window? simpler — top-1 user per y
    val agg = ZxSql.run(fixture,
      "select sum(foo) as s group by y, x order by s desc limit 1 per y")
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Double]("s"))).toSet
    // per y: best x by sum — y=1: only row 1 (x=7, 100); y=9: rows 4 (x=2,400),
    // 10 (x=0,1000) → x=0 wins; __nil: max foo row 9 (x=8, 900)
    assert(agg == Set(("1", "7", 100.0), ("9", "0", 1000.0),
      (Compiler.NilSentinel, "8", 900.0)))
    // raw path: top-2 rows per y by foo desc (id tiebreak via foo uniqueness)
    val raw = ZxSql.run(fixture,
      "select id, y, foo order by foo desc limit 2 per y")
      .collect().map(_.getLong(0)).toSet
    // y=1: {1}; y=9: {10, 4}; __nil: foo desc → rows 9, 8
    assert(raw == Set(1L, 10L, 4L, 9L, 8L))
    // guards: needs order by; per-col must be a group key / selected col;
    // no rollup; no seq ops
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select sum(foo) as s group by y limit 2 per y"))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select sum(foo) as s group by y order by s desc limit 2 per x"))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select id, foo order by foo desc limit 2 per y"))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select sum(foo) as s group by rollup y, x order by s desc limit 1 per y"))
  }

  test("membership subqueries: in/not-in (select …) compile to semi/anti joins") {
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_seconds
    val fact = Seq((1L, 10L, 5.0), (2L, 20L, 7.0), (3L, 30L, 2.0), (4L, 10L, 4.0))
      .toDF("fid", "k", "qty")
      .withColumn("ts", timestamp_seconds(col("fid")))
    val dim = Seq((10L, "x"), (20L, "y"), (30L, "x")).toDF("dk", "tag")
    val cat = Map("d" -> dim, "f" -> fact)
    // plain semi: keys whose dim tag = x → {10, 30} → fids {1,3,4}
    val semi = ZxSql.run(fact,
      "select fid, k where k in (select dk from d where tag = 'x')",
      tables = cat).collect().map(_.getLong(0)).toSet
    assert(semi == Set(1L, 3L, 4L))
    // anti: fids whose k NOT in the x-set → {2}
    val anti = ZxSql.run(fact,
      "select fid, k where k not in (select dk from d where tag = 'x')",
      tables = cat).collect().map(_.getLong(0)).toSet
    assert(anti == Set(2L))
    // grouped+having subquery (the q18 shape): k with sum(qty) > 5 → {10(9.0), 20(7.0)}
    val hot = ZxSql.run(fact,
      "select count(*) as n where k in (select k from f group by k " +
        "having sum(qty) > 5) group by k order by n desc",
      tables = cat).collect().map(r => (r.getString(0), r.getAs[Double]("n"))).toMap
    assert(hot == Map("10" -> 2.0, "20" -> 1.0))
    // subqueries compose with other WHERE conjuncts (pushdown intact)
    val mixed = ZxSql.run(fact,
      "select fid, k, qty where qty > 3 and k in (select dk from d where tag = 'x')",
      tables = cat).collect().map(_.getLong(0)).toSet
    assert(mixed == Set(1L, 4L))
    // guards
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select fid where k in (select dk from d) or qty > 3")) // not top-level AND
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select sum(case when k in (select dk from d) then 1 end) as s")) // not in case
    assertThrows[ZxSql.ParseError](ZxSql.run(fact,
      "select fid where k in (select dk, tag from d)", tables = cat)) // one column
    assertThrows[ZxSql.ParseError](ZxSql.run(fact,
      "select fid where k in (select dk)", tables = cat)) // from required
    assertThrows[ZxSql.ParseError](ZxSql.run(fact,
      "select fid where k in (select sum(dk) from d)", tables = cat)) // bare column
    assertThrows[ZxSql.ParseError](ZxSql.run(fact,
      "select fid where k in (select dk from d order by dk)", tables = cat))
    assertThrows[ZxSql.ParseError](ZxSql.run(fact,
      "select fid where k in (select dk from d where dk in (select k from f))",
      tables = cat)) // no nesting
    // streaming rejects (membership set is a bounded-table construct)
    val sdir = java.nio.file.Files.createTempDirectory("graft-sq-st").toString
    fact.write.mode("overwrite").parquet(sdir)
    val st = spark.readStream.schema(fact.schema).parquet(sdir)
    val e = intercept[ZxSql.ParseError](ZxSql.runStream(st,
      "select count(*) where k in (select dk from d) group by k granularity 10",
      tables = cat))
    assert(e.getMessage.contains("foreachBatch"))
  }

  test("derived tables: from (select …) runs two-level aggregation; guards fail loudly") {
    // inner per-y sums: y=1 → 100, y=9 → 1400, __nil → 4000
    val inner = "select sum(foo) as s group by y order by s"
    // outer global aggregate — no ORDER BY needed: derived outers always
    // take the sorted (non-windowed) path, never granularity buckets
    val g = ZxSql.run(fixture, s"select mean(s) as m, max(s) as mx, count(*) as n from ($inner)")
      .collect().head
    assert(math.abs(g.getAs[Double]("m") - 5500.0 / 3) < 1e-9)
    assert(g.getAs[Double]("mx") == 4000.0 && g.getAs[Double]("n") == 3.0)
    // outer WHERE gates inner rows (HAVING at the front door)
    val w = ZxSql.run(fixture, s"select count(*) as n from ($inner) where s > 150")
      .collect().head.getAs[Double]("n")
    assert(w == 2.0)
    // outer raw projection over the derived frame
    val raw = ZxSql.run(fixture, s"select s from ($inner) order by s desc limit 2")
      .collect().map(_.getAs[Double]("s")).toSeq
    assert(raw == Seq(4000.0, 1400.0))
    // the q13 custdist shape: histogram of a grouped count — outer groups
    // BY the inner measure; per-y counts are 1/2/7, each bucket size 1
    val hist = ZxSql.run(fixture,
      "select count(*) as k from (select count(*) as n group by y order by n) " +
        "group by n order by k desc, n desc")
      .collect().map(r => (r.getString(0), r.getAs[Double]("k"))).toSeq
    assert(hist == Seq(("7.0", 1.0), ("2.0", 1.0), ("1.0", 1.0)))
    // ADVICE r12 medium: the SAME shape WITHOUT the inner ORDER BY must
    // route identically (per-key totals, the sorted path) — an aggregate
    // inner with no order/window clause must never silently fall into the
    // default 300 s tumbling buckets and hand the outer per-(key, window)
    // rows
    val hist2 = ZxSql.run(fixture,
      "select count(*) as k from (select count(*) as n group by y) " +
        "group by n order by k desc, n desc")
      .collect().map(r => (r.getString(0), r.getAs[Double]("k"))).toSeq
    assert(hist2 == hist)
    // …while an EXPLICIT granularity still opts the inner into windows
    // (more window-rows than the 3 per-key totals)
    val nWin = ZxSql.run(fixture,
      "select count(*) as k from (select count(*) as n group by y granularity 2)")
      .collect().head.getAs[Double]("k")
    assert(nWin > 3.0)
    // runCatalog resolves the INNERMOST from
    val cat = ZxSql.runCatalog(Map("t" -> fixture),
      "select max(s) as mx from (select sum(foo) as s from t group by y order by s)")
      .collect().head.getAs[Double]("mx")
    assert(cat == 4000.0)
    // guards: time/window/join/sequence constructs belong on the inner query
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      s"select max(s) as mx from ($inner) where $$t_start = 0"))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      s"select max(s) as mx from ($inner) granularity 60"))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      s"select max(s) as mx from ($inner) session 60"))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      s"select max(s) as mx group by s from ($inner) exact"))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      s"select journeys(3) top 5 from ($inner)"))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      s"select max(s) as mx from ($inner) join d on a = b group by s"))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      s"select heatmap(s) from ($inner)"))
    // streaming rejects the bounded two-level construct
    val sdir2 = java.nio.file.Files.createTempDirectory("graft-der-st").toString
    fixture.write.mode("overwrite").parquet(sdir2)
    val st2 = spark.readStream.schema(fixture.schema).parquet(sdir2)
    val e2 = intercept[ZxSql.ParseError](ZxSql.runStream(st2,
      s"select max(s) as mx from ($inner)"))
    assert(e2.getMessage.contains("foreachBatch"))
  }

  test("derived join sides: join (select …) builds per-key thresholds; guards fail loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_seconds
    val fact = Seq((1L, 10L, 5.0), (2L, 10L, 1.0), (3L, 20L, 4.0), (4L, 20L, 8.0))
      .toDF("fid", "k", "qty")
      .withColumn("ts", timestamp_seconds(col("fid")))
    val cat = Map("f" -> fact)
    // the q17 correlated-threshold shape: rows above their own key's mean
    // — k=10 avg 3 → fid 1; k=20 avg 6 → fid 4 (note the SELF-join: the
    // subquery key equals the fact key by name, no ambiguity; column-vs-
    // column comparison spells as the expression predicate `a - b > 0`,
    // since a bare right identifier is a literal by reference semantics)
    val got = ZxSql.run(fact,
      "select count(*) as n, sum(qty) as s " +
        "join (select mean(qty) as avg_q from f group by k) on k = k " +
        "where qty - avg_q > 0 group by k order by s desc",
      tables = cat).collect()
      .map(r => (r.getString(0), r.getAs[Double]("n"), r.getAs[Double]("s"))).toSeq
    assert(got == Seq(("20", 1.0, 8.0), ("10", 1.0, 5.0)))
    // subquery HAVING prunes keys before the join (k=10 only)
    val hv = ZxSql.run(fact,
      "select count(*) as n " +
        "join (select mean(qty) as avg_q from f group by k having count(*) > 1) on k = k " +
        "group by k order by n desc", tables = cat)
      .collect().map(_.getString(0)).toSet
    assert(hv == Set("10", "20")) // both keys have 2 rows
    // guards
    assertThrows[ZxSql.ParseError](ZxSql.run(fact, // bare column select
      "select count(*) as n join (select k from f group by k) on k = k group by k order by n",
      tables = cat))
    assertThrows[ZxSql.ParseError](ZxSql.run(fact, // group key must be ON key
      "select count(*) as n join (select mean(qty) as a from f group by fid) on k = k group by k order by n",
      tables = cat))
    assertThrows[ZxSql.ParseError](ZxSql.run(fact, // no order by in sub
      "select count(*) as n join (select mean(qty) as a from f group by k order by a) on k = k group by k order by n",
      tables = cat))
    assertThrows[ZxSql.ParseError](ZxSql.run(fact, // alias collides with fact column
      "select count(*) as n join (select mean(qty) as qty from f group by k) on k = k group by k order by n",
      tables = cat))
    assertThrows[ZxSql.ParseError](ZxSql.run(fact, // unknown table
      "select count(*) as n join (select mean(qty) as a from zzz group by k) on k = k group by k order by n",
      tables = cat))
    // streaming: derived join side + window clause constructs (computed
    // once from the static table); without `from` it fails loudly
    val sdir3 = java.nio.file.Files.createTempDirectory("graft-dj-st").toString
    fact.write.mode("overwrite").parquet(sdir3)
    val st3 = spark.readStream.schema(fact.schema).parquet(sdir3)
    val sdf3 = ZxSql.runStream(st3,
      "select count(*) as n join (select mean(qty) as avg_q from f group by k) " +
        "on k = k group by k granularity 10 slide 10", tables = cat)
    assert(sdf3.isStreaming)
    assertThrows[ZxSql.ParseError](ZxSql.runStream(st3,
      "select count(*) as n join (select mean(qty) as avg_q group by k) " +
        "on k = k group by k granularity 10 slide 10", tables = cat))
  }

  test("scalar subqueries resolve to literal thresholds; compose anywhere; guards fail loudly") {
    val cat = Map("t" -> fixture)
    // mean(foo) over the fixture = 550 — the inlined threshold keeps rows 6-10
    val above = ZxSql.run(fixture,
      "select id, foo where foo > (select mean(foo) from t)", tables = cat)
      .collect().map(_.getLong(0)).toSet
    assert(above == Set(6L, 7L, 8L, 9L, 10L))
    // once resolved it IS a row predicate — legal under OR (unlike `in (select)`)
    val orMix = ZxSql.run(fixture,
      "select id where foo > (select mean(foo) from t) or y = 1", tables = cat)
      .collect().map(_.getLong(0)).toSet
    assert(orMix == Set(1L, 6L, 7L, 8L, 9L, 10L))
    // the subquery scans/filters its own table: max(foo) where y = 9 → 1000
    val eqMax = ZxSql.run(fixture,
      "select id where foo >= (select max(foo) from t where y = 9)", tables = cat)
      .collect().map(_.getLong(0)).toSet
    assert(eqMax == Set(10L))
    // scalars nest inside membership subqueries (resolved innermost-first)
    val nested = ZxSql.run(fixture,
      "select id where x in (select x from t where foo > (select mean(foo) from t))",
      tables = cat).collect().map(_.getLong(0)).toSet
    assert(nested == Set(6L, 7L, 8L, 9L, 10L))
    // guards: NULL scalar (empty input) fails loudly; shape must be one
    // scalar aggregate; grouped results are not scalars; $t_start takes
    // literals; unknown table names the catalog
    // (sum/count over empty input coalesce to 0 by reference convention —
    // max/min/mean are the aggregates that can produce a NULL scalar)
    assertThrows[ZxSql.ParseError](ZxSql.run(fixture,
      "select id where foo > (select max(foo) from t where foo > 99999)", tables = cat))
    assertThrows[ZxSql.ParseError](ZxSql.run(fixture,
      "select id where foo > (select foo from t)", tables = cat))
    assertThrows[ZxSql.ParseError](ZxSql.run(fixture,
      "select id where foo > (select sum(foo) from t group by y)", tables = cat))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select id where $t_start = (select min(foo) from t)"))
    assertThrows[ZxSql.ParseError](ZxSql.run(fixture,
      "select id where foo > (select mean(foo) from missing)", tables = cat))
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select sum(case when foo > (select mean(foo) from t) then 1 end) as s"))
    // STREAMS accept scalar subqueries — the threshold resolves once
    // against the static table at stream construction
    val sdir = java.nio.file.Files.createTempDirectory("graft-ssq-st").toString
    fixture.write.mode("overwrite").parquet(sdir)
    val st = spark.readStream.schema(fixture.schema).parquet(sdir)
    val sdf = ZxSql.runStream(st,
      "select count(*) as n where foo > (select mean(foo) from t) granularity 10",
      tables = cat)
    assert(sdf.isStreaming)
    // …and a NULL scalar still fails loudly at construction
    assertThrows[ZxSql.ParseError](ZxSql.runStream(st,
      "select count(*) as n where foo > (select max(foo) from t where foo > 99999) granularity 10",
      tables = cat))
  }

  test("windowed equi-joins: slide/session compose with joins on batch and stream") {
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_seconds
    val fact = Seq((1L, 10L, 5.0), (12L, 10L, 7.0), (2L, 20L, 2.0), (25L, 20L, 4.0))
      .toDF("sec", "k1", "qty")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val dim = Seq((10L, "A"), (20L, "B")).toDF("k1r", "seg")
    val sql = "select sum(qty) as s join d on k1 = k1r group by seg granularity 10 slide 10"
    val got = ZxSql.run(fact, sql, tables = Map("d" -> dim))
      .collect().map(r => (r.getString(0), r.getAs[Long]("w_start"), r.getAs[Double]("s"))).toSet
    assert(got == Set(("A", 0L, 5.0), ("A", 10L, 7.0), ("B", 0L, 2.0), ("B", 20L, 4.0)))
    // session over the joined frame: A's events at 1,12 gap 11 < 15 → one session
    val sess = ZxSql.run(fact,
      "select sum(qty) as s join d on k1 = k1r group by seg session 15",
      tables = Map("d" -> dim))
      .collect().map(r => (r.getString(0), r.getAs[Double]("s"))).toSet
    assert(sess == Set(("A", 12.0), ("B", 2.0), ("B", 4.0)))
    // exact still refuses joins; streaming rejects a STREAM as the dim side
    assertThrows[ZxSql.ParseError](ZxSql.parse(
      "select sum(qty) join d on k1 = k1r group by seg exact"))
    val sdir = java.nio.file.Files.createTempDirectory("graft-enrich-st").toString
    fact.write.mode("overwrite").parquet(sdir)
    val st = spark.readStream.schema(fact.schema).parquet(sdir)
    val e = intercept[ZxSql.ParseError](ZxSql.runStream(st, sql,
      tables = Map("d" -> st)))
    assert(e.getMessage.contains("STATIC dimension"))
    // the streaming windowed join itself computes batch-identically
    val out = ZxSql.runStream(st, sql, watermark = "0 seconds",
      tables = Map("d" -> dim))
    val query = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .collect().map(r => (r.getString(0), r.getAs[Long]("w_start"), r.getAs[Double]("s"))).toSet
      assert(streamed == got)
    } finally query.stop()
  }

  test("streaming windowed agg computes posts identically to batch") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-postagg").toString
    fixture.coalesce(1).write.mode("overwrite").parquet(dir)
    val sql = "select sum(foo) as s, sum(foo)/count(*) as avg_foo group by y granularity 15"
    val stream = spark.readStream.schema(fixture.schema).parquet(dir)
    val out = ZxSql.runStream(stream, sql, watermark = "0 seconds")
    val query = out.writeStream.format("memory").queryName("post_out")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("post_out")
        .select("y", "w_start", "s", "avg_foo")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      val batch = ZxSql.run(fixture, sql)
        .select("y", "w_start", "s", "avg_foo")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally query.stop()
  }
}
