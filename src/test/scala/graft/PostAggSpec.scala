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
