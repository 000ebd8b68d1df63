package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** As-of join semantics on hand-built fixtures: ≤ matching, per-key
  * isolation, null before the first version, same-row payload consistency,
  * and the deterministic version dedup. */
class AsofSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private def right() = Seq(
    // key, time, version payload (v, tag)
    (1L, 10L, 100L, "a"),
    (1L, 20L, 200L, "b"),
    (2L, 15L, 300L, "c")
  ).toDF("k", "t", "v", "tag")

  private def asofAll() = {
    val left = Seq((1L, 5L), (1L, 10L), (1L, 19L), (1L, 20L), (1L, 99L),
      (2L, 14L), (2L, 16L), (3L, 50L)).toDF("k", "t")
      .withColumn("eid", col("k") * 1000 + col("t"))
    AsofJoin.asof(left, right(), "k", "k", "t", "t", Seq("v", "tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4))))
      .toMap
  }

  test("asof picks the most recent right row at or before each left time") {
    val got = asofAll()
    assert(got((1L, 5L)) == (None, None), "no version precedes t=5")
    assert(got((1L, 10L)) == (Some(100L), Some("a")), "equal time matches (≤)")
    assert(got((1L, 19L)) == (Some(100L), Some("a")))
    assert(got((1L, 20L)) == (Some(200L), Some("b")), "newer version replaces")
    assert(got((1L, 99L)) == (Some(200L), Some("b")), "carried indefinitely")
    assert(got((2L, 14L)) == (None, None))
    assert(got((2L, 16L)) == (Some(300L), Some("c")), "keys are isolated")
    assert(got((3L, 50L)) == (None, None), "unknown key → null payload")
  }

  test("payload columns always come from the same matched row") {
    // would fail if v and tag were carried by independent last_value's and
    // one of them were null on the newest version
    val r = Seq((1L, 10L, Some(100L), "a"), (1L, 20L, None: Option[Long], "b"))
      .toDF("k", "t", "v", "tag")
    val l = Seq((1L, 30L)).toDF("k", "t")
    val got = AsofJoin.asof(l, r, "k", "k", "t", "t", Seq("v", "tag")).head()
    assert(got.isNullAt(2) && got.getString(3) == "b",
      "null v of the newest row must win together with its tag")
  }

  test("trailing window aggregates exactly the right rows in [t-W, t] per key") {
    val left = Seq((1L, 100L), (1L, 115L), (2L, 100L)).toDF("k", "t")
      .withColumn("eid", col("k") * 1000 + col("t"))
    val right = Seq((1L, 89L, 5.0), (1L, 90L, 1.0), (1L, 100L, 2.0),
      (1L, 110L, 4.0), (2L, 100L, 8.0)).toDF("k", "t", "v")
    val got = AsofJoin.trailingWindow(left, right, "k", "k", "t", "t",
      windowLen = 10L,
      aggs = Map("n" -> count(col("v")), "s" -> sum(col("v"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    // k=1 t=100: rows at 90 (inclusive lower bound) and 100 — not 89
    assert(got((1L, 100L)) == (2L, 3.0))
    // k=1 t=115: rows at 110 only (105..115)
    assert(got((1L, 115L)) == (1L, 4.0))
    // k=2 isolated from k=1
    assert(got((2L, 100L)) == (1L, 8.0))
  }

  test("asof rejects payload and reserved-name collisions loudly") {
    val l = Seq((1L, 1L, 2.0)).toDF("k", "t", "v")
    val r = Seq((1L, 1L, 3.0)).toDF("k", "t", "v")
    val e1 = intercept[IllegalArgumentException](
      AsofJoin.asof(l, r, "k", "k", "t", "t", Seq("v")))
    assert(e1.getMessage.contains("collide"))
    val e2 = intercept[IllegalArgumentException](
      AsofJoin.asof(l.withColumnRenamed("v", "__side"), r, "k", "k", "t", "t", Seq("v")))
    assert(e2.getMessage.contains("internals"))
  }

  test("trailing window rejects colliding right column names loudly") {
    val l = Seq((1L, 1L)).toDF("k", "t").withColumn("v", lit(1.0))
    val r = Seq((1L, 1L)).toDF("k", "t").withColumn("v", lit(2.0))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.trailingWindow(l, r, "k", "k", "t", "t", 10L,
        Map("s" -> sum(col("v"))))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asof matches the brute-force per-row lookup on seeded random data") {
    val rnd = new scala.util.Random(42)
    val leftRows = Seq.tabulate(200)(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
    // unique (k, t) right rows by construction — no tie ambiguity
    val rightRows = rnd.shuffle((for (k <- 0L to 4L; t <- 0L until 100L) yield (k, t)).toSeq)
      .take(60).map { case (k, t) => (k, t, k * 1000 + t) }
    val left = leftRows.toDF("k", "t", "eid")
    val right = rightRows.toDF("k", "t", "v")
    val got = AsofJoin.asof(left, right, "k", "k", "t", "t", Seq("v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val expect = leftRows.map { case (k, t, eid) =>
      eid -> rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
    }.toMap
    assert(got == expect)
  }

  test("trailing window matches brute-force trailing aggregation on seeded random data") {
    val rnd = new scala.util.Random(7)
    val leftRows = Seq.tabulate(150)(i => (rnd.nextInt(4).toLong, rnd.nextInt(80).toLong, i.toLong))
    val rightRows = Seq.tabulate(120)(_ =>
      (rnd.nextInt(4).toLong, rnd.nextInt(80).toLong, (rnd.nextInt(9) + 1).toDouble))
    val got = AsofJoin.trailingWindow(
      leftRows.toDF("k", "t", "eid"), rightRows.toDF("k", "t", "v"),
      "k", "k", "t", "t", windowLen = 15L,
      aggs = Map("n" -> count(col("v")), "s" -> sum(col("v"))))
      .collect().map(r => r.getLong(2) ->
        (r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double]).getOrElse(0.0))).toMap
    val expect = leftRows.map { case (k, t, eid) =>
      val in = rightRows.filter(r => r._1 == k && r._2 >= t - 15 && r._2 <= t)
      eid -> (in.size.toLong, in.map(_._3).sum)
    }.toMap
    assert(got == expect)
  }

  test("asofBroadcast equals the single-exchange asof and plans zero exchanges/windows") {
    val left = Seq((1L, 5L), (1L, 10L), (1L, 19L), (1L, 20L), (1L, 99L),
      (2L, 14L), (2L, 16L), (3L, 50L)).toDF("k", "t")
      .withColumn("eid", col("k") * 1000 + col("t"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("eid", "v", "tag").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val bc = AsofJoin.asofBroadcast(left, right(), "k", "k", "t", "t", Seq("v", "tag"))
    assert(canon(bc) == canon(
      AsofJoin.asof(left, right(), "k", "k", "t", "t", Seq("v", "tag"))))
    // the entire point: no SHUFFLE, no window sort — the only exchange
    // is the broadcast of the plan-resident history relation, and the
    // probe is a hash join (round 14: the map-literal probe was a linear
    // scan per row)
    val plan = bc.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Window"),
      s"broadcast asof must stay shuffle-free:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"broadcast asof should probe via a hash join:\n$plan")
  }

  test("asofBroadcast matches brute force on seeded random data") {
    val rnd = new scala.util.Random(43)
    val leftRows = Seq.tabulate(200)(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
    val rightRows = rnd.shuffle((for (k <- 0L to 4L; t <- 0L until 100L) yield (k, t)).toSeq)
      .take(60).map { case (k, t) => (k, t, k * 1000 + t) }
    val got = AsofJoin.asofBroadcast(leftRows.toDF("k", "t", "eid"),
        rightRows.toDF("k", "t", "v"), "k", "k", "t", "t", Seq("v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val expect = leftRows.map { case (k, t, eid) =>
      eid -> rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
    }.toMap
    assert(got == expect)
  }

  test("asofBroadcast enriches a STREAM: streamed rows match the batch answer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-asof-stream").toString
    val left = Seq((1L, 5L), (1L, 10L), (1L, 20L), (2L, 16L), (3L, 50L))
      .toDF("k", "t").withColumn("eid", col("k") * 1000 + col("t"))
    left.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(left.schema).parquet(dir)
    // the SAME call that serves batch — stateless, so append mode just works
    val enriched = AsofJoin.asofBroadcast(stream, right(), "k", "k", "t", "t", Seq("v", "tag"))
    val query = enriched.writeStream.format("memory").queryName("asof_bc_out")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("eid", "v", "tag").collect()
          .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
      val batch = canon(AsofJoin.asof(left, right(), "k", "k", "t", "t", Seq("v", "tag")))
      assert(canon(spark.table("asof_bc_out")) == batch)
      assert(batch.nonEmpty)
    } finally query.stop()
  }

  test("asofBroadcast: null right keys are dropped (SQL equality — null matches nothing)") {
    val left = Seq((1L, 20L)).toDF("k", "t")
    val r = Seq((Some(1L), 10L, "a"), (None: Option[Long], 5L, "ghost"))
      .toDF("k", "t", "tag")
    val got = AsofJoin.asofBroadcast(left, r, "k", "k", "t", "t", Seq("tag")).head()
    assert(got.getString(2) == "a", "the null-keyed version must never be carried")
  }

  test("asofBroadcast rejects ambiguous, empty, or null-time right sides loudly") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val dupRight = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b")).toDF("k", "t", "v", "tag")
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofBroadcast(left, dupRight, "k", "k", "t", "t", Seq("v", "tag")))
      .getMessage.contains("latestPerKeyTime"))
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofBroadcast(left, right().filter(col("k") === 99), "k", "k", "t", "t", Seq("v")))
      .getMessage.contains("empty"))
    // a null version TIME is corruption, not SQL-null semantics — loud error
    val nullT = Seq((Some(1L), Some(10L), "a"), (Some(1L), None: Option[Long], "broken"))
      .toDF("k", "t", "tag")
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofBroadcast(left, nullT, "k", "k", "t", "t", Seq("tag")))
      .getMessage.contains("null t"))
  }

  test("asofBroadcast above maxRightRows degrades to asof() on batch, errors on streams") {
    val left = Seq((1L, 5L), (1L, 10L), (1L, 19L), (1L, 20L), (1L, 99L),
      (2L, 14L), (2L, 16L), (3L, 50L)).toDF("k", "t")
      .withColumn("eid", col("k") * 1000 + col("t"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("eid", "v", "tag").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    // right() has 3 rows: budget 3 broadcasts, budget 2 falls back — the
    // output must be identical on BOTH sides of the boundary
    val within = AsofJoin.asofBroadcast(left, right(), "k", "k", "t", "t",
      Seq("v", "tag"), maxRightRows = 3)
    val fellBack = AsofJoin.asofBroadcast(left, right(), "k", "k", "t", "t",
      Seq("v", "tag"), maxRightRows = 2)
    assert(canon(within) == canon(fellBack),
      "fallback must preserve the broadcast output exactly")
    // and the fallback really is the windowed plan (the broadcast is narrow)
    assert(fellBack.queryExecution.executedPlan.toString.contains("Window"))
    assert(!within.queryExecution.executedPlan.toString.contains("Window"))
    // a streaming left cannot fall back (asof needs a window sort) — the
    // overflow must stay a loud error naming the stream
    val dir = java.nio.file.Files.createTempDirectory("graft-asof-ovf").toString
    left.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(left.schema).parquet(dir)
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofBroadcast(stream, right(), "k", "k", "t", "t",
        Seq("v", "tag"), maxRightRows = 2))
      .getMessage.contains("STREAM"))
  }

  test("asofBroadcast fallback enforces the broadcast path's contract (no sort-order luck past the boundary)") {
    val left = Seq((1L, 20L)).toDF("k", "t")
    // duplicate (key, time): loud on BOTH sides of maxRightRows — the
    // windowed fallback would otherwise pick a payload by sort luck
    val dupRight = Seq((1L, 10L, "a"), (1L, 10L, "b"), (2L, 5L, "c")).toDF("k", "t", "tag")
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofBroadcast(left, dupRight, "k", "k", "t", "t", Seq("tag"),
        maxRightRows = 2)).getMessage.contains("latestPerKeyTime"))
    // null version time: loud on both sides too (nulls sort FIRST in the
    // fallback's window — they would silently match as 'earliest version')
    val nullT = Seq((Some(1L), Some(10L), "a"), (Some(1L), None: Option[Long], "broken"),
      (Some(2L), Some(5L), "c")).toDF("k", "t", "tag")
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofBroadcast(left, nullT, "k", "k", "t", "t", Seq("tag"),
        maxRightRows = 2)).getMessage.contains("null t"))
    // null right keys: dropped in the fallback exactly like the broadcast
    // probe (asof()'s window would group them with null-key left rows)
    val nullK = Seq((Some(1L), 10L, "a"), (None: Option[Long], 5L, "ghost"),
      (Some(2L), 7L, "x")).toDF("k", "t", "tag")
    val got = AsofJoin.asofBroadcast(left, nullK, "k", "k", "t", "t", Seq("tag"),
      maxRightRows = 2)
    assert(got.head().getString(2) == "a")
    val allNull = Seq((None: Option[Long], 5L, "g1"), (None: Option[Long], 6L, "g2"),
      (None: Option[Long], 7L, "g3")).toDF("k", "t", "tag")
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofBroadcast(left, allNull, "k", "k", "t", "t", Seq("tag"),
        maxRightRows = 2)).getMessage.contains("null key"))
  }

  test("latestPerKeyTime keeps exactly the max-tie version per (key, time)") {
    val dup = Seq((1L, 10L, 7L, "x"), (1L, 10L, 9L, "y"), (1L, 11L, 1L, "z"))
      .toDF("k", "t", "ver", "tag")
    val got = AsofJoin.latestPerKeyTime(dup, "k", "t", "ver")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(got == Map((1L, 10L) -> "y", (1L, 11L) -> "z"))
  }
  test("asofBroadcastKeys: composite struct-keyed probe — parity, fallback, nulls (round 14)") {
    // (uid, dev) pair key: two versioned dims that only differ in the
    // SECOND component — a scalar-keyed probe would conflate them
    val right = Seq(
      (1L, "a", 10L, 100L), (1L, "a", 20L, 200L),
      (1L, "b", 15L, 300L), (2L, "a", 5L, 400L)
    ).toDF("ruid", "rdev", "rt", "rv")
    val left = Seq((1L, "a", 19L), (1L, "a", 20L), (1L, "b", 14L),
      (1L, "b", 16L), (2L, "a", 99L), (3L, "a", 50L))
      .toDF("uid", "dev", "t")
      .withColumn("eid", col("uid") * 1000 + col("t"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("eid", "rv").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toSet
    val expected = Set(1019L -> Some(100L), 1020L -> Some(200L),
      1014L -> None, 1016L -> Some(300L), 2099L -> Some(400L), 3050L -> None)
    val bc = AsofJoin.asofBroadcastKeys(left, right,
      Seq("uid", "dev"), Seq("ruid", "rdev"), "t", "rt", Seq("rv"))
    assert(canon(bc) == expected)
    // no exchange/window in the broadcast plan — the probe is a narrow map
    assert(!bc.queryExecution.executedPlan.toString.contains("Window"))
    // above maxRightRows the composite fallback (struct-keyed asof())
    // must produce the identical output
    val fellBack = AsofJoin.asofBroadcastKeys(left, right,
      Seq("uid", "dev"), Seq("ruid", "rdev"), "t", "rt", Seq("rv"),
      maxRightRows = 2)
    assert(canon(fellBack) == expected, "composite fallback diverged")
    assert(!fellBack.columns.contains("__bkl"), "internal key leaked")
    // a null in ANY key component: right rows dropped, left rows match
    // nothing — on both sides of the boundary
    val nullRight = Seq((Some(1L), Option.empty[String], 10L, 999L))
      .toDF("ruid", "rdev", "rt", "rv")
    val nl = Seq((Some(1L), Option.empty[String], 50L))
      .toDF("uid", "dev", "t").withColumn("eid", lit(1L))
    assert(AsofJoin.asofBroadcastKeys(nl, right,
      Seq("uid", "dev"), Seq("ruid", "rdev"), "t", "rt", Seq("rv"))
      .head().isNullAt(4), "null left component must match nothing")
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofBroadcastKeys(left, nullRight,
        Seq("uid", "dev"), Seq("ruid", "rdev"), "t", "rt", Seq("rv")))
      .getMessage.contains("null key"))
    // composite duplicate (key tuple, time): loud, both sides
    val dupRight = Seq((1L, "a", 10L, 1L), (1L, "a", 10L, 2L))
      .toDF("ruid", "rdev", "rt", "rv")
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofBroadcastKeys(left, dupRight,
        Seq("uid", "dev"), Seq("ruid", "rdev"), "t", "rt", Seq("rv")))
      .getMessage.contains("latestPerKeyTime"))
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofBroadcastKeys(left, dupRight,
        Seq("uid", "dev"), Seq("ruid", "rdev"), "t", "rt", Seq("rv"),
        maxRightRows = 1)).getMessage.contains("latestPerKeyTime"))
    // mismatched key lists: loud
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofBroadcastKeys(left, right,
        Seq("uid", "dev"), Seq("ruid"), "t", "rt", Seq("rv")))
      .getMessage.contains("matched key lists"))
  }

}
