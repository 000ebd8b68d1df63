package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ir._
import graft.compile.Compiler
import graft.sources.{EventStore, JsonResult}
import graft.streaming.EventStream

/** Write path (S1/S2), streaming ingest + windowed agg, and the S4 JSON
  * result shaper. */
class StoreStreamSpec extends AnyFunSuite {
  import SparkFixture._

  test("S1/S2: append is date-partitioned and re-readable; reset clears") {
    val dir = Files.createTempDirectory("graft-store").toString + "/events"
    // testdata events use TIMESTAMP(NANOS) → must go through Tables
    val src = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    EventStore.append(src, dir)
    val back = EventStore.read(spark, dir)
    assert(back.count() == src.count())
    assert(back.columns.contains("event_date")) // partition column
    // partition pruning: a one-day filter must prune input files
    val pruned = back.filter(col("event_date") === lit("2024-01-05"))
    assert(pruned.count() > 0 && pruned.count() < src.count())
    EventStore.reset(spark, dir)
    assert(!new java.io.File(dir).exists())
  }

  test("bucketed table: self-join and aggregation on the bucket key skip the shuffle") {
    val src = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "value") // ns-mirror col not needed here
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    EventStore.appendBucketed(src, "ev_bucketed", "user_id", buckets = 8)
    // at this toy scale the planner would just broadcast the table — turn
    // that off so the plan shows what bucketing buys on two FACT-sized sides
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = spark.table("ev_bucketed")
      // equi-join on the bucket key: both sides read pre-bucketed files —
      // no Exchange anywhere in the plan
      val joined = t.as("a").join(t.as("b"), "user_id")
      val jp = joined.queryExecution.executedPlan.toString
      assert(!jp.contains("Exchange"), s"bucketed join must not shuffle:\n$jp")
      assert(joined.count() > 0)
      // aggregation on the bucket key: partial == final, zero exchanges
      val agg = t.groupBy(col("user_id")).agg(sum(col("value")))
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange"), s"bucketed agg must not shuffle:\n$ap")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    }
  }

  test("streaming windowed agg matches the batch compiler on the same data") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val src = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", col("ts").cast("timestamp"))
    src.coalesce(1).write.mode("overwrite").parquet(dir)
    val q = ZxQuery(
      selects = Seq(Select(Agg.Sum, "value"), Select(Agg.Count, "value")),
      groupBy = Seq("event_type"), granularitySec = 86400L)

    val stream = EventStream.read(spark, dir)
    val agg = EventStream.windowedAgg(stream, q, watermark = "0 seconds")
    val query = agg.writeStream.format("memory").queryName("ss_out")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("ss_out")
        .select("event_type", "w_start", "sum_value", "count_value")
        .collect().map(r => (r.getString(0), r.getLong(1),
          math.round(r.getDouble(2) * 1000), r.getDouble(3))).toSet
      val batch = Compiler.runUnsorted(src, q)
        .select("event_type", "w_start", "sum_value", "count_value")
        .collect().map(r => (r.getString(0), r.getLong(1),
          math.round(r.getDouble(2) * 1000), r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("streaming rejects exact count_distinct with a clear message") {
    val stream = EventStream.read(spark, "/root/testdata/sf0.001")
    val q = ZxQuery(selects = Seq(Select(Agg.CountDistinct, "user_id")))
    val e = intercept[IllegalArgumentException](EventStream.windowedAgg(stream, q))
    assert(e.getMessage.contains("approx_count_distinct"))
  }

  test("streaming approx_count_distinct (the suggested replacement) works") {
    val dir = Files.createTempDirectory("graft-acd").toString
    val src = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    src.coalesce(1).write.mode("overwrite").parquet(dir)
    val q = ZxQuery(
      selects = Seq(Select(Agg.ApproxCountDistinct, "user_id")),
      granularitySec = 86400L * 365) // one window over the whole testdata span
    val agg = EventStream.windowedAgg(EventStream.read(spark, dir), q,
      watermark = "0 seconds")
    val query = agg.writeStream.format("memory").queryName("acd_out")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      assert(spark.table("acd_out").count() == 1)
      val approx = spark.table("acd_out")
        .agg(sum(col("approx_count_distinct_user_id"))).head().getLong(0)
      val exact = src.select(countDistinct(col("user_id"))).head().getLong(0)
      assert(math.abs(approx - exact).toDouble / exact <= 0.1)
    } finally query.stop()
  }

  test("streaming hopping windows match the batch compiler on the same data") {
    val dir = Files.createTempDirectory("graft-hop").toString
    val src = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", col("ts").cast("timestamp"))
    src.coalesce(1).write.mode("overwrite").parquet(dir)
    val q = ZxQuery(
      selects = Seq(Select(Agg.Sum, "value"), Select(Agg.Count, "value")),
      groupBy = Seq("event_type"), granularitySec = 86400L,
      slideSec = Some(43200L))
    val agg = graft.streaming.EventStream.hoppingAgg(
      graft.streaming.EventStream.read(spark, dir), q, watermark = "0 seconds")
    val query = agg.writeStream.format("memory").queryName("hop_out")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("event_type", "w_start", "w_end", "sum_value", "count_value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          math.round(r.getDouble(3) * 1000), r.getDouble(4))).toSet
      val streamed = canon(spark.table("hop_out"))
      val batch = canon(graft.compile.Compiler.runUnsorted(src, q))
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // every event lands in exactly size/slide = 2 windows: hopping total
      // count is 2x the tumbling total
      val tumbling = graft.compile.Compiler
        .runUnsorted(src, q.copy(slideSec = None))
        .agg(sum(col("count_value"))).head().getDouble(0)
      val hopping = spark.table("hop_out")
        .agg(sum(col("count_value"))).head().getDouble(0)
      assert(hopping == 2 * tumbling)
    } finally query.stop()
  }

  test("streaming session windows match the batch compiler on closed sessions") {
    val dir = Files.createTempDirectory("graft-sess").toString
    def writeBatch(rows: Seq[(Long, Long, String, String, String, String)]): Unit = {
      val data = rows.map { case (id, sec, foo, x, y, tag) =>
        org.apache.spark.sql.Row(id,
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), foo, x, y, tag)
      }
      spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
        .write.mode("append").parquet(dir)
    }
    val base = 1704067200L
    val batch1 = Seq(
      (1L, base + 0L, "100", "7", "1", "t1"), (2L, base + 1L, "200", "1", null, "t1,t2"),
      (3L, base + 2L, "300", "3", null, "t3"), (4L, base + 3L, "400", "2", "9", "t2"),
      (5L, base + 4L, "500", "4", null, null), (6L, base + 5L, "600", "5", null, "t3"),
      (7L, base + 6L, "700", "6", null, null), (8L, base + 7L, "800", "9", null, null),
      (9L, base + 8L, "900", "8", null, null), (10L, base + 9L, "1000", "0", "9", null))
    writeBatch(batch1)
    val q = ZxQuery(selects = Seq(Select(Agg.Sum, "foo"), Select(Agg.Count, "foo")),
      groupBy = Seq("y"), sessionGapSec = Some(5L))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = graft.streaming.EventStream.sessionAgg(stream, q, watermark = "0 seconds")
    val query = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      // far-future events advance the watermark past every open session
      writeBatch(Seq((11L, base + 5000L, "1", "1", "1", null),
        (12L, base + 5000L, "1", "1", "9", null),
        (13L, base + 5000L, "1", "1", null, null)))
      query.processAllAvailable()
      def canon(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          math.round(r.getDouble(3) * 1000), r.getDouble(4))).toSet
      val streamed = canon(spark.table("sess_out")
        .select("y", "w_start", "w_end", "sum_foo", "count_foo").collect())
      val batch1Df = spark.createDataFrame(
        spark.sparkContext.parallelize(batch1.map { case (id, sec, foo, x, y, tag) =>
          org.apache.spark.sql.Row(id,
            java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), foo, x, y, tag)
        }, 2), schema)
      val batch = canon(graft.compile.Compiler.runSession(batch1Df, q)
        .select("y", "w_start", "w_end", "sum_foo", "count_foo").collect())
      assert(streamed == batch)
      // sessions: y=1 {0}; y=9 {3}, {9} (gap 6 > 5 splits); __nil {1..8}
      assert(streamed.map(t => (t._1, t._2 - base, t._3 - base)) ==
        Set(("1", 0L, 5L), ("9", 3L, 8L), ("9", 9L, 14L),
          (graft.compile.Compiler.NilSentinel, 1L, 13L)))
    } finally query.stop()
  }

  test("stateful streaming gap windows match the batch operator on closed windows") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-gws").toString
    def writeBatch(rows: Seq[(Long, Long, String, String, String, String)]): Unit = {
      val data = rows.map { case (id, sec, foo, x, y, tag) =>
        org.apache.spark.sql.Row(id,
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), foo, x, y, tag)
      }
      spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
        .write.mode("append").parquet(dir)
    }
    // batch 1: the canonical fixture rows, shifted to a realistic epoch —
    // an event at ts == the initial watermark (epoch 0) is filtered as late
    // by Spark's stateful-operator late-row filter, a degenerate boundary
    // no real stream hits
    val base = 1704067200L
    val batch1 = Seq(
      (1L, 0L, "100", "7", "1", "t1"), (2L, 1L, "200", "1", null, "t1,t2"),
      (3L, 2L, "300", "3", null, "t3"), (4L, 3L, "400", "2", "9", "t2"),
      (5L, 4L, "500", "4", null, null), (6L, 5L, "600", "5", null, "t3"),
      (7L, 6L, "700", "6", null, null), (8L, 7L, "800", "9", null, null),
      (9L, 8L, "900", "8", null, null), (10L, 9L, "1000", "0", "9", null))
      .map { case (id, sec, foo, x, y, tag) => (id, base + sec, foo, x, y, tag) }
    writeBatch(batch1)

    val q = ZxQuery(selects = Seq(Select(Agg.Sum, "foo"), Select(Agg.Count, "foo")),
      groupBy = Seq("y"), granularitySec = 15L)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = graft.streaming.GapWindowStream(stream, q, watermark = "0 seconds")
    val query = out.writeStream.format("memory").queryName("gws_out")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      assert(spark.table("gws_out").count() == 0) // all windows still open
      // batch 2: one far-future event per group closes the first windows
      writeBatch(Seq((11L, base + 1000L, "1", "1", "1", null),
        (12L, base + 1000L, "1", "1", "9", null),
        (13L, base + 1000L, "1", "1", null, null)))
      query.processAllAvailable()
      val streamed = spark.table("gws_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getSeq[Double](3).head)).toSet
      // batch operator over the same batch-1 rows is the semantics oracle
      val batch1Df = spark.createDataFrame(
        spark.sparkContext.parallelize(batch1.map { case (id, sec, foo, x, y, tag) =>
          org.apache.spark.sql.Row(id,
            java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), foo, x, y, tag)
        }, 2), schema)
      val batch = graft.operators.GapWindows(batch1Df, q, idCol = Some("id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(streamed.map(_._4) == Set(100.0, 1400.0, 4000.0))
    } finally query.stop()
  }

  test("gap windows: cross-batch out-of-order events match the batch operator") {
    val dir = Files.createTempDirectory("graft-gwo").toString
    def mkRows(t: Seq[(Long, Long, String)]) = t.map { case (id, sec, foo) =>
      org.apache.spark.sql.Row(id,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), foo, null, "9", null)
    }
    def write(t: Seq[(Long, Long, String)]): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(mkRows(t), 1), schema)
        .write.mode("append").parquet(dir)
    val base = 1704067200L
    // batch A sees ts 0, 9, 30; batch B delivers 3 and 7 AFTER them — above
    // the 50s watermark, so they must be buffered and folded in ts order,
    // not walked in arrival order (the round-1 corruption case)
    val a = Seq((1L, base + 0L, "100"), (2L, base + 9L, "200"), (5L, base + 30L, "500"))
    val b = Seq((3L, base + 3L, "300"), (4L, base + 7L, "400"))
    val q = ZxQuery(selects = Seq(Select(Agg.Sum, "foo")),
      groupBy = Seq("y"), granularitySec = 15L)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = graft.streaming.GapWindowStream(stream, q, watermark = "50 seconds")
    val query = out.writeStream.format("memory").queryName("gwo_out")
      .outputMode("append").start()
    try {
      write(a); query.processAllAvailable()
      write(b); query.processAllAvailable()
      // far-future event advances the watermark past every deadline
      write(Seq((6L, base + 5000L, "1"))); query.processAllAvailable()
      val streamed = spark.table("gwo_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getSeq[Double](3).head)).toSet
      val union = spark.createDataFrame(
        spark.sparkContext.parallelize(mkRows(a ++ b), 2), schema)
      val batch = graft.operators.GapWindows(union, q, idCol = Some("id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(streamed == Set(("9", base + 0L, base + 9L, 1000.0)))
    } finally query.stop()
  }

  test("streaming dedup drops within-watermark re-deliveries across batches") {
    val dir = Files.createTempDirectory("graft-sdd").toString
    def mkRows(t: Seq[(Long, Long, String)]) = t.map { case (id, sec, foo) =>
      org.apache.spark.sql.Row(id,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), foo, null, "9", null)
    }
    def write(t: Seq[(Long, Long, String)]): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(mkRows(t), 1), schema)
        .write.mode("append").parquet(dir)
    val base = 1704067200L
    // batch B re-delivers id 1 and 2 (same key) within the 60s watermark —
    // both must be dropped by state carried across the batch boundary
    val a = Seq((1L, base + 0L, "100"), (2L, base + 9L, "200"))
    val b = Seq((1L, base + 1L, "100"), (2L, base + 9L, "200"), (3L, base + 30L, "300"))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = graft.streaming.EventStream.dedupByKey(stream, Seq("id"),
      watermark = "60 seconds", tsCol = "ts")
    val query = out.writeStream.format("memory").queryName("sdd_out")
      .outputMode("append").start()
    try {
      write(a); query.processAllAvailable()
      write(b); query.processAllAvailable()
      val ids = spark.table("sdd_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), "one survivor per key")
    } finally query.stop()
  }

  test("curation gates run unchanged on a document stream (batch == stream)") {
    import graft.functions.TextFunctions._
    val dir = Files.createTempDirectory("graft-docstream").toString
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    def gates(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      qualityOk(col("text")).as("ok"),
      langId(col("text")).as("lid"))
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val query = gates(stream).writeStream.format("memory")
      .queryName("docs_out").outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("docs_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getString(3))).toSet
      val batch = gates(docs).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getString(3))).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally query.stop()
  }

  test("S4: JSON result shaper reproduces the reference's nested shape") {
    val q = ZxQuery(selects = Seq(Select(Agg.Sum, "foo")),
      groupBy = Seq("y"), granularitySec = 15L)
    val windowed = Compiler.runUnsorted(fixture, q)
    val json = JsonResult.toReferenceJson(windowed, Seq("y"), q.selects)
    // group key serialized as a JSON-object *string*; $$agg(col) keys;
    // parallel data/window_starts/window_ends arrays (lib.rs:74-79, 102-109)
    assert(json.contains(""""{\"y\":\"9\"}""""))
    assert(json.contains("$$sum(foo)"))
    assert(json.contains("\"window_starts\":[0]"))
    assert(json.contains("\"data\":[1400.0]"))
  }
}
