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
