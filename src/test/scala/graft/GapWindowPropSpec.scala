package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ir._
import graft.operators.GapWindows

/** Property pin for the flagship exact operator: GapWindows against an
  * independent in-JVM replay of the documented walk (open at first ts,
  * admit while ts−start ≤ g, close on breach, breacher anchors the next
  * window but is dropped) on seeded random data — 100× the coverage of the
  * 10-row goldens, including consecutive-breach chains, singleton windows,
  * and duplicate timestamps. Arithmetic is replicated operation-for-
  * operation (fold-order sum, incremental mean), so doubles compare
  * EXACTLY, not approximately. */
class GapWindowPropSpec extends AnyFunSuite {
  import SparkFixture.spark

  private val gran = 10L

  private case class Ev(id: Long, g: String, ts: Long, v: Double)

  private def brute(events: Seq[Ev]): Set[(String, Long, Long, Double, Double, Double)] = {
    val out = Seq.newBuilder[(String, Long, Long, Double, Double, Double)]
    for ((g, evs) <- events.groupBy(_.g)) {
      val sorted = evs.sortBy(e => (e.ts, e.id))
      var rows = Vector.empty[Ev]
      var wStart = -1L; var wEnd = -1L; var anchor = -1L
      def close(): Unit = if (rows.nonEmpty) {
        val sum = rows.foldLeft(0.0)((acc, e) => acc + 1.0 * e.v)
        val count = rows.foldLeft(0.0)((acc, _) => acc + 1.0)
        var n = 0L; var mean = 0.0
        rows.foreach { e => n += 1; mean += (e.v - mean) / n }
        out += ((g, wStart, wEnd, sum, count, mean))
        rows = Vector.empty
      }
      sorted.foreach { e =>
        if (wStart == -1L) { wStart = e.ts; wEnd = e.ts; rows = Vector(e) }
        else if (anchor >= 0L) {
          if (e.ts - anchor <= gran) { wStart = anchor; wEnd = e.ts; rows = Vector(e); anchor = -1L }
          else anchor = e.ts
        } else if (e.ts - wStart <= gran) { wEnd = e.ts; rows :+= e }
        else { close(); anchor = e.ts }
      }
      close()
    }
    out.result().toSet
  }

  test("gap windows == independent brute-force walk on 300 seeded random events") {
    val rnd = new scala.util.Random(2026)
    val base = 1704067200L
    val events = Seq.tabulate(300) { i =>
      Ev(i.toLong, s"g${rnd.nextInt(3)}", base + rnd.nextInt(500).toLong,
        (rnd.nextInt(1000) + 1).toDouble)
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("g", StringType), StructField("v", StringType)))
    val rows = events.map(e => Row(e.id,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(e.ts)), e.g,
      // exact decimal rendering: v is integral, so "123.0" parses back to
      // the identical double on the operator side
      e.v.toString))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val q = ZxQuery(
      selects = Seq(Select(Agg.Sum, "v"), Select(Agg.Count, "v"), Select(Agg.Mean, "v")),
      groupBy = Seq("g"), granularitySec = gran)
    val got = GapWindows(df, q, idCol = Some("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    val want = brute(events)
    assert(got.size == want.size, s"window count: got ${got.size}, want ${want.size}")
    assert(got == want)
    assert(got.size > 20, "the random data must actually exercise many windows")
    // the run-decomposed parallel walk must agree EXACTLY (identical
    // fold-order arithmetic per run, provable anchor at every run boundary)
    val par = GapWindows.parallel(df, q, idCol = Some("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(par == want, "parallel walk diverged from the model")
  }

  test("parallel walk == serial walk on dense data with NO gaps (single run per key)") {
    // the degenerate case the run decomposition cannot split: every
    // consecutive gap <= granularity, so each key is ONE run — the
    // parallel plan must still be exactly the serial answer
    val base = 1704067200L
    val events = Seq.tabulate(120) { i =>
      Ev(i.toLong, s"g${i % 2}", base + (i / 2).toLong * gran, (i + 1).toDouble)
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("g", StringType), StructField("v", StringType)))
    val rows = events.map(e => Row(e.id,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(e.ts)), e.g,
      e.v.toString))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val q = ZxQuery(
      selects = Seq(Select(Agg.Sum, "v"), Select(Agg.Count, "v"), Select(Agg.Mean, "v")),
      groupBy = Seq("g"), granularitySec = gran)
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(canon(GapWindows.parallel(df, q, idCol = Some("id"))) ==
      canon(GapWindows(df, q, idCol = Some("id"))))
    assert(canon(GapWindows.parallel(df, q, idCol = Some("id"))) == brute(events))
  }

  test("parallel walk handles the UNGROUPED global walk (runs still fan out)") {
    val rnd = new scala.util.Random(7)
    val base = 1704067200L
    // clustered bursts separated by > gran gaps → many runs, no group keys
    val events = (0 until 40).flatMap { burst =>
      val t0 = base + burst.toLong * 10 * gran
      Seq.tabulate(5)(j => Ev((burst * 5 + j).toLong, "all",
        t0 + rnd.nextInt(gran.toInt).toLong, (j + 1).toDouble))
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("g", StringType), StructField("v", StringType)))
    val rows = events.map(e => Row(e.id,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(e.ts)), e.g,
      e.v.toString))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val q = ZxQuery(
      selects = Seq(Select(Agg.Sum, "v"), Select(Agg.Count, "v"), Select(Agg.Mean, "v")),
      groupBy = Seq.empty, granularitySec = gran)
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(canon(GapWindows.parallel(df, q, idCol = Some("id"))) ==
      canon(GapWindows(df, q, idCol = Some("id"))))
  }
}
