package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scratch phase-timer for the c17 CDC-follow lifecycle — NOT part of the
  * driver contract; exists to attribute the row's seconds to store ops vs
  * follow folds. Kept as the measurement record behind
  * OPTIMIZATION_r15.md's c17 decision (measured, reverted). */
object C17Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = graft.GraftSession.create(s"local[$cpus]", cpus)
    import graft.sources.{EventStore, Tables}
    (1 to 2).foreach { round =>
      val t0 = System.nanoTime()
      var last = t0
      def lap(name: String): Unit = {
        val now = System.nanoTime()
        println(f"[c17probe] r$round $name%-22s ${(now - last) / 1e9}%6.3f s")
        last = now
      }
      val path = "target/graft-cdc-probe/" + dir.replaceAll("[^A-Za-z0-9._-]", "_")
      EventStore.reset(s, path)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      lap("reset")
      EventStore.append(ev.filter(dayofmonth(col("ts")) <= 10).repartition(3), path)
      EventStore.writeManifest(s, path)
      val v1 = EventStore.manifestVersion(s, path)
      lap("append+manifest")
      val fp = floor(coalesce(col("value"), lit(0.0)) * lit(1048576.0))
        .cast(LongType)
      def keyed(df: DataFrame, sign: Column) = df
        .select(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"), fp.as("__fv"),
          sign.as("__s"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("__s")).as("n"), sum(col("__s") * col("__fv")).as("sum_fp"))
      var state = keyed(EventStore.readPinned(s, path, v1), lit(1L))
      val follower = new graft.streaming.ChangeFeedFollower(s, path, v1,
        (_, _, feed) => {
          val delta = keyed(feed,
            when(col("_change_type") === "insert", 1L).otherwise(-1L))
          state = state.unionByName(delta)
            .groupBy(col("event_type"), col("day"))
            .agg(sum(col("n")).as("n"), sum(col("sum_fp")).as("sum_fp"))
        }).start()
      lap("seed+start")
      EventStore.appendCommitted(
        ev.filter(dayofmonth(col("ts")).between(11, 20)), path, "cdc-probe", 1L)
      lap("appendCommitted")
      follower.processAllAvailable()
      lap("poll1")
      EventStore.compactInPlace(s, path)
      lap("compact")
      follower.processAllAvailable()
      lap("poll2")
      EventStore.deleteWhere(s, path,
        pmod(col("user_id"), lit(5)) === 3 && dayofmonth(col("ts")) <= 10)
      lap("deleteWhere")
      follower.processAllAvailable()
      lap("poll3")
      follower.stopQuietly()
      val out = state.filter(col("n") > 0)
      out.select(xxhash64(out.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      lap("evaluate")
      println(f"[c17probe] r$round TOTAL ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    s.stop()
  }
}
