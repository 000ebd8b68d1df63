package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side of the engine — the reference's storage commands re-expressed
  * as Parquet table management (SURVEY §2 S1-S4).
  *
  * | reference | here |
  * |---|---|
  * | `insert` — per-row ZADDs + fsync per column (lib.rs:263-303, self-
  *   described slow) | [[append]] — batch append of a DataFrame, columnar
  *   encoding + stats for free |
  * | `init`/`flushall` (lib.rs:248-261) | [[reset]] — overwrite the path |
  * | bulk load via redis-cli pipe (Makefile:1-2) | [[append]] of any
  *   `spark.read` source; Structured Streaming ingest in
  *   [[graft.streaming.EventStream.ingest]] |
  * | row ids via `INCR LAST-ID` (lib.rs:265-267) | [[withEventIds]] —
  *   partition-parallel unique ids; a global INCR is a scalability
  *   anti-pattern at 100 TB |
  *
  * Layout: events are date-partitioned on `event_date` so time-range scans
  * prune whole directories before row-group stats even engage — the
  * distributed analog of the reference's TS-zset index (lib.rs:305-331).
  */
object EventStore {

  /** Assign cluster-unique event ids without a global counter. */
  def withEventIds(df: DataFrame, idCol: String = "event_id"): DataFrame =
    df.withColumn(idCol, monotonically_increasing_id())

  /** S1: batch append into the date-partitioned store. */
  def append(df: DataFrame, path: String, tsCol: String = "ts"): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write.mode(SaveMode.Append)
      .partitionBy("event_date")
      .parquet(path)

  /** S1 at join scale: append as a BUCKETED catalog table. Bucketing
    * pre-shuffles the data once at write time — every later equi-join or
    * aggregation on the bucket key reads co-located buckets and skips its
    * exchange entirely (PlanSpec-pinned). At 100 TB this converts the
    * recurring per-query shuffle of fact⨝fact joins into a one-off write
    * cost; pick the dominant join key (`user_id` for events) and a bucket
    * count ~= the cluster's target parallelism. */
  def appendBucketed(df: DataFrame, table: String, bucketCol: String,
                     buckets: Int = 32, tsCol: String = "ts"): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** S2: reset the store (init/flushall) — recursive delete of the table
    * path through the Hadoop FS abstraction (works on local FS and object
    * stores alike). */
  def reset(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
