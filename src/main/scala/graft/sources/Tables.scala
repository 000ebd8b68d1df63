package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata layout (TESTDATA.md).
  *
  * Plain `spark.read.parquet` is deliberate: the vectorized Parquet reader +
  * Catalyst pushdown replace the reference's entire storage layer (per-column
  * redis processes, proc.rs:12-58) — columnar files on a distributed store
  * ARE the "separated storage and computing layers" of README.md:4. At
  * cluster scale the same loaders work against an object-store path; date
  * partitioning of the events table would add directory-level pruning on top
  * of the row-group stats we already get.
  */
object Tables {
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Raw epoch-nanos companion column kept alongside the converted `ts` —
    * [[graft.compile.Compiler.scanFilter]] mirrors time bounds onto it so the
    * range predicate reaches the Parquet reader (row-group min/max pruning)
    * even though the TimestampType `ts` is a derived expression. */
  val TsNanosCol = "__ts_ns"

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects by default (PARQUET_TYPE_ILLEGAL). Read nanos as LONG
    * (runtime-settable legacy conf, so this works under any driver-built
    * session) and truncate to a microsecond TimestampType column, keeping the
    * raw nanos as [[TsNanosCol]] for predicate pushdown. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, dir, "events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    raw.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        // integer `div`, NOT `/`: double division loses precision above 2^53
        // (epoch-nanos ≈ 2^60) — a 1 µs error that can cross a second
        // boundary and corrupt window assignment
        raw.withColumn(TsNanosCol, col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(_: TimestampType) | _ => raw
    }
  }
  def lineitem(s: SparkSession, dir: String): DataFrame   = table(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame     = table(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame   = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = table(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame     = table(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame     = table(s, dir, "region")
  def documents(s: SparkSession, dir: String): DataFrame  = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
