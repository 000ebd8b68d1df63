package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** Per-partition outcome of [[compact]]. */
  final case class PartitionCompaction(partition: String, filesBefore: Int,
                                       bytes: Long, filesAfter: Int)

  /** Compact the small files that per-batch and streaming appends
    * accumulate — the maintenance job every 100 TB ingest path needs:
    * thousands of KB-scale files per partition collapse scan throughput
    * (per-file open cost, tiny row groups that defeat min/max pruning)
    * and every appended micro-batch makes it worse.
    *
    * Shape: a driver-side metadata pass sizes each partition
    * (ceil(bytes/targetBytes) output files); partitions already at or
    * under that count are untouched. Each affected partition is rewritten
    * by its own narrow job — `read partition → coalesce(nOut) → write
    * staging` (no shuffle; the partition column lives in the directory
    * name, so bytes round-trip unchanged) — and swapped in with two
    * renames, so a crash leaves the old or the new directory, never a
    * mix. Jobs run `parallelism`-wide from the driver (the Delta
    * OPTIMIZE file-group pattern): partitions are independent, so the
    * scheduler overlaps them. A reader that LISTS during the two-rename
    * window can momentarily miss the swapping partition — single-writer
    * maintenance windows are the operating assumption here; fully
    * concurrent swaps need a manifest/table format (that's the problem
    * transaction logs solve, see the `_spark_metadata` guard below). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              parallelism: Int = 8): Seq[PartitionCompaction] = {
    require(targetBytes > 0 && parallelism > 0,
      s"compact: need targetBytes > 0 and parallelism > 0, got $targetBytes/$parallelism")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a streaming parquet sink's _spark_metadata log is the source of truth
    // for batch readers of that directory — renaming its files would leave
    // the log pointing at deleted paths and silently corrupt every read.
    // (This composition gap is why table formats with transaction logs
    // exist; for a plain-parquet streaming index, stop the stream and
    // rewrite WITHOUT the log, or re-ingest.)
    require(!fs.exists(new org.apache.hadoop.fs.Path(root, "_spark_metadata")),
      s"compact: $path is a streaming-sink output (_spark_metadata present) — " +
        "compacting under the metadata log would desync batch readers")
    val affected = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .flatMap { p =>
        val files = fs.listStatus(p.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))
        val bytes = files.map(_.getLen).sum
        val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        if (files.length <= nOut) None
        else Some((p.getPath, files.length, bytes, nOut))
      }
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, math.max(1, affected.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val done = Future.sequence(affected.map { case (part, nBefore, bytes, nOut) =>
        Future {
          val staged = new org.apache.hadoop.fs.Path(
            part.getParent, "." + part.getName + ".compact-staging")
          val old = new org.apache.hadoop.fs.Path(
            part.getParent, "." + part.getName + ".compact-old")
          fs.delete(staged, true); fs.delete(old, true)
          spark.read.parquet(part.toString).coalesce(nOut)
            .write.mode(SaveMode.Overwrite).parquet(staged.toString)
          // two-step swap with explicit recovery: after a FIRST-rename
          // failure the partition is untouched; after a SECOND-rename
          // failure the data would be parked in the hidden old dir (which
          // readers skip), so roll the original back into place and say
          // exactly where everything is. A CRASH between the renames
          // leaves the same parked state — recover by manually renaming
          // `.<part>.compact-old` back to `<part>`.
          require(fs.rename(part, old),
            s"compact: rename $part -> $old failed; partition untouched, " +
              s"compacted output remains at $staged")
          if (!fs.rename(staged, part)) {
            val rolledBack = fs.rename(old, part)
            throw new IllegalStateException(
              if (rolledBack)
                s"compact: swap-in of $staged failed for $part; original " +
                  s"data ROLLED BACK in place, compacted output left at $staged"
              else
                s"compact: swap-in of $staged failed for $part AND rollback " +
                  s"failed — original data is parked at $old (hidden from " +
                  s"readers); recover by renaming it back to $part")
          }
          fs.delete(old, true)
          PartitionCompaction(part.getName, nBefore, bytes, nOut)
        }
      })
      Await.result(done, Duration.Inf).sortBy(_.partition)
    } finally pool.shutdown()
  }

  // ------------------------------------------------- manifest-pinned store
  //
  // The "properly" answer to compaction-vs-readers: a tiny file manifest
  // the readers pin, so maintenance and queries never race on directory
  // listings (the same idea transaction-log table formats scale up).
  // Protocol: appends are followed by writeManifest; readers use
  // readPinned (atomic snapshot); compactInPlace never touches live files
  // — it moves compacted files IN and swaps the manifest as its single
  // commit point; vacuum reclaims unmanifested bytes after a grace window
  // longer than the longest running query.

  private val ManifestName = "_graft_manifest.json" // legacy unversioned name
  private val ManifestVersioned = """^_graft_manifest\.v(\d+)\.json$""".r

  private def manifestVersionPath(root: org.apache.hadoop.fs.Path, v: Long) =
    new org.apache.hadoop.fs.Path(root, s"_graft_manifest.v$v.json")

  /** All committed manifest versions under the store, ascending. A legacy
    * unversioned `_graft_manifest.json` reads as version 0. */
  private def manifestVersions(fs: org.apache.hadoop.fs.FileSystem,
                               root: org.apache.hadoop.fs.Path): Seq[Long] = {
    if (!fs.exists(root)) return Seq.empty // fresh store: no versions yet
    val versioned = fs.listStatus(root).toSeq.filter(_.isFile)
      .map(_.getPath.getName)
      .collect { case ManifestVersioned(v) => v.toLong }
    val legacy = if (fs.exists(new org.apache.hadoop.fs.Path(root, ManifestName)))
      Seq(0L) else Seq.empty
    (legacy ++ versioned).distinct.sorted
  }

  private def manifestPath(fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path, v: Long) =
    if (v == 0L && !fs.exists(manifestVersionPath(root, 0L)))
      new org.apache.hadoop.fs.Path(root, ManifestName)
    else manifestVersionPath(root, v)

  /** Visible data files, as `partitionDir/fileName` relative paths.
    * Hidden (dot-prefixed) directories — maintenance staging and the
    * legacy compactor's `.<part>.compact-old` recovery parking — are NOT
    * data, however partition-like their names look: listing them would
    * let [[writeManifest]] adopt crash debris and [[vacuum]] delete the
    * very files [[readRetrying]]'s recovery message points at. */
  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                            root: org.apache.hadoop.fs.Path): Seq[String] = {
    val listing = fs.listStatus(root).toSeq
    val partitioned = listing
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".")
        && s.getPath.getName.contains("="))
      .flatMap { p =>
        fs.listStatus(p.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))
          .map(f => p.getPath.getName + "/" + f.getPath.getName)
      }
    // FLAT stores ([[createTable]] of a result with no timestamp column)
    // keep their data files at the root — manifests (`_graft_manifest*`),
    // markers (`_SUCCESS`) and locks/staging (dot-prefixed) are excluded
    // by the same prefix rules the partition listing uses
    val flat = listing
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
        && !f.getPath.getName.startsWith("."))
      .map(_.getPath.getName)
    (partitioned ++ flat).sorted
  }

  /** Files that only a MAINTENANCE commit may introduce to the manifest:
    * [[compactInPlace]]/[[clusterInPlace]] move their outputs into the
    * live dirs under these names BEFORE their manifest swap, so a
    * concurrent (or later) [[writeManifest]] listing must not adopt ones
    * the manifest does not already contain — they are either mid-flight
    * (their commit is coming) or crash debris (vacuum's to reclaim).
    * Without this rule, a crashed compaction's moved-in files would be
    * double-counted next to the originals they never replaced. */
  private val MaintenanceFile = """(?:compact|zorder|merge|delete|ingest|ctas)-\d+-.*""".r

  /** Serialize manifest commits: an exclusive-create lock file arbitrates,
    * because a plain rename-to-destination OVERWRITES on local/POSIX
    * filesystems — two racing committers would both "succeed" at the same
    * version and one commit would be silently lost. Under the lock the
    * committer recomputes the next version from a fresh listing, so the
    * lost-update window is closed on any filesystem whose exclusive
    * create is atomic (HDFS, object stores with preconditions; local FS
    * to within `File#createNewFile` semantics). A crash while holding the
    * lock blocks later commits LOUDLY — the error names the lock and its
    * age so an operator can remove a stale one. */
  private def withCommitLock[A](fs: org.apache.hadoop.fs.FileSystem,
                                root: org.apache.hadoop.fs.Path)(body: => A): A = {
    val lock = new org.apache.hadoop.fs.Path(root, ".manifest.lock")
    // Local scheme: Hadoop's LocalFileSystem.create(overwrite = false) is
    // an exists-CHECK followed by a create — NOT atomic. Two same-machine
    // committers could both claim the lock and silently collide on one
    // version (caught by the threaded race spec, round 10). POSIX
    // O_CREAT|O_EXCL via File#createNewFile IS atomic; HDFS's create(…,
    // false) is atomic server-side, so the FS call stays for remote
    // schemes.
    val claimed =
      if (fs.getScheme == "file")
        try new java.io.File(fs.makeQualified(lock).toUri.getPath).createNewFile()
        catch { case _: java.io.IOException => false }
      else
        try { fs.create(lock, false).close(); true }
        catch { case _: java.io.IOException => false }
    if (!claimed) {
      val age =
        try System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
        catch { case _: java.io.IOException => -1L }
      throw new IllegalStateException(
        s"manifest commit lock $lock is held (age ${age}ms) — a concurrent " +
          "committer is mid-commit; retry after it finishes, or delete the " +
          "lock file if its holder crashed")
    }
    try body finally { fs.delete(lock, false); () }
  }

  /** Commit `files` as the NEXT manifest version, under [[withCommitLock]].
    * Manifest files are immutable once committed (write-tmp +
    * rename-to-fresh-name, version chosen inside the lock — never an
    * overwrite), which is what makes old versions time-travelable and the
    * commit race-free. Returns the committed version. */
  private def writeManifestFile(fs: org.apache.hadoop.fs.FileSystem,
                                root: org.apache.hadoop.fs.Path,
                                files: Seq[String]): Long =
    withCommitLock(fs, root) { commitLocked(fs, root, files) }

  /** The commit body — caller MUST hold the commit lock. `txn` records an
    * application transaction id INSIDE the commit (Delta's txn action):
    * the id becomes durable in exactly the same atomic rename that makes
    * the files visible, which is what gives [[appendCommitted]] its
    * exactly-once restart contract — there is no window where one is
    * committed without the other. */
  private def commitLocked(fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path,
                           files: Seq[String],
                           txn: Option[(String, Long)] = None): Long = {
    val next = manifestVersions(fs, root).lastOption.getOrElse(-1L) + 1L
    // per-attempt unique tmp name: even a misbehaving double-claimed lock
    // (a broken FS) can then at worst fail a rename loudly, never have two
    // writers interleave bytes into ONE tmp file
    val tmp = new org.apache.hadoop.fs.Path(root,
      s".manifest-v$next-${Thread.currentThread().getId}-${System.nanoTime()}.tmp")
    val txnPart = txn.map { case (app, b) =>
      s"""\"txn\": {\"app\": \"${jsonEscape(app)}\", \"batch\": $b}, """
    }.getOrElse("")
    val out = fs.create(tmp, true)
    try out.write(files.sorted
      .map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString(s"{$txnPart\"files\": [", ",\n", "]}")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, manifestVersionPath(root, next)),
      s"writeManifest: could not commit manifest v$next under $root " +
        "(a concurrent writer took the version?) — retry the commit")
    next
  }

  private def readManifestText(fs: org.apache.hadoop.fs.FileSystem,
                               root: org.apache.hadoop.fs.Path,
                               version: Long): String = {
    val versions = manifestVersions(fs, root)
    require(versions.nonEmpty,
      s"no manifest under $root — this store is not manifested; " +
        "call writeManifest after appends to adopt the pinned-read protocol")
    val v = if (version < 0) versions.last else version
    require(versions.contains(v),
      s"manifest v$version does not exist under $root (have: " +
        s"${versions.mkString(", ")}) — vacuumed past retention or never committed")
    val p = manifestPath(fs, root, v)
    val in = fs.open(p)
    try new String(
      org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
  }

  private def readManifestFile(fs: org.apache.hadoop.fs.FileSystem,
                               root: org.apache.hadoop.fs.Path,
                               version: Long = -1L): Seq[String] = {
    val txt = readManifestText(fs, root, version)
    // parse only the files ARRAY — a txn header carries its own quoted
    // strings that must never read as file names
    val fi = txt.indexOf("\"files\"")
    val body = if (fi >= 0) txt.substring(fi) else txt
    """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(body).map(_.group(1)
      .replace("\\\"", "\"").replace("\\\\", "\\")).toSeq.filter(_ != "files")
  }

  private val TxnHeader =
    """"txn": \{"app": "((?:[^"\\]|\\.)*)", "batch": (-?\d+)\}""".r

  /** The last transaction id `app` committed into this store, scanning
    * manifest versions newest-first (bounded by [[vacuum]] retention —
    * keep at least one version between ingest checkpoints, which any sane
    * retention does: the latest ingest commit is by definition recent).
    * None = no retained commit carries this app's txn. */
  def lastTxn(spark: SparkSession, path: String, app: String): Option[Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    manifestVersions(fs, root).reverseIterator.map { v =>
      TxnHeader.findFirstMatchIn(readManifestText(fs, root, v))
        .filter(m => jsonUnescape(m.group(1)) == app).map(_.group(2).toLong)
    }.collectFirst { case Some(b) => b }
  }

  /** Transactionally-committed append (the exactly-once ingest primitive):
    * write `batch` date-partitioned to hidden staging, move the files in
    * under `ingest-{gen}-*` maintenance names, and commit them PLUS the
    * `(app, batchId)` txn id as ONE manifest version. Every crash window
    * is safe: before/mid-move leaves only unmanifested maintenance-named
    * files ([[writeManifest]] never adopts those; [[vacuum]] reclaims),
    * and after the commit a replay of the same batch sees its id via
    * [[lastTxn]] and skips — so a batch lands EXACTLY once no matter where
    * the writer dies, without leaning on the caller's checkpoint. */
  def appendCommitted(batch: DataFrame, path: String, app: String,
                      batchId: Long, tsCol: String = "ts"): Seq[String] = {
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gen = nextGen()
    val staged = new org.apache.hadoop.fs.Path(root, s".ingest-staging-$gen")
    fs.delete(staged, true)
    batch.withColumn("event_date", to_date(col(tsCol)))
      .write.partitionBy("event_date").mode(SaveMode.Overwrite)
      .parquet(staged.toString)
    val moved = moveStagedIn(fs, root, staged, "ingest", gen)
    fs.delete(staged, true)
    // an empty batch moves nothing: commit nothing (a txn-only version
    // would burn a retention slot per idle tick — the round-8 lesson);
    // replaying an empty batch is a no-op anyway
    if (moved.nonEmpty) withCommitLock(fs, root) {
      val current = manifestVersions(fs, root).lastOption
        .map(v => readManifestFile(fs, root, v)).getOrElse(Seq.empty)
      commitLocked(fs, root, current ++ moved, Some((app, batchId)))
    }
    moved
  }

  /** CTAS commit — materialize `df` as a NEW manifested store at `path`
    * (the write half of the SQL front door's `create table … as`; the
    * reference's third command is the insert face, lib.rs:846-856).
    *
    * Layout: date-partitioned on `tsCol` when the result carries it as a
    * timestamp (full store parity — partition pruning, compaction,
    * z-order, time travel all apply), FLAT otherwise (arbitrary result
    * schemas: a grouped aggregate or a documents slice has no event
    * time; flat stores still get manifest-pinned reads, writeManifest
    * refresh, time travel, and vacuum — partition-level maintenance is
    * date-store-only by construction).
    *
    * Protocol is [[appendCommitted]]'s: write to hidden staging, move the
    * files in under `ctas-{gen}-*` maintenance names, commit them as
    * manifest v0. Every crash window leaves only unmanifested debris
    * ([[vacuum]]'s to reclaim, [[writeManifest]] never adopts maintenance
    * names) — never a half-visible table.
    *
    * Collisions are LOUD: an existing manifest, data files, or non-empty
    * directory at `path` fails the call — CTAS creates, it never
    * overwrites or merges ([[reset]] first, or [[appendCommitted]] to
    * grow an existing store). Returns the committed relative paths. */
  def createTable(df: DataFrame, path: String, tsCol: String = "ts"): Seq[String] = {
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) {
      require(manifestVersions(fs, root).isEmpty,
        s"createTable: $path is already a manifested store — reset it " +
          "first, or appendCommitted into it")
      require(listDataFiles(fs, root).isEmpty && !fs.listStatus(root)
          .exists(s => s.isFile && s.getPath.getName == "_SUCCESS"),
        s"createTable: $path already holds data files — CTAS never " +
          "overwrites; reset the path or pick another name")
    }
    val partitioned = df.schema.fields.exists(f =>
      f.name == tsCol && f.dataType.typeName == "timestamp")
    val gen = nextGen()
    val staged = new org.apache.hadoop.fs.Path(root, s".ctas-staging-$gen")
    fs.delete(staged, true)
    if (partitioned)
      df.withColumn("event_date", to_date(col(tsCol)))
        .write.partitionBy("event_date").mode(SaveMode.Overwrite)
        .parquet(staged.toString)
    else df.write.mode(SaveMode.Overwrite).parquet(staged.toString)
    val moved =
      if (partitioned) moveStagedIn(fs, root, staged, "ctas", gen)
      else fs.listStatus(staged).toSeq
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.startsWith("."))
        .map { f =>
          val name = s"ctas-$gen-${f.getPath.getName}"
          require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(root, name)),
            s"createTable: moving ${f.getPath} into $root failed")
          name
        }
    fs.delete(staged, true)
    require(moved.nonEmpty,
      s"createTable: the statement produced no data files for $path — an " +
        "empty table has no schema to pin; gate less or skip the CTAS")
    withCommitLock(fs, root) {
      require(manifestVersions(fs, root).isEmpty,
        s"createTable: $path gained a manifest mid-create (concurrent " +
          "creator?) — the moved files are unmanifested debris for vacuum")
      commitLocked(fs, root, moved)
    }
    moved
  }

  /** INSERT commit — append `df` to an EXISTING manifested store (the
    * companion of [[createTable]]; together they are the SQL front door's
    * write faces, `create table … as` / `insert into`). The target's
    * layout is read from its manifest (partitioned paths contain '/'),
    * and `df` must match the stored schema exactly — positionally, by
    * name AND type, minus the partition column a date store derives —
    * because a silent coercion or column shuffle here would corrupt the
    * table for every later reader. Same staged-move + manifest protocol
    * as [[appendCommitted]] (minus the txn id — SQL INSERT carries no
    * replay identity; exactly-once ingest stays the API's contract):
    * crash windows leave only unmanifested debris, and the commit is one
    * atomic manifest version on top of the current files. Returns the
    * committed relative paths. */
  def insertInto(df: DataFrame, path: String, tsCol: String = "ts"): Seq[String] = {
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(manifestVersions(fs, root).nonEmpty,
      s"insertInto: $path is not a manifested store — create table first " +
        "(or append + writeManifest)")
    val partitioned = readManifestFile(fs, root).head.contains("/")
    val stored = readPinned(spark, path).schema
    val want =
      if (partitioned) stored.fields.toSeq.filter(_.name != "event_date")
      else stored.fields.toSeq
    val got = df.schema.fields.toSeq
    def sig(fs0: Seq[org.apache.spark.sql.types.StructField]) =
      fs0.map(f => s"${f.name} ${f.dataType.simpleString}").mkString(", ")
    require(got.map(f => (f.name, f.dataType)) == want.map(f => (f.name, f.dataType)),
      s"insertInto: statement schema (${sig(got)}) does not match the " +
        s"stored table (${sig(want)}) — INSERT never coerces or reorders; " +
        "alias/cast the statement to the table's exact shape")
    if (partitioned) require(
      df.schema.fields.exists(f => f.name == tsCol && f.dataType.typeName == "timestamp"),
      s"insertInto: $path is date-partitioned but the statement result " +
        s"has no timestamp '$tsCol' to derive partitions from")
    val gen = nextGen()
    val staged = new org.apache.hadoop.fs.Path(root, s".ctas-staging-$gen")
    fs.delete(staged, true)
    if (partitioned)
      df.withColumn("event_date", to_date(col(tsCol)))
        .write.partitionBy("event_date").mode(SaveMode.Overwrite)
        .parquet(staged.toString)
    else df.write.mode(SaveMode.Overwrite).parquet(staged.toString)
    val moved =
      if (partitioned) moveStagedIn(fs, root, staged, "ctas", gen)
      else fs.listStatus(staged).toSeq
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.startsWith("."))
        .map { f =>
          val name = s"ctas-$gen-${f.getPath.getName}"
          require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(root, name)),
            s"insertInto: moving ${f.getPath} into $root failed")
          name
        }
    fs.delete(staged, true)
    // an empty statement inserts nothing: no version burned (the
    // appendCommitted rule), the table is simply unchanged
    if (moved.nonEmpty) withCommitLock(fs, root) {
      val current = manifestVersions(fs, root).lastOption
        .map(v => readManifestFile(fs, root, v)).getOrElse(Seq.empty)
      commitLocked(fs, root, current ++ moved)
    }
    moved
  }

  /** Name → manifest-pinned frame for every store under a warehouse
    * directory — the read half of the SQL front door's warehouse story:
    * `runCatalog(EventStore.warehouseCatalog(spark, wh) ++ extras, sql)`
    * lets a statement SELECT from any table a previous `create table` /
    * `insert into` committed, by name. Only manifested stores list
    * (half-created debris and foreign dirs are invisible, matching the
    * write faces' crash contract); `pin` overrides individual tables to
    * a historical manifest version (time travel at the catalog level).
    * The frames are lazy plans — building the catalog reads manifests,
    * never data. */
  def warehouseCatalog(spark: SparkSession, warehouseDir: String,
                       pin: Map[String, Long] = Map.empty)
      : Map[String, DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(warehouseDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Map.empty
    val names = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith(".")
        && !st.getPath.getName.startsWith("_"))
      .map(_.getPath.getName)
      .filter(n => manifestVersions(fs,
        new org.apache.hadoop.fs.Path(root, n)).nonEmpty)
    val unknown = pin.keySet -- names.toSet
    require(unknown.isEmpty,
      s"warehouseCatalog: pinned tables not in the warehouse: " +
        s"${unknown.mkString(", ")} (have: ${names.sorted.mkString(", ")})")
    names.map { n =>
      n -> readPinned(spark, warehouseDir.stripSuffix("/") + "/" + n,
        pin.getOrElse(n, -1L))
    }.toMap
  }

  /** Adopt (or refresh) the manifest: snapshot the CURRENT visible data
    * files as the store's committed set, as a NEW immutable manifest
    * version. Run after every append batch; anything not in the manifest
    * is invisible to [[readPinned]] and fair game for [[vacuum]]. Files
    * with [[MaintenanceFile]] names that the current manifest does not
    * already list are skipped — they belong to a maintenance commit
    * (mid-flight or crashed), never to append adoption. Returns the
    * number of committed files. */
  def writeManifest(spark: SparkSession, path: String): Int = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    withCommitLock(fs, root) {
      val current = manifestVersions(fs, root).lastOption
        .map(v => readManifestFile(fs, root, v).toSet).getOrElse(Set.empty[String])
      val files = listDataFiles(fs, root).filter { f =>
        current(f) || !MaintenanceFile.pattern
          .matcher(f.substring(f.indexOf('/') + 1)).matches()
      }
      require(files.nonEmpty, s"writeManifest: no data files under $path")
      commitLocked(fs, root, files)
      files.size
    }
  }

  /** The store's current (highest) manifest version — every commit
    * ([[writeManifest]], [[compactInPlace]], [[clusterInPlace]]) bumps it.
    * Pass an old version to [[readPinned]] to time-travel. */
  def manifestVersion(spark: SparkSession, path: String): Long = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = manifestVersions(fs, root)
    require(versions.nonEmpty, s"manifestVersion: no manifest under $path")
    versions.last
  }

  /** Manifest-pinned read: the plan binds to the manifest's exact file
    * set, atomically snapshotted at call time — a concurrent
    * [[compactInPlace]] (which only ADDS files and commits a new manifest
    * version) can neither hide a partition from this reader nor
    * double-count into it, the two failure modes a listing read has.
    * Partition columns still come from the directory names (`basePath`).
    *
    * `version` time-travels: every commit is an immutable snapshot, so
    * `readPinned(s, path, v)` reproduces exactly the store a version-`v`
    * reader saw — for as long as [[vacuum]]'s retention keeps that
    * version's files (the Delta/Iceberg time-travel contract). Default −1
    * = latest.
    *
    * `mergeSchema` is the SCHEMA-EVOLUTION read: a late batch may append
    * files carrying new columns without rewriting history (absence at the
    * parquet footer is the cheapest possible "null for old rows"), and the
    * merged read unifies every footer's schema — old files' missing
    * columns surface as nulls. Off by default: the single-footer read
    * skips the footer sweep and is the right call for a settled schema. */
  def readPinned(spark: SparkSession, path: String, version: Long = -1L,
                 mergeSchema: Boolean = false): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = readManifestFile(fs, root, version)
    require(files.nonEmpty, s"readPinned: empty manifest under $path")
    spark.read.option("basePath", path)
      .option("mergeSchema", mergeSchema)
      .parquet(files.map(f => path + "/" + f): _*)
  }

  /** Manifested compaction — same sizing policy as [[compact]], different
    * commitment protocol: compacted files are written to hidden staging,
    * MOVED INTO the live partition dirs under fresh names (no live file or
    * directory is ever renamed away), and the manifest swap is the single
    * atomic commit point. Readers pinned to the old manifest keep reading
    * the old files (still present); readers pinning after the swap see
    * exactly the compacted set; a crash before the swap leaves only
    * unmanifested garbage for [[vacuum]]. Old files are NOT deleted here —
    * run vacuum after a grace window longer than the longest query. */
  def compactInPlace(spark: SparkSession, path: String,
                     targetBytes: Long = 128L * 1024 * 1024,
                     parallelism: Int = 8): Seq[PartitionCompaction] = {
    require(targetBytes > 0 && parallelism > 0,
      s"compactInPlace: need targetBytes > 0 and parallelism > 0, got $targetBytes/$parallelism")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(root, "_spark_metadata")),
      s"compactInPlace: $path is a streaming-sink output — compact would " +
        "desync the metadata log's readers")
    val manifest = readManifestFile(fs, root)
    val byPart = manifest.groupBy(_.takeWhile(_ != '/'))
    val gen = nextGen()
    val affected = byPart.toSeq.sortBy(_._1).flatMap { case (part, rel) =>
      val partPath = new org.apache.hadoop.fs.Path(root, part)
      val files = rel.map(r => new org.apache.hadoop.fs.Path(root, r))
        .filter(fs.exists(_))
      val bytes = files.map(fs.getFileStatus(_).getLen).sum
      val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (files.length <= nOut) None
      else Some((part, partPath, files, bytes, nOut))
    }
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, math.max(1, affected.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val done = Future.sequence(affected.map { case (part, partPath, files, bytes, nOut) =>
        Future {
          // gen-suffixed: a concurrent compactor must never share (and
          // then clean up) another run's staging dir — the nextGen() rule
          val staged = new org.apache.hadoop.fs.Path(root,
            "." + part + s".compact-staging-$gen")
          fs.delete(staged, true)
          spark.read.parquet(files.map(_.toString): _*).coalesce(nOut)
            .write.mode(SaveMode.Overwrite).parquet(staged.toString)
          val movedIn = fs.listStatus(staged)
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
              && !f.getPath.getName.startsWith("."))
            .map { f =>
              val name = s"compact-$gen-${f.getPath.getName}"
              require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(partPath, name)),
                s"compactInPlace: moving ${f.getPath} into $partPath failed")
              part + "/" + name
            }.toSeq
          fs.delete(staged, true)
          (part, files.map(f => part + "/" + f.getName), movedIn,
            PartitionCompaction(part, files.length, bytes, movedIn.size))
        }
      })
      val results = Await.result(done, Duration.Inf)
      val replaced = results.flatMap(_._2).toSet
      val added = results.flatMap(_._3)
      // the ONE commit point — an OPTIMISTIC rebase under the commit
      // lock: the swap applies (remove replaced, add compacted) to the
      // manifest AS OF COMMIT TIME, not as of the read above, so files a
      // concurrent append committed mid-compaction survive the swap. If
      // a file this compaction replaced has itself vanished from the
      // manifest, a conflicting maintenance ran — fail loudly, leaving
      // the compacted output as unmanifested garbage for vacuum.
      withCommitLock(fs, root) {
        val current = readManifestFile(fs, root)
        val vanished = replaced -- current.toSet
        require(vanished.isEmpty,
          s"compactInPlace: files replaced by this compaction left the " +
            s"manifest mid-run (concurrent maintenance?): " +
            s"${vanished.take(3).mkString(", ")} — re-run against the new snapshot")
        commitLocked(fs, root, current.filterNot(replaced) ++ added)
      }
      results.map(_._4).sortBy(_.partition)
    } finally pool.shutdown()
  }

  /** The manifest's file set as absolute paths — the input an audit tool
    * ([[ZOrder.rowGroupStats]]) or an external engine pins. Default −1 =
    * latest version. */
  def manifestFiles(spark: SparkSession, path: String, version: Long = -1L): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readManifestFile(fs, root, version).map(f => path + "/" + f)
  }

  // ------------------------------------------------ stats-carrying manifest
  //
  // File-level min/max stats pinned NEXT TO a manifest version: the same
  // idea table formats keep in their metadata layer. With them a reader
  // prunes whole files at PLANNING time — fewer tasks scheduled, no
  // footer even opened on the pruned files — one level above the
  // row-group pruning the parquet reader does at read time. The payoff
  // multiplies with [[clusterInPlace]]: z-ordered files have tight
  // per-file ranges on the clustering columns, so a selective filter
  // keeps a small fraction of the file list.

  private def statsPath(root: org.apache.hadoop.fs.Path, v: Long) =
    new org.apache.hadoop.fs.Path(root, s"_graft_manifest.v$v.stats.jsonl")

  private def jsonEscape(s: String) =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  private def jsonUnescape(s: String) =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Pin per-file min/max stats against a manifest version (default:
    * latest): `columns` integral (c8 — a timestamp's footer stats are in
    * micros/nanos and belong to the date-partition pruning path, not
    * this one), `stringColumns` truncated-ASCII (c8b), `doubleColumns`
    * float/double under the pinned IEEE-comparison contract (c8c,
    * [[ZOrder.fileDoubleStats]]). One footer read per file, driver-side
    * like the manifest itself; at 100 TB the same reads run as a job over
    * the file list. The sidecar is immutable and version-tied — a
    * [[compactInPlace]]/[[clusterInPlace]] commit makes a NEW version, so
    * stale stats can never be consulted for it. Returns the number of
    * (file, column) entries pinned. */
  def writeFileStats(spark: SparkSession, path: String, columns: Seq[String],
                     stringColumns: Seq[String] = Nil,
                     doubleColumns: Seq[String] = Nil, truncateTo: Int = 16,
                     version: Long = -1L): Int = {
    require(columns.nonEmpty || stringColumns.nonEmpty || doubleColumns.nonEmpty,
      "writeFileStats: no columns")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = if (version < 0) {
      val vs = manifestVersions(fs, root)
      require(vs.nonEmpty, s"writeFileStats: no manifest under $path")
      vs.last
    } else version
    val rel = readManifestFile(fs, root, v)
    val lines = columns.flatMap { c =>
      ZOrder.fileColumnStats(spark, rel.map(f => path + "/" + f), c)
        .zip(rel).collect { case ((_, Some((mn, mx))), r) =>
          s"""{"f":"${jsonEscape(r)}","c":"${jsonEscape(c)}","mn":$mn,"mx":$mx}"""
        }
    } ++ stringColumns.flatMap { c =>
      // c8b: Iceberg-style truncated string bounds — lower truncates
      // plainly, upper increments at the cut (ZOrder.truncatedStringBounds)
      ZOrder.fileStringStats(spark, rel.map(f => path + "/" + f), c, truncateTo)
        .zip(rel).collect { case ((_, Some((mn, mx))), r) =>
          s"""{"f":"${jsonEscape(r)}","c":"${jsonEscape(c)}",""" +
            s""""smn":"${jsonEscape(mn)}","smx":"${jsonEscape(mx)}"}"""
        }
    } ++ doubleColumns.flatMap { c =>
      // c8c: float/double bounds — ZOrder.fileDoubleStats pins the
      // IEEE-vs-total-order contract; Double.toString round-trips
      // exactly and is valid JSON for the (guaranteed finite) bounds
      ZOrder.fileDoubleStats(spark, rel.map(f => path + "/" + f), c)
        .zip(rel).collect { case ((_, Some((mn, mx))), r) =>
          s"""{"f":"${jsonEscape(r)}","c":"${jsonEscape(c)}","dmn":$mn,"dmx":$mx}"""
        }
    }
    val tmp = new org.apache.hadoop.fs.Path(root, s".stats-v$v.tmp")
    val out = fs.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, statsPath(root, v)),
      s"writeFileStats: could not commit stats for manifest v$v under $path")
    lines.size
  }

  private val StatsLine =
    """\{"f":"((?:[^"\\]|\\.)*)","c":"((?:[^"\\]|\\.)*)","mn":(-?\d+),"mx":(-?\d+)\}""".r

  private val StrStatsLine =
    ("""\{"f":"((?:[^"\\]|\\.)*)","c":"((?:[^"\\]|\\.)*)",""" +
      """"smn":"((?:[^"\\]|\\.)*)","smx":"((?:[^"\\]|\\.)*)"\}""").r

  private val DblStatsLine =
    """\{"f":"((?:[^"\\]|\\.)*)","c":"((?:[^"\\]|\\.)*)","dmn":([-+0-9.eE]+),"dmx":([-+0-9.eE]+)\}""".r

  /** String-stats-pruned pinned read (c8b): bind the plan to ONLY the
    * manifest files whose pinned truncated bounds on string `column`
    * intersect `[lo, hi]` (equality = `lo == hi`), then apply the row
    * filter. Truncated bounds are conservative by construction
    * ([[ZOrder.truncatedStringBounds]]: lower ≤ true min, upper ≥ true
    * max), and files without pinned bounds are kept, so results equal
    * `readPinned(...).filter(column between lo and hi)` exactly. ASCII
    * bounds only (enforced at pin time) — the driver's Java-String compare
    * and Spark's UTF-8 binary compare agree there. */
  def readPinnedWhereString(spark: SparkSession, path: String, column: String,
                            lo: String, hi: String, version: Long = -1L): DataFrame = {
    require(lo <= hi, s"readPinnedWhereString: empty range ['$lo', '$hi']")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = if (version < 0) {
      val vs = manifestVersions(fs, root)
      require(vs.nonEmpty, s"readPinnedWhereString: no manifest under $path")
      vs.last
    } else version
    val sp = statsPath(root, v)
    require(fs.exists(sp),
      s"readPinnedWhereString: no stats sidecar for manifest v$v under $path — " +
        s"run writeFileStats(..., stringColumns = Seq(\"$column\")) after the commit")
    val in = fs.open(sp)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val bounds = txt.linesIterator.collect {
      case StrStatsLine(f, c, mn, mx) if jsonUnescape(c) == column =>
        jsonUnescape(f) -> (jsonUnescape(mn), jsonUnescape(mx))
    }.toMap
    val files = readManifestFile(fs, root, v)
    val kept = files.filter(f => bounds.get(f) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None           => true // unknown bounds — must admit
    })
    val bind = if (kept.nonEmpty) kept else files.take(1)
    val df = spark.read.option("basePath", path)
      .parquet(bind.map(f => path + "/" + f): _*)
    require(df.schema(column).dataType ==
        org.apache.spark.sql.types.StringType,
      s"readPinnedWhereString: '$column' must be a string column, got " +
        df.schema(column).dataType)
    val filtered = df.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
    if (kept.nonEmpty) filtered else filtered.limit(0)
  }

  /** Double-stats-pruned pinned read (c8c): bind the plan to ONLY the
    * manifest files whose pinned float/double bounds on `column`
    * intersect `[lo, hi]`, then apply the row filter. The comparison
    * contract is [[ZOrder.fileDoubleStats]]'s: PRIMITIVE IEEE `<=`/`>=`
    * on both sides of the prune — never total order — matching exactly
    * how Spark and DuckDB evaluate the row filter (-0.0 == 0.0; NaN rows
    * fail any finite range in both engines, and NaN-poisoned or
    * unstatted files are always admitted). Finite bounds only: a NaN or
    * infinite query bound has no prunable meaning and fails loudly. */
  def readPinnedWhereDouble(spark: SparkSession, path: String, column: String,
                            lo: Double, hi: Double, version: Long = -1L)
      : DataFrame = {
    require(java.lang.Double.isFinite(lo) && java.lang.Double.isFinite(hi)
        && lo <= hi,
      s"readPinnedWhereDouble: bounds must be finite with lo <= hi, " +
        s"got [$lo, $hi]")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = if (version < 0) {
      val vs = manifestVersions(fs, root)
      require(vs.nonEmpty, s"readPinnedWhereDouble: no manifest under $path")
      vs.last
    } else version
    val sp = statsPath(root, v)
    require(fs.exists(sp),
      s"readPinnedWhereDouble: no stats sidecar for manifest v$v under $path — " +
        s"run writeFileStats(..., doubleColumns = Seq(\"$column\")) after the commit")
    val in = fs.open(sp)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val bounds = txt.linesIterator.collect {
      case DblStatsLine(f, c, mn, mx) if jsonUnescape(c) == column =>
        jsonUnescape(f) -> ((mn.toDouble, mx.toDouble))
    }.toMap
    val files = readManifestFile(fs, root, v)
    val kept = files.filter(f => bounds.get(f) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi // primitive IEEE compare
      case None           => true // unknown bounds — must admit
    })
    val bind = if (kept.nonEmpty) kept else files.take(1)
    val df = spark.read.option("basePath", path)
      .parquet(bind.map(f => path + "/" + f): _*)
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.DoubleType, org.apache.spark.sql.types.FloatType)
        .contains(df.schema(column).dataType),
      s"readPinnedWhereDouble: '$column' must be float/double, got " +
        df.schema(column).dataType)
    val filtered = df.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
    if (kept.nonEmpty) filtered else filtered.limit(0)
  }

  private def keysPath(root: org.apache.hadoop.fs.Path, v: Long) =
    new org.apache.hadoop.fs.Path(root, s"_graft_manifest.v$v.keys.jsonl")

  /** splitmix64 finalizer — the membership sidecar's base hash (public
    * constant-multiplier avalanche mix; deterministic across JVMs, unlike
    * `Long.hashCode`'s 32-bit fold). */
  private[graft] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bloom geometry for `n` keys at false-positive rate `p`:
    * m = −n·ln p / ln²2 bits (rounded up to whole bytes),
    * k = (m/n)·ln 2 probes. */
  private[graft] def bloomGeometry(n: Long, p: Double): (Int, Int) = {
    val mRaw = math.ceil(-n * math.log(p) / (math.log(2) * math.log(2))).toLong
    val m = (((mRaw max 64L) + 7L) / 8L * 8L).min(Int.MaxValue.toLong).toInt
    val k = math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)
    (m, k)
  }

  private[graft] def bloomSet(bits: Array[Byte], m: Int, k: Int, key: Long): Unit = {
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x6a09e667f3bcc909L) | 1L
    var i = 0
    while (i < k) {
      val bit = (((h1 + i * h2) % m + m) % m).toInt
      bits(bit >>> 3) = (bits(bit >>> 3) | (1 << (bit & 7))).toByte
      i += 1
    }
  }

  private[graft] def bloomContains(bits: Array[Byte], k: Int, key: Long): Boolean = {
    val m = bits.length * 8
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x6a09e667f3bcc909L) | 1L
    var i = 0
    while (i < k) {
      val bit = (((h1 + i * h2) % m + m) % m).toInt
      if ((bits(bit >>> 3) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Distributed per-file bloom build: a typed Aggregator whose buffer IS
    * the m-bit array — map-side partials OR together, so a file's bloom
    * never funnels its raw keys anywhere (the buffer is m/8 bytes however
    * many keys the file holds). */
  private final class BloomAgg(m: Int, k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](m / 8)
    def reduce(b: Array[Byte], key: Long): Array[Byte] = { bloomSet(b, m, k, key); b }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** Point-lookup membership sidecar: per manifested file, the EXACT
    * distinct-value set of an integral column when the set is
    * ≤ `maxDistinct` values (the degenerate, zero-false-positive end of
    * the bloom-filter spectrum) — and for files ABOVE the cap (c12b), a
    * per-file BLOOM filter at `bloomFpp` instead: a bloom miss proves
    * absence, so pruning on it is exact-result-safe, and a false
    * positive only admits one extra file to the scan. Geometry is shared
    * across the store's large files (sized for the largest;
    * `maxBloomBytes` fails loudly when fpp and cardinality can't
    * coexist). Range stats ([[writeFileStats]]) prune range scans; this
    * prunes POINT lookups, where a file's [min, max] usually straddles
    * every key — the bloom tier extends that to exactly the
    * high-cardinality un-z-ordered files that dominate a 100 TB store.
    * One store scan feeds both tiers (`input_file_name`; collect_set
    * only ever aggregates ≤-cap files, big files OR fixed-size bloom
    * buffers); the sidecar is then STREAMED to disk partition-at-a-time,
    * never collected whole — driver residency is bounded by
    * `driverBudgetBytes`, not by the manifest's file count. Same
    * immutable version-tied commit discipline as the stats sidecar.
    * STRING key columns (c12c) pin xxhash64 hashes in both tiers —
    * constant 8 bytes per key in the sidecar whatever the string length,
    * probed via [[readPinnedPointString]]; a hash collision only admits
    * a file (same safe direction as a bloom false positive), never
    * corrupts a result. Most effective after [[clusterInPlace]] on the
    * key column — z-order makes per-file key sets small and disjoint. */
  def writeFileKeySets(spark: SparkSession, path: String, column: String,
                       maxDistinct: Int = 4096, version: Long = -1L,
                       driverBudgetBytes: Long = 64L << 20,
                       bloomFpp: Double = 0.01,
                       maxBloomBytes: Long = 16L << 20): Int = {
    require(maxDistinct >= 1, s"writeFileKeySets: bad maxDistinct $maxDistinct")
    require(driverBudgetBytes >= 1,
      s"writeFileKeySets: bad driverBudgetBytes $driverBudgetBytes")
    require(bloomFpp > 0.0 && bloomFpp < 1.0,
      s"writeFileKeySets: bloomFpp must be in (0,1), got $bloomFpp")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = if (version < 0) {
      val vs = manifestVersions(fs, root)
      require(vs.nonEmpty, s"writeFileKeySets: no manifest under $path")
      vs.last
    } else version
    val rel = readManifestFile(fs, root, v)
    val abs = rel.map(f => path + "/" + f)
    val df = spark.read.option("basePath", path).parquet(abs: _*)
    // STRING keys (c12c) ride the same two tiers through xxhash64: the
    // sidecar pins 8-byte hashes, never the strings (a doc-id tier would
    // otherwise cost the store's whole key column in sidecar bytes). A
    // hash collision can only FALSELY ADMIT a file — the same
    // conservative direction as a bloom false positive — so point-read
    // results stay exact; only scan width is probabilistic.
    val hashed = df.schema(column).dataType ==
      org.apache.spark.sql.types.StringType
    require(hashed || Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(df.schema(column).dataType),
      s"writeFileKeySets: '$column' must be integral or string, got " +
        df.schema(column).dataType)
    // absolute URI → manifest-relative name: input_file_name() returns a
    // URI whose slash count varies by filesystem — compare by URI *path*,
    // with BOTH sides qualified through the store's Hadoop filesystem
    // (java.io.File only resolves local paths; on HDFS/S3 it would miss
    // every entry and silently commit an empty sidecar)
    val byPath = abs
      .map(a => fs.makeQualified(new org.apache.hadoop.fs.Path(a)).toUri.getPath)
      .zip(rel).toMap
    val keyExpr =
      if (hashed) xxhash64(col(column))
      else col(column).cast(org.apache.spark.sql.types.LongType)
    val pairs = df.where(col(column).isNotNull)
      .select(input_file_name().as("__f"), keyExpr.as("__k"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = pairs.groupBy(col("__f")).agg(count(lit(1)).as("__n"))
      .localCheckpoint() // O(files) rows — same order as the manifest itself
    // split BEFORE any per-file set materializes: collect_set only ever
    // runs on files already known ≤ maxDistinct (a 10M-distinct file must
    // never funnel its keys into one aggregation buffer), and the big
    // files build fixed-size blooms instead (c12b) — admit-on-absent
    // conservative, so a false positive only costs a scanned file, never
    // a wrong result
    val withN = pairs.join(broadcast(counts), "__f")
    val sets = withN.filter(col("__n") <= maxDistinct)
      .groupBy(col("__f"))
      .agg(collect_set(col("__k")).as("__ks"))
    val bigStats = counts.filter(col("__n") > maxDistinct)
      .agg(count(lit(1)), max(col("__n"))).head()
    val nBig = bigStats.getLong(0)
    val maxN = if (bigStats.isNullAt(1)) 0L else bigStats.getLong(1)
    val (bm, bk) = if (nBig > 0) bloomGeometry(maxN, bloomFpp) else (0, 0)
    require(nBig == 0 || bm / 8 <= maxBloomBytes,
      s"writeFileKeySets: a file holds $maxN distinct keys — its " +
        s"${bm / 8}-byte bloom at fpp=$bloomFpp exceeds maxBloomBytes=" +
        s"$maxBloomBytes; raise bloomFpp (coarser pruning) or the byte cap")
    // Driver-memory contract: the sidecar has one row per manifest file,
    // and at 100 TB that dimension is ~10^6 files — an unbounded
    // collect() here would materialize up to files × rowBytes on the
    // driver. Instead the write streams partition-at-a-time
    // (toLocalIterator), with each shuffle sized so the single resident
    // partition's worst case stays under `driverBudgetBytes` regardless
    // of how many files the manifest holds.
    def parts(nRows: Long, rowBytes: Long): Int = {
      val rowsPerPart = math.max(1L, driverBudgetBytes / rowBytes)
      math.max(1, math.min(1 << 16, (nRows + rowsPerPart - 1) / rowsPerPart).toInt)
    }
    val tmp = new org.apache.hadoop.fs.Path(root, s".keys-v$v.tmp")
    val out = fs.create(tmp, true)
    var pinned = 0
    def relOf(r: org.apache.spark.sql.Row): String = {
      val uriPath = new java.net.URI(r.getString(0)).getPath
      byPath.getOrElse(uriPath, sys.error(
        s"writeFileKeySets: scanned file '$uriPath' resolves to no manifest " +
          s"entry of v$v — refusing to commit a short sidecar"))
    }
    def stream(it: java.util.Iterator[org.apache.spark.sql.Row])
              (fmt: org.apache.spark.sql.Row => String): Unit =
      while (it.hasNext) {
        out.write((fmt(it.next()) + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        pinned += 1
      }
    try {
      // hashed (string-key) entries carry distinct field names so an
      // integral reader can never mistake a hash set for raw keys
      val setField = if (hashed) "kh" else "k"
      val bloomFields = if (hashed) ("bkh", "bmh") else ("bk", "bm")
      stream(sets.repartition(parts(rel.size.toLong, maxDistinct.toLong * 16 + 256))
          .toLocalIterator()) { r =>
        val ks = r.getSeq[Long](1).sorted.mkString(",")
        s"""{"f":"${jsonEscape(relOf(r))}","c":"${jsonEscape(column)}","$setField":[$ks]}"""
      }
      if (nBig > 0) {
        val blooms = withN.filter(col("__n") > maxDistinct)
          .groupBy(col("__f"))
          .agg(udaf(new BloomAgg(bm, bk)).apply(col("__k")).as("__bm"))
        stream(blooms.repartition(parts(nBig, bm.toLong / 8 * 2 + 256))
            .toLocalIterator()) { r =>
          val b64 = java.util.Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](1))
          s"""{"f":"${jsonEscape(relOf(r))}","c":"${jsonEscape(column)}",""" +
            s""""${bloomFields._1}":$bk,"${bloomFields._2}":"$b64"}"""
        }
      }
    } finally { out.close(); pairs.unpersist() }
    // idempotent re-pin: content for a version is deterministic, so a
    // pre-existing sidecar may be replaced (local/HDFS rename refuses an
    // existing destination rather than overwriting)
    val dest = keysPath(root, v)
    if (fs.exists(dest)) fs.delete(dest, false)
    require(fs.rename(tmp, dest),
      s"writeFileKeySets: could not commit key sets for manifest v$v under $path")
    pinned
  }

  private val KeysLine =
    """\{"f":"((?:[^"\\]|\\.)*)","c":"((?:[^"\\]|\\.)*)","k":\[([-\d,]*)\]\}""".r

  private val BloomLine =
    """\{"f":"((?:[^"\\]|\\.)*)","c":"((?:[^"\\]|\\.)*)","bk":(\d+),"bm":"([A-Za-z0-9+/=]*)"\}""".r

  private val HKeysLine =
    """\{"f":"((?:[^"\\]|\\.)*)","c":"((?:[^"\\]|\\.)*)","kh":\[([-\d,]*)\]\}""".r

  private val HBloomLine =
    """\{"f":"((?:[^"\\]|\\.)*)","c":"((?:[^"\\]|\\.)*)","bkh":(\d+),"bmh":"([A-Za-z0-9+/=]*)"\}""".r

  /** Membership-pruned point lookup: bind the plan to ONLY the manifest
    * files whose pinned key set contains `key` — exactly for ≤-cap files,
    * bloom-probabilistically for the rest (false positives admit, misses
    * prove absence); files with no pinned entry of either tier are
    * admitted (conservative) — then apply the row filter. Results equal
    * `readPinned(...).filter(column === key)` exactly. */
  def readPinnedPoint(spark: SparkSession, path: String, column: String,
                      key: Long, version: Long = -1L): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = if (version < 0) {
      val vs = manifestVersions(fs, root)
      require(vs.nonEmpty, s"readPinnedPoint: no manifest under $path")
      vs.last
    } else version
    val kp = keysPath(root, v)
    require(fs.exists(kp),
      s"readPinnedPoint: no key-set sidecar for manifest v$v under $path — " +
        s"run writeFileKeySets(..., \"$column\") after the commit")
    val in = fs.open(kp)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val keySets: Map[String, Long => Boolean] = txt.linesIterator.collect {
      case KeysLine(f, c, ks) if jsonUnescape(c) == column =>
        val set = ks.split(',').filter(_.nonEmpty).map(_.toLong).toSet
        jsonUnescape(f) -> ((k: Long) => set.contains(k))
      case BloomLine(f, c, bk, bm) if jsonUnescape(c) == column =>
        val bits = java.util.Base64.getDecoder.decode(bm)
        jsonUnescape(f) -> ((k: Long) => bloomContains(bits, bk.toInt, k))
    }.toMap
    val files = readManifestFile(fs, root, v)
    val kept = files.filter(f => keySets.get(f).forall(_.apply(key)))
    val bind = if (kept.nonEmpty) kept else files.take(1)
    val filtered = spark.read.option("basePath", path)
      .parquet(bind.map(f => path + "/" + f): _*)
      .filter(col(column) === lit(key))
    if (kept.nonEmpty) filtered else filtered.limit(0)
  }

  /** Membership-pruned point lookup on a STRING key column (c12c): the
    * sidecar pinned xxhash64 hashes ([[writeFileKeySets]] on a string
    * column), so both tiers probe with the hashed key — a set/bloom miss
    * proves the string absent (xxhash64 is deterministic), a hit may be a
    * collision and only admits a file to the scan. The row filter is the
    * plain string equality, so results equal
    * `readPinned(...).filter(column === key)` exactly. */
  def readPinnedPointString(spark: SparkSession, path: String, column: String,
                            key: String, version: Long = -1L): DataFrame = {
    require(key != null, "readPinnedPointString: null key has no membership")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = if (version < 0) {
      val vs = manifestVersions(fs, root)
      require(vs.nonEmpty, s"readPinnedPointString: no manifest under $path")
      vs.last
    } else version
    val kp = keysPath(root, v)
    require(fs.exists(kp),
      s"readPinnedPointString: no key-set sidecar for manifest v$v under " +
        s"$path — run writeFileKeySets(..., \"$column\") after the commit")
    // the probe hash must be EXACTLY the hash the writer's xxhash64
    // column produced — compute it through the same Spark expression
    // (one 1-row local-relation job, constant-folded, no cluster work)
    val probe = spark.range(1)
      .select(xxhash64(lit(key)).as("h")).head().getLong(0)
    val in = fs.open(kp)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val keySets: Map[String, Long => Boolean] = txt.linesIterator.collect {
      case HKeysLine(f, c, ks) if jsonUnescape(c) == column =>
        val set = ks.split(',').filter(_.nonEmpty).map(_.toLong).toSet
        jsonUnescape(f) -> ((k: Long) => set.contains(k))
      case HBloomLine(f, c, bk, bm) if jsonUnescape(c) == column =>
        val bits = java.util.Base64.getDecoder.decode(bm)
        jsonUnescape(f) -> ((k: Long) => bloomContains(bits, bk.toInt, k))
    }.toMap
    val files = readManifestFile(fs, root, v)
    val kept = files.filter(f => keySets.get(f).forall(_.apply(probe)))
    val bind = if (kept.nonEmpty) kept else files.take(1)
    val filtered = spark.read.option("basePath", path)
      .parquet(bind.map(f => path + "/" + f): _*)
      .filter(col(column) === lit(key))
    if (kept.nonEmpty) filtered else filtered.limit(0)
  }

  /** Stats-pruned pinned read: bind the plan to ONLY the manifest files
    * whose pinned `[min, max]` on `column` intersects `[lo, hi]`, then
    * apply the row filter. Files without a pinned range are kept (pruning
    * is always conservative), so results equal
    * `readPinned(...).filter(column between lo and hi)` exactly — the
    * difference is how many files the plan ever sees. Requires
    * [[writeFileStats]] for this version to exist; integral columns only
    * (enforced on the bound plan's schema). */
  def readPinnedWhere(spark: SparkSession, path: String, column: String,
                      lo: Long, hi: Long, version: Long = -1L): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = if (version < 0) {
      val vs = manifestVersions(fs, root)
      require(vs.nonEmpty, s"readPinnedWhere: no manifest under $path")
      vs.last
    } else version
    val sp = statsPath(root, v)
    require(fs.exists(sp),
      s"readPinnedWhere: no stats sidecar for manifest v$v under $path — " +
        s"run writeFileStats(..., Seq(\"$column\")) after the commit")
    val in = fs.open(sp)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val ranges = txt.linesIterator.collect {
      case StatsLine(f, c, mn, mx) if jsonUnescape(c) == column =>
        jsonUnescape(f) -> (mn.toLong, mx.toLong)
    }.toMap
    val files = readManifestFile(fs, root, v)
    val kept = files.filter(f => ranges.get(f) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None           => true // unknown range — must admit
    })
    // every file pruned ⇒ provably empty result; bind one file so the
    // plan still carries the store's schema
    val bind = if (kept.nonEmpty) kept else files.take(1)
    val df = spark.read.option("basePath", path)
      .parquet(bind.map(f => path + "/" + f): _*)
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(df.schema(column).dataType),
      s"readPinnedWhere: '$column' must be integral (timestamps belong to " +
        "date-partition pruning) — got " + df.schema(column).dataType)
    val filtered = df.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
    if (kept.nonEmpty) filtered else filtered.limit(0)
  }

  /** The file-set delta between two manifest versions: what `vNew` added
    * and what it removed relative to `vOld` (relative paths). This is the
    * incremental-computation primitive the version log buys: an
    * append-only period diffs to (newFiles, ∅), so a downstream aggregate
    * refreshes by reading ONLY the new files instead of re-scanning the
    * store — at 100 TB/day that is the difference between an incremental
    * ETL tick and a full-table pass. Maintenance commits (compact,
    * cluster) rewrite files without changing content, so consumers should
    * diff across QUIET versions or re-base after maintenance — the
    * removed-set being nonempty is the detectable signal. */
  def manifestDiff(spark: SparkSession, path: String, vOld: Long, vNew: Long)
      : (Seq[String], Seq[String]) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = readManifestFile(fs, root, vOld).toSet
    val neu = readManifestFile(fs, root, vNew).toSet
    ((neu -- old).toSeq.sorted, (old -- neu).toSeq.sorted)
  }

  /** Bind a plan to an explicit subset of the store's files (relative
    * paths, e.g. one side of [[manifestDiff]]). Partition columns still
    * come from the directory names. */
  def readFiles(spark: SparkSession, path: String, rel: Seq[String]): DataFrame = {
    require(rel.nonEmpty, "readFiles: empty file list")
    spark.read.option("basePath", path)
      .parquet(rel.map(f => path + "/" + f): _*)
  }

  /** ROW-level change feed between two manifest versions — the CDC read
    * every downstream incremental consumer wants: what rows appeared,
    * what rows disappeared, net of maintenance?
    *
    * [[manifestDiff]] gives the FILE delta; this nets it to rows with a
    * multiset difference in each direction (`exceptAll`): a file rewritten
    * by compaction / z-order contributes identical rows to BOTH sides, so
    * pure re-layout cancels to an empty feed, while a copy-on-write
    * merge/delete nets to exactly the changed rows. Cost scales with the
    * CHANGED files only — untouched files are never opened — and the
    * `exceptAll` shuffles just those rows; at 100 TB a day's feed reads a
    * day's files, not the store.
    *
    * Requires `vOld`'s replaced files to still exist (same contract as
    * pinned readers — run the feed before [[vacuum]] passes the old
    * version's retention) and a stable schema across the range (for
    * evolved stores, diff within a generation). An UPDATE appears as
    * delete(old row) + insert(new row), the classic CDF encoding.
    *
    * Lifecycle caveat: append batches AFTER a maintenance commit via
    * [[appendCommitted]], not a bare [[writeManifest]] — the replaced
    * originals a compaction leaves on disk for time travel are
    * indistinguishable from fresh un-adopted appends, so a blanket
    * re-adopt would resurrect them (double-counting the store AND
    * polluting this feed with phantom inserts). */
  def changeFeed(spark: SparkSession, path: String, vOld: Long, vNew: Long)
      : DataFrame = {
    require(vOld <= vNew, s"changeFeed: need vOld ≤ vNew, got $vOld > $vNew")
    val (added, removed) = manifestDiff(spark, path, vOld, vNew)
    def rd(rel: Seq[String]): Option[DataFrame] =
      if (rel.isEmpty) None else Some(readFiles(spark, path, rel))
    val tagged = (rd(added), rd(removed)) match {
      case (None, None) => readPinned(spark, path, vNew).limit(0)
        .withColumn("_change_type", lit("insert"))
      case (Some(i), None) => i.withColumn("_change_type", lit("insert"))
      case (None, Some(d)) => d.withColumn("_change_type", lit("delete"))
      case (Some(i), Some(d)) =>
        i.exceptAll(d).withColumn("_change_type", lit("insert"))
          .unionByName(d.exceptAll(i).withColumn("_change_type", lit("delete")))
    }
    tagged
  }

  /** Deep snapshot clone: copy exactly the files version `version` pins
    * into a fresh store root and commit them there as the new store's
    * manifest v1 — the backup / environment-promotion primitive ("ship
    * yesterday's snapshot to staging"). The clone is a fully independent
    * store: the source can compact, rewrite, or [[vacuum]] past the
    * cloned version afterwards without touching it. The copy IS the
    * distcp-shaped job the scale demands: the pinned file list is
    * parallelized and each TASK copies its file through its own
    * `FileSystem` handle (overwrite=true so a speculative/retried task is
    * idempotent against its own partial output — the destination was
    * verified empty up front, so nothing else can be overwritten), an
    * accumulator cross-checks that every task-side copy actually ran, and
    * only then does the driver take the ONE locked manifest commit. The
    * driver never moves bytes — at 100 TB the copy saturates the cluster,
    * not one machine. A SHALLOW clone (manifest referencing source files)
    * is deliberately not offered, because the store's relative-path
    * manifests are what make vacuum/maintenance reasoning local to one
    * root. Returns the cloned file count. */
  def cloneSnapshot(spark: SparkSession, srcPath: String, dstPath: String,
                    version: Long = -1L): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val dst = new org.apache.hadoop.fs.Path(dstPath)
    val sfs = src.getFileSystem(conf)
    val dfs = dst.getFileSystem(conf)
    require(!dfs.exists(dst) || dfs.listStatus(dst).isEmpty,
      s"cloneSnapshot: destination $dstPath is not empty")
    val v = if (version >= 0) version
      else manifestVersions(sfs, src).lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"cloneSnapshot: $srcPath has no manifest"))
    val rel = readManifestFile(sfs, src, v)
    require(rel.nonEmpty, s"cloneSnapshot: version $v lists no files")
    val sc = spark.sparkContext
    val ser = new org.apache.spark.util.SerializableConfiguration(conf)
    val srcStr = src.toString
    val dstStr = dst.toString
    val copied = sc.longAccumulator("graft.cloneSnapshot.filesCopied")
    sc.parallelize(rel, math.max(1, math.min(rel.size, sc.defaultParallelism)))
      .foreach { r =>
        val c = ser.value
        val from = new org.apache.hadoop.fs.Path(srcStr, r)
        val to = new org.apache.hadoop.fs.Path(dstStr, r)
        val fromFs = from.getFileSystem(c)
        val toFs = to.getFileSystem(c)
        toFs.mkdirs(to.getParent)
        require(org.apache.hadoop.fs.FileUtil.copy(fromFs, from, toFs, to,
          false, true, c), s"cloneSnapshot: copy failed for $r")
        copied.add(1L)
      }
    require(copied.value >= rel.size,
      s"cloneSnapshot: copy tasks reported ${copied.value} of ${rel.size} files")
    withCommitLock(dfs, dst) { commitLocked(dfs, dst, rel) }
    rel.size
  }

  // --------------------------------------------- copy-on-write row mutation
  //
  // The manifest protocol so far only ever ADDS rows (append) or re-lays
  // them (compact / z-order). MERGE and DELETE complete the lifecycle —
  // the GDPR-erasure / late-correction / CDC-upsert operations every real
  // 100 TB store eventually needs — with the same copy-on-write shape
  // table formats use: touched files are rewritten under maintenance
  // names, untouched files are never opened, and ONE manifest commit
  // (optimistic rebase under the commit lock, like [[compactInPlace]])
  // swaps the row change in atomically. Readers pinned to an old version
  // keep their snapshot; [[vacuum]] reclaims the replaced files later.

  /** Outcome of [[mergeInto]] / [[deleteWhere]]. `filesDropped` counts
    * files removed from the manifest WITHOUT a rewrite (every row
    * matched — [[deleteWhere]]'s metadata-only fast path; always 0 for
    * merge); `filesRewritten` counts INPUT files rewritten without their
    * matching rows; `filesInserted` counts the insert job's output. */
  final case class MergeStats(filesUntouched: Int, filesRewritten: Int,
                              filesDropped: Int, filesInserted: Int,
                              rowsDeleted: Long, rowsInserted: Long)

  /** Relative `dir/file` path of the file a scanned row came from —
    * Spark's `_metadata` hidden column, cut to the store-relative form the
    * manifest speaks. */
  private def relFileCol =
    regexp_extract(col("_metadata.file_path"), "([^/]+/[^/]+)$", 1)

  /** Generation nonce for staging dirs and maintenance file names —
    * UNIQUE across threads and (probabilistically) processes, digits-only.
    * `System.currentTimeMillis()` alone is not a generation: two
    * same-millisecond concurrent writers shared one `.ingest-staging-<ms>`
    * dir, and the first finisher's cleanup deleted the other's in-flight
    * write (found by the round-11 racing-committer spec — the same hazard
    * existed for compact/merge/delete/z-order staging and moved-in file
    * names). millis·2^20 keeps the nonce time-sortable for operators
    * reading file listings; the process-random base + per-call counter
    * make it collision-free in-process and ~2^-20 per process pair — and
    * a residual collision still fails LOUDLY (rename onto an existing
    * name), never silently interleaves. */
  private val genCounter = new java.util.concurrent.atomic.AtomicLong(
    new java.security.SecureRandom().nextInt(1 << 20).toLong)
  private[graft] def nextGen(): Long =
    ((System.currentTimeMillis() << 20) + genCounter.getAndIncrement()) & Long.MaxValue

  /** Move every data file under `staged` (a hidden staging dir holding a
    * date-partitioned write) into the live partition dirs under
    * `prefix-gen-` maintenance names; returns the moved files' relative
    * paths. Partition dirs an append never created yet are created here —
    * a merge may insert into brand-new dates. */
  private def moveStagedIn(fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path,
                           staged: org.apache.hadoop.fs.Path,
                           prefix: String, gen: Long): Seq[String] = {
    val parts = fs.listStatus(staged).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    parts.flatMap { p =>
      val live = new org.apache.hadoop.fs.Path(root, p.getPath.getName)
      if (!fs.exists(live)) fs.mkdirs(live)
      fs.listStatus(p.getPath)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.startsWith("."))
        .map { f =>
          val name = s"$prefix-$gen-${f.getPath.getName}"
          require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(live, name)),
            s"$prefix: moving ${f.getPath} into $live failed")
          p.getPath.getName + "/" + name
        }.toSeq
    }
  }

  /** Copy-on-write MERGE (upsert) into the manifested store, with
    * DELETE-THEN-INSERT semantics: every store row whose `keyCols` tuple
    * appears in `updates` is removed, and every `updates` row is inserted
    * (date-partitioned on `tsCol`, like [[append]] — an update may move a
    * row across partitions, carry several rows per key, or introduce keys
    * the store never held). This is the CDC-upsert contract for an event
    * store, where a key does not promise uniqueness.
    *
    * Plan shape at 100 TB: ONE distributed detection pass (a semi join of
    * the pinned scan's `_metadata.file_path` against the distinct update
    * keys — filter pushdown and AQE broadcast apply as usual) finds the
    * files that contain matching keys; ONE rewrite job reads ONLY those
    * files and anti-joins the keys out; ONE insert job writes the update
    * rows. Untouched files are never opened. Both jobs write to hidden
    * staging, move in under `merge-{gen}-*` maintenance names, and a
    * single optimistic-rebase manifest commit swaps rewrites + inserts in
    * atomically — a crash before the commit leaves only unmanifested
    * garbage for [[vacuum]], never a half-merged store.
    *
    * Keys compare with SQL equality: a null key field matches nothing
    * (its store rows survive, its update rows still insert).
    *
    * `updates` is PERSISTED internally for the operation's lifetime
    * (released in a finally): the plan feeds up to three jobs — detection
    * semi join, rewrite anti join, count + insert — and without the cache
    * an expensive or (worse) non-deterministic update plan would evaluate
    * once per job, risking a merge whose delete set and insert set
    * disagree. Safe-by-default (VERDICT r9 "what's wrong" #3); callers no
    * longer need to cache. */
  def mergeInto(spark: SparkSession, path: String, updates: DataFrame,
                keyCols: Seq[String], tsCol: String = "ts",
                driverBudgetBytes: Long = 64L << 20): MergeStats = {
    require(keyCols.nonEmpty, "mergeInto: need at least one key column")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = readManifestFile(fs, root)
    requireDetectionBudget("mergeInto", manifest.size, driverBudgetBytes)
    val gen = nextGen()
    val upd = updates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val keys = upd.select(keyCols.map(col): _*).distinct()
      // detection: which manifested files hold a matching key, and how many
      // rows they lose — file-granular output (#files rows), one job
      val pinned = readPinned(spark, path)
      val hits = pinned
        .select(relFileCol.as("__file"), struct(keyCols.map(col): _*).as("__k"))
        .join(keys.select(struct(keyCols.map(col): _*).as("__k")), Seq("__k"), "left_semi")
        .groupBy(col("__file")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val affected = manifest.filter(hits.contains)
      val rowsDeleted = hits.values.sum
      // rewrite: ONLY the affected files, matching keys anti-joined out;
      // event_date is recomputed from tsCol exactly as append derives it
      val rewritten = if (affected.isEmpty) Seq.empty[String] else {
        val staged = new org.apache.hadoop.fs.Path(root, s".merge-rewrite-$gen")
        fs.delete(staged, true)
        readFiles(spark, path, affected).drop("event_date")
          .join(keys, keyCols, "left_anti")
          .withColumn("event_date", to_date(col(tsCol)))
          .write.partitionBy("event_date").mode(SaveMode.Overwrite)
          .parquet(staged.toString)
        val moved = moveStagedIn(fs, root, staged, "merge", gen)
        fs.delete(staged, true)
        moved
      }
      // insert: every update row, as a normal date-partitioned write
      val rowsInserted = upd.count()
      val inserted = if (rowsInserted == 0) Seq.empty[String] else {
        val staged = new org.apache.hadoop.fs.Path(root, s".merge-insert-$gen")
        fs.delete(staged, true)
        upd.withColumn("event_date", to_date(col(tsCol)))
          .write.partitionBy("event_date").mode(SaveMode.Overwrite)
          .parquet(staged.toString)
        val moved = moveStagedIn(fs, root, staged, "merge", gen)
        fs.delete(staged, true)
        moved
      }
      commitCow(fs, root, "mergeInto", affected.toSet, rewritten ++ inserted)
      MergeStats(manifest.size - affected.size, affected.size, 0,
        inserted.size, rowsDeleted, rowsInserted)
    } finally upd.unpersist(blocking = false)
  }

  /** Copy-on-write DELETE from the manifested store. Files where EVERY
    * row matches `predicate` are dropped from the manifest WITHOUT a
    * rewrite — the metadata-only fast path that makes retention deletes
    * (drop a day, drop a user range on a z-ordered layout) near-free at
    * 100 TB, because a clustered layout concentrates matching rows into
    * few files and most of those match fully. Partially-matching files
    * are rewritten without their matching rows under `delete-{gen}-*`
    * names; files with no match are never opened past the ONE detection
    * pass. Single optimistic-rebase manifest commit, as [[mergeInto]].
    *
    * `predicate` must be deterministic and null-rejecting (a null
    * predicate value keeps the row, SQL WHERE-NOT semantics). */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column,
                  tsCol: String = "ts",
                  driverBudgetBytes: Long = 64L << 20): MergeStats = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = readManifestFile(fs, root)
    requireDetectionBudget("deleteWhere", manifest.size, driverBudgetBytes)
    val gen = nextGen()
    // FLAT stores (createTable of a ts-free result) manifest BARE file
    // names — the relative-path extraction must match, or detection keys
    // miss the manifest entirely and the delete silently no-ops
    val partitioned = manifest.head.contains("/")
    val fileKeyCol =
      if (partitioned) relFileCol
      else regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1)
    // detection: per-file (matching, total) counts — one job, file-granular
    val counts = readPinned(spark, path)
      .select(fileKeyCol.as("__file"),
        when(predicate, 1L).otherwise(0L).as("__m"))
      .groupBy(col("__file"))
      .agg(sum(col("__m")).as("m"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dropped = manifest.filter(f => counts.get(f).exists { case (m, n) => m == n && n > 0 })
    val partial = manifest.filter(f => counts.get(f).exists { case (m, n) => m > 0 && m < n })
    val rowsDeleted = counts.values.map(_._1).sum
    // FLAT stores rewrite without the partition round-trip — same COW
    // protocol, root-level move-in
    val rewritten = if (partial.isEmpty) Seq.empty[String] else {
      val staged = new org.apache.hadoop.fs.Path(root, s".delete-rewrite-$gen")
      fs.delete(staged, true)
      val kept = readFiles(spark, path, partial)
        .filter(!coalesce(predicate, lit(false)))
      val moved = if (partitioned) {
        kept.drop("event_date")
          .withColumn("event_date", to_date(col(tsCol)))
          .write.partitionBy("event_date").mode(SaveMode.Overwrite)
          .parquet(staged.toString)
        moveStagedIn(fs, root, staged, "delete", gen)
      } else {
        kept.write.mode(SaveMode.Overwrite).parquet(staged.toString)
        fs.listStatus(staged).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))
          .map { f =>
            val name = s"delete-$gen-${f.getPath.getName}"
            require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(root, name)),
              s"deleteWhere: moving ${f.getPath} into $root failed")
            name
          }
      }
      fs.delete(staged, true)
      moved
    }
    commitCow(fs, root, "deleteWhere", (dropped ++ partial).toSet, rewritten)
    MergeStats(manifest.size - dropped.size - partial.size, partial.size,
      dropped.size, 0, rowsDeleted, 0L)
  }

  /** COW UPDATE by predicate — rewrite the rows `predicate` matches with
    * `sets` applied (each value a Column over the row's columns; the
    * other rows and files byte-survive). The fourth verb of the SQL
    * write face (`update … set … where`), and simpler than [[mergeInto]]
    * because the transform is row-local: ONE detection pass finds the
    * files holding matches, ONE rewrite job re-writes exactly those
    * files with `when(pred, new).otherwise(old)` per assigned column,
    * and one atomic manifest commit swaps them in. Untouched files are
    * never opened. Assigned columns must exist and keep their TYPE (a
    * silent type change would corrupt the table for every reader).
    * Updating `tsCol` on a date-partitioned store is allowed — rewritten
    * rows land in their new date partitions, the same row-moves-partition
    * contract [[mergeInto]] has. */
  def updateWhere(spark: SparkSession, path: String, predicate: Column,
                  sets: Map[String, Column], tsCol: String = "ts",
                  driverBudgetBytes: Long = 64L << 20): MergeStats = {
    require(sets.nonEmpty, "updateWhere: no SET assignments")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = readManifestFile(fs, root)
    requireDetectionBudget("updateWhere", manifest.size, driverBudgetBytes)
    val gen = nextGen()
    val partitioned = manifest.head.contains("/")
    val fileKeyCol =
      if (partitioned) relFileCol
      else regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1)
    val stored = readPinned(spark, path)
    val dataSchema =
      if (partitioned) org.apache.spark.sql.types.StructType(
        stored.schema.fields.filter(_.name != "event_date"))
      else stored.schema
    sets.keys.foreach { c =>
      require(dataSchema.fieldNames.contains(c),
        s"updateWhere: SET column '$c' does not exist (have: " +
          s"${dataSchema.fieldNames.mkString(", ")})")
      require(c != "event_date",
        "updateWhere: event_date derives from the timestamp — SET the " +
          s"'$tsCol' column instead")
    }
    // detection: which files hold at least one matching row
    val counts = stored
      .select(fileKeyCol.as("__file"),
        when(predicate, 1L).otherwise(0L).as("__m"))
      .groupBy(col("__file")).agg(sum(col("__m")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val affected = manifest.filter(f => counts.get(f).exists(_ > 0))
    val rowsMatched = counts.values.sum
    if (affected.isEmpty)
      return MergeStats(manifest.size, 0, 0, 0, 0L, 0L)
    val pred = coalesce(predicate, lit(false))
    val staged = new org.apache.hadoop.fs.Path(root, s".merge-rewrite-$gen")
    fs.delete(staged, true)
    val base = readFiles(spark, path, affected)
    val base2 = if (partitioned) base.drop("event_date") else base
    // ALL assignments evaluate against the OLD row (SQL semantics):
    // stage every new value into a temp column over the original frame
    // first, then swap them in — a naive chained withColumn would let a
    // later assignment read an earlier one's result
    val staged0 = sets.toSeq.zipWithIndex
    val withTmp = staged0.foldLeft(base2) { case (df, ((c, v), i)) =>
      val out = df.withColumn(s"__set$i", when(pred, v).otherwise(col(c)))
      require(out.schema(s"__set$i").dataType == base2.schema(c).dataType,
        s"updateWhere: SET changes '$c' from " +
          s"${base2.schema(c).dataType.simpleString} to " +
          s"${out.schema(s"__set$i").dataType.simpleString} — cast the " +
          "expression to the column's type; UPDATE never retypes a table")
      out
    }
    val updated = staged0.foldLeft(withTmp) { case (df, ((c, _), i)) =>
      df.withColumn(c, col(s"__set$i"))
    }.drop(staged0.map { case (_, i) => s"__set$i" }: _*)
    val moved = if (partitioned) {
      updated.withColumn("event_date", to_date(col(tsCol)))
        .write.partitionBy("event_date").mode(SaveMode.Overwrite)
        .parquet(staged.toString)
      moveStagedIn(fs, root, staged, "merge", gen)
    } else {
      updated.write.mode(SaveMode.Overwrite).parquet(staged.toString)
      fs.listStatus(staged).toSeq
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.startsWith("."))
        .map { f =>
          val name = s"merge-$gen-${f.getPath.getName}"
          require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(root, name)),
            s"updateWhere: moving ${f.getPath} into $root failed")
          name
        }
    }
    fs.delete(staged, true)
    commitCow(fs, root, "updateWhere", affected.toSet, moved)
    MergeStats(manifest.size - affected.size, affected.size, 0, 0,
      0L, rowsMatched)
  }

  /** Loud driver-memory guard on the COW DETECTION maps: both [[mergeInto]]
    * and [[deleteWhere]] collect one constant-width (file, counts) row per
    * manifested file — the same driver dimension as Spark's own FileIndex —
    * but at 10^6 files that map is ~100 MB and deserves the same explicit
    * budget the key-set sidecar has ([[writeFileKeySets]]), not an implicit
    * OOM. 512 bytes/file is a deliberate overestimate (relative path string
    * + boxed longs + HashMap node); the check runs BEFORE the detection job
    * so an over-budget manifest fails before materializing anything. */
  private def requireDetectionBudget(op: String, nFiles: Int,
                                     driverBudgetBytes: Long): Unit = {
    require(driverBudgetBytes >= 1, s"$op: bad driverBudgetBytes $driverBudgetBytes")
    val est = nFiles.toLong * 512L
    require(est <= driverBudgetBytes,
      s"$op: the per-file detection map over $nFiles manifested files is " +
        s"~$est bytes on the driver, over driverBudgetBytes=" +
        s"$driverBudgetBytes — compact the store first (compact/" +
        "compactManifested) or raise the budget deliberately")
  }

  /** The shared copy-on-write commit: remove `replaced`, add `added`, as
    * ONE manifest version under the commit lock — rebased onto the
    * manifest AS OF COMMIT TIME so a concurrent append's files survive,
    * failing loudly if a replaced file left the manifest mid-run
    * (conflicting maintenance). An empty post-merge manifest is legal for
    * a whole-store delete ONLY via an explicit empty commit — but an
    * empty store breaks [[readPinned]]'s nonempty require, so refuse it
    * loudly: a delete of everything is [[reset]], not a merge. */
  private def commitCow(fs: org.apache.hadoop.fs.FileSystem,
                        root: org.apache.hadoop.fs.Path, op: String,
                        replaced: Set[String], added: Seq[String]): Long =
    withCommitLock(fs, root) {
      val current = readManifestFile(fs, root)
      val vanished = replaced -- current.toSet
      require(vanished.isEmpty,
        s"$op: files this operation replaced left the manifest mid-run " +
          s"(concurrent maintenance?): ${vanished.take(3).mkString(", ")} — " +
          "re-run against the new snapshot")
      val next = current.filterNot(replaced) ++ added
      require(next.nonEmpty,
        s"$op: the commit would empty the store — use reset() to drop " +
          "everything; an empty manifest would break every pinned reader")
      commitLocked(fs, root, next)
    }

  /** Outcome of [[clusterInPlace]]. */
  final case class ClusterStats(filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Z-order clustered rewrite of the manifested store: re-lay the pinned
    * file set so each output file covers a small rectangle of the
    * (`zCol1`, `zCol2`) space instead of a thin ingest-order slice — after
    * this, selective filters on EITHER column skip most row groups via
    * ordinary parquet min/max stats ([[ZOrder]] has the full rationale and
    * the audit that measures it). Same commitment protocol as
    * [[compactInPlace]]: clustered files are staged hidden, moved into the
    * live partition dirs under fresh names (no live file is ever renamed
    * away), and the manifest swap is the single commit point — readers
    * pinned to the old manifest keep their snapshot; a crash before the
    * swap leaves only unmanifested garbage for [[vacuum]].
    *
    * `event_date` directory partitioning is preserved (time-range scans
    * keep their directory pruning); the range partitioner keys on
    * (event_date, z) so output files nest inside dates. One global
    * range-exchange is the whole cost — the one-off write that converts
    * every later per-entity scan from O(store) to O(matching rectangles).
    */
  def clusterInPlace(spark: SparkSession, path: String,
                     zCol1: String, zCol2: String,
                     targetBytes: Long): ClusterStats =
    clusterInPlace(spark, path, Seq(zCol1, zCol2), targetBytes)

  def clusterInPlace(spark: SparkSession, path: String,
                     zCol1: String, zCol2: String): ClusterStats =
    clusterInPlace(spark, path, Seq(zCol1, zCol2), 128L * 1024 * 1024)

  /** N-dimensional (2-4) clustered rewrite — `zCols` in declared order
    * become the Morton dimensions ([[ZOrder.zValueN]]); everything else
    * identical to the 2-dim form above. */
  def clusterInPlace(spark: SparkSession, path: String, zCols: Seq[String],
                     targetBytes: Long): ClusterStats = {
    require(targetBytes > 0, s"clusterInPlace: need targetBytes > 0, got $targetBytes")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(root, "_spark_metadata")),
      s"clusterInPlace: $path is a streaming-sink output — rewriting under " +
        "the metadata log would desync its readers")
    val manifest = readManifestFile(fs, root)
    val bytes = manifest.map(f => fs.getFileStatus(
      new org.apache.hadoop.fs.Path(root, f)).getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = readPinned(spark, path)
    val ranges = ZOrder.columnRanges(df, zCols)
    val gen = nextGen()
    val staged = new org.apache.hadoop.fs.Path(root, s".zorder-staging-$gen")
    fs.delete(staged, true)
    df.withColumn("__z",
        ZOrder.zValueN(zCols.map(c => (col(c), ranges(c)))))
      .repartitionByRange(nOut, col("event_date"), col("__z"))
      .sortWithinPartitions(col("event_date"), col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date").parquet(staged.toString)
    val movedIn = fs.listStatus(staged).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .flatMap { p =>
        val live = new org.apache.hadoop.fs.Path(root, p.getPath.getName)
        fs.mkdirs(live)
        fs.listStatus(p.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))
          .map { f =>
            val name = s"zorder-$gen-${f.getPath.getName}"
            require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(live, name)),
              s"clusterInPlace: moving ${f.getPath} into $live failed")
            p.getPath.getName + "/" + name
          }
      }
    fs.delete(staged, true)
    // the ONE commit point — optimistic rebase like compactInPlace's:
    // the rewrite replaces exactly the file set it READ; files a
    // concurrent append committed mid-rewrite are carried forward (they
    // are simply not clustered yet — the next clusterInPlace picks them
    // up).
    withCommitLock(fs, root) {
      val current = readManifestFile(fs, root)
      commitLocked(fs, root, current.filterNot(manifest.toSet) ++ movedIn)
    }
    ClusterStats(manifest.size, movedIn.size, bytes)
  }

  /** Reclaim unmanifested bytes: delete visible data files no RETAINED
    * manifest version lists — replaced compaction/clustering inputs past
    * their grace window, and debris from crashed maintenance. `olderThanMs`
    * is the grace: only files whose modification time is at least that old
    * are removed, so in-flight readers pinned to a recent manifest (and
    * appends awaiting their writeManifest) survive a conservatively-
    * scheduled vacuum. `keepVersions` is the time-travel retention: the
    * newest K manifest versions' files all survive, and manifests older
    * than that are dropped — [[readPinned]] time travel reaches exactly as
    * far back as the last vacuum's retention, the same contract Delta's
    * VACUUM has. Default 1 = only the current snapshot survives. Returns
    * the deleted data-file relative paths. */
  def vacuum(spark: SparkSession, path: String, olderThanMs: Long = 0L,
             keepVersions: Int = 1): Seq[String] = {
    require(keepVersions >= 1, s"vacuum: keepVersions must be >= 1, got $keepVersions")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = manifestVersions(fs, root)
    require(versions.nonEmpty, s"vacuum: no manifest under $path")
    val (dropped, retained) = versions.splitAt(math.max(0, versions.size - keepVersions))
    val keep = retained.flatMap(v => readManifestFile(fs, root, v)).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    val deleted = listDataFiles(fs, root).filter { rel =>
      !keep(rel) && {
        val p = new org.apache.hadoop.fs.Path(root, rel)
        fs.getFileStatus(p).getModificationTime <= cutoff && fs.delete(p, false)
      }
    }
    // retention boundary: versions past keepVersions stop being
    // time-travelable NOW (their files may just have been deleted) — a
    // dangling manifest would turn a clear "vacuumed past retention"
    // error into a silent short read
    dropped.foreach { v =>
      fs.delete(manifestPath(fs, root, v), false)
      fs.delete(statsPath(root, v), false) // sidecar dies with its version
    }
    // crashed-maintenance STAGING dirs past the same grace window: pure
    // scratch (their contents were either moved out or never committed).
    // The legacy compactor's `.<part>.compact-old` parking is deliberately
    // NOT touched — it can hold the only copy of a partition, and
    // readRetrying's recovery message points operators at it.
    val staging = ("""^\..*\.compact-staging(?:-\d+)?$|^\.zorder-staging(?:-\d+)?$""" +
      """|^\.(?:merge|delete)-(?:rewrite|insert)-\d+$""" +
      """|^\.(?:ingest|ctas)-staging-\d+$""").r
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && staging.pattern.matcher(s.getPath.getName).matches()
        && s.getModificationTime <= cutoff)
      .foreach(s => fs.delete(s.getPath, true))
    deleted
  }

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

  /** Swap-aware read: a plain [[read]] that LISTS the store while
    * [[compact]] is mid-swap can momentarily miss the swapping partition —
    * and a directory listing has no way to know data is absent, so the
    * result is silently short, the worst failure mode a store can have.
    *
    * compact's protocol makes the window DETECTABLE: for the whole swap the
    * hidden `.<part>.compact-old` (and before it `.compact-staging`) marker
    * exists next to the partition. This reader polls the listing until no
    * partition is mid-swap (marker present but live dir absent), then binds
    * the plan. A swap that STARTS after the check is still invisible — that
    * remaining race is what manifest/transaction-log table formats exist
    * for (see the `_spark_metadata` guard in [[compact]]); within
    * single-compactor operation this closes the observed gap.
    *
    * Fails loudly after `maxWaitMs` — a marker without a live partition
    * that never resolves means a crashed compactor, and the error says how
    * to recover. */
  def readRetrying(spark: SparkSession, path: String,
                   maxWaitMs: Long = 30000, pollMs: Long = 100): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = """^\.(.*)\.compact-(old|staging)$""".r
    def midSwap(): Set[String] = {
      val names = fs.listStatus(root).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).toSet
      names.collect { case marker(part, _) if !names.contains(part) => part }
    }
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var missing = midSwap()
    while (missing.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(pollMs)
      missing = midSwap()
    }
    if (missing.nonEmpty) throw new IllegalStateException(
      s"readRetrying: partitions ${missing.mkString(", ")} stayed mid-swap " +
        s"for ${maxWaitMs}ms — a compactor likely crashed between renames; " +
        "recover by renaming the hidden '.<part>.compact-old' dir back to " +
        "'<part>' under " + path)
    spark.read.parquet(path)
  }
}
