package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TSDB STORE tier — the last §1.1 row (the reference is a
  * time-series *store* extension, not just a query engine): a
  * day-partitioned parquet layout with append + upsert-on-read
  * semantics, the LSM-style pattern every lake-format store (and the
  * reference's keyed time-series tables) exposes:
  *
  *  - WRITE: rows land partitioned by `event_date = to_date(ts)` —
  *    at 100 TB the date directory IS the index: a time-range query
  *    prunes non-matching partitions at the SCAN (PartitionFilters,
  *    asserted in PlanShapeSpec), and ingest appends only to the
  *    current day's directory;
  *  - UPSERT: new versions of a logical row are APPENDED with a higher
  *    version id (no read-modify-write at ingest — the only write
  *    pattern that scales), and readers resolve
  *    "latest version per key" with one max_by aggregation
  *    ([[latestByKey]] — dedup-on-read, the MERGE-less form);
  *  - COMPACTION: rewriting a partition through [[latestByKey]] back
  *    to its directory reclaims superseded versions; it is the same
  *    one-aggregate job, run partition-at-a-time (day directories are
  *    independent, so compaction parallelizes per day and never
  *    touches the rest of the store).
  *
  * The gated queries (ops/StoreOps) build a REAL store under
  * java.io.tmpdir from the events table plus an update batch, read it
  * back pruned, and resolve latest versions — their DuckDB oracles
  * recompute the same answers from the ORIGINAL events parquet, so a
  * round trip that dropped, duplicated, or re-typed any row
  * hash-fails the gate.
  */
object TsdbStore {

  /** Write `df` as a NEW day-partitioned store at `path` (overwrite —
    * the initial bulk load). The partition key `event_date` is derived
    * from `tsCol` (UTC session ⇒ calendar-day buckets match DuckDB's
    * `cast(ts as date)`). Rows are CLUSTERED by the partition key
    * before the write (`repartition(event_date)`): without it every
    * task holding rows of day D opens its own file under
    * `event_date=D/`, so a T-task write of P days emits up to T×P
    * small files — the classic partitioned-write mistake that turns a
    * 100 TB store into a metadata bomb. Clustered, each day emits one
    * well-sized file (shard WITHIN hot days by adding a salt column to
    * the repartition when a single day outgrows one task). */
  def writeDayPartitioned(df: DataFrame, tsCol: String, path: String): Unit = {
    val dated = df.withColumn("event_date", to_date(col(tsCol)))
    dated.repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(path)
    // ZERO-ROW corpus: a partitioned write of an empty frame emits no
    // files at all (there are no partition values), so a later read
    // can't infer the schema. Keep the store READABLE by writing one
    // empty schema-carrying file with event_date as a data column —
    // type-identical to the partition-discovered DATE, zero rows.
    val files = Option(new java.io.File(path).listFiles).getOrElse(Array.empty)
    if (!files.exists(f => f.getName.startsWith("event_date=")))
      dated.limit(0).write.mode("overwrite").parquet(path)
  }

  /** Append a batch to an existing store at `path` (the ingest /
    * upsert path: new versions append, readers resolve). Same
    * cluster-before-write discipline.
    *
    * If the store was bulk-loaded EMPTY, [[writeDayPartitioned]] left a
    * root-level schema-marker file (event_date as a data column). Once
    * a non-empty append lands real `event_date=…` directories, that
    * marker would make partition discovery see a MIXED layout
    * (conflicting directory structures) and fail the read — the
    * empty-backfill-then-stream shape the streaming ingest advertises
    * (ADVICE round 12). So after the append, if partition directories
    * now exist, the root marker files are removed. */
  def appendDayPartitioned(df: DataFrame, tsCol: String, path: String): Unit = {
    df.withColumn("event_date", to_date(col(tsCol)))
      .repartition(col("event_date"))
      .write.mode("append").partitionBy("event_date").parquet(path)
    val files = Option(new java.io.File(path).listFiles).getOrElse(Array.empty)
    if (files.exists(f => f.isDirectory && f.getName.startsWith("event_date=")))
      files.filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .foreach(f => f.delete(): Unit)
  }

  /** Read the store back. Partition discovery types `event_date` as
    * DATE; filters on it prune directories before any file opens. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read the store with SCHEMA MERGING across heterogeneous batches —
    * the schema-evolution read path: an appended batch may carry
    * columns the base load lacks (a new sensor field, a tag); merged
    * read unions the schemas and NULLs the column where a file lacks
    * it. Costs one footer read per file at planning (at 100 TB: keep
    * schema-stable batches per partition, or register the store in a
    * catalog that tracks the merged schema once); row reads are
    * unchanged. */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** COMPACTION: rewrite the store keeping only the latest version of
    * each `keyCols` row (full-row survivor via one
    * max_by(struct(*), version) hash agg — no window, no sort), day-
    * partitioned again at `dstPath`. Reclaims superseded versions; at
    * scale this runs partition-at-a-time (day directories are
    * independent), and the agg shuffles one row per LIVE key. */
  def compact(spark: SparkSession, srcPath: String, dstPath: String,
              keyCols: Seq[String], versionCol: String, tsCol: String): Unit = {
    val df = read(spark, srcPath)
    val dataCols = df.columns.filterNot(_ == "event_date") // re-derived on write
    val survivors = df
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(dataCols.map(col): _*), col(versionCol)).as("_r"))
      .select(col("_r.*"))
    writeDayPartitioned(survivors, tsCol, dstPath)
  }

  /** RETENTION / TTL expiry — the first of the two maintenance jobs
    * every production TSDB runs beside compaction (drop partitions
    * older than the retention window). Because the store is
    * day-partitioned, expiry is a METADATA operation: delete the
    * `event_date=D` directories with D < `keepFrom` — O(expired days)
    * filesystem deletes, ZERO data read or rewrite (at 100 TB this is
    * the difference between an instant and a full-store rewrite; on a
    * lake format the same op is a partition-drop commit). Rows inside
    * retained days are untouched. Returns the number of partitions
    * dropped. */
  def expirePartitions(path: String, keepFrom: java.sql.Date): Int = {
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
      f.delete(): Unit
    }
    val dirs = Option(new java.io.File(path).listFiles)
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
    val expired = dirs.filter { d =>
      val v = d.getName.stripPrefix("event_date=")
      try java.sql.Date.valueOf(v).before(keepFrom)
      catch { case _: IllegalArgumentException => false } // non-date partition value: keep
    }
    expired.foreach(deleteRec)
    expired.length
  }

  /** ROLLUP maintenance — the second standing TSDB job: materialize a
    * coarser-grained aggregate store (here hourly per event_type) so
    * dashboards read the rollup while raw data ages out under
    * [[expirePartitions]]. One partial+final hash agg over the raw
    * store (exact-decimal sums per the §2.0 money policy) + one
    * clustered day-partitioned write — the rollup is
    * hours × event_types rows, so each day directory is a single small
    * file and a month of 100 TB raw collapses to MBs of rollup. The
    * agg keys on (hour, event_type): upstream partition pruning on the
    * raw scan composes (roll up only the days you need). */
  def rollupHourly(spark: SparkSession, srcPath: String, dstPath: String,
                   tsCol: String, byCol: String, valueCol: String): Unit = {
    val rolled = read(spark, srcPath)
      .groupBy(date_trunc("hour", col(tsCol)).as("hour_ts"), col(byCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double")
          .as(s"sum_$valueCol"))
    writeDayPartitioned(rolled, "hour_ts", dstPath)
  }

  /** INCREMENTAL rollup refresh — the continuous-aggregate maintenance
    * job: recompute ONLY the day partitions `batch` touched and
    * replace those directories in the rollup store (dynamic partition
    * overwrite), leaving every other day's files byte-untouched
    * (StoreSpec asserts via mtimes). The source re-read is
    * partition-pruned to the touched days, so refresh cost scales with
    * the DELTA's day count, not the store's size — at 100 TB a
    * one-day ingest re-aggregates one day. */
  def rollupRefreshDays(spark: SparkSession, srcPath: String, dstPath: String,
                        batch: DataFrame, tsCol: String, byCol: String,
                        valueCol: String): Unit = {
    // the touched-day list is bounded by the batch's time span
    val days = batch.select(to_date(col(tsCol)).as("event_date"))
      .distinct().collect().map(_.getDate(0))
    if (days.isEmpty) return
    val rolled = read(spark, srcPath)
      .filter(col("event_date").isin(days.toIndexedSeq: _*)) // partition-pruned
      .groupBy(date_trunc("hour", col(tsCol)).as("hour_ts"), col(byCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double")
          .as(s"sum_$valueCol"))
    // WRITER-scoped dynamic overwrite: the per-write option takes
    // precedence over the session conf, so no session-global
    // set/restore — a concurrent partitioned overwrite on the same
    // SparkSession can never inherit (or restore over) this write's
    // mode (ADVICE r13 item 4).
    rolled.withColumn("event_date", to_date(col("hour_ts")))
      .repartition(col("event_date"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date").parquet(dstPath)
  }

  /** BUCKETED store variant: save the store as a bucketed table
    * (`bucketBy(buckets, keyCol)` + saveAsTable — bucketing metadata
    * needs the catalog; a bare parquet path can't carry it). Reading
    * the table back, any aggregation or join keyed on `keyCol` —
    * [[latestByKey]] above all — needs NO exchange: the scan already
    * reports hash distribution by bucket, so EnsureRequirements plans
    * zero shuffles and upsert resolution over a 100 TB store never
    * moves a row (asserted in StoreSpec). The trade: ingest pays the
    * bucketing shuffle once at write. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keyCol).saveAsTable(table)

  /** Upsert-on-read: the LATEST version per `keyCols`, where
    * `versionCol` is the monotone version (here the unique event_id —
    * a commit timestamp at scale). One hash aggregation: max_by picks
    * each tracked column from the max-version row, so no window/sort
    * pass and no per-key shuffle beyond the agg's own — the shape that
    * holds when the store is 100 TB and the key space is billions. */
  def latestByKey(df: DataFrame, keyCols: Seq[String], versionCol: String,
                  valueCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(max(col(versionCol)).as(s"last_${versionCol}"),
        valueCols.map(v =>
          max_by(col(v), col(versionCol)).as(s"last_$v")) :+
          count(lit(1)).as("n_versions"): _*)

  // ----------------------------------------------------------------
  // Gate fixture: the events store (base load + one update batch),
  // built ONCE per (session, corpus) — memoized like NearDup's label
  // frames so the two gated queries share one write.
  // ----------------------------------------------------------------

  /** The deterministic update batch: every 1000th event re-ingested
    * as a NEW VERSION (event_id + 10⁷ keeps ids unique and monotone
    * above the base; value + 1000 makes the update visible in any
    * value aggregate). Both constants are inlined into the oracles. */
  private val versionOffset = 10000000L
  private val valueBump = 1000.0

  private[graft] def updateBatch(events: DataFrame): DataFrame =
    events.filter(col("event_id") % 1000 === 0)
      .withColumn("event_id", col("event_id") + versionOffset)
      .withColumn("value", col("value") + valueBump)

  /** size+mtime stamp of the source events parquet, so a regenerated
    * corpus rebuilds the store (the NearDup.corpusStamp contract). */
  private def stamp(d: String): String = {
    def rec(f: java.io.File): String =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName).map(rec).mkString("[", ",", "]")
      else s"${f.getName}:${f.length}:${f.lastModified}"
    val f = new java.io.File(s"$d/events.parquet")
    if (f.exists) rec(f) else d
  }

  /** Per-JVM uid + strong digest (ADVICE round 12): the old path was a
    * 32-bit hashCode of (sfDir + stamp) SHARED across JVMs — two
    * processes over the same corpus raced overwrite-then-append on one
    * directory, and a hashCode collision could conflate distinct
    * corpora. Now: sha-256 prefix (collision-proof in practice) inside
    * a per-JVM directory (no cross-process path sharing at all), and
    * the JVM-wide `built` map's computeIfAbsent serializes concurrent
    * builders of the same corpus within this JVM. The store content is
    * deterministic in the corpus, so JVM-wide (not per-session) memo
    * keys are sound; stamp changes (corpus regen) re-key and rebuild. */
  private lazy val jvmUid: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      .replaceAll("[^A-Za-z0-9]", "")
  private def sha16(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(12).map("%02x".format(_)).mkString
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  // per-key lock objects, NOT computeIfAbsent-with-build: ensure*
  // builds NEST (ensureCompactedStore/ensureRetainedStore/
  // ensureRollupStore all call ensureEventsStore), and a nested
  // computeIfAbsent on one ConcurrentHashMap throws
  // IllegalStateException("Recursive update") whenever the two digests
  // share a hash bin — the DiskMemo.ensure fix applied here. Build
  // dependencies form a DAG, so lock order is consistent (no deadlock).
  private val buildLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def ensureBuilt(key: String)(build: String => Unit): String = {
    val dg = sha16(key)
    var path = built.get(dg)
    if (path == null) {
      buildLocks.computeIfAbsent(dg, _ => new Object).synchronized {
        path = built.get(dg)
        if (path == null) {
          val p = new java.io.File(
            sys.props("java.io.tmpdir"), s"graft_store_${jvmUid}_$dg").getAbsolutePath
          build(p)
          built.put(dg, p)
          path = p
        }
      }
    }
    path
  }

  /** The BASE LOAD alone (no update batch), built once per JVM+corpus
    * — the staging store the batch-carrying fixtures derive from by
    * FILE COPY (round-19 optimization, guide §6): the events store and
    * the schema-evolution store share an identical base load, and the
    * old spelling re-ran the full clustered partitioned write for each
    * (~1.2 s of shuffle + 30-directory commit apiece at sf0.1) to
    * produce byte-equivalent directories. Copying the staged base
    * (2.8 MB / 30 day dirs → tens of ms) is content-identical —
    * the copyRec device ensureRetainedStore already uses. */
  private def ensureBaseStore(spark: SparkSession, sfDir: String): String =
    ensureBuilt(s"base|$sfDir ${stamp(sfDir)}") { path =>
      // STORE INVARIANT, enforced at load: (user_id, ts) — the upsert
      // key — is non-null. The day-profile/vacuum grid rewrites count
      // pre-agg rows where the oracle counts DISTINCT user_id; a NULL
      // would form a grid row countDistinct excludes, silently
      // breaking oracle exactness on a future corpus. raise_error
      // rides the existing write pass — no extra scan.
      val events = graft.core.Tables.events(spark, sfDir)
        .withColumn("user_id", expr(
          "if(user_id IS NULL OR ts IS NULL, " +
            "raise_error('events store invariant violated: NULL user_id/ts'), user_id)"))
      writeDayPartitioned(events, "ts", path)
    }

  /** Build (once per JVM+corpus) the gate's events store under
    * java.io.tmpdir: bulk load (copied from [[ensureBaseStore]]) +
    * appended update batch. Returns the store path. Idempotent:
    * overwrite-then-append, so a rebuild after corpus regen yields
    * byte-equivalent content. */
  def ensureEventsStore(spark: SparkSession, sfDir: String): String =
    ensureBuilt(s"events|$sfDir ${stamp(sfDir)}") { path =>
      copyRec(new java.io.File(ensureBaseStore(spark, sfDir)),
        new java.io.File(path))
      val events = graft.core.Tables.events(spark, sfDir)
      appendDayPartitioned(updateBatch(events), "ts", path)
    }

  /** Compact (once per JVM+corpus) the gate's events store at
    * (user_id, ts) granularity — exactly the update batch's duplicated
    * keys collapse, each to its max-event_id version. Returns the
    * compacted store's path. */
  def ensureCompactedStore(spark: SparkSession, sfDir: String): String =
    ensureBuilt(s"compact|$sfDir ${stamp(sfDir)}") { dst =>
      val src = ensureEventsStore(spark, sfDir)
      compact(spark, src, dst, Seq("user_id", "ts"), "event_id", "ts")
    }

  /** Retention cutoff used by the gated retention query — inlined in
    * its oracle (the store holds 2024-01-01..30, so 15 days expire). */
  private[graft] val retentionCutoff: java.sql.Date =
    java.sql.Date.valueOf("2024-01-15")

  private def copyRec(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      Option(src.listFiles).getOrElse(Array.empty[java.io.File])
        .foreach(f => copyRec(f, new java.io.File(dst, f.getName)))
    } else
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Gate fixture: a copy of the events store with partitions before
    * [[retentionCutoff]] dropped via [[expirePartitions]] — the
    * metadata-only delete is the op under test (the copy exists only
    * so sibling gated queries keep the full store). */
  def ensureRetainedStore(spark: SparkSession, sfDir: String): String =
    ensureBuilt(s"retain|$sfDir ${stamp(sfDir)}") { dst =>
      val src = ensureEventsStore(spark, sfDir)
      copyRec(new java.io.File(src), new java.io.File(dst))
      expirePartitions(dst, retentionCutoff)
      // a corpus that lies ENTIRELY before the cutoff expires to zero
      // partitions — keep the store readable with the zero-row
      // schema-marker device (the writeDayPartitioned contract; a
      // later real append removes it again)
      val files = Option(new java.io.File(dst).listFiles)
        .getOrElse(Array.empty[java.io.File])
      if (!files.exists(f => f.isDirectory && f.getName.startsWith("event_date=")))
        read(spark, src).limit(0).write.mode("overwrite").parquet(dst)
    }

  /** Gate fixture: the hourly (hour × event_type) rollup store
    * materialized from the events store via [[rollupHourly]]. */
  def ensureRollupStore(spark: SparkSession, sfDir: String): String =
    ensureBuilt(s"rollup|$sfDir ${stamp(sfDir)}") { dst =>
      val src = ensureEventsStore(spark, sfDir)
      rollupHourly(spark, src, dst, "ts", "event_type", "value")
    }

  /** Gate fixture: the hourly rollup maintained INCREMENTALLY — v1
    * rolled up from the base load only, then the update batch lands in
    * the source store and [[rollupRefreshDays]] recomputes just the
    * touched day partitions. The gated read proves incremental ≡ full
    * recompute (its oracle is the full-store hourly aggregate). */
  def ensureIncRollupStore(spark: SparkSession, sfDir: String): String =
    ensureBuilt(s"incroll|$sfDir ${stamp(sfDir)}") { dst =>
      // Source reuse (round-19 optimization, verdict item 3 / guide
      // §6): the old spelling staged a PRIVATE copy of the events
      // store (one full writeDayPartitioned of the corpus plus one
      // appendDayPartitioned of the batch — two extra clustered
      // partitioned writes) purely so the v1 rollup could aggregate
      // "base load only". The shared gate store already holds
      // base + update batch, and batch rows are identified exactly by
      // the version offset (event_id >= 10^7, the as-of-version
      // contract StoreSpec pins) — so v1 rolls up the SHARED store
      // filtered below the offset (row-identical input ⇒ identical
      // aggregate), and the refresh prunes the shared store to the
      // touched days exactly as before. The incremental-refresh
      // machinery under test (rollupRefreshDays: day-pruned re-agg +
      // dynamic partition overwrite, untouched days byte-identical)
      // is unchanged and still receipted by StoreSpec's mtime test.
      val src = ensureEventsStore(spark, sfDir)
      val events = graft.core.Tables.events(spark, sfDir)
      val baseOnly = read(spark, src).filter(col("event_id") < versionOffset)
      val v1 = baseOnly
        .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      writeDayPartitioned(v1, "hour_ts", dst)
      rollupRefreshDays(spark, src, dst, updateBatch(events), "ts", "event_type", "value")
    }

  /** Gate fixture for SCHEMA EVOLUTION: the events store rebuilt with
    * the update batch carrying a NEW `batch_tag` column the base load
    * lacks — the "a later ingest added a field" shape. Read it with
    * [[readMerged]]; base rows surface NULL tags. */
  def ensureEvolvedStore(spark: SparkSession, sfDir: String): String =
    ensureBuilt(s"evolve|$sfDir ${stamp(sfDir)}") { dst =>
      // base load COPIED from the shared staging store (round-19 —
      // identical bytes, no second full clustered write; see
      // ensureBaseStore), then the tagged batch appends on top,
      // exactly the "a later ingest added a field" shape under test.
      copyRec(new java.io.File(ensureBaseStore(spark, sfDir)),
        new java.io.File(dst))
      val events = graft.core.Tables.events(spark, sfDir)
      appendDayPartitioned(
        updateBatch(events).withColumn("batch_tag", lit("u1")), "ts", dst)
    }

  /** Forget memoized store paths (graft.core.Caches). Rebuilds are
    * idempotent overwrites, so clearing is always safe. */
  private[graft] def clearMemo(s: SparkSession): Unit = built.clear()
}
