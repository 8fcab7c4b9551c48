package graft.ops

import graft.store.TsdbStore
import org.apache.spark.sql.functions._

/** §1.1 store-tier gate (round-11 verdict item 3): the partitioned
  * WRITE path exercised end-to-end by declared queries. Each query
  * first ensures the events store exists (one day-partitioned bulk
  * load + one appended update batch, memoized per session+corpus —
  * graft.store.TsdbStore), then queries the STORE while its oracle
  * recomputes the answer from the ORIGINAL events parquet + the same
  * declared update rule — so any row the round trip dropped,
  * duplicated, or re-typed hash-fails.
  *
  * The update batch (inlined in both engines): every 1000th event
  * re-ingested as a new version with event_id + 10⁷ and value + 1000.
  * value + 1000.0 is one IEEE double add — identical in both engines —
  * and the decimal(18,2) cast of the result can't tie-split: a binary
  * double is never exactly a 2-dp half, so both engines round the same
  * direction (the standing §2.0 argument for the raw value column).
  */
object StoreOps {
  /** The shared update-batch CTE: store = events ∪ updates. */
  private val storeSql =
    """store AS (
      |  SELECT event_id, ts, user_id, event_type, value FROM events
      |  UNION ALL
      |  SELECT event_id + 10000000, ts, user_id, event_type, value + 1000.0
      |  FROM events WHERE event_id % 1000 = 0)""".stripMargin

  val ops: Seq[OpSpec] = Seq(
    // Partition-PRUNED time-range read of the store: filter on the
    // event_date PARTITION column, so only 3 day-directories are ever
    // opened (PartitionFilters — asserted in PlanShapeSpec; at 100 TB
    // this is the difference between scanning 3 days and 10 years).
    // Aggregate = rows + exact-decimal value mass per day: any row the
    // write path lost or duplicated inside the range flips a count or
    // a sum.
    OpSpec(
      "store_read_pruned",
      (s, d) => {
        val path = TsdbStore.ensureEventsStore(s, d)
        TsdbStore.read(s, path)
          .filter(col("event_date").between(
            lit(java.sql.Date.valueOf("2024-01-10")),
            lit(java.sql.Date.valueOf("2024-01-12"))))
          .groupBy("event_date")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
          // DATE output policy: emit the day as timestamp_ntz (midnight)
          // — Spark DateType reads back as pandas object(date) while
          // DuckDB DATE .df()'s as datetime64[us], a comparator dtype
          // split (the §2.0 tsOut rule applied to dates)
          .select(graft.core.Policy.tsOut(col("event_date").cast("timestamp"))
            .as("event_date"), col("n"), col("sum_value"))
          .orderBy("event_date")
      },
      Some(s"""WITH $storeSql
              |SELECT cast(ts as date) AS event_date, count(*) AS n,
              |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
              |FROM store
              |WHERE cast(ts as date) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
              |GROUP BY 1 ORDER BY event_date""".stripMargin),
    ),
    // UPSERT-ON-READ: latest version per user_id over the store
    // (base + appended update batch), resolved by ONE max/max_by hash
    // aggregation — no window, no sort; the MERGE-less dedup-on-read
    // that scales to billions of keys. n_versions > the user's base
    // event count proves the append landed; last_value picking the
    // bumped value proves version resolution picked the update.
    OpSpec(
      "store_upsert_latest",
      (s, d) => {
        val path = TsdbStore.ensureEventsStore(s, d)
        TsdbStore.latestByKey(
          TsdbStore.read(s, path), Seq("user_id"), "event_id", Seq("value"))
          .orderBy("user_id")
      },
      Some(s"""WITH $storeSql
              |SELECT user_id, max(event_id) AS last_event_id,
              |  arg_max(value, event_id) AS last_value,
              |  count(*) AS n_versions
              |FROM store GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),
    // The SAME upsert-on-read STRAIGHT FROM SQL TEXT through the
    // `latest_by` table-valued function — the store family's SQL tier,
    // mirroring resample/sessionize/simhash_pairs/asof_join. Expands
    // to the identical one-hash-agg plan as TsdbStore.latestByKey, so
    // this green row proves SQL tier ≡ DataFrame tier ≡ oracle.
    OpSpec(
      "store_upsert_tvf",
      (s, d) => {
        val path = TsdbStore.ensureEventsStore(s, d)
        TsdbStore.read(s, path).createOrReplaceTempView("tvf_store_events")
        s.sql("""SELECT * FROM latest_by('tvf_store_events', 'user_id', 'event_id', 'value')
                |ORDER BY user_id""".stripMargin)
      },
      Some(s"""WITH $storeSql
              |SELECT user_id, max(event_id) AS last_event_id,
              |  arg_max(value, event_id) AS last_value,
              |  count(*) AS n_versions
              |FROM store GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),
    // COMPACTION: rewrite the store keeping only the latest version
    // per (user_id, ts) — one max_by(struct(*), event_id) hash agg +
    // one clustered day-partitioned write (TsdbStore.compact), run
    // partition-at-a-time at scale. The gated read aggregates the
    // COMPACTED store per day: row counts prove superseded versions
    // (and only those) were reclaimed, the value mass proves each
    // survivor is the bumped update, max_version proves the kept row
    // is the latest one.
    OpSpec(
      "store_compact",
      (s, d) => {
        val path = TsdbStore.ensureCompactedStore(s, d)
        TsdbStore.read(s, path)
          .groupBy("event_date")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
            max(col("event_id")).as("max_version"))
          .select(graft.core.Policy.tsOut(col("event_date").cast("timestamp"))
            .as("event_date"), col("n"), col("sum_value"), col("max_version"))
          .orderBy("event_date")
      },
      Some(s"""WITH $storeSql,
              |latest AS (
              |  SELECT user_id, ts, arg_max(value, event_id) AS value,
              |    max(event_id) AS event_id
              |  FROM store GROUP BY user_id, ts)
              |SELECT cast(ts as date) AS event_date, count(*) AS n,
              |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value,
              |  max(event_id) AS max_version
              |FROM latest GROUP BY 1 ORDER BY event_date""".stripMargin),
    ),
  )
}
