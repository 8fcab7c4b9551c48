package graft.core

import org.apache.spark.sql.SparkSession

/** Cache lifecycle for long-lived sessions.
  *
  * The dedup/ANN queries pin a handful of SLIM frames — SimHash
  * sketches, banded LSH signatures (2–3 int64s per row, never a
  * document or vector payload) — via plan-keyed `.cache()`, so the
  * two sides of each self-join and sibling queries over the same
  * corpus share one computation. `graft.text.NearDup` additionally
  * memoizes the dedup cluster-label frame driver-side (its
  * localCheckpoint plan is unique per invocation, so Spark's
  * plan-keyed cache could never share it).
  *
  * Single-shot drivers (`graft.Bench`, `graft.Verify`) need no
  * cleanup: `spark.stop()` releases every cached block and memo with
  * the JVM. A long-lived session iterating over MANY corpora should
  * call [[release]] between corpora so retired entries don't
  * accumulate (each is small, but 100 corpora × a few MB is real
  * executor memory at scale).
  *
  * Driver-side memos released here (all keyed by (session, corpus
  * stamp), so a regenerated corpus re-derives automatically):
  * NearDup's cluster labels + n-gram pair stats (their plans embed
  * per-invocation UDAF/checkpoint identities, so Spark's plan-keyed
  * cache can never share them), and TsdbStore's built/compacted
  * store paths (filesystem artifacts, not plans).
  */
object Caches {
  /** Drop every engine-held cache for `spark`: the driver-side label
    * memo and all of Spark's in-memory relation cache entries. */
  def release(spark: SparkSession): Unit = {
    graft.text.NearDup.clearMemo(spark)
    graft.store.TsdbStore.clearMemo(spark)
    DiskMemo.clear()
    Tables.clearMemo()
    spark.catalog.clearCache()
  }
}
