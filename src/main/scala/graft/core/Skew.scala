package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for the 100 TB tier.
  *
  * AQE's skew-join splitting handles most runtime skew automatically
  * (enabled by default in Spark 4); these helpers cover the cases AQE
  * can't: a pathologically hot GROUP BY key, and a hot join key where
  * the build side is small enough to replicate.
  *
  *  - [[saltedAgg]]: two-phase aggregation — shuffle once on
  *    (key, salt) so one hot key spreads over `salts` reducers, then
  *    combine the per-salt partials. Works for any commutative
  *    aggregate expressed as (partial, merge) pairs; here sum/count,
  *    which cover mean/variance via the exact-sum device.
  *  - [[saltedJoin]]: replicate each small-side row `salts` times with
  *    an explicit salt column; big side tags rows with a random-free,
  *    deterministic salt (hash of a disambiguating column) so the join
  *    key becomes (key, salt) and a hot key fans out. Semantics equal
  *    the plain inner join (SkewSpec asserts equivalence).
  */
object Skew {

  /** Two-phase salted sum/count per key. `tieCol` drives the
    * deterministic salt (any column with per-row variation). */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
                tieCol: String, salts: Int = 16): DataFrame =
    df
      .withColumn("_salt", pmod(hash(col(tieCol)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(
        sum(col(valueCol).cast("decimal(18,2)")).as("_psum"),
        count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(
        sum("_psum").cast("double").as("sum_value"),
        sum("_pcnt").as("n"))

  /** Salted inner equi-join: big ⋈ small on `key`, hot keys spread
    * over `salts` partitions by replicating the small side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 tieCol: String, salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(hash(col(tieCol)), lit(salts)))
    val replicated = small
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
