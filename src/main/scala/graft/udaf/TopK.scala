package graft.udaf

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}

/** Bounded-heap per-key top-k as a true `Aggregator` UDAF.
  *
  * The window formulation (`row_number over (key order value) <= k`)
  * shuffles EVERY row to its key's partition before discarding all but
  * k. This aggregator keeps a k-element buffer per key, so Spark's
  * two-phase aggregation discards losers map-side: the shuffle carries
  * at most k (value, id) pairs per (partition, key) — the difference
  * between shuffling 100 TB and shuffling megabytes for a per-entity
  * top-k. TopKSpec asserts equivalence with the window form.
  *
  * Merge is associative and commutative as partial aggregation
  * requires; ties are broken by id so the result is deterministic
  * under any partitioning.
  */
object TopK {
  case class ValId(v: Double, id: Long)
  case class Buf(items: Seq[ValId])

  class TopKAgg(k: Int) extends Aggregator[ValId, Buf, Buf] {
    private def desc: Ordering[ValId] =
      Ordering.by((x: ValId) => (-x.v, x.id)) // larger v first; smaller id on ties
    private def trim(s: Seq[ValId]): Buf = Buf(s.sorted(desc).take(k))
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: ValId): Buf = trim(b.items :+ a)
    override def merge(b1: Buf, b2: Buf): Buf = trim(b1.items ++ b2.items)
    override def finish(r: Buf): Buf = trim(r.items)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** df must have columns (key: Long, v: Double, id: Long); returns
    * (key, rank, id, v) with rank 1..k per key. */
  def topKPerKey(df: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val agg = udaf(new TopKAgg(k), Encoders.product[ValId])
    df.groupBy("key")
      .agg(agg(col("v"), col("id")).as("top"))
      .select(col("key"), posexplode(col("top.items")))
      .select(col("key"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col.id").as("id"), col("col.v").as("v"))
  }
}
