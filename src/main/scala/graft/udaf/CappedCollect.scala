package graft.udaf

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Distinct-collect with a HARD buffer cap — the aggregation-layer
  * answer to the hot-key blowup in shingle-based near-dup candidate
  * generation.
  *
  * A plain `collect_list` over (shingle → doc ids) materializes every
  * group in full before any df-cap filter can drop it, so one
  * boilerplate shingle shared by 10⁸ documents would build a
  * multi-GB aggregation row. This aggregator saturates at `cap + 1`
  * elements: enough to KNOW the group overflowed (length > cap ⇒ drop
  * it), never more — per-group memory is O(cap) at any corpus size,
  * and Spark's two-phase aggregation truncates map-side, so the
  * shuffle carries at most cap+1 ids per (partition, key).
  *
  * Inputs must be pre-deduplicated rows (the caller feeds the DISTINCT
  * (doc_id, shingle) set), which makes the outcome deterministic: a
  * group with ≤ cap total elements always yields the complete set; a
  * larger group yields SOME cap+1-subset, and only its length is ever
  * inspected. Merge is associative/commutative up to element order —
  * callers sort the survivor arrays.
  */
object CappedCollect {
  case class Buf(items: Seq[Long])

  class CappedCollectAgg(cap: Int) extends Aggregator[Long, Buf, Buf] {
    override def zero: Buf = Buf(Vector.empty)
    override def reduce(b: Buf, a: Long): Buf =
      if (b.items.length > cap) b else Buf(b.items :+ a)
    override def merge(b1: Buf, b2: Buf): Buf = {
      val room = cap + 1 - b1.items.length
      if (room <= 0) b1 else Buf(b1.items ++ b2.items.take(room))
    }
    override def finish(r: Buf): Buf = r
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }
}
