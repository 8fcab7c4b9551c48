package graft.udaf

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** DISTINCT-collect with a HARD buffer cap — the aggregation-layer
  * answer to the hot-key blowup in shingle-based near-dup candidate
  * generation.
  *
  * A plain `collect_set` over (shingle → doc ids) materializes every
  * group in full before any df-cap filter can drop it, so one
  * boilerplate shingle shared by 10⁸ documents would build a
  * multi-GB aggregation row. This aggregator saturates at `cap + 1`
  * DISTINCT elements: enough to KNOW the group overflowed (length >
  * cap ⇒ drop it), never more — per-group memory is O(cap) at any
  * corpus size, and Spark's two-phase aggregation truncates map-side,
  * so the shuffle carries at most cap+1 ids per (partition, key).
  *
  * Deduplication happens INSIDE the bounded buffer (an O(cap)
  * contains-scan per row — cap is small by construction), so callers
  * feed the RAW exploded rows and skip the pre-`distinct()` pass — at
  * 100 TB that deletes the pipeline's largest shuffle outright. The
  * outcome is deterministic: a group with ≤ cap distinct elements
  * always yields the complete set; a larger group yields SOME
  * cap+1-subset, and only its length is ever inspected. Merge is
  * associative/commutative up to element order — callers sort the
  * survivor arrays.
  */
object CappedCollect {
  case class Buf(items: Seq[Long])

  class CappedCollectAgg(cap: Int) extends Aggregator[Long, Buf, Buf] {
    override def zero: Buf = Buf(Vector.empty)
    override def reduce(b: Buf, a: Long): Buf =
      if (b.items.length > cap || b.items.contains(a)) b else Buf(b.items :+ a)
    override def merge(b1: Buf, b2: Buf): Buf = {
      var out = b1.items
      val it = b2.items.iterator
      while (it.hasNext && out.length <= cap) {
        val a = it.next()
        if (!out.contains(a)) out = out :+ a
      }
      Buf(out)
    }
    override def finish(r: Buf): Buf = r
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }
}
