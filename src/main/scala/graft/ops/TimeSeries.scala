package graft.ops

/** Placeholder — filled in by the next milestone. */
object TimeSeries {
  val ops: Seq[OpSpec] = Seq()
}
