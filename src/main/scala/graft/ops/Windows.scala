package graft.ops

/** Placeholder — filled in by the next milestone. */
object Windows {
  val ops: Seq[OpSpec] = Seq()
}
