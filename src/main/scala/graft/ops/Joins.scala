package graft.ops

/** Placeholder — filled in by the next milestone. */
object Joins {
  val ops: Seq[OpSpec] = Seq()
}
