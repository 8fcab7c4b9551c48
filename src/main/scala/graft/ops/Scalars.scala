package graft.ops

/** Placeholder — filled in by the next milestone. */
object Scalars {
  val ops: Seq[OpSpec] = Seq()
}
