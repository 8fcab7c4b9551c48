package graft.ops

/** Placeholder — filled in by the next milestone. */
object LlmOps {
  val ops: Seq[OpSpec] = Seq()
}
