package graft.operators

import graft.GQuery

/** Multimodal (binary) column handling — filled in wave 4. */
object Multimodal {
  val all: Seq[GQuery] = Seq()
}
