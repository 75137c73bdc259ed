package graft.operators

import graft.GQuery

/** Deduplication operators over `documents` — filled in wave 3. */
object Dedup {
  val all: Seq[GQuery] = Seq()
}
