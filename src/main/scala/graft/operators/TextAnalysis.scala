package graft.operators

import graft.GQuery

/** Text analysis over `documents` — filled in wave 3. */
object TextAnalysis {
  val all: Seq[GQuery] = Seq()
}
