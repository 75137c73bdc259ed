package graft.operators

import graft.GQuery

/** Similarity search over `embeddings` — filled in wave 3. */
object Similarity {
  val all: Seq[GQuery] = Seq()
}
