package graft.suite

/** Placeholders — filled in as the corresponding packages land. */
object DedupQueries { def all: Seq[QDef] = Seq.empty }
object TextQueries { def all: Seq[QDef] = Seq.empty }
object SimilarityQueries { def all: Seq[QDef] = Seq.empty }
object MultimodalQueries { def all: Seq[QDef] = Seq.empty }
object StreamingQueries { def all: Seq[QDef] = Seq.empty }
