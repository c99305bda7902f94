package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental text-index contract (`text_index_incremental`):
  * merging a new batch's term stats into the persisted index
  * algebraically equals retraining from scratch — over the FULL
  * vocabulary, not just the registered query's top slice. Also pins
  * the n-way composition property (three batches merged pairwise in
  * either association equal the scratch build), which is what lets a
  * production pipeline fold in arrivals continuously.
  */
class TextIndexIncrementalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("merged base+batch stats equal a from-scratch retrain over the full vocab") {
    val scratch = Corpus.termStats(Corpus.bm25Tf(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val base = Corpus.termStats(
      Corpus.bm25Tf(docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text"))
    val delta = Corpus.termStats(
      Corpus.bm25Tf(docs.filter(col("doc_id") % 5 === 0), "doc_id", "text"))
    val merged = Corpus.mergeTermStats(base, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(merged.nonEmpty)
    assert(merged == scratch, "algebraic merge diverged from retrain")
  }

  test("three-way merge composes: fold order does not matter") {
    def part(rem: Int) = Corpus.termStats(
      Corpus.bm25Tf(docs.filter(col("doc_id") % 3 === rem), "doc_id", "text"))
    val scratch = Corpus.termStats(Corpus.bm25Tf(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val leftFold = Corpus.mergeTermStats(
      Corpus.mergeTermStats(part(0), part(1)), part(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rightFold = Corpus.mergeTermStats(
      part(0), Corpus.mergeTermStats(part(1), part(2)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(leftFold == scratch && rightFold == scratch)
  }
}
