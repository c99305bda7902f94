package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "common rare1 common filler", "s1"),
    (2L, "common filler stuff", "s1"),
    (3L, "common stuff other", "s2")
  ).toDF("doc_id", "text", "source")

  test("tfidf: a corpus-wide word ranks below a document-unique word") {
    val top = Corpus.tfidfTopTerms(docs, "doc_id", "text", k = 10)
      .filter(col("doc_id") === 1)
      .orderBy("rank")
      .collect()
    val byWord = top.map(r => r.getLong(1) -> (r.getLong(4), r.getInt(5))).toMap
    val commonId = graft.dedup.Dedup.wordId(lit("common"))
    val rareId = graft.dedup.Dedup.wordId(lit("rare1"))
    val ids = docs.sparkSession.range(1)
      .select(commonId.as("c"), rareId.as("r")).head()
    val (cScore, cRank) = byWord(ids.getLong(0))
    val (rScore, rRank) = byWord(ids.getLong(1))
    // df(common)=3 of N=3 -> idf quotient 1<<20; unique word df=1 -> 3<<20;
    // tf(common in doc1)=2 so scores are 2*(1<<20) vs 3*(1<<20)
    assert(cScore === 2L * (1L << 20) && rScore === 3L * (1L << 20))
    assert(rRank < cRank)
  }

  test("contamination flags only train docs sharing >= minShared shingles with eval") {
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon"), // shares the eval 3-shingle chain
      (11L, "zeta eta theta iota kappa")       // disjoint
    ).toDF("doc_id", "text")
    val eval_ = Seq((90L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = Corpus.contamination(train, eval_, "doc_id", "text", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 10 shares shingles (alpha,beta,gamma) and (beta,gamma,delta)
    assert(got.toSeq === Seq((10L, 1L, 2L)))
  }
}
