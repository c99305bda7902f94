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

  test("chunkDocuments: stride windows overlap, offsets trace, tail is short") {
    val d = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than one chunk
      (3L, "solo")                                    // single token
    ).toDF("doc_id", "text")
    val got = Corpus.chunkDocuments(d, "doc_id", "text", chunkTokens = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq === Seq(
      (1L, 0L, 0L, 4L, "w1 w2 w3 w4"),
      (1L, 1L, 3L, 4L, "w4 w5 w6 w7"),   // 1-token overlap with previous
      (1L, 2L, 6L, 4L, "w7 w8 w9 w10"),
      (1L, 3L, 9L, 1L, "w10"),           // short tail
      (2L, 0L, 0L, 3L, "a b c"),
      (3L, 0L, 0L, 1L, "solo")))
    // zero-shuffle claim: no Exchange in the unordered plan
    val plan = Corpus.chunkDocuments(d, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking should not shuffle:\n$plan")
  }

  test("chunkDocuments reconstruction: stride == chunk size partitions losslessly") {
    // non-overlapping chunks concatenate back to the document, and chunk
    // token counts sum to the document's token count — for any doc length
    // around the window boundary (multiple, off-by-one, shorter)
    val d = (1 to 17).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Corpus.chunkDocuments(d, "doc_id", "text", chunkTokens = 5, stride = 5)
    // collect_list order is not guaranteed post-shuffle: sort the
    // (chunk_idx, chunk_text) structs inside the aggregation instead
    val rebuilt = chunks
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          x => x.getField("chunk_text")), " ").as("text2"),
        sum(col("n_tok")).as("n2"))
    val joined = d.join(rebuilt, Seq("doc_id"))
      .withColumn("n", size(split(col("text"), " ")))
      .collect()
    joined.foreach { r =>
      assert(r.getAs[String]("text") === r.getAs[String]("text2"))
      assert(r.getAs[Long]("n2") === r.getAs[Int]("n").toLong)
    }
    assert(joined.length === 17)
  }

  test("bm25: only docs containing a query term score; saturation favors higher tf") {
    // exactly one eligible query term: 'q' has df=2 < N/2 (N=5); the c*
    // terms appear in every doc (df=5) so the query-term selector skips
    // them. Only docs 1 and 2 match; doc 1 (tf=3) must outrank doc 2
    // (tf=1) despite its longer length at these BM25 constants.
    val corpus = Seq(
      (1L, "q q q c1 c2 c3"),
      (2L, "q c1 c2 c3"),
      (3L, "c1 c2 c3"),
      (4L, "c1 c2 c3"),
      (5L, "c1 c2 c3")
    ).toDF("doc_id", "text")
    val got = Corpus.bm25TopDocs(corpus, "doc_id", "text", nTerms = 5, k = 10)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(got.map(_.getInt(3)).toSeq === Seq(1, 2))
    assert(got.forall(_.getLong(1) === 1L), "each matched exactly one query term")
    val scores = got.map(_.getLong(2))
    assert(scores(0) > scores(1) && scores(1) > 0L)
  }

  test("bm25: ranks are dense and scores non-increasing on the fixture corpus") {
    val got = Corpus.bm25TopDocs(docs, "doc_id", "text", nTerms = 2, k = 10)
      .orderBy("rank").collect()
    assert(got.nonEmpty)
    assert(got.map(_.getInt(3)).toSeq === (1 to got.length))
    val s = got.map(_.getLong(2))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
  }
}
