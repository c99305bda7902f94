package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge training against the hand-computable classic fixture
  * (Sennrich et al. 2016 §3.2 style) plus the greedy-overlap contract.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
  ).toDF("word", "cnt")

  test("first four merges match the hand computation with the documented tie-break") {
    // pair counts by hand: (e,s)=9 and (s,t)=9 tie -> (e,s) wins lexico;
    // then (es,t)=9; then (l,o)=7 and (o,w)=7 tie -> (l,o); then (lo,w)=7
    val (merges, _) = Bpe.trainMerges(corpus, "word", "cnt", 4)
    assert(merges.map(m => (m.l_sym, m.r_sym, m.pair_count)) ==
      Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
    assert(merges.map(_.merge_rank) == Seq(1L, 2L, 3L, 4L))
  }

  test("final symbol frame reflects the applied merges") {
    val (_, fin) = Bpe.trainMerges(corpus, "word", "cnt", 4)
    val got = fin.select(trim(col("w")).as("w"), col("cnt"))
      .as[(String, Long)].collect().toMap
    assert(got("low") == 5L)          // fully merged
    assert(got("low e r") == 2L)      // 'lower' = low + e + r
    assert(got("n e w est") == 6L)
    assert(got("w i d est") == 3L)
  }

  test("overlapping pairs count every adjacent position; merge applies greedy leftmost") {
    val aaa = Seq(("aaa", 1L)).toDF("word", "cnt")
    val pc = Bpe.pairCounts(Bpe.symbolized(aaa, "word", "cnt"))
      .as[(String, String, Long)].collect().toSeq
    assert(pc == Seq(("a", "a", 2L))) // both positions counted
    val (m, fin) = Bpe.trainMerges(aaa, "word", "cnt", 1)
    assert(m.map(x => (x.l_sym, x.r_sym, x.pair_count)) == Seq(("a", "a", 2L)))
    assert(fin.select(trim(col("w"))).as[String].head() == "aa a")
  }

  test("greedy leftmost merges every non-overlapping occurrence in repeated runs") {
    // the case the naive padded replace gets wrong (" a a a a " ->
    // " aa a a "): canonical BPE pairs up greedily left to right
    def applied(word: String, l: String, r: String): String = {
      val df = Seq((word, 1L)).toDF("word", "cnt")
      Bpe.symbolized(df, "word", "cnt")
        .select(trim(Bpe.applyMerge(col("w"), l, r)))
        .as[String].head()
    }
    assert(applied("aaaa", "a", "a") == "aa aa")
    assert(applied("aaaaa", "a", "a") == "aa aa a")   // odd run: trailing single
    assert(applied("abab", "a", "b") == "ab ab")      // adjacent distinct-pair occurrences
    assert(applied("aab", "a", "b") == "a ab")
    assert(applied("ba", "a", "b") == "b a")          // order matters: no merge
  }

  test("training stops when no pairs remain instead of looping") {
    val tiny = Seq(("ab", 3L)).toDF("word", "cnt")
    val (merges, fin) = Bpe.trainMerges(tiny, "word", "cnt", 10)
    assert(merges.map(x => (x.l_sym, x.r_sym)) == Seq(("a", "b")))
    assert(fin.select(trim(col("w"))).as[String].head() == "ab")
  }

  test("symbolCounts weights by word count") {
    val (_, fin) = Bpe.trainMerges(corpus, "word", "cnt", 4)
    val sc = Bpe.symbolCounts(fin).as[(String, Long)].collect().toMap
    assert(sc("est") == 9L && sc("low") == 7L && sc("e") == 8L)
  }
}
