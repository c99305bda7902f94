package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of `dedup_substring_spans`: known shared phrases produce
  * exactly the expected positioned spans, and on real data every span
  * satisfies the structural invariants (in-bounds, island arithmetic,
  * disjoint gram runs).
  */
class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  private val q = graft.SparkEntry.queries("dedup_substring_spans")

  test("a phrase shared by two docs yields exactly its positioned spans") {
    val dir = java.nio.file.Files.createTempDirectory("spans").toString
    // doc 1 and 2 share the 6-word run "q w e r t y" (two 5-grams);
    // doc 3 shares nothing 5 words long with anyone
    Seq(
      (1L, "q w e r t y g h", "en", "s", 15L),
      (2L, "x y2 q w e r t y z", "en", "s", 17L),
      (3L, "completely different words with no overlap here", "en", "s", 47L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = q(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc1: grams at pos 1,2 -> span words [1, 6]; doc2: grams at pos
    // 3,4 -> span words [3, 8]
    assert(got.toSeq == Seq((1L, 1L, 6L, 2L), (2L, 3L, 8L, 2L)))
  }

  test("real-data spans: in-bounds, island arithmetic, disjoint gram runs") {
    val dir = "/root/testdata/sf0.001"
    val spans = q(spark, dir)
    val k = 5
    // island arithmetic: a span of n consecutive grams covers
    // n + k - 1 words
    assert(spans.filter(
      col("n_grams") =!= col("span_end") - col("span_start") - lit(k - 2))
      .count() == 0)
    // in bounds of the doc's token count
    val nTok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long").as("n"))
    val oob = spans.join(nTok, "doc_id")
      .filter(col("span_start") < 1 || col("span_end") > col("n"))
    assert(oob.count() == 0)
    // gram runs are maximal: consecutive islands in one doc are
    // separated by at least one non-duplicated gram position
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("span_start")
    val adjacent = spans
      .withColumn("prev_end", lag(col("span_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("span_start") < col("prev_end") - lit(k - 1) + lit(2))
    assert(adjacent.count() == 0)
    // and there is real duplication to find at sf0.001
    assert(spans.count() > 0)
  }
}
