package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Corpus-level statistics for the training-data pipeline: TF-IDF term
  * scoring and train/eval contamination detection.
  *
  * Scale shapes: TF and DF are each one map-side-combined groupBy; the
  * corpus size joins in as a broadcast single-row frame (never a global
  * window); contamination is an equi-join on shingle hashes with the
  * (small) eval side broadcast. All hash arithmetic is the explicit
  * integer polyHash family, so DuckDB oracles reproduce it exactly.
  */
object Corpus {

  /** Per-document top-k terms by TF-IDF, with an integer-exact rational
    * idf: `score = tf * ((N << 20) div df)`. The idf quotient is a
    * monotone transform of N/df (the quantity `ln` would be applied to),
    * kept in integer arithmetic on purpose: `ln` differs in the last ulp
    * across engines/libms, which flips ranks between near-equal scores
    * and breaks bit-reproducibility of the ranking — the integer form
    * makes the operator's output stable under any partitioning, engine,
    * or platform. Ties break by ascending word_id.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .select(col("doc_id"), Dedup.wordId(col("word")).as("word_id"))
      .groupBy(col("doc_id"), col("word_id"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("word_id")).agg(count(lit(1)).as("df"))
    // corpus size as a broadcast 1-row dimension — the scale-safe form of
    // a global scalar (a `count() over ()` window would single-reduce)
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    tf.join(dfreq, Seq("word_id"))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * expr("(n_docs * 1048576) div df"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("word_id"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("word_id"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Train/eval contamination: training documents sharing at least
    * `minShared` 3-word shingles with ANY eval document. Returns one row
    * per contaminated training doc: (doc_id, n_eval_hits, max_shared).
    *
    * The join is an equi-join on the shingle hash; at production scale
    * the eval set is orders of magnitude smaller than the training
    * corpus, so its shingle frame broadcasts and the scan of the
    * training side stays shuffle-free. The pre-aggregation to distinct
    * (doc, shingle) pairs happens inside shingles3FromText.
    */
  def contamination(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      minShared: Int): DataFrame = {
    val trSh = Dedup.shingles3FromText(train, idCol, textCol)
    val evSh = Dedup.shingles3FromText(eval_, idCol, textCol)
      .withColumnRenamed("doc_id", "eval_id")
    val shared = trSh
      .join(broadcast(evSh), Seq("shingle"))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    shared.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("shared")).as("max_shared"))
  }
}
