package graft.tools
import graft.GraftSession
import graft.suite.{Artifacts, Registry}
import org.apache.spark.sql.functions._
object ProbeBm25 {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROBE $name rows=$n t=${(System.nanoTime - t0) / 1e9}%.3f")
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("probe-bm25")
    val dir = "/root/repo/tmp/sf1"
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    val docs = Registry.tbl(spark, dir, "documents")
    for (lap <- 1 to 2) {
      println(s"--- lap $lap")
      val tf = Artifacts.memo(spark, dir, "documents", "bm25_tf")(
        graft.text.Corpus.bm25Tf(docs, "doc_id", "text"))
      t("tf.count")(tf.count())
      val dl = Artifacts.memo(spark, dir, "documents", "bm25_dl")(
        tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
      t("dl.count")(dl.count())
      val dfq = Artifacts.memo(spark, dir, "documents", "bm25_df")(
        graft.text.Corpus.termStats(tf))
      t("df.count")(dfq.count())
      t("n_docs")(docs.select(countDistinct(col("doc_id"))).collect()(0).getLong(0))
      t("full")(graft.text.Corpus.bm25TopDocs(docs, "doc_id", "text", 5, 20,
        Some(tf), Some(dl), Some(dfq)).count())
    }
    spark.stop()
  }
}
