package graft.similarity

import graft.SparkSpec
import graft.suite.Registry
import org.apache.spark.sql.functions._

/** ANN quality gate: LSH-bucketed top-k must recover a reasonable
  * fraction of the exact top-k — the check that the scale path is not
  * just fast but useful.
  */
class AnnRecallSpec extends SparkSpec {

  test("LSH ANN recall@3 vs brute-force cosine on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    val emb = Registry.tbl(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)

    val exact = Similarity.cosineTopK(queries, emb, "vec_id", "embedding", k = 3)
      .select("q_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", 4, 64, k = 3,
        multiProbe = true)
      .filter(col("q_id") < 50)
      .select("q_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (exact & ann).size.toDouble / exact.size
    info(f"recall@3 = $recall%.2f (${(exact & ann).size}/${exact.size})")
    // 4 hyperplanes split the corpus into 16 buckets; same-bucket
    // neighbors ranked by integer dot should recover a meaningful share
    // of the true neighbors. This is a floor, not a target.
    assert(recall >= 0.3, f"ANN recall collapsed: $recall%.2f")
  }

  test("IVF ANN: disjoint cells, bounded candidates, recall@3 floor") {
    val dir = "/root/testdata/sf0.001"
    val emb = Registry.tbl(spark, dir, "embeddings")

    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", 8)
    // every vector lands in exactly one cell
    assert(assign.count() === emb.count())
    assert(assign.select("cell").distinct().count() <= 8)

    val exact = Similarity.cosineTopK(emb.filter(col("vec_id") < 50), emb,
        "vec_id", "embedding", k = 3)
      .select("q_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
        numCells = 8, nprobe = 3, k = 3)
      .filter(col("q_id") < 50)
      .select("q_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"ivf recall@3 = $recall%.2f (${(exact & ivf).size}/${exact.size})")
    // learned (2-iter k-means) codebook: 0.69 on this data; the floor
    // guards the training-free baseline's 0.62 against regressions
    assert(recall >= 0.6, f"IVF recall collapsed: $recall%.2f")
  }
}
