package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two sketch contracts the oracle can't check:
  *
  * - HLL: per-shard sketches MERGE into a corpus-wide estimate without
  *   re-touching rows (the distributed property), and both the merged
  *   and the directly-built estimates land within the error envelope of
  *   the exact count. (Merge is NOT bit-lossless in Datasketches HLL —
  *   the union gadget carries its own state — so the contract is the
  *   envelope, not estimate equality.)
  * - approx_percentile: at a reduced accuracy (the real production
  *   setting) the sketch answer stays within 1/accuracy rank error of
  *   the exact discrete quantile.
  */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("hll union of per-source sketches == whole-corpus sketch; error bounded") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mergedEst = docs.groupBy(col("source"))
      .agg(hll_sketch_agg(col("doc_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val directEst = docs
      .agg(hll_sketch_estimate(hll_sketch_agg(col("doc_id"))).as("est"))
      .head().getLong(0)
    val exact = docs.select(col("doc_id")).distinct().count()
    def relErr(est: Long) = math.abs(est - exact).toDouble / exact
    assert(relErr(mergedEst) <= 0.05,
      f"merged HLL off by ${relErr(mergedEst) * 100}%.1f%% (> 5%%)")
    assert(relErr(directEst) <= 0.05,
      f"direct HLL off by ${relErr(directEst) * 100}%.1f%% (> 5%%)")
  }

  test("reduced-accuracy percentile sketch stays within its rank-error bound") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val n = li.count()
    val accuracy = 100 // rank error <= n/accuracy
    val approx = li.agg(percentile_approx(
        col("l_quantity"), lit(0.9), lit(accuracy)).as("p"))
      .head().getDouble(0)
    // rank of the sketch answer must be within n/accuracy of 0.9n
    val rank = li.filter(col("l_quantity") <= approx).count()
    val tol = n.toDouble / accuracy + 1
    assert(math.abs(rank - 0.9 * n) <= tol,
      s"sketch p90=$approx has rank $rank, expected ${0.9 * n} +- $tol")
  }
}
