package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the integer-exact HLL operator that the DuckDB oracle
  * can't see:
  *
  *  - MERGE LAW, exactly: per-group register frames max-merged to the
  *    global grain produce the IDENTICAL estimate to registers built
  *    directly from the raw rows — bit equality, not an envelope
  *    (registers are a max-semilattice; this is what makes per-shard
  *    sketching at 100 TB sound regardless of sharding or merge order).
  *  - ERROR ENVELOPE: per-group and global estimates land within the
  *    textbook ~1.04/sqrt(256) = 6.5% standard error of the exact
  *    distinct count (asserted at 3 sigma ≈ 20%) once n >> 2.5·m, the
  *    raw-estimator regime the operator documents.
  */
class HllSpec extends SparkSpec {

  test("register merge to the global grain == registers built from raw") {
    val df = spark.range(60000)
      .select((col("id") % 7).cast("string").as("g"), col("id").as("u"))
    val perGroup = Hll.registers(df, Seq("g"), col("u"))
    val mergedEst = Hll.estimate(Hll.merge(perGroup, Nil), Nil)
      .select(col("z23"), col("hll_est")).head()
    val directEst = Hll.estimate(Hll.registers(df, Nil, col("u")), Nil)
      .select(col("z23"), col("hll_est")).head()
    assert(mergedEst === directEst,
      s"merge law violated: merged=$mergedEst direct=$directEst")
  }

  test("estimates land inside the 3-sigma envelope of exact counts") {
    val df = spark.range(60000)
      .select((col("id") % 7).cast("string").as("g"), col("id").as("u"))
    val est = Hll.estimate(Hll.registers(df, Seq("g"), col("u")), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = df.groupBy("g").agg(countDistinct("u").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      val relErr = math.abs(est(g) - n).toDouble / n
      assert(relErr <= 0.20,
        f"group $g: est=${est(g)} exact=$n off ${relErr * 100}%.1f%% (> 20%%)")
    }
    val globalEst = Hll.estimate(Hll.registers(df, Nil, col("u")), Nil)
      .select(col("hll_est")).head().getLong(0)
    val globalRel = math.abs(globalEst - 60000).toDouble / 60000
    assert(globalRel <= 0.20,
      f"global est=$globalEst off ${globalRel * 100}%.1f%% (> 20%%)")
  }
}
