package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ORC path must keep parquet's scan economics: filters pushed into
  * the scan, projection pruned to the referenced columns.
  */
class OrcScanSpec extends SparkSpec {
  import spark.implicits._

  test("ORC scan: filter pushed down, schema pruned to referenced columns") {
    val out = sys.props("java.io.tmpdir") + "/graft_orc_scan_spec"
    (1L to 1000L).map(i => (i, s"f${i % 3}", i * 1.5, s"pad$i"))
      .toDF("k", "flag", "v", "padding")
      .write.mode("overwrite").orc(out)
    val df = spark.read.orc(out)
      .filter(col("flag") === "f1")
      .select(sum(col("k")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(flag), EqualTo(flag,f1)]"),
      s"filter not pushed:\n$plan")
    // projection pruned: the wide 'padding'/'v' columns never read
    assert(!plan.contains("padding"), s"pruning failed:\n$plan")
    assert(df.head.getLong(0) ===
      (1L to 1000L).filter(_ % 3 == 1).sum)
  }
}
