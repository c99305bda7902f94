package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Directory-partitioned layout (`partitionBy`) is the coarse
  * data-skipping lever that complements z-order's row-group pruning: a
  * filter on the partition column never opens the other partitions'
  * files at all (pruning happens at file listing, before any I/O). This
  * spec pins the behavior through the scan's own metrics: partition
  * filters present in the plan, strictly fewer files read, identical
  * results — the layout every 100 TB corpus write should lead with
  * (partition by coarse columns, z-order within).
  */
class PartitionPruneSpec extends SparkSpec {

  private def scan(p: SparkPlan): FileSourceScanExec = p match {
    case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
    case f: FileSourceScanExec => f
    case other =>
      other.children.collectFirst {
        case c if findable(c) => scan(c)
      }.get
  }
  private def findable(p: SparkPlan): Boolean = p match {
    case _: FileSourceScanExec => true
    case a: AdaptiveSparkPlanExec => findable(a.executedPlan)
    case other => other.children.exists(findable)
  }

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    scan(df.queryExecution.executedPlan).metrics("numFiles").value
  }

  test("partitionBy(lang) layout: a lang filter opens only that partition's files") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_ppart").toString
    docs.write.partitionBy("lang").parquet(s"$dir/by_lang")

    val part = spark.read.parquet(s"$dir/by_lang")
    val all = filesRead(part.select(col("doc_id")))
    val en = part.filter(col("lang") === "en")
    val enFiles = filesRead(en.select(col("doc_id")))

    // the filter must be a partition filter (applied at listing time),
    // not a pushed data filter
    assert(scan(en.queryExecution.executedPlan).partitionFilters.nonEmpty,
      "lang filter should prune at listing time")
    assert(enFiles < all, s"expected fewer files: en=$enFiles all=$all")
    // pruning never changes results
    val expected = docs.filter(col("lang") === "en").count()
    assert(en.count() === expected && expected > 0)
  }
}
