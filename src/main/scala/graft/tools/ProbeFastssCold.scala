package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Cold-run bisect for the r12 FastSS regression: one variant per JVM
  * (codegen/JIT caches make a second cold impossible in-process).
  * `runMain graft.tools.ProbeFastssCold <variant> [sfDir]` where
  * variant ∈ base | merge | prefilter | prefilter_merge.
  */
object ProbeFastssCold {
  def main(args: Array[String]): Unit = {
    val variant = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/repo/tmp/sf1"
    val spark = GraftSession.build("graft-probe-fastss-cold")
    spark.read.parquet(s"$sfDir/customer.parquet").count()

    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    def base = cust
      .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
        col("c_name").as("nm"))
      .withColumn("blks", array_distinct(transform(
        concat(
          transform(sequence(lit(1), length(col("nm"))),
            i => concat(
              col("nm").substr(lit(1), i - 1),
              col("nm").substr(i + 1, length(col("nm"))))),
          array(col("nm"))),
        v => xxhash64(v))))

    def shape(prefilter: Boolean, merge: Boolean): DataFrame = {
      val kk0 = base.withColumn("blk", explode(col("blks")))
      val kk = if (!prefilter) kk0 else {
        val multi = kk0.groupBy(col("nk"), col("blk"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") >= 2)
          .select(col("nk"), col("blk"))
        kk0.join(multi, Seq("nk", "blk"), "left_semi")
      }
      val rhs = if (merge) kk.as("b").hint("MERGE") else kk.as("b")
      kk.as("a").join(rhs,
          col("a.nk") === col("b.nk") && col("a.blk") === col("b.blk") &&
            col("a.k") < col("b.k"))
        .filter(col("a.blk") ===
          array_min(array_intersect(col("a.blks"), col("b.blks"))))
        .withColumn("edit_dist",
          levenshtein(col("a.nm"), col("b.nm"), 1).cast("long"))
        .filter(col("edit_dist") >= 0)
        .select(col("a.k").as("a_custkey"), col("b.k").as("b_custkey"),
          col("edit_dist"))
        .orderBy(col("a_custkey"), col("b_custkey"))
    }

    val df = variant match {
      case "base" => shape(prefilter = false, merge = false)
      case "merge" => shape(prefilter = false, merge = true)
      case "prefilter" => shape(prefilter = true, merge = false)
      case "prefilter_merge" => shape(prefilter = true, merge = true)
    }
    (0 until 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"PROBECOLD $variant lap$i ${(System.nanoTime() - t0) / 1e9}%.3f rows=$n")
    }
    spark.stop()
  }
}
