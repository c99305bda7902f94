package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession

/** A/B probe for the market-basket pair-count plan shapes:
  *   a) distinct-pairs wedge self-join (round-10 shape),
  *   b) collect_set + double-explode (set build is ONE shuffle with
  *      map-side partial collect; pair generation is a pipelined
  *      generate chain, no join),
  * `runMain graft.tools.ProbeCopurchase [sfDir] [laps]`
  */
object ProbeCopurchase {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val laps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.build("graft-probe-copurchase")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count()

    def variantA: DataFrame = {
      val items = li.select(col("l_orderkey"), col("l_partkey")).distinct()
      items.select(col("l_orderkey"), col("l_partkey").as("p1"))
        .join(items.select(col("l_orderkey"), col("l_partkey").as("p2")),
          "l_orderkey")
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
        .orderBy(col("n_orders").desc, col("p1"), col("p2"))
        .limit(20)
    }

    def variantB: DataFrame = {
      val sets = li.select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("ps"))
        .select(col("ps"))
      sets
        .select(explode(col("ps")).as("p1"), col("ps"))
        .select(col("p1"), explode(col("ps")).as("p2"))
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
        .orderBy(col("n_orders").desc, col("p1"), col("p2"))
        .limit(20)
    }

    // co-partitioned wedge: ONE repartition by the join key; the dedup
    // aggregate's (ok, pk) clustering is satisfied by hash(ok) (subset
    // rule), and the self-join reuses the same exchange — so the only
    // full-width shuffle left is the pair groupBy itself
    def variantC: DataFrame = {
      val items = li.select(col("l_orderkey"), col("l_partkey"))
        .repartition(col("l_orderkey"))
        .dropDuplicates("l_orderkey", "l_partkey")
      items.select(col("l_orderkey"), col("l_partkey").as("p1"))
        .join(items.select(col("l_orderkey"), col("l_partkey").as("p2")),
          "l_orderkey")
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
        .orderBy(col("n_orders").desc, col("p1"), col("p2"))
        .limit(20)
    }

    def time(name: String, f: => DataFrame): Unit = {
      val ts = (0 until laps).map { _ =>
        val t0 = System.nanoTime(); f.collect(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name ${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // D/E: same shapes, but the pair groupBy's exchange is pinned to
    // the session shuffle width (REPARTITION_BY_NUM — AQE cannot
    // coalesce it): parallelismFirst=false coalesces the ~200MB pair
    // shuffle to ~4 tasks, starving the CPU-heavy count stage
    val width = spark.sparkContext.defaultParallelism
    def variantD: DataFrame = {
      val sets = li.select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("ps"))
        .select(col("ps"))
      sets
        .select(explode(col("ps")).as("p1"), col("ps"))
        .select(col("p1"), explode(col("ps")).as("p2"))
        .filter(col("p1") < col("p2"))
        .repartition(width, col("p1"), col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
        .orderBy(col("n_orders").desc, col("p1"), col("p2"))
        .limit(20)
    }
    def variantE: DataFrame = {
      val items = li.select(col("l_orderkey"), col("l_partkey"))
        .repartition(width, col("l_orderkey"))
        .dropDuplicates("l_orderkey", "l_partkey")
      items.select(col("l_orderkey"), col("l_partkey").as("p1"))
        .join(items.select(col("l_orderkey"), col("l_partkey").as("p2")),
          "l_orderkey")
        .filter(col("p1") < col("p2"))
        .repartition(width, col("p1"), col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
        .orderBy(col("n_orders").desc, col("p1"), col("p2"))
        .limit(20)
    }
    val which = sys.env.getOrElse("PROBE_VARIANTS", "DEDE")
    which.foreach {
      case 'A' => time("A_wedge_join", variantA)
      case 'B' => time("B_set_explode", variantB)
      case 'C' => time("C_copart_wedge", variantC)
      case 'D' => time("D_set_explode_wide", variantD)
      case 'E' => time("E_copart_wedge_wide", variantE)
      case _ => ()
    }
    spark.stop()
  }
}
