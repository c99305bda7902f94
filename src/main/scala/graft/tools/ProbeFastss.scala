package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession

/** r12 decomposition of the FastSS pair (`join_entity_resolution` /
  * `join_edit_dist_auto`): the r12 plan audit found the deletion-variant
  * array is evaluated THREE times per input row — once in the Project
  * that defines it and twice more in the `isnotnull && size > 0` filter
  * InferFiltersFromGenerate adds below the explode, which
  * PushDownPredicates substitutes through the alias (guide §4.4's
  * duplicated-expression trap, JVM flavor). Variants:
  *   C1   one forced construction pass (xxhash64 over the array, agg)
  *   K    explode + count (construction + the inferred-filter recomputes)
  *   J    the full current query shape
  *   JP   J over a PRE-MATERIALIZED (persisted) variant frame — what the
  *        fingerprinted-artifact form pays per probe
  * `runMain graft.tools.ProbeFastss [sfDir] [laps]`
  */
object ProbeFastss {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val laps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.build("graft-probe-fastss")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    cust.count()

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

    def joinShape(b: DataFrame): DataFrame = {
      val kk = b.withColumn("blk", explode(col("blks")))
      kk.as("a").join(kk.as("b"),
          col("a.nk") === col("b.nk") && col("a.blk") === col("b.blk") &&
            col("a.k") < col("b.k"))
        .filter(col("a.blk") ===
          array_min(array_intersect(col("a.blks"), col("b.blks"))))
        .withColumn("edit_dist",
          levenshtein(col("a.nm"), col("b.nm"), 1).cast("long"))
        .filter(col("edit_dist") >= 0)
        .select(col("a.k").as("a_custkey"), col("b.k").as("b_custkey"),
          col("edit_dist"))
        .groupBy().count()
    }

    def time(name: String, f: => DataFrame): Unit = {
      val ts = (0 until laps).map { _ =>
        val t0 = System.nanoTime(); f.collect(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name ${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    def joinShapeMerge(b: DataFrame, prefilter: Boolean): DataFrame = {
      val kk0 = b.withColumn("blk", explode(col("blks")))
      val kk = if (!prefilter) kk0 else {
        // only multi-member (nk, blk) buckets can produce a pair;
        // variants are near-unique so this prunes most of the sort input
        val multi = kk0.groupBy(col("nk"), col("blk"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") >= 2)
          .select(col("nk"), col("blk"))
        kk0.join(multi, Seq("nk", "blk"), "left_semi")
      }
      kk.as("a").join(kk.as("b").hint("MERGE"),
          col("a.nk") === col("b.nk") && col("a.blk") === col("b.blk") &&
            col("a.k") < col("b.k"))
        .filter(col("a.blk") ===
          array_min(array_intersect(col("a.blks"), col("b.blks"))))
        .withColumn("edit_dist",
          levenshtein(col("a.nm"), col("b.nm"), 1).cast("long"))
        .filter(col("edit_dist") >= 0)
        .select(col("a.k").as("a_custkey"), col("b.k").as("b_custkey"),
          col("edit_dist"))
        .groupBy().count()
    }

    // machine-noise control: alternate the variants ROUND-ROBIN so host
    // interference (this box shows intermittent multi-second steal)
    // lands on all variants equally; compare MINIMA across rounds.
    // guide §8 narrow form: only (nk, blk, k) rides the pair shuffle;
    // candidate pairs dedup on ids, names re-attach for the exact verify
    def joinNarrow(b: DataFrame, prefilter: Boolean): DataFrame = {
      val kk0 = b.withColumn("blk", explode(col("blks")))
        .select(col("nk"), col("blk"), col("k"))
      val kk = if (!prefilter) kk0 else {
        val multi = kk0.groupBy(col("nk"), col("blk"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") >= 2)
          .select(col("nk"), col("blk"))
        kk0.join(multi, Seq("nk", "blk"), "left_semi")
      }
      val cand = kk.as("a").join(kk.as("b").hint("MERGE"),
          col("a.nk") === col("b.nk") && col("a.blk") === col("b.blk") &&
            col("a.k") < col("b.k"))
        .select(col("a.k").as("ka"), col("b.k").as("kb"))
        .dropDuplicates("ka", "kb")
      val names = b.select(col("k"), col("nm"))
      cand
        .join(names.select(col("k").as("ka"), col("nm").as("na")), Seq("ka"))
        .join(names.select(col("k").as("kb"), col("nm").as("nb")), Seq("kb"))
        .withColumn("edit_dist", levenshtein(col("na"), col("nb"), 1).cast("long"))
        .filter(col("edit_dist") >= 0)
        .select(col("ka"), col("kb"), col("edit_dist"))
        .groupBy().count()
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("JM_merge_only", () => joinShapeMerge(base, prefilter = false)),
      ("PM_prefilter_merge", () => joinShapeMerge(base, prefilter = true)),
      ("N_narrow_merge", () => joinNarrow(base, prefilter = false)),
      ("NP_narrow_prefilter", () => joinNarrow(base, prefilter = true)),
      ("J_full_broadcast", () => joinShape(base)))
    val acc = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    variants.foreach { case (n, f) => f().collect() } // warm all plans once
    (0 until laps).foreach { _ =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime(); f().collect()
        acc(n) = acc.getOrElse(n, Vector.empty) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    acc.foreach { case (n, ts) =>
      println(f"PROBE $n min=${ts.min}%.3f laps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
