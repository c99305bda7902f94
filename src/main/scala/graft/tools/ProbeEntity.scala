package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Stage decomposition of join_entity_resolution at sf1: where do the
  * ~7 s go — variant explode, banded join, min-shared-key gate, or the
  * levenshtein verify? Variants test narrower shuffles:
  *   S1 explode+count; S2 join only; S3 join+gate; S4 full (current);
  *   N  narrow: keys-only join (no name/array payload on the probe
  *      side), gate via pair-dedup on (a,b) ids, names re-attached for
  *      the levenshtein verify by two id-equi-joins.
  * `runMain graft.tools.ProbeEntity [sfDir] [laps]`
  */
object ProbeEntity {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val laps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.build("graft-probe-entity")
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

    def keyed = base.withColumn("blk", explode(col("blks")))

    def s1 = keyed.agg(count(lit(1)).as("n"))

    def s3 = {
      val kk = keyed
      kk.as("a").join(kk.as("b"),
          col("a.nk") === col("b.nk") && col("a.blk") === col("b.blk") &&
            col("a.k") < col("b.k"))
        .filter(col("a.blk") ===
          array_min(array_intersect(col("a.blks"), col("b.blks"))))
        .agg(count(lit(1)).as("n"))
    }

    def s4 = {
      val kk = keyed
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
        .orderBy(col("a_custkey"), col("b_custkey"))
    }

    def nVariant = {
      // narrow join: only (nk, blk, k) rides the shuffle; candidate
      // pairs dedupe on ids; names re-attach for the exact verify
      val slim = keyed.select(col("nk"), col("blk"), col("k"))
      val cand = slim.as("a").join(slim.as("b"),
          col("a.nk") === col("b.nk") && col("a.blk") === col("b.blk") &&
            col("a.k") < col("b.k"))
        .select(col("a.k").as("ka"), col("b.k").as("kb"))
        .dropDuplicates("ka", "kb")
      val names = base.select(col("k"), col("nm"))
      cand
        .join(names.select(col("k").as("ka"), col("nm").as("na")), Seq("ka"))
        .join(names.select(col("k").as("kb"), col("nm").as("nb")), Seq("kb"))
        .withColumn("edit_dist", levenshtein(col("na"), col("nb"), 1).cast("long"))
        .filter(col("edit_dist") >= 0)
        .select(col("ka").as("a_custkey"), col("kb").as("b_custkey"),
          col("edit_dist"))
        .orderBy(col("a_custkey"), col("b_custkey"))
    }

    def time(name: String, f: => DataFrame): Unit = {
      val ts = (0 until laps).map { _ =>
        val t0 = System.nanoTime(); f.collect(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name ${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def s3h = {
      val kk = keyed
      kk.as("a").join(kk.as("b").hint("SHUFFLE_HASH"),
          col("a.nk") === col("b.nk") && col("a.blk") === col("b.blk") &&
            col("a.k") < col("b.k"))
        .filter(col("a.blk") ===
          array_min(array_intersect(col("a.blks"), col("b.blks"))))
        .agg(count(lit(1)).as("n"))
    }

    def s4h = {
      val kk = keyed
      kk.as("a").join(kk.as("b").hint("SHUFFLE_HASH"),
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
        .groupBy().count()
    }

    // P: ONE exchange of the exploded stream by (nk, blk); the
    // multi-member-bucket filter (min(k) != max(k) per bucket), the
    // semi-join back, and the pair self-join all reuse that layout —
    // and the SMJ sorts run over only the ~few% of rows in buckets of
    // size >= 2
    def pVariant = {
      val width = spark.sparkContext.defaultParallelism
      val kk = keyed.repartition(width, col("nk"), col("blk"))
      val multi = kk.groupBy(col("nk"), col("blk"))
        .agg(min(col("k")).as("k0"), max(col("k")).as("k1"))
        .where(col("k0") =!= col("k1"))
        .select(col("nk"), col("blk"))
      val slim = kk.join(multi, Seq("nk", "blk"), "left_semi")
      slim.as("a").join(slim.as("b"),
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
    def s4count = {
      val kk = keyed
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
    time("S4_count_base", s4count)
    time("P_prefilter", pVariant)
    time("S4_count_base", s4count)
    time("P_prefilter", pVariant)
    spark.stop()
  }
}
