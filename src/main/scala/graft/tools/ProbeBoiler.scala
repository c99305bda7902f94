package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.text.TextFunctions

/** A/B probe for the boilerplate 5-gram support count:
  *   t) tokenize+gram-generate only (CPU floor: count of exploded grams)
  *   1) one-pass string groupBy with countDistinct (round-10 shape;
  *      the distinct agg plans as an expand — every gram string rides
  *      the shuffle twice)
  *   2) two-phase string agg: (gram, doc) grain then gram grain — no
  *      expand, map-side combine kills in-doc repeats
  *   3) integer-gid prefilter (polynomial word-id fold, longs on the
  *      shuffle), survivors re-counted exactly on a second scan —
  *      superset-safe under collisions
  * `runMain graft.tools.ProbeBoiler [sfDir] [laps]`
  */
object ProbeBoiler {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val laps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.build("graft-probe-boiler")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val P = graft.functions.Scalars.polyHashP

    def gramsStr: DataFrame = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), size(col("w")) - lit(5)),
          i => concat_ws(" ", slice(col("w"), i + lit(1), lit(5))))).as("gram"))

    def gramsGid: DataFrame = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"),
        transform(col("w"), t => graft.dedup.Dedup.wordId(t)).as("ws"))
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), size(col("ws")) - lit(5)),
          i => aggregate(slice(col("ws"), i + lit(1), lit(5)), lit(0L),
            (acc, x) => (acc * lit(131L) + x) % lit(P)))).as("gid"))

    def vT: DataFrame = gramsStr.agg(count(lit(1)).as("n"))

    def v1: DataFrame = gramsStr
      .groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= 3)
      .orderBy("gram")

    def v2: DataFrame = gramsStr
      .groupBy(col("gram"), col("doc_id"))
      .agg(count(lit(1)).as("n_in_doc"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_in_doc")).as("n_occurrences"))
      .filter(col("n_docs") >= 3)
      .orderBy("gram")

    def v3: DataFrame = {
      val cand = gramsGid
        .groupBy(col("gid"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 3)
        .select(col("gid"))
      gramsStr
        .withColumn("gid",
          aggregate(transform(split(col("gram"), " "),
              t => graft.dedup.Dedup.wordId(t)), lit(0L),
            (acc, x) => (acc * lit(131L) + x) % lit(P)))
        .join(broadcast(cand), Seq("gid"))
        .groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_docs") >= 3)
        .orderBy("gram")
    }

    def time(name: String, f: => DataFrame): Unit = {
      val ts = (0 until laps).map { _ =>
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name ${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("T_generate_floor", vT)
    time("V1_onepass_cd", v1)
    time("V2_twophase", v2)
    time("V3_gid_prefilter", v3)
    spark.stop()
  }
}
