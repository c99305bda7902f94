package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Protocol (hardened round 5):
  *
  *  1. SETUP — one-time shared artifacts (dedup corpus index, bucketed
  *     join tables) built up front and itemized separately, so index
  *     cost never reads as a query regression.
  *  2. One COLD lap — per-plan codegen/JIT/file-listing cost.
  *  3. K warm laps; the reported number is the per-query MEDIAN across
  *     them (min/max kept for variance). Between laps the session cache
  *     is cleared and the shared artifacts re-pinned: queries that
  *     `.cache()` internally would otherwise accumulate ~134 frames per
  *     lap until storage eviction starts recomputing hot frames mid-lap
  *     (the observed multi-second run-to-run swings).
  *
  * A throwing query is recorded under "errors" (name -> exception) with
  * value -1 — never silently timed as if it ran.
  */
object Bench {
  private val WarmLaps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    // JVM/codegen warmup so the first measured query doesn't absorb
    // session startup (~4-5s on this box)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // ---- setup phase ----
    val setup = scala.collection.mutable.LinkedHashMap[String, Double]()
    def setupStep(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; setup(name) = secs(t0)
    }
    // Read every input table end-to-end once (all columns) so the OS
    // page cache and parquet footers are hot BEFORE the cold lap: the
    // r5 A/B runs showed the single-shot cold lap swinging 1.4-2x with
    // nothing but page-cache state (137.7s vs 222.7s, same code, warm
    // medians within 0.5%). With I/O state pinned here, "cold" measures
    // what the protocol defines: per-plan codegen/JIT/listing cost.
    setupStep("page_cache_warm") {
      val tables = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      tables.foreach { t =>
        val df = suite.Registry.tbl(spark, sfDir, t)
        df.select(org.apache.spark.sql.functions.xxhash64(df.columns.map(df.col): _*))
          .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).count()
      }
    }
    setupStep("dedup_corpus_index")(suite.DedupQueries.prebuildArtifacts(spark, sfDir))
    setupStep("ivf_index")(suite.SimilarityQueries.prebuildArtifacts(spark, sfDir))
    setupStep("bucketed_tables")(suite.ExtrasQueries.prebuildBucketed(spark, sfDir))
    setupStep("graph_edges")(suite.GraphQueries.prebuildArtifacts(spark, sfDir))

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    def lap(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch {
            case t: Throwable =>
              errors(name) = (t.getClass.getSimpleName + ": " +
                Option(t.getMessage).getOrElse("").linesIterator
                  .take(1).mkString.take(200))
              false
          }
        name -> (if (ok) secs(t0) else -1.0)
      }

    // drop per-query cache accumulation, keep the shared indexes warm
    def resetCaches(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      suite.Artifacts.rewarmAll(spark)
    }

    val cold = lap()
    val warmLaps = (1 to WarmLaps).map { _ => resetCaches(); lap() }

    def stat(pick: Seq[Double] => Double): Map[String, Double] =
      cold.keys.map { name =>
        val vs = warmLaps.map(_(name))
        name -> (if (vs.contains(-1.0)) -1.0 else pick(vs.sorted))
      }.toMap
    val med = stat(vs => vs(vs.size / 2))
    val mn = stat(_.head)
    val mx = stat(_.last)

    def fmt(m: Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }.mkString("{", ",", "}")
    def fmtS(m: scala.collection.Map[String, String]): String =
      m.map { case (k, v) => "\"" + k + "\":\"" + v.replace("\"", "'") + "\"" }
        .mkString("{", ",", "}")

    val json =
      s"""{"metric":"total","value":${f"${med.values.filter(_ >= 0).sum}%.3f"},"unit":"sec"""" +
        s""","queries":${fmt(med)},"queries_min":${fmt(mn)},"queries_max":${fmt(mx)}""" +
        s""","warm_laps":$WarmLaps,"cold_value":${f"${cold.values.filter(_ >= 0).sum}%.3f"}""" +
        s""","queries_cold":${fmt(cold)}""" +
        s""","setup_sec":${f"${setup.values.sum}%.3f"},"setup":${fmt(setup.toMap)}""" +
        s""","errors":${fmtS(errors)},"sf":"$sfDir"}"""
    println(json)
    // stdout capture can truncate a multi-KB line; keep a durable copy so
    // per-query round deltas stay computable
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_full.json"), json + "\n")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
