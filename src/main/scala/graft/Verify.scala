package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Each query runs under a wall-clock budget
  * (SPARK_GRAFT_QUERY_TIMEOUT_SEC, default 120 s — queries at sf0.01
  * take ~1 s; the margin is for cold JIT). On timeout its Spark job
  * group is cancelled and the QUERY is recorded failed — the RUN
  * continues, so one runaway plan can never zero the whole round's
  * correctness artifact again (round 5: one plan-exponential query
  * consumed the driver's entire budget and CORRECTNESS_r05 came back
  * empty).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    val spark = GraftSession.build("graft-verify")
    new java.io.File(outDir).mkdirs()
    val timeoutSec =
      sys.env.get("SPARK_GRAFT_QUERY_TIMEOUT_SEC").map(_.toLong).getOrElse(120L)
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only.exists(n.startsWith) }
    selected.foreach { case (name, fn) =>
      Budget.runBounded(spark, name, timeoutSec) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } match {
        case Budget.Ok(_) => ()
        case Budget.Failed(msg) =>
          System.err.println(s"[verify] $name failed: $msg")
        case Budget.TimedOut(stuck) =>
          // a write cancelled mid-flight can leave a PARTIAL parquet dir
          // that the downstream DuckDB compare would read as a (wrong)
          // result — delete it so the query reads unambiguously failed
          val dir = Paths.get(s"$outDir/$name")
          if (Files.exists(dir)) {
            import scala.jdk.CollectionConverters._
            Files.walk(dir).iterator().asScala.toSeq.reverse
              .foreach(p => try Files.delete(p) catch { case _: Throwable => () })
          }
          System.err.println(
            s"[verify] $name TIMED OUT after ${timeoutSec}s — cancelled, " +
              s"partial output removed, continuing" +
              (if (stuck) " (worker stuck in uninterruptible planning)" else ""))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
