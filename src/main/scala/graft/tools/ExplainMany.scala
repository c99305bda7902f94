package graft.tools

import graft.{GraftSession, SparkEntry}

/** Batch plan capture: `runMain graft.tools.ExplainMany <outDir> <suffix>
  * <name>[,<name>...] [sfDir]` — writes each named query's
  * `.explain("formatted")` output to `<outDir>/<name>_<suffix>.txt` in
  * one JVM (one `graft.Explain` JVM per query costs ~40 s of sbt/Spark
  * startup each; the r12 before/after plan evidence needs dozens).
  */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(',').toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-explain-many")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"EXPLAINED $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
