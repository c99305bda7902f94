package graft

/** Plan inspection: `runMain graft.Explain <queryName> [sfDir]` prints the
  * formatted physical plan for one registered query — the feedback loop
  * for the 100 TB scale review (broadcasts, pushed filters, shuffle
  * counts, codegen spans).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.build("graft-explain")
    SparkEntry.queries.get(name) match {
      case Some(fn) => fn(spark, sfDir).explain("formatted")
      case None =>
        System.err.println(
          s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
        sys.exit(2)
    }
    spark.stop()
  }
}
