package graft

/** Local stand-in for the driver's t1 smoke: SparkEntry.entry must return
  * >0 rows on sf0.001.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"SMOKE rows=$n ${if (n > 0) "PASS" else "FAIL"}")
    spark.stop()
    if (n == 0) sys.exit(1)
  }
}
