package graft

/** Regression guard for the r8 sf1 bench diagnosis: localCheckpoint RDDs
  * pinned by queries (BPE rounds, connected-components iterations, the
  * global prefix-sum phase pin) accumulated across bench laps because
  * `clearCache()` only reaches SQL-cached relations, not the raw
  * persistent-RDD registry — the second warm lap ran up to 37x slower
  * under the memory pressure (818.9 s → 571.2 s at sf1 once fixed).
  * `Bench.resetCaches` unpersists the registry between laps; this spec
  * pins that a checkpoint-pinning query's lap pins do not survive the
  * reset, and that repeated lap+reset cycles reach a steady state
  * instead of monotone growth.
  */
class BenchLapLeakSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("lap-pinned checkpoint RDDs are released by Bench.resetCaches") {
    // agg_rfm_segments runs Windows.globalCumSum, which
    // localCheckpoint-pins its range-partitioned input between the
    // offset-collect and window phases and leaves the pin for the
    // session to clear — the exact pin class that leaked in r8
    val q = SparkEntry.queries("agg_rfm_segments")
    Bench.resetCaches(spark) // start from a clean registry
    val before = spark.sparkContext.getPersistentRDDs.keySet
    q(spark, sfDir).count()
    val pinned = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinned.nonEmpty,
      "fixture no longer pins any RDD — pick another checkpoint-pinning query")
    Bench.resetCaches(spark)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after.intersect(pinned).isEmpty,
      s"lap-pinned RDDs leaked past resetCaches: ${after.intersect(pinned)}")
  }

  test("repeated lap+reset cycles do not grow the persistent-RDD registry") {
    val q = SparkEntry.queries("agg_rfm_segments")
    def cycle(): Int = {
      q(spark, sfDir).count()
      Bench.resetCaches(spark)
      spark.sparkContext.getPersistentRDDs.size
    }
    val sizes = (1 to 3).map(_ => cycle())
    assert(sizes.distinct.size == 1,
      s"persistent-RDD registry grew across laps: $sizes")
  }
}
