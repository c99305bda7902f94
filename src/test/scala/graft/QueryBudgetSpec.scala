package graft

/** Execution-budget gate: EVERY registered query must build AND run at
  * sf0.001 inside a per-query wall cap. This is the sbt-test guard that
  * would have caught round 5's `sim_pca_power` before commit: a
  * plan-exponential loop burns its wall in analysis/optimization and
  * first execution, which PlanShapeSpec (planning a single query plan)
  * under-measures and the full Bench only reveals after the fact. The
  * cap is deliberately generous (sf0.001 queries run in well under a
  * second; 60 s absorbs cold JIT + fixture/artifact builds) — it exists
  * to catch blow-ups, not regressions; BENCH_full.json owns the
  * fine-grained numbers.
  */
class QueryBudgetSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val capSec = 60L

  test(s"every registered query executes at sf0.001 within ${capSec}s") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      Budget.runBounded(spark, name, capSec) {
        fn(spark, sfDir).count()
      } match {
        case Budget.Ok(_) => None
        case Budget.Failed(msg) => Some(s"$name FAILED: $msg")
        case Budget.TimedOut(_) => Some(s"$name TIMED OUT after ${capSec}s")
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
