package graft

import org.apache.spark.sql.SparkSession

/** Wall-clock budget enforcement for harness mains (Verify/Bench).
  *
  * A Spark action cannot be interrupted from outside by killing a
  * thread — the work is on executor task threads. The supported lever
  * is job-group cancellation: the worker thread tags everything it
  * launches with a job group, and on timeout the watchdog cancels that
  * group (interruptOnCancel=true so task threads get interrupted too).
  * Plan CONSTRUCTION (analysis/optimization on the worker thread) is
  * only PARTIALLY covered: `Thread.interrupt()` sets a flag that
  * CPU-bound Catalyst analysis/optimization never checks, so a worker
  * stuck in the plan-exponential phase keeps burning one driver core
  * (and holding its plan's heap) after the timeout — the run CONTINUES
  * (the thread is daemon, results are recorded TimedOut) but is not
  * freed of the cost. The guard's real guarantees are (a) launched
  * Spark JOBS are cancelled (job-group cancel + task interrupt), and
  * (b) the harness never blocks on a runaway worker. Callers are told
  * via [[Outcome]] whether the worker was still alive after the grace
  * join (`TimedOut(workerStillRunning = true)`). The flag is surfaced
  * for DIAGNOSTICS: Bench interpolates it into the error record, and
  * Verify's partial-output cleanup runs on ANY timeout (plus a final
  * post-`spark.stop()` sweep of timed-out names, because a stuck
  * worker can recreate a purged dir with a late write) — neither
  * branches on the flag itself.
  */
object Budget {
  sealed trait Outcome[+A]
  final case class Ok[A](value: A) extends Outcome[A]
  final case class Failed(msg: String) extends Outcome[Nothing]
  /** `workerStillRunning`: the worker thread survived the cancel + grace
    * join — it is stuck in uninterruptible driver-side work (Catalyst
    * analysis, most likely) and is still consuming a core.
    */
  final case class TimedOut(workerStillRunning: Boolean) extends Outcome[Nothing]

  def runBounded[A](spark: SparkSession, name: String, timeoutSec: Long)(
      body: => A): Outcome[A] = {
    val group = s"budget-$name-${System.nanoTime()}"
    @volatile var out: Outcome[A] = TimedOut(workerStillRunning = false)
    val worker = new Thread(() => {
      try {
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        out = Ok(body)
      } catch {
        case t: Throwable =>
          out = Failed(t.getClass.getSimpleName + ": " +
            Option(t.getMessage).getOrElse("").linesIterator
              .take(1).mkString.take(300))
      } finally spark.sparkContext.clearJobGroup()
    }, s"graft-$name")
    worker.setDaemon(true)
    worker.start()
    worker.join(timeoutSec * 1000L)
    if (worker.isAlive) {
      spark.sparkContext.cancelJobGroup(group)
      worker.interrupt()
      // bounded grace for the cancel to propagate; the thread is daemon,
      // so a stuck driver-side loop can't block JVM exit either way
      worker.join(10000L)
      TimedOut(workerStillRunning = worker.isAlive)
    } else out
  }
}
