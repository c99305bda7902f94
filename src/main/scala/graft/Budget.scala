package graft

import org.apache.spark.sql.SparkSession

/** Wall-clock budget enforcement for harness mains (Verify/Bench).
  *
  * A Spark action cannot be interrupted from outside by killing a
  * thread — the work is on executor task threads. The supported lever
  * is job-group cancellation: the worker thread tags everything it
  * launches with a job group, and on timeout the watchdog cancels that
  * group (interruptOnCancel=true so task threads get interrupted too).
  * Plan CONSTRUCTION (analysis/optimization on the caller thread) is
  * also covered: the worker thread is interrupted as well, and a
  * plan-exponential query — round 5's failure mode — burns most of its
  * wall in precisely that phase.
  */
object Budget {
  sealed trait Outcome[+A]
  final case class Ok[A](value: A) extends Outcome[A]
  final case class Failed(msg: String) extends Outcome[Nothing]
  case object TimedOut extends Outcome[Nothing]

  def runBounded[A](spark: SparkSession, name: String, timeoutSec: Long)(
      body: => A): Outcome[A] = {
    val group = s"budget-$name-${System.nanoTime()}"
    @volatile var out: Outcome[A] = TimedOut
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
      TimedOut
    } else out
  }
}
