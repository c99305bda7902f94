package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench.disturbedLaps — the cross-query machine-churn detector
  * (VERDICT r10 #7): a lap is flagged only when the MEDIAN query ran
  * >= 1.5x its own best lap, i.e. unrelated queries inflated together.
  */
class BenchDisturbedLapSpec extends AnyFunSuite {

  private def lap(qs: (String, Double)*): Map[String, Double] = qs.toMap

  test("healthy laps with per-query noise are not flagged") {
    val laps = Seq(
      lap("a" -> 1.0, "b" -> 2.0, "c" -> 3.0, "d" -> 0.5),
      lap("a" -> 1.1, "b" -> 1.9, "c" -> 3.2, "d" -> 0.52),
      lap("a" -> 0.95, "b" -> 2.1, "c" -> 2.9, "d" -> 0.49))
    assert(Bench.disturbedLaps(laps) == Seq.empty)
  }

  test("one globally slow lap is flagged; the others are not") {
    val base = lap("a" -> 1.0, "b" -> 2.0, "c" -> 3.0, "d" -> 0.5)
    val slow = base.map { case (k, v) => k -> v * 4.0 } // uniform 4x churn
    val laps = Seq(base, slow, base.map { case (k, v) => k -> v * 1.05 })
    assert(Bench.disturbedLaps(laps) == Seq(1))
  }

  test("a single query's own slow lap does NOT flag the lap") {
    // one query 10x slower in lap 1, everything else steady: that's the
    // query's variance (or its plan), not machine churn — median ratio
    // across the other queries stays ~1
    val laps = Seq(
      lap("a" -> 1.0, "b" -> 2.0, "c" -> 3.0, "d" -> 0.5, "e" -> 1.5),
      lap("a" -> 10.0, "b" -> 2.02, "c" -> 3.01, "d" -> 0.5, "e" -> 1.51),
      lap("a" -> 1.01, "b" -> 2.0, "c" -> 3.0, "d" -> 0.51, "e" -> 1.5))
    assert(Bench.disturbedLaps(laps) == Seq.empty)
  }

  test("errored queries (-1) are excluded, not treated as fast laps") {
    val laps = Seq(
      lap("a" -> 1.0, "b" -> -1.0, "c" -> 3.0),
      lap("a" -> 1.0, "b" -> 5.0, "c" -> 3.0))
    assert(Bench.disturbedLaps(laps) == Seq.empty)
  }

  test("fewer than two laps can never be disturbed") {
    assert(Bench.disturbedLaps(Seq(lap("a" -> 1.0))) == Seq.empty)
    assert(Bench.disturbedLaps(Seq.empty) == Seq.empty)
  }
}
