package graft.operators

import graft.SparkSpec

class IslandsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: the documented semantics of
    * find_consecutive_groups (process_af3_outputs.py:253-286).
    */
  private def bruteIslands(nums: Seq[Long], maxGap: Long, minLen: Long): Seq[Seq[Long]] = {
    val sorted = nums.sorted
    if (sorted.isEmpty) Seq.empty
    else {
      val groups = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer(sorted.head))
      for (x <- sorted.tail) {
        if (x - groups.last.last <= maxGap) groups.last += x
        else groups += scala.collection.mutable.ArrayBuffer(x)
      }
      groups.map(_.toSeq).filter(_.size >= minLen).toSeq
    }
  }

  private def run(nums: Seq[Long], maxGap: Long, minLen: Long): Seq[(Long, Long, Long)] =
    Islands.islands(nums.map(("g", _)).toDF("g", "n"), Seq("g"), "n", maxGap, minLen)
      .select("island_start", "island_end", "island_size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("empty input -> no islands (py:266-268)") {
    assert(run(Seq.empty, 2, 3) === Seq.empty)
  }

  test("single element below min_length dropped; met exactly kept") {
    assert(run(Seq(5), 2, 1) === Seq((5L, 5L, 1L)))
    assert(run(Seq(5), 2, 2) === Seq.empty)
  }

  test("gap exactly max_gap stays in the island; max_gap+1 splits") {
    assert(run(Seq(1, 3, 5), 2, 1) === Seq((1L, 5L, 3L)))
    assert(run(Seq(1, 4), 2, 1) === Seq((1L, 1L, 1L), (4L, 4L, 1L)))
  }

  test("reference defaults (2,3): doc example") {
    assert(run(Seq(1, 2, 3, 7, 8, 9, 15), 2, 3) === Seq((1L, 3L, 3L), (7L, 9L, 3L)))
  }

  test("duplicate values stay in one island") {
    assert(run(Seq(4, 4, 5), 1, 3) === Seq((4L, 5L, 3L)))
  }

  test("property: matches brute force on random inputs (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val n = rnd.nextInt(60)
      val xs = Seq.fill(n)(rnd.nextLong(80))
      val gap = 1L + rnd.nextInt(4)
      val minLen = 1L + rnd.nextInt(4)
      val expected = bruteIslands(xs, gap, minLen)
        .map(g => (g.min, g.max, g.size.toLong)).sortBy(_._1)
      assert(run(xs, gap, minLen) === expected, s"xs=$xs gap=$gap minLen=$minLen")
    }
  }
}
