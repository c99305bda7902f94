package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SortedIntersectSizeExpr == size(array_intersect(...)) on sorted
  * duplicate-free arrays — the builtin is the semantic oracle, the
  * expression is the zero-alloc merge used in the blocked Jaccard hot
  * loop.
  */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  test("merge-walk intersection size equals array_intersect on random sorted sets") {
    val rnd = new scala.util.Random(42)
    def randSet(): Seq[Long] =
      Seq.fill(rnd.nextInt(40))(rnd.between(-50L, 51L)).distinct.sorted
    val cases = Seq.fill(60)((randSet(), randSet()))
    val df = cases.toDF("a", "b")
      .select(
        VectorExpressions.sortedIntersectSize(col("a"), col("b")).as("merge"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
    assert(df.filter(col("merge") =!= col("builtin")).isEmpty)
    // and the empty/disjoint/identical edges explicitly
    val edges = Seq(
      (Seq.empty[Long], Seq.empty[Long], 0L),
      (Seq(1L, 2L, 3L), Seq.empty[Long], 0L),
      (Seq(1L, 2L, 3L), Seq(4L, 5L), 0L),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3L),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue), 2L))
    edges.foreach { case (a, b, want) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(VectorExpressions.sortedIntersectSize(col("a"), col("b")))
        .head().getLong(0)
      assert(got === want, s"$a ∩ $b")
    }
  }
}
