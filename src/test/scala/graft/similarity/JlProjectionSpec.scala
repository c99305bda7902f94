package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The JL random projection's exactness contract: every coordinate is an
  * integer dot over the deterministic weight family, so linearity and
  * negation hold EXACTLY (not approximately) whenever the float inputs
  * make intEmbedding exact (multiples of 1/1000 representable in float).
  */
class JlProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private val out = 4

  private def proj(rows: Seq[(Long, Seq[Float])]) =
    Similarity.randomProjection(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", out, dims)
      .orderBy("vec_id")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap

  test("projects to outDims coordinates; zero vector projects to zero") {
    val x = Seq.fill(dims)(0.0f)
    val p = proj(Seq((0L, x)))
    assert(p(0L).length === out)
    assert(p(0L).forall(_ === 0L))
  }

  test("linearity and negation hold exactly on exact-representable inputs") {
    // 0.5, 0.25, 0.125... are exact floats and exact multiples of 1/1000?
    // No — exactness needs floor(x*1000) to distribute over +; use values
    // where x*1000 is an integer-valued double: k/8 * 1000 = 125k exact.
    val x = (0 until dims).map(i => (i % 5) / 8.0f)
    val y = (0 until dims).map(i => ((i + 3) % 4) / 8.0f)
    val sum = x.zip(y).map { case (a, b) => a + b }
    val neg = x.map(-_)
    val p = proj(Seq((0L, x), (1L, y), (2L, sum), (3L, neg)))
    assert(p(2L) === p(0L).zip(p(1L)).map { case (a, b) => a + b },
      "P(x+y) must equal Px + Py exactly")
    assert(p(3L) === p(0L).map(-_), "P(-x) must equal -Px exactly")
  }

  test("aligned pairs keep positive projected dot; opposite pairs negative") {
    val x = (0 until dims).map(i => ((i % 3) + 1) / 8.0f)
    val p = proj(Seq((0L, x), (1L, x.map(-_))))
    val dotXX = p(0L).zip(p(0L)).map { case (a, b) => a * b }.sum
    val dotXN = p(0L).zip(p(1L)).map { case (a, b) => a * b }.sum
    assert(dotXX > 0L)
    assert(dotXN === -dotXX)
  }
}
