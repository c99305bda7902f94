package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long): Long = {
    var acc = 0L
    for (b <- 0 until 16) {
      acc |= (((x & 0xffffL) >> b) & 1L) << (2 * b)
      acc |= (((y & 0xffffL) >> b) & 1L) << (2 * b + 1)
    }
    acc
  }

  test("unit square maps to 0..3 in Z pattern; matches reference on random points") {
    val rnd = new scala.util.Random(3)
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)) ++
      (1 to 200).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        VectorExpressions.zorder2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z === mortonRef(x, y), s"($x,$y)") }
    assert(got.take(4).map(_._3).toSeq === Seq(0L, 1L, 2L, 3L))
  }

  test("graft_zorder2 is registered for SQL and agrees with the Column form") {
    val df = Seq((5L, 9L), (1234L, 4321L)).toDF("x", "y")
    df.createOrReplaceTempView("zpts")
    val viaSql = spark.sql("SELECT graft_zorder2(x, y) AS z FROM zpts")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(VectorExpressions.zorder2(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === viaCol)
  }

  test("z-order clusters 2-D neighborhoods: quadrant ranges are contiguous") {
    // all points of the 256x256 lower-left quadrant of a 512x512 grid
    // compress into one contiguous z-range — the data-skipping property
    val quad = for (x <- 0L until 256L by 17; y <- 0L until 256L by 17) yield (x, y)
    val zs = quad.toDF("x", "y")
      .select(VectorExpressions.zorder2(col("x"), col("y")))
      .collect().map(_.getLong(0))
    assert(zs.max < 65536L) // 256*256 quadrant occupies z-range [0, 2^16)
  }
}
