package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for the two round-5 additions that shipped
  * without a spec: [[Similarity.gramPowerTopEig]] (relational power
  * iteration) and the `sim_mips_pruned` registered query (Cauchy–Schwarz
  * norm-pruned maximum-inner-product search).
  */
class PcaPowerSpec extends SparkSpec {
  import spark.implicits._

  /** Mirror of Similarity.intEmbedding for driver-side brute force. */
  private def intEmb(xs: Seq[Float]): Array[Long] =
    xs.map(x => math.floor(x.toDouble * 1000).toLong).toArray

  /** Dense Gram of the integer embeddings, then double-precision power
    * iteration run far past convergence — the independent oracle. */
  private def bruteTopEig(vecs: Seq[Seq[Float]], dims: Int): Double = {
    val ies = vecs.map(intEmb)
    val g = Array.ofDim[Double](dims, dims)
    for (ie <- ies; i <- 0 until dims; j <- 0 until dims)
      g(i)(j) += ie(i).toDouble * ie(j).toDouble
    var v = Array.fill(dims)(1.0)
    for (_ <- 1 to 500) {
      val w = Array.tabulate(dims)(i => (0 until dims).map(j => g(i)(j) * v(j)).sum)
      val n = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / n)
    }
    val gv = Array.tabulate(dims)(i => (0 until dims).map(j => g(i)(j) * v(j)).sum)
    (0 until dims).map(i => v(i) * gv(i)).sum / v.map(x => x * x).sum
  }

  // two labels with clearly separated spectra: label 0 dominated by the
  // e1 direction (fast power-iteration convergence), label 1 by e3
  private val fixture = Seq(
    (0L, 0, Seq(1.0f, 0.1f, 0.0f, 0.0f)),
    (1L, 0, Seq(0.9f, -0.1f, 0.1f, 0.0f)),
    (2L, 0, Seq(1.1f, 0.0f, -0.1f, 0.1f)),
    (3L, 0, Seq(0.2f, 0.3f, 0.1f, 0.0f)),
    (4L, 1, Seq(0.0f, 0.1f, 1.0f, 0.5f)),
    (5L, 1, Seq(0.1f, 0.0f, 0.8f, 0.4f)),
    (6L, 1, Seq(0.0f, -0.1f, 1.2f, 0.6f))
  ).toDF("vec_id", "label", "embedding")

  test("gramPowerTopEig matches double-precision power iteration per label") {
    val got = Similarity.gramPowerTopEig(fixture, "embedding", "label", dims = 4, iters = 8)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    val rows = fixture.select("label", "embedding").as[(Int, Seq[Float])].collect()
    for (lbl <- Seq(0, 1)) {
      val exp = bruteTopEig(rows.filter(_._1 == lbl).map(_._2).toSeq, 4)
      assert(math.abs(got(lbl) - exp) / exp < 1e-3,
        s"label=$lbl got=${got(lbl)} exp=$exp")
    }
  }

  test("gramPowerTopEig invariants: trace is the exact integer second moment, 0 < expl_ratio <= 1") {
    val got = Similarity.gramPowerTopEig(fixture, "embedding", "label", dims = 4, iters = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    val rows = fixture.select("label", "embedding").as[(Int, Seq[Float])].collect()
    got.foreach { case (lbl, nVecs, trace, ratio) =>
      val mine = rows.filter(_._1 == lbl)
      assert(nVecs === mine.length)
      assert(trace === mine.map(v => intEmb(v._2).map(x => x * x).sum).sum)
      assert(ratio > 0.0 && ratio <= 1.0 + 1e-12)
    }
  }

  test("gramPowerTopEig is ~scale-equivariant: 2x the data direction gives ~4x eig1") {
    // 2x on values that stay exact under floor(x*1000) of float widening
    val doubled = fixture.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x * 2.0f).as("embedding"))
    val e1 = Similarity.gramPowerTopEig(fixture, "embedding", "label", 4, 8)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    val e2 = Similarity.gramPowerTopEig(doubled, "embedding", "label", 4, 8)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    for (lbl <- Seq(0, 1))
      assert(math.abs(e2(lbl) / e1(lbl) - 4.0) < 0.05,
        s"label=$lbl ratio=${e2(lbl) / e1(lbl)}")
  }

  test("sim_mips_pruned: the Cauchy-Schwarz prune is a certificate — equals the unpruned top-5") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("sim_mips_pruned")(spark, dir)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // unpruned brute force, driver-side
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val q = intEmb(emb.find(_._1 == 0L).get._2)
    val brute = emb.filter(_._1 != 0L)
      .map { case (id, v) =>
        val ie = intEmb(v)
        (id, q.indices.map(i => q(i) * ie(i)).sum)
      }
      .sortBy { case (id, dot) => (-dot, id) }
      .take(5)
    assert(got.toSeq === brute.toSeq)
  }
}
