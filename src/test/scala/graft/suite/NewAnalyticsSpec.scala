package graft.suite

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Mathematical invariants of the round-5 closing analytics — each
  * query's oracle proves engine agreement; these prove the NUMBERS mean
  * what they claim (bounds every textbook definition imposes).
  */
class NewAnalyticsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("KS distance numerator is within [0, n1*n2] and counts are positive") {
    val r = run("agg_ks_distance").head
    val (d, n1, n2) = (r.getAs[Long]("d_num"), r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    assert(n1 > 0 && n2 > 0)
    assert(d >= 0 && d <= n1 * n2, s"D=$d outside [0, ${n1 * n2}]")
  }

  test("Gini numerator implies a coefficient in [0, 1)") {
    val r = run("agg_gini_concentration").head
    val (num, den) = (r.getAs[Long]("g_num"), r.getAs[Long]("g_den"))
    assert(den > 0)
    assert(num >= 0 && num < den, s"G=$num/$den outside [0,1)")
  }

  test("modularity contributions bound: sum(e_in) <= m and sum(deg_sum) = 2m") {
    val rows = run("graph_modularity").collect()
    val eIn = rows.map(_.getAs[Long]("e_in")).sum
    val degSum = rows.map(_.getAs[Long]("deg_sum")).sum
    // recover m from any row's q_num = 4*m*e_in - deg_sum^2
    val r0 = rows.find(_.getAs[Long]("e_in") > 0).get
    val m = (r0.getAs[Long]("q_num") + r0.getAs[Long]("deg_sum") * r0.getAs[Long]("deg_sum")) /
      (4 * r0.getAs[Long]("e_in"))
    assert(eIn <= m, s"internal edges $eIn exceed m=$m")
    assert(degSum == 2 * m, s"degree sum $degSum != 2m=${2 * m}")
    // global Q = sum(q_num)/(4m^2) must lie in (-1, 1)
    val qNum = rows.map(_.getAs[Long]("q_num")).sum
    assert(math.abs(qNum) < 4 * m * m)
  }

  test("clustering coefficient: triangles never exceed wedges") {
    val bad = run("graph_clustering_coeff")
      .filter(col("n_tri") > col("n_wedge")).count()
    assert(bad == 0)
  }

  test("assortativity moments satisfy Cauchy-Schwarz (r in [-1, 1])") {
    val r = run("graph_assortativity").head
    val (m, sProd, sSum, sSq) = (r.getAs[Long]("m"), r.getAs[Long]("s_prod"),
      r.getAs[Long]("s_sum"), r.getAs[Long]("s_sq"))
    assert(m > 0)
    // r = (4m*s_prod - s_sum^2) / (2m*s_sq - s_sum^2); denominator > 0
    // unless the graph is degree-regular, and |numerator| <= denominator
    val num = 4 * m * sProd - sSum * sSum
    val den = 2 * m * sSq - sSum * sSum
    assert(den >= 0)
    if (den > 0) assert(math.abs(num) <= den, s"r=$num/$den outside [-1,1]")
  }

  test("KNN classify: votes within [1,3] and correctness flag consistent") {
    val rows = run("sim_knn_classify").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("votes")
      assert(v >= 1 && v <= 3)
      val flag = r.getAs[Long]("correct")
      val agree = r.getAs[Long]("pred_label") == r.getAs[Long]("true_label")
      assert((flag == 1L) == agree)
    }
  }
}
