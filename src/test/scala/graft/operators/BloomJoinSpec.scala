package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-prefiltered join: no false negatives (every true match
  * survives the prune), real pruning (the probe side shrinks), and the
  * final join result is exactly the plain join's.
  */
class BloomJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("prune keeps every matching probe row and drops most others") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") >= 49)
      .select(col("l_orderkey"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"))

    val pruned = BloomJoin.prune(o, "o_orderkey", li, "l_orderkey",
      expectedItems = 1L << 16, numBits = 1L << 20)

    val total = o.count()
    val kept = pruned.count()
    val trueMatches = o.join(li, o("o_orderkey") === li("l_orderkey"))
      .select("o_orderkey").distinct().count()

    // exactness floor and pruning ceiling
    assert(kept >= trueMatches, "bloom prune dropped a true match (false negative)")
    assert(kept < total, s"bloom prune removed nothing ($kept of $total)")

    // no false negatives, row by row: every matching key survives
    val lost = o.join(li, o("o_orderkey") === li("l_orderkey")).select("o_orderkey")
      .except(pruned.select("o_orderkey"))
    assert(lost.isEmpty, "a matching probe key was pruned")
  }

  test("prefiltered join equals the plain join") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") >= 49)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))

    val pruned = BloomJoin.prune(o, "o_orderkey", li, "l_orderkey")
    val viaBloom = pruned.join(li, pruned("o_orderkey") === li("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plain = o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

    assert(viaBloom.except(plain).isEmpty && plain.except(viaBloom).isEmpty)
  }
}
