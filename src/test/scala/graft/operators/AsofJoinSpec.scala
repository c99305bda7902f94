package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("backward as-of attaches the latest right row at or before left ts") {
    val trades = Seq(("A", ts(100), 1L), ("A", ts(200), 2L), ("B", ts(150), 3L))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", ts(90), 10.0), ("A", ts(150), 11.0), ("A", ts(200), 12.0),
      ("B", ts(160), 20.0))
      .toDF("sym", "qt", "px")
    val got = AsofJoin.asofBackward(trades, quotes, Seq("sym"), "t", "qt",
        valueCols = Seq("px"), tieBreak = Seq("px"))
      .select("sym", "trade_id", "px")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got === Set(
      ("A", 1L, 10.0),   // 100 -> quote@90
      ("A", 2L, 12.0),   // 200 -> quote@200 (inclusive tie)
      ("B", 3L, null)))  // 150 -> no quote yet
  }

  test("duplicate right timestamps resolve by tiebreak (last asc wins)") {
    val l = Seq(("A", ts(100), 1L)).toDF("k", "t", "id")
    val r = Seq(("A", ts(50), 5L), ("A", ts(50), 9L), ("A", ts(50), 7L))
      .toDF("k", "rt", "v")
    val got = AsofJoin.asofBackward(l, r, Seq("k"), "t", "rt",
        valueCols = Seq("v"), tieBreak = Seq("v"))
      .select("v").collect().head.getLong(0)
    assert(got === 9L)
  }

  test("forward as-of attaches the earliest right row at or after left ts") {
    val trades = Seq(("A", ts(100), 1L), ("A", ts(200), 2L), ("B", ts(150), 3L))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", ts(90), 10.0), ("A", ts(150), 11.0), ("A", ts(200), 12.0),
      ("B", ts(100), 20.0))
      .toDF("sym", "qt", "px")
    val got = AsofJoin.asofForward(trades, quotes, Seq("sym"), "t", "qt",
        valueCols = Seq("px"), tieBreak = Seq("px"))
      .select("sym", "trade_id", "px")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got === Set(
      ("A", 1L, 11.0),   // 100 -> quote@150 (next at-or-after)
      ("A", 2L, 12.0),   // 200 -> quote@200 (inclusive tie)
      ("B", 3L, null)))  // 150 -> nothing after
  }

  test("forward ties at equal right timestamps resolve by tiebreak (first asc wins)") {
    val l = Seq(("A", ts(100), 1L)).toDF("k", "t", "id")
    val r = Seq(("A", ts(150), 9L), ("A", ts(150), 5L), ("A", ts(150), 7L))
      .toDF("k", "rt", "v")
    val got = AsofJoin.asofForward(l, r, Seq("k"), "t", "rt",
        valueCols = Seq("v"), tieBreak = Seq("v"))
      .select("v").collect().head.getLong(0)
    assert(got === 5L)
  }

  test("forward == brute-force next-at-or-after on seeded random data") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 200).map(i => (s"K${rnd.nextInt(4)}", ts(rnd.nextInt(1000)), i.toLong))
      .toDF("k", "t", "id")
    val r = (1 to 150).map(i => (s"K${rnd.nextInt(4)}", ts(rnd.nextInt(1000)), i.toLong))
      .toDF("k", "rt", "v")
    val fast = AsofJoin.asofForward(l, r, Seq("k"), "t", "rt",
        valueCols = Seq("v"), tieBreak = Seq("v"))
      .select("id", "v")
    val brute = l.join(r, l("k") === r("k") && r("rt") >= l("t"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(l("id"))
          .orderBy(r("rt").asc_nulls_last, r("v").asc_nulls_last)))
      .filter(col("rn") === 1)
      .select(l("id"), r("v"))
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
  }
}
