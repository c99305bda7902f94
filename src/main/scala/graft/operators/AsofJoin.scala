package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the latest right row
  * with `right.ts <= left.ts` within the same key — the standard
  * time-series operator Spark lacks natively.
  *
  * Implementation: the union-and-window trick, not a range theta-join.
  * Tag both sides, union, sort within key by (ts, tag) and carry the most
  * recent right values forward with `last(ignoreNulls)`. One shuffle on
  * the key, O(n log n) within partitions, no nested-loop — this is the
  * plan that survives 100 TB (a theta join would be quadratic; Spark
  * plans `<=` joins as BroadcastNestedLoop).
  *
  * Ties (right.ts == left.ts) attach — right rows sort before left rows
  * at equal timestamps via the tag.
  */
object AsofJoin {

  /** @param left       probe side; keeps all rows
    * @param right      build side; its `valueCols` get attached
    * @param keyCols    equi-key columns present on both sides
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param valueCols  right columns to carry (renamed as-is onto output)
    * @param tieBreak   right columns ordering ties at equal timestamps
    *                   (ascending; the LAST one wins) — required for a
    *                   deterministic result when the right side has
    *                   duplicate timestamps per key
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__ts", col(leftTs).cast("timestamp").cast("long"))
      .withColumn("__side", lit(1))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(c => col(c).as(s"__l_$c")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right.withColumn("__ts", col(rightTs).cast("timestamp").cast("long"))
      .withColumn("__side", lit(0))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val ordering = (col("__ts") :: col("__side") ::
      tieBreak.toList.map(c => col(s"__r_$c").asc_nulls_first)): Seq[Column]
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__c_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(c => col(s"__l_$c").as(c)) ++
        valueCols.map(c => col(s"__c_$c").as(c)): _*)
  }

  /** As-of FORWARD join: for every left row, attach the EARLIEST right
    * row with `right.ts >= left.ts` within the same key — the "next
    * reading after" mirror of [[asofBackward]], same union-and-window
    * plan (one shuffle, no nested loop). Ties (`right.ts == left.ts`)
    * attach; among right rows at the same timestamp the SMALLEST
    * `tieBreak` wins.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns
    // left tags 0, right 1: at equal ts the left row sorts FIRST, so
    // same-timestamp right rows fall inside its following frame
    val l = left.withColumn("__ts", col(leftTs).cast("timestamp").cast("long"))
      .withColumn("__side", lit(0))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(c => col(c).as(s"__l_$c")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right.withColumn("__ts", col(rightTs).cast("timestamp").cast("long"))
      .withColumn("__side", lit(1))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val ordering = (col("__ts") :: col("__side") ::
      tieBreak.toList.map(c => col(s"__r_$c").asc_nulls_last)): Seq[Column]
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = valueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__c_$c", first(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 0)
      .select(keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(c => col(s"__l_$c").as(c)) ++
        valueCols.map(c => col(s"__c_$c").as(c)): _*)
  }
}
