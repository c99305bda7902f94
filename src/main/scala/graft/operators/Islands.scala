package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands ("find_consecutive_groups", reference
  * process_af3_outputs.py:253–286): given rows carrying an integer axis
  * (residue number, epoch second, …), group consecutive values where the
  * gap to the previous value is <= `maxGap`, and keep groups with at least
  * `minLen` members (py:279–283; defaults `(max_gap, min_length) = (2, 3)`
  * at py:253).
  *
  * Spark-native formulation: lag + conditional break flag + running sum
  * (one shuffle on `partCols`, then pure window computation). At 100 TB the
  * shuffle is keyed by the partition columns (e.g. `job_dir` / `user_id`),
  * so each group is processed independently on one executor; no
  * driver-side state.
  */
object Islands {

  /** Adds `idCol`: a per-partition island id (0-based, increasing with the
    * order column). Rows with equal order values land in the same island.
    */
  def assignIds(
      df: DataFrame,
      partCols: Seq[String],
      orderCol: String,
      maxGap: Long,
      idCol: String = "island_id"): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
    val gap = col(orderCol) - lag(col(orderCol), 1).over(w)
    val brk = when(gap > maxGap, lit(1L)).otherwise(lit(0L))
    df.withColumn(
      idCol,
      sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Full islands aggregation: one row per island with start/end/size and
    * the sorted member list, filtered to `island_size >= minLen`
    * (the HAVING of py:279–283).
    */
  def islands(
      df: DataFrame,
      partCols: Seq[String],
      orderCol: String,
      maxGap: Long,
      minLen: Long,
      withMembers: Boolean = false): DataFrame = {
    val withIds = assignIds(df, partCols, orderCol, maxGap)
    val keys = (partCols :+ "island_id").map(col)
    val base = Seq(
      min(col(orderCol)).as("island_start"),
      max(col(orderCol)).as("island_end"),
      count(lit(1)).as("island_size"))
    val aggs =
      if (withMembers) base :+ array_sort(collect_list(col(orderCol))).as("members")
      else base
    withIds
      .groupBy(keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("island_size") >= minLen)
  }
}
