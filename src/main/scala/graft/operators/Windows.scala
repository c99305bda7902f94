package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window/ordered computation shapes from the reference (SURVEY §2.5). */
object Windows {

  /** Prefix-sum offsets ("chain start/end", reference
    * process_af3_outputs.py:197–204): within each partition, ordered by
    * `orderCol`, `start = sum of preceding lenCol`, `end = start + len`.
    * Pure window computation after one shuffle on `partCols`.
    */
  def prefixOffsets(
      df: DataFrame,
      partCols: Seq[String],
      orderCol: String,
      lenCol: String,
      startName: String = "start_off",
      endName: String = "end_off"): DataFrame = {
    val w = Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(startName, coalesce(sum(col(lenCol)).over(w), lit(0L)))
      .withColumn(endName, col(startName) + col(lenCol))
  }

  /** Top-N-per-group by rank ("rank-0 model selection" — the reference
    * reads only `_model_0.cif`, py:349/357/563). `orderCols` must be a
    * total order (include a unique tiebreaker) for determinism.
    */
  def topPerGroup(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column],
      n: Int = 1): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
