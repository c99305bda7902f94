package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation shapes from the reference (SURVEY §2.4). */
object Aggregates {

  /** Conditional count + HAVING ("identify_interacting_residues" core,
    * reference process_af3_outputs.py:215–221): per group key, count rows
    * satisfying `pred`, keep groups with count >= `minCount`.
    *
    * Map-side partial aggregation makes this a single cheap shuffle at any
    * scale; the predicate is pushed below the aggregate by Catalyst.
    */
  def thresholdCount(
      df: DataFrame,
      groupCols: Seq[String],
      pred: Column,
      minCount: Long,
      countName: String = "n"): DataFrame =
    df.filter(pred)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(countName))
      .filter(col(countName) >= minCount)

  /** min/max per group (island range labels, py:376–379). */
  def groupMinMax(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))

  /** Order-sensitive string concatenation per group (the per-chain
    * `sequence` assembly of py:156: 1-letter codes concatenated in residue
    * order). `orderCols` must make the order total for determinism.
    *
    * Implemented as collect_list of a (orderKeys…, value) struct +
    * array_sort + transform — no UDAF; array_sort on structs compares
    * fields left-to-right, so the value column must sort consistently
    * given the keys (keys are a unique prefix).
    */
  def orderedStringAgg(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[String],
      valueCol: Column,
      resultName: String = "sequence",
      sep: String = ""): DataFrame = {
    val packed = struct((orderCols.map(col) :+ valueCol.as("__v")): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        concat_ws(sep, transform(array_sort(collect_list(packed)), _.getField("__v")))
          .as(resultName))
  }

  /** Distinct values per group, joined as a sorted comma string — the
    * deterministic relational rendering of `collect_set` (py:249). Arrays
    * stay out of the result schema so any downstream consumer (CSV, the
    * DuckDB oracle) sees a plain string.
    */
  def distinctSortedConcat(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      resultName: String = "members"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(concat_ws(",", array_sort(collect_set(valueCol.cast("string")))).as(resultName))
}
