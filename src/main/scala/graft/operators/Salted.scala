package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-stage ("salted") aggregation for self-mergeable
  * aggregates (sum/count/min/max). Stage 1 groups on (keys, salt) so a
  * hot key's rows spread over `buckets` reducers; stage 2 merges the
  * partials on the true keys — a tiny shuffle (|keys| x buckets rows).
  *
  * When to use at 100 TB: a groupBy where one key holds a large fraction
  * of all rows (single-reducer straggler). AQE's skew handling covers
  * sort-merge *joins*; aggregation skew still needs salting. The salt is
  * deterministic (hash of a uniformizing column mod buckets), so results
  * are reproducible.
  */
object Salted {

  /** Salted equi-join for a skewed fact side: the fact's hot keys are
    * spread over `buckets` salt values, and the (small-ish but not
    * broadcast-able) dimension side is replicated once per salt value,
    * so a hot key's rows land on `buckets` reducers instead of one.
    * Result is exactly `fact JOIN dim ON keys` — the salt never leaks.
    *
    * When to use at 100 TB: AQE's skew-join split only fires for
    * sort-merge joins after a shuffle is already materialized, and it
    * cannot help when one key dominates a shuffled *hash* join build;
    * explicit salting plans the spread from the start. Replication cost
    * is |dim| x buckets — pick buckets so that stays shuffle-cheap.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      spreadCol: Column,
      buckets: Int = 32): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(spreadCol), lit(buckets)))
    val repDim = dim.withColumn("__salt",
      explode(typedLit((0 until buckets).toList)))
    saltedFact
      .join(repDim, keys :+ "__salt")
      .drop("__salt")
  }

  /** Salted sum+count per key. `spreadCol` should be high-cardinality
    * (e.g. a row id) so the salt distributes a hot key evenly.
    */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: Column,
      spreadCol: Column,
      buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(spreadCol), lit(buckets)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as("sum_val"), sum(col("__pcnt")).as("n"))
  }
}
