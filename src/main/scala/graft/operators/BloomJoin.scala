package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter join pruning — the runtime-filter pattern made explicit.
  *
  * At 100 TB the expensive side of a selective join is shuffling probe
  * rows that can never match. Spark's AQE injects this rewrite itself
  * for some plans (`spark.sql.optimizer.runtime.bloomFilter.enabled`),
  * but only under cost heuristics a pipeline author can't rely on; this
  * operator is the same trick as a first-class, deterministic step:
  *
  *   1. aggregate the (already filtered, selective) build side's join
  *      keys into one bloom sketch — a map-side-combined aggregate that
  *      reduces the whole build side to a few MB of bits;
  *   2. plug the sketch into the probe side as an uncorrelated scalar
  *      subquery (`might_contain` requires a constant-or-subquery bloom,
  *      the same contract the optimizer's injected filters satisfy) and
  *      pre-filter BEFORE the shuffle — false positives pass (and are
  *      removed by the real join), false negatives are impossible, so
  *      results are exact;
  *   3. run the ordinary equi-join on the surviving rows.
  *
  * The pruned shuffle is the win: probe traffic drops to
  * (selectivity + fpp) of the original. Wraps Spark's own
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions (the
  * ones the optimizer injects) via [[ColumnBridge]].
  */
object BloomJoin {

  /** One-row bloom sketch of `keys` (long or string column). */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(key),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a [[bloomAgg]] sketch: never false on a
    * present key.
    */
  def mightContain(bloom: Column, value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(value)))

  /** `probe` reduced to rows whose `probeKey` might appear in
    * `build`'s `buildKey` set. Exact superset of the true-match rows.
    * The sketch rides a scalar subquery: evaluated once, its bytes
    * become a query-constant on every probe task — no join in the plan.
    */
  def prune(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    val sketch = ColumnBridge.scalar(
      build.agg(bloomAgg(col(buildKey), expectedItems, numBits).as("__bf")))
    probe.filter(mightContain(sketch, col(probeKey)))
  }
}
