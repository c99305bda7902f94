package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics without a global sort.
  *
  * `approx_percentile` trades exactness for one pass; a global
  * `row_number()` window is exact but single-partition — the classic
  * scale-killer. This is the exact AND distributed form: the same
  * two-level decomposition as [[Sampling.tokenBudgetSample]], applied to
  * value order instead of shuffle order.
  */
object Quantiles {

  /** The exact q-quantile row of `df` under `(value, tiebreak)` order
    * (0-based index `floor(q * (n-1))` — the discrete quantile, no
    * interpolation, so the result is an actual row and any engine
    * agrees exactly).
    *
    * Plan shape, all declarative (no driver-side count):
    *  1. bucket rows by `value div bucketWidth` — monotone in value, so
    *     bucket order == value order;
    *  2. per-bucket counts collapse to a tiny frame; its prefix sums +
    *     the grand total locate the ONE bucket holding the target index
    *     (the only globally-ordered window runs over that bounded
    *     frame);
    *  3. the located bucket broadcasts back; only ITS rows are ranked
    *     by an in-bucket window and the row at `target - offset` wins.
    *
    * `bucketWidth` bounds the in-bucket sort: pick it so a bucket's
    * population fits one partition (a third level generalizes if not).
    */
  def exactQuantile(
      df: DataFrame,
      valueCol: String,
      tiebreakCol: String,
      q: Double,
      bucketWidth: Long): DataFrame =
    exactQuantiles(df, valueCol, tiebreakCol, Seq(q), bucketWidth)
      .drop("q")

  /** All of `qs` in ONE pass over the data: the per-bucket count frame
    * is computed once, every target index is located on that tiny frame
    * (cross join with the bounded quantile list), and only the buckets
    * holding some target get their rows ranked. Output carries a `q`
    * column — one row per requested quantile. This is how equi-depth
    * bin edges (deciles etc.) are extracted without B passes.
    */
  def exactQuantiles(
      df: DataFrame,
      valueCol: String,
      tiebreakCol: String,
      qs: Seq[Double],
      bucketWidth: Long): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1], got $qs")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val rows = df.select(col(valueCol).as("__v"), col(tiebreakCol).as("__k"))
      .withColumn("__b", expr(s"__v div $bucketWidth"))
    val counts = rows.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
    val located = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(
        Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy()))
      // attach the bounded quantile list by exploding a literal array —
      // no join node at all, so the registry-wide no-CartesianProduct
      // plan guard stays meaningful
      .withColumn("q", explode(typedLit(qs)))
      .withColumn("__target",
        floor(col("q") * (col("__n") - 1).cast("double")).cast("long"))
      .filter(col("__target") >= col("__off") &&
        col("__target") < col("__off") + col("__c"))
      .select(col("__b"), col("__off"), col("__target"), col("q"))
    // rank per (bucket, q): several quantiles can land in one bucket,
    // and the join fans each of its rows out once per matching q
    val inBucket = Window.partitionBy(col("__b"), col("q"))
      .orderBy(col("__v"), col("__k"))
    rows.join(broadcast(located), Seq("__b"))
      .withColumn("__r", row_number().over(inBucket).cast("long") - 1)
      .filter(col("__off") + col("__r") === col("__target"))
      .select(col("q"), col("__v").as(valueCol), col("__k").as(tiebreakCol))
  }

  /** Per-group exact WEIGHTED median without sorting any group's full
    * value grain: the smallest value whose cumulative weight (in value
    * order) reaches half the group total — `exactQuantile`'s two-level
    * bucket decomposition, carried by weight instead of row count.
    *
    * Plan shape:
    *  1. collapse to the (group, value) grain with summed weights
    *     (map-side combined — the fact table never reaches a window);
    *  2. per-(group, bucket) weight sums collapse to a tiny frame whose
    *     prefix sums locate the ONE bucket per group holding the
    *     half-total crossing (windows only ever run over this frame);
    *  3. the located buckets broadcast back; only THEIR values get the
    *     in-bucket cumulative scan, offset by the weight mass below.
    *
    * Compared with a straight `sum(w) over (partition by g order by v)`
    * this removes the per-group sort of the whole value grain — the
    * difference between parallelism = |groups| and parallelism =
    * |groups| x |buckets| at 100 TB (and between a 200k-row and a
    * bucket-wide sort frame). The result is identical by construction:
    * both compute the same order-independent integer recurrence.
    */
  def weightedMedianByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      weightCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val base = df
      .select(col(groupCol).as("__g"), col(valueCol).as("__v"),
        col(weightCol).as("__w"))
      .withColumn("__b", expr(s"__v div $bucketWidth"))
    // pass 1: straight to the (group, bucket) grain — map-side combine
    // collapses each input partition to at most |groups|·|buckets|
    // partial rows, so the only full-data cost is the scan itself (the
    // value grain is never shuffled, unlike a collapse-then-window)
    val perBucket = base.groupBy(col("__g"), col("__b")).agg(sum(col("__w")).as("__bw"))
    val located = perBucket
      .withColumn("__cum", sum(col("__bw")).over(
        Window.partitionBy(col("__g")).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("__bw")).over(Window.partitionBy(col("__g"))))
      .filter(col("__cum") * 2 >= col("__tot"))
      .withColumn("__off", col("__cum") - col("__bw"))
      // first crossing bucket per group: lexicographic min over
      // (bucket, offset, total) — one aggregation, no second window
      .groupBy(col("__g"))
      .agg(min(struct(col("__b"), col("__off"), col("__tot"))).as("__m"))
      .select(col("__g"), col("__m.__b").as("__b"),
        col("__m.__off").as("__off"), col("__m.__tot").as("__tot"))
    // pass 2 re-scans the input but keeps ONLY the crossing bucket's
    // rows (broadcast semi-filter straight after the scan), so the
    // value-grain collapse and the cumulative window both run on a
    // bucket-bounded frame. Two scans + two tiny shuffles beats one
    // scan + a full value-grain shuffle-and-sort per group — scans are
    // columnar and cache-friendly; shuffles are the scale cost.
    base
      .join(broadcast(located.select(col("__g"), col("__b"))), Seq("__g", "__b"),
        "left_semi")
      .groupBy(col("__g"), col("__v")).agg(sum(col("__w")).as("__w"))
      .join(broadcast(located.select(col("__g"), col("__off"), col("__tot"))),
        Seq("__g"))
      .withColumn("__cin", sum(col("__w")).over(
        Window.partitionBy(col("__g")).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter((col("__off") + col("__cin")) * 2 >= col("__tot"))
      .groupBy(col("__g"))
      .agg(min(col("__v")).as(valueCol))
      .withColumnRenamed("__g", groupCol)
  }

  /** Per-group exact q-quantile — the partitioned form. Each group ranks
    * independently inside an ordinary partitioned window, so parallelism
    * is the group count and no global order exists anywhere; scalable as
    * long as single groups fit a partition (for one huge group — or the
    * global case — use [[exactQuantile]]'s bucket decomposition).
    */
  def exactQuantileByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tiebreakCol: String,
      q: Double): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(tiebreakCol))
    val cw = Window.partitionBy(col(groupCol))
    df.select(col(groupCol), col(valueCol), col(tiebreakCol))
      .withColumn("__r", row_number().over(w).cast("long") - 1)
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__r") ===
        floor(lit(q) * (col("__n") - 1).cast("double")).cast("long"))
      .select(col(groupCol), col(valueCol), col(tiebreakCol))
  }

  /** Per-group exact q-quantile, BUCKETED: [[exactQuantileByGroup]]'s
    * answer through [[exactQuantile]]'s two-level decomposition. Use
    * when groups are FEW but individually huge (calendar days, event
    * types): the plain partitioned form sorts each group's full value
    * grain in one task — parallelism = |groups| and per-task rows grow
    * with the corpus — while this form's only full-grain shuffle keys on
    * (group, bucket) with map-side combine, windows run on the bounded
    * counts frame, and the final rank touches one bucket's rows per
    * group (per-task rows = n / (|groups|·|buckets|)). Values must be
    * non-negative integers (`div` bucketing must stay monotone).
    * Returns (group, value, n) at the located index, tie-broken by
    * `tiebreakCol`.
    */
  def exactQuantileByGroupBucketed(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tiebreakCol: String,
      q: Double,
      bucketWidth: Long): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val rows = df
      .select(col(groupCol).as("__g"), col(valueCol).as("__v"),
        col(tiebreakCol).as("__k"))
      .withColumn("__b", expr(s"__v div $bucketWidth"))
    val counts = rows.groupBy(col("__g"), col("__b")).agg(count(lit(1)).as("__c"))
    val located = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(
        Window.partitionBy(col("__g")).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col("__g"))))
      .withColumn("__target",
        floor(lit(q) * (col("__n") - 1).cast("double")).cast("long"))
      .filter(col("__target") >= col("__off") &&
        col("__target") < col("__off") + col("__c"))
      .select(col("__g"), col("__b"), col("__off"), col("__target"), col("__n"))
    val inBucket = Window.partitionBy(col("__g")).orderBy(col("__v"), col("__k"))
    rows.join(broadcast(located), Seq("__g", "__b"))
      .withColumn("__r", row_number().over(inBucket).cast("long") - 1)
      .filter(col("__off") + col("__r") === col("__target"))
      .select(col("__g").as(groupCol), col("__v").as(valueCol),
        col("__n").as("n"))
  }
}
