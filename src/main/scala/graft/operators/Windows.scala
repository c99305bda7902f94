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

  /** Distributed GLOBAL running total over `orderCol` — the two-phase
    * scan that replaces the single-partition trap of an unpartitioned
    * window (`Window.orderBy(...)` funnels EVERY row through one task;
    * Spark even logs a performance warning). Phase 1 range-partitions
    * on the order key and computes per-partition totals (one tiny
    * driver collect, <= numPartitions rows — metadata, not data);
    * phase 2 runs an ordinary partitioned cumulative window and adds
    * each partition's exclusive offset, attached as a literal map
    * lookup (codegen'd, no join). Net cost: one range shuffle + one
    * local sort — the same as any global sort — with every partition
    * scanned in parallel.
    *
    * The input is localCheckpoint-pinned between the two phases:
    * `repartitionByRange` samples its bounds, so two separate actions
    * over the un-pinned plan could disagree on partition boundaries.
    *
    * Rows must be UNIQUE on `orderCol` (pre-collapse to the distinct
    * key grain first — also what bounds the window frame); with ties
    * the within-tie cumulative split would be partition-order
    * dependent. Adds `cum_<c>` for each value column.
    */
  def globalCumSum(df: DataFrame, orderCol: String, valueCols: Seq[String]): DataFrame = {
    val staged = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val aggCols = valueCols.map(c => sum(col(c)).cast("long").as(c))
    val offRows = staged.groupBy(col("__pid"))
      .agg(aggCols.head, aggCols.tail: _*)
      .collect()
      .sortBy(_.getInt(0))
    val offs = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Long])]
    var acc = valueCols.map(_ => 0L)
    offRows.foreach { r =>
      offs += ((r.getInt(0), acc))
      acc = valueCols.indices.map(j =>
        acc(j) + (if (r.isNullAt(j + 1)) 0L else r.getLong(j + 1)))
    }
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.zipWithIndex.foldLeft(staged) { case (d, (c, j)) =>
      val kv = offs.toSeq.flatMap { case (pid, a) => Seq(lit(pid), lit(a(j))) }
      d.withColumn(s"cum_$c",
        sum(col(c)).over(w) + coalesce(element_at(map(kv: _*), col("__pid")), lit(0L)))
    }.drop("__pid")
  }

  /** Distributed GLOBAL running maximum over `orderCol` — the prefix-max
    * sibling of [[globalCumSum]] (same two-phase range-partition + offset
    * shape): phase 1 collects the per-partition maxima (≤ numPartitions
    * rows), the exclusive prefix max of those becomes each partition's
    * floor, phase 2 is a plain partitioned running max combined with
    * `greatest(floor, local)`. Adds `cummax_<valueCol>`.
    *
    * Tie contract: INCLUSIVE mode keeps [[globalCumSum]]'s uniqueness
    * requirement on `orderCol` (a row frame splits ties arbitrarily).
    * EXCLUSIVE mode — "prefix max over STRICTLY preceding KEYS", the 2-D
    * skyline primitive — is safe under duplicate keys: its frame is
    * RANGE-based (`rangeBetween(…, -1)` = keys ≤ current−1 = strictly
    * less, for the integral keys the mode requires), so tied rows never
    * see each other regardless of their physical order, and the range
    * partitioner keeps equal keys in one partition so the phase-1 floor
    * stays strictly-preceding too.
    */
  def globalCumMax(df: DataFrame, orderCol: String, valueCol: String,
      inclusive: Boolean = true): DataFrame = {
    if (!inclusive) {
      import org.apache.spark.sql.types._
      val dt = df.schema(orderCol).dataType
      require(Seq[DataType](LongType, IntegerType, ShortType, ByteType).contains(dt),
        s"globalCumMax exclusive mode needs an integral order key " +
          s"(rangeBetween -1 = strictly less only holds for integers); got $dt")
    }
    val staged = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val offRows = staged.groupBy(col("__pid"))
      .agg(max(col(valueCol)).cast("long").as(valueCol))
      .collect()
      .sortBy(_.getInt(0))
    val offs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var acc = Long.MinValue
    offRows.foreach { r =>
      offs += ((r.getInt(0), acc))
      if (!r.isNullAt(1)) acc = math.max(acc, r.getLong(1))
    }
    // exclusive mode (prefix max over STRICTLY preceding KEYS — the 2-D
    // skyline primitive) uses a RANGE frame ending at key−1, so duplicate
    // keys are tie-safe; the cross-partition floor from phase 1 is
    // exclusive either way
    val w0 = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    val w =
      if (inclusive) w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w0.rangeBetween(Window.unboundedPreceding, -1)
    val kv = offs.toSeq.flatMap { case (pid, a) => Seq(lit(pid), lit(a)) }
    staged.withColumn(s"cummax_$valueCol",
        greatest(
          coalesce(max(col(valueCol)).over(w), lit(Long.MinValue)),
          coalesce(element_at(map(kv: _*), col("__pid")), lit(Long.MinValue))))
      .drop("__pid")
  }
}
