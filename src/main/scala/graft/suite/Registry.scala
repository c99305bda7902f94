package graft.suite

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a DataFrame program over the test tables
  * plus (when SQL-expressible) the equivalent ANSI SQL for the DuckDB
  * oracle. Column names/types must line up exactly between the two — the
  * driver sorts columns by name and hash-compares values.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** Read one driver test table from the scale-factor dir.
    *
    * `events.ts` has shipped as two physical types across driver data
    * generations: parquet TIMESTAMP(NANOS) (read only as a
    * nanos-since-epoch LONG under the nanosAsLong legacy flag set in
    * [[graft.GraftSession]]) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (read as TIMESTAMP_NTZ). Normalize either to a session-local
    * TIMESTAMP so every query sees one type.
    */
  def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** The ts-column rebuild, shared with every readStream path over the
    * same files (one definition, so batch and streaming sides of an
    * equivalence spec can't drift). LONG means nanos-since-epoch: rebuild
    * with exact integer arithmetic (`div`, not double division — nanos
    * ~1e18 exceed double's 2^53 exact range), truncating toward
    * microseconds the same way DuckDB does. TIMESTAMP_NTZ means UTC wall
    * time: with the session timezone pinned to UTC the cast to TIMESTAMP
    * is an exact relabeling, and `epoch()` agrees with DuckDB's naive
    * reading of the same file.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (!df.schema.fieldNames.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Build a plan with the range-join rewrite active at the given bin
    * size, scoped: the conf is set only around construction, so the
    * rewrite fires for THIS query without a session-wide bin leaking
    * onto unrelated numeric bound pairs (a 900 s bin is right for
    * epoch-second sessions and arbitrary for prices).
    *
    * The rewrite must survive EXECUTION, not just inspection: every
    * terminal action (`df.count()`, `df.write`, `df.collect()`) builds a
    * NEW QueryExecution over the LOGICAL plan and re-runs the optimizer
    * — by then the conf is restored and the rule is inactive, so merely
    * forcing/memoizing `optimizedPlan` here would leave all real
    * execution paths on the naive nested-loop theta join (round-9
    * advisor finding). Instead the optimizer is forced under the scoped
    * conf and the returned Dataset is REBUILT over the optimized plan:
    * downstream QueryExecutions embed the already-rewritten subtree, and
    * the rule's self-termination check (`__graft_rb` attributes in the
    * join condition) plus the unset conf make the re-optimization pass a
    * no-op for the rewrite. RangeJoinRuleSpec pins that the plan of a
    * downstream action (count-shaped and write-shaped) still carries the
    * bucketed join.
    */
  def withRangeBucket(s: SparkSession, width: Long)(build: => DataFrame): DataFrame = {
    val key = "spark.graft.rangeJoinRewrite.bucket"
    val prev = s.conf.getOption(key)
    s.conf.set(key, width.toString)
    try {
      val df = build
      // force the optimizer under the scoped conf, then rebase the
      // Dataset on the rewritten plan so downstream actions execute it
      org.apache.spark.sql.graft.ColumnBridge.ofRows(
        s, df.queryExecution.optimizedPlan)
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** The full registry. Built once; duplicate keys are a build-time
    * error — SparkEntry.queries folds this into a last-wins ListMap, so
    * a silent key collision would unregister an earlier query without
    * any test noticing (it happened once: two `agg_retention_cohorts`
    * definitions, and the round-5 daily triangle silently vanished).
    */
  lazy val all: Seq[QDef] = {
    val qs =
      CoreQueries.all ++ RelationalQueries.all ++ Af3Queries.all ++
        DedupQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++
        MultimodalQueries.all ++ StreamingQueries.all ++ ExtrasQueries.all ++
        WindowExtraQueries.all ++ SamplingQueries.all ++ GraphQueries.all ++
        TpchQueries.all ++ StatQueries.all
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys.toSeq.sorted
    require(dups.isEmpty, s"duplicate registry keys: ${dups.mkString(", ")}")
    qs
  }
}
