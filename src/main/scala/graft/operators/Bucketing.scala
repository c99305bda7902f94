package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location: write both sides of a recurring join
  * bucketed (and sorted) on the join key, and every subsequent join on
  * that key plans with ZERO Exchange — the shuffle is paid once at write
  * time and amortized over every downstream query.
  *
  * This is the 100 TB pattern for fact-to-fact joins that are too big to
  * broadcast and too frequent to re-shuffle per query (e.g. lineitem x
  * orders on orderkey every night): bucket counts must match across the
  * joined tables, and Spark's scan exposes the bucketing as an output
  * partitioning that the join reuses directly.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed + sorted on
    * `bucketCols`. Overwrites the table if it exists.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      buckets: Int): Unit =
    writeBucketedImpl(df, table, bucketCols, buckets,
      qualified(df, table), signature(df, bucketCols, buckets))

  private def writeBucketedImpl(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      buckets: Int,
      key: String,
      sig: String): Unit = {
    // unqualified names only: keeps the ensureBucketed signature and the
    // catalog-resolved cleanup below unambiguous
    require(!table.contains("."),
      s"writeBucketed takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    // a previous session's table dir survives the in-memory catalog;
    // clear both so overwrite is truly idempotent. The location comes
    // from the catalog (honors USE <db>: <warehouse>/<db>.db/<table>),
    // never hand-built from the warehouse root.
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
    written.put(key, sig)
  }

  // table -> latest written signature (a grow-only SET would false-skip
  // after the same table is rewritten from different input and then
  // requested with the original input again)
  private val written =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def qualified(df: DataFrame, table: String): String =
    s"${df.sparkSession.sessionState.catalog.getCurrentDatabase}.$table"

  // the input plan's semantic hash rides along so a same-named table fed
  // from different data (another sf dir, a changed projection) never
  // false-skips the rewrite; a content fingerprint (size + mtime of every
  // input file, from the already-listed file index — no extra FS RPCs)
  // additionally catches data regenerated AT THE SAME PATH, which the
  // plan hash alone cannot see
  private def signature(
      df: DataFrame, bucketCols: Seq[String], buckets: Int): String =
    s"${bucketCols.mkString(",")}|$buckets|" +
      df.queryExecution.analyzed.semanticHash() + "|" + contentFingerprint(df)

  private[graft] def contentFingerprint(df: DataFrame): Long = {
    var h = 1125899906842597L // FNV-ish fold over (path, len, mtime)
    def mix(x: Long): Unit = { h = h * 31 + x }
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.listFiles(Nil, Nil).flatMap(_.files).foreach { st =>
              mix(st.getPath.toString.hashCode.toLong)
              mix(st.getLen); mix(st.getModificationTime)
            }
          case _ => ()
        }
      case _ => ()
    }
    h
  }

  /** Write-once form of [[writeBucketed]]: skips the write when this JVM
    * already produced `table` with the same layout and the table is still
    * in the catalog. This is the write-once/join-many shape in practice —
    * callers measuring the co-located *join* (bench) don't re-pay the
    * setup shuffle on every invocation, exactly as a nightly cluster job
    * reuses yesterday's bucketed tables.
    */
  def ensureBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      buckets: Int): Unit = {
    val key = qualified(df, table)
    val sig = signature(df, bucketCols, buckets)
    // per-table lock makes the check-then-write atomic under concurrent
    // callers (two sessions racing here would otherwise both write, or
    // one would read a half-written table)
    locks.computeIfAbsent(key, _ => new Object).synchronized {
      if (written.get(key) != sig ||
          !df.sparkSession.catalog.tableExists(table))
        writeBucketedImpl(df, table, bucketCols, buckets, key, sig)
    }
  }

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
}
