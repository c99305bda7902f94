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
      buckets: Int): Unit = {
    // unqualified names only: a db-qualified table lives under
    // <warehouse>/<db>.db/<table>, which the stale-location cleanup
    // below would miss — fail loudly instead of cleaning the wrong path
    require(!table.contains("."),
      s"writeBucketed takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    // a previous session's table dir survives the in-memory catalog;
    // clear both so overwrite is truly idempotent
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
