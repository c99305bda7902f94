package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.VectorExpressions

/** Z-order (Morton) clustered table layout — the write-side half of the
  * `graft_zorder2` locality key (see ZOrder2Expr; the key itself is the
  * registered query `f_zorder_cluster`).
  *
  * Range-partitioning + sorting a table by the interleaved key clusters
  * rows close in BOTH dimensions into the same files and row groups, so
  * each row group's parquet min/max stats on x AND y are tight. A 2-D
  * range predicate then prunes most row groups at scan time — where a
  * lexicographic (x, y) sort gives tight stats only on the leading
  * column, and an unclustered layout gives none. ZorderSkipSpec measures
  * the effect: strictly fewer rows read from the scan, z-order <
  * lexicographic < unclustered, identical results.
  *
  * Scale shape: one range shuffle at write time (sampled boundaries, no
  * driver data), then every future scan of the table skips — the classic
  * write-once/read-many trade a 100 TB table wants. `numFiles` bounds
  * output file count; `rowGroupBytes` sets skipping granularity (smaller
  * groups skip more precisely, cost more footer metadata).
  */
object Zorder {

  /** Write `df` to parquet clustered by the z-order key of two integer
    * dimensions (each masked to its low 16 bits by the expression — bucket
    * wider domains first).
    */
  def writeZOrdered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      path: String,
      numFiles: Int = 8,
      rowGroupBytes: Int = 16 * 1024): Unit =
    writeClustered(df,
      Seq(VectorExpressions.zorder2(df(xCol), df(yCol))),
      path, numFiles, rowGroupBytes)

  /** Generic clustered write: range-partition by `keys`, sort within each
    * partition by the same keys, emit parquet with `rowGroupBytes` row
    * groups. Key expressions need not be materialized columns — nothing
    * extra lands in the file.
    */
  def writeClustered(
      df: DataFrame,
      keys: Seq[Column],
      path: String,
      numFiles: Int,
      rowGroupBytes: Int): Unit =
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(path)
}
