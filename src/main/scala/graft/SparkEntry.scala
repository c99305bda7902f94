package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.suite.{QDef, Registry, CoreQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 registers a [[QDef]] in
  * [[graft.suite.Registry]]: a DataFrame program over the driver's parquet
  * tables plus (when expressible) the equivalent DuckDB SQL oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * gaps-and-islands sessionization of `events` (the reference's
    * signature semantic, process_af3_outputs.py:253–302).
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Insertion
    * order is preserved (ListMap): iteration order — and therefore which
    * query pays each shared setup artifact's one-time build in a
    * sequential replay — is the registry order, not hash order, so
    * bench/verify attribution is stable across builds.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
      Registry.all.map(q => q.name -> q.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case QDef(n, _, Some(o)) => n -> o }.toMap
}
