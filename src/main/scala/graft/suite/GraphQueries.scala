package graft.suite

import org.apache.spark.sql.functions._

import graft.operators.Graph
import Registry.tbl

/** Graph analytics over the part co-occurrence graph (parts are
  * adjacent when some order contains both): degree profile and triangle
  * participation. Triangles are the canonical "curse of the last
  * reducer" workload — the registered query runs the degree-oriented
  * O(E^1.5) algorithm (operators/Graph.scala), while the DuckDB oracle
  * uses the naive id-oriented 3-way join: both enumerate each triangle
  * exactly once, so the per-corner counts must agree exactly.
  */
object GraphQueries {

  private def edges(s: org.apache.spark.sql.SparkSession, dir: String) =
    Graph.cooccurrenceEdges(
      tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey")

  /** Shared oracle prelude: distinct (order, part) membership and the
    * id-oriented distinct edge list.
    */
  private val edgeSql =
    """pp AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
       e AS (SELECT DISTINCT a.i AS src, b.i AS dst
             FROM pp a JOIN pp b ON a.g = b.g AND a.i < b.i)"""

  def all: Seq[QDef] = Seq(

    QDef(
      "graph_degree_hist",
      (s, dir) => {
        // degree distribution of the co-occurrence graph: undirected
        // incidence (each edge counts at both endpoints), then a
        // histogram over degrees — two map-side-combined aggregations,
        // the graph-health profile that decides whether degree
        // orientation is even needed downstream
        val e = edges(s, dir)
        e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
          .groupBy("deg").agg(count(lit(1)).as("n_vertices"))
          .orderBy("deg")
      },
      Some(s"""
        WITH $edgeSql,
        d AS (SELECT v, count(*) AS deg FROM (
                SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)
              GROUP BY v)
        SELECT deg, count(*) AS n_vertices FROM d
        GROUP BY deg ORDER BY deg""")),

    QDef(
      "graph_triangle_topk",
      (s, dir) =>
        // top-20 parts by triangle participation: triangles from the
        // degree-oriented wedge join (skew-proof at any scale), corners
        // exploded and counted, orderBy().limit() planning as
        // TakeOrderedAndProject (per-partition top-k, no global sort)
        Graph.triangles(edges(s, dir))
          .select(explode(array(col("a"), col("b"), col("c"))).as("part"))
          .groupBy("part").agg(count(lit(1)).as("n_tri"))
          .orderBy(col("n_tri").desc, col("part"))
          .limit(20),
      Some(s"""
        WITH $edgeSql,
        tr AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
               FROM e e1
               JOIN e e2 ON e1.dst = e2.src
               JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        x AS (SELECT unnest([a, b, c]) AS part FROM tr)
        SELECT part, count(*) AS n_tri FROM x
        GROUP BY part ORDER BY n_tri DESC, part LIMIT 20"""))
  )
}
