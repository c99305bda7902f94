package graft.suite

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Aggregates, Islands, Windows}
import graft.functions.Scalars
import Registry.tbl

/** Core operator suite — each entry exercises one SURVEY §2 key over the
  * driver's synthetic tables, with a DuckDB oracle. Reference file:line
  * cites are in the corresponding operator's Scaladoc.
  */
object CoreQueries {

  /** Flagship: gaps-and-islands sessionization of `events` per user —
    * the reference's most distinctive semantic (process_af3_outputs.py
    * :253–302) re-expressed as lag/cumsum windows.
    */
  def flagship(s: SparkSession, dir: String): DataFrame =
    winGapsAndIslands(s, dir)

  private def winGapsAndIslands(s: SparkSession, dir: String): DataFrame = {
    val ev = tbl(s, dir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
    Islands
      .islands(ev, Seq("user_id"), "sec", maxGap = 1800L, minLen = 3L)
      .select("user_id", "island_id", "island_start", "island_end", "island_size")
      .orderBy("user_id", "island_id")
  }

  def all: Seq[QDef] = Seq(
    QDef(
      "win_gaps_and_islands",
      (s, dir) => winGapsAndIslands(s, dir),
      Some("""
        WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        b AS (SELECT user_id, sec,
              CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec) > 1800
                   THEN 1 ELSE 0 END AS brk FROM e),
        g AS (SELECT user_id, sec,
              CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY sec
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island_id
              FROM b)
        SELECT user_id, island_id, min(sec) AS island_start, max(sec) AS island_end,
               count(*) AS island_size
        FROM g GROUP BY user_id, island_id HAVING count(*) >= 3
        ORDER BY user_id, island_id""")),

    QDef(
      "filter_confidence_gate",
      (s, dir) => {
        // iptm >= min AND ptm >= min AND pae_min < cutoff, missing -> 0
        // (py:66-105); embedding dims stand in for the three confidences.
        val e = tbl(s, dir, "embeddings")
        def dim(i: Int) =
          coalesce(try_element_at(col("embedding"), lit(i)).cast("double"), lit(0.0))
        e.filter(dim(1) >= 0.05 && dim(2) >= -0.5 && dim(3) < 0.1)
          .select(col("vec_id"))
          .orderBy("vec_id")
      },
      Some("""
        SELECT vec_id FROM embeddings
        WHERE coalesce(CAST(embedding[1] AS DOUBLE), 0.0) >= 0.05
          AND coalesce(CAST(embedding[2] AS DOUBLE), 0.0) >= -0.5
          AND coalesce(CAST(embedding[3] AS DOUBLE), 0.0) < 0.1
        ORDER BY vec_id""")),

    QDef(
      "agg_pae_threshold_count",
      (s, dir) => {
        // For each matrix column j: count_i(value < cutoff) >= minResidues
        // (py:215-221), in long/COO form via posexplode — the transpose of
        // the reference is a no-op here.
        val m = tbl(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        m.filter(col("v").cast("double") < 0.0)
          .groupBy((col("pos") + 1).cast("long").as("j"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= 260)
          .orderBy("j")
      },
      Some("""
        SELECT CAST(j AS BIGINT) AS j, count(*) AS n
        FROM (SELECT generate_subscripts(embedding, 1) AS j, unnest(embedding) AS v
              FROM embeddings)
        WHERE CAST(v AS DOUBLE) < 0.0
        GROUP BY j HAVING count(*) >= 260 ORDER BY j""")),

    QDef(
      "win_prefix_sum_offsets",
      (s, dir) => {
        // chain start/end offsets = prefix sums of chain lengths (py:197-204);
        // per-region nation "lengths" = customer counts.
        val n = tbl(s, dir, "nation")
        val c = tbl(s, dir, "customer")
        val lens = n
          .join(c, n("n_nationkey") === c("c_nationkey"), "left")
          .groupBy(n("n_regionkey"), n("n_name"))
          .agg(count(c("c_custkey")).as("len"))
        Windows
          .prefixOffsets(lens, Seq("n_regionkey"), "n_name", "len")
          .select("n_regionkey", "n_name", "len", "start_off", "end_off")
          .orderBy("n_regionkey", "n_name")
      },
      Some("""
        WITH lens AS (
          SELECT n_regionkey, n_name, count(c_custkey) AS len
          FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
          GROUP BY n_regionkey, n_name)
        SELECT n_regionkey, n_name, len,
               CAST(coalesce(sum(len) OVER w, 0) AS BIGINT) AS start_off,
               CAST(coalesce(sum(len) OVER w, 0) + len AS BIGINT) AS end_off
        FROM lens
        WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_name
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ORDER BY n_regionkey, n_name""")),

    QDef(
      "win_rank_model_select",
      (s, dir) => {
        // top-1-by-rank selection (the reference reads only rank-0 model
        // artifacts, py:349/357/563): latest order per customer.
        Windows
          .topPerGroup(
            tbl(s, dir, "orders"),
            Seq("o_custkey"),
            Seq(col("o_orderdate").desc, col("o_orderkey").desc))
          .select("o_custkey", "o_orderkey")
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey FROM (
          SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) t
        WHERE rn = 1 ORDER BY o_custkey""")),

    QDef(
      "agg_group_minmax",
      (s, dir) =>
        Aggregates
          .groupMinMax(tbl(s, dir, "lineitem"), Seq("l_returnflag"), "l_quantity")
          .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag, min(l_quantity) AS mn, max(l_quantity) AS mx
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QDef(
      "f_range_label",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(Scalars
            .rangeLabel(min(col("l_quantity")).cast("long"), max(col("l_quantity")).cast("long"))
            .as("qty_range"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(min(l_quantity) AS BIGINT) AS VARCHAR) || '-' ||
               CAST(CAST(max(l_quantity) AS BIGINT) AS VARCHAR) AS qty_range
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    QDef(
      "agg_having_min_length",
      (s, dir) =>
        Aggregates
          .thresholdCount(tbl(s, dir, "events"), Seq("user_id"), lit(true), 70L)
          .orderBy("user_id"),
      Some("""
        SELECT user_id, count(*) AS n FROM events
        GROUP BY user_id HAVING count(*) >= 70 ORDER BY user_id""")),

    QDef(
      "set_distinct_contacts",
      (s, dir) =>
        Aggregates
          .distinctSortedConcat(tbl(s, dir, "events"), Seq("user_id"), col("event_type"), "types")
          .orderBy("user_id"),
      Some("""
        SELECT user_id, string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
        FROM events GROUP BY user_id ORDER BY user_id""")),

    QDef(
      "f_seq1_lookup",
      (s, dir) =>
        tbl(s, dir, "events")
          .select(
            col("event_type"),
            Scalars
              .mapLookup(
                Map("click" -> "C", "error" -> "E", "purchase" -> "P"),
                col("event_type"),
                "X")
              .as("code"))
          .groupBy("event_type", "code")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type,
               CASE event_type WHEN 'click' THEN 'C' WHEN 'error' THEN 'E'
                    WHEN 'purchase' THEN 'P' ELSE 'X' END AS code,
               count(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY event_type""")),

    QDef(
      "scan_json_summary",
      (s, dir) => {
        // explicit-schema JSON read of the props payload (py:67-84 reads
        // summary confidences with fixed keys); aggregate proves the parse.
        val parsed = tbl(s, dir, "events")
          .select(
            col("event_type"),
            from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
        parsed
          .groupBy("event_type")
          .agg(sum(col("k")).cast("long").as("sum_k"), count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type,
               CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
               count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")),

    QDef(
      "f_json_get_default",
      (s, dir) =>
        // dict.get(key, 0) defaulting (py:82-84): present key + absent key.
        tbl(s, dir, "events")
          .filter(col("event_id") < 100)
          .select(
            col("event_id"),
            coalesce(from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"), lit(0)).as("k"),
            coalesce(from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("missing INT")).getField("missing"), lit(0))
              .as("m"))
          .orderBy("event_id"),
      Some("""
        SELECT event_id,
               coalesce(CAST(props->>'$.k' AS INTEGER), 0) AS k,
               coalesce(CAST(props->>'$.missing' AS INTEGER), 0) AS m
        FROM events WHERE event_id < 100 ORDER BY event_id"""))
  )
}
