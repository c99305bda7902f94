package graft.suite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import Registry.tbl

/** The remaining TPC-H-shaped heads (Q2, Q9, Q11, Q12, Q20, Q21) —
  * completing the 22-query set whose other members live in
  * [[ExtrasQueries]]. The driver schema has no `partsupp`,
  * `l_shipmode`, or `l_commitdate`/`l_receiptdate`, so each query keeps
  * its reference SHAPE (the join/agg/subquery structure that matters at
  * scale) while deriving the missing relation from what exists:
  *
  *  - the supply relation (Q2/Q20) is the observed (part, supplier)
  *    pairs in `lineitem`, with unit cost as exact integer millicents
  *    (`price_c * 1000 DIV qty` — truncating division both engines
  *    compute identically on positive longs);
  *  - "late" (Q12/Q21) is a ship lag in whole days past the order date
  *    (`datediff` on dates), standing in for receipt-vs-commit;
  *  - supply cost (Q9) is the part's list price, standing in for
  *    `ps_supplycost`.
  *
  * Money math follows the house rule: integer cents end-to-end, so sums
  * are order-independent and exactly comparable across engines.
  */
object TpchQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  def all: Seq[QDef] = Seq(

    QDef(
      "tpch_q2_min_cost_supplier",
      (s, dir) => {
        // TPC-H Q2 shape: for each qualifying part, the EUROPE supplier
        // achieving the minimum supply cost — the correlated-min
        // subquery becomes a per-part aggregate joined back on
        // (partkey, min). Selectivity runs first: the part gate
        // (~1/300) broadcasts into the supply relation before any
        // wide work, so the min-per-part aggregate sees only
        // surviving parts. Cost is exact millicents (1000*price_c DIV
        // qty), never a float division.
        val parts = tbl(s, dir, "part")
          .filter(col("p_size") === 15 && col("p_type") === "LARGE")
          .select(col("p_partkey"), col("p_brand"))
        val eurSupp = tbl(s, dir, "supplier")
          .join(broadcast(tbl(s, dir, "nation")
            .filter(col("n_regionkey") === 3)), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"),
            cents(col("s_acctbal")).as("s_acctbal_c"))
        // the part gate broadcasts BELOW the supply aggregation: only
        // ~1/300 of lineitem survives into the (part, supplier) grain
        // shuffle — the aggregate-after-filter ordering that keeps the
        // wide shuffle proportional to the answer, not the fact table
        val spe = tbl(s, dir, "lineitem")
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .select(col("p_partkey"), col("p_brand"), col("l_suppkey"),
            expr("(CAST(round(l_extendedprice * 100) AS BIGINT) * 1000L) DIV CAST(l_quantity AS BIGINT)")
              .as("unit_m"))
          .groupBy(col("p_partkey"), col("p_brand"), col("l_suppkey"))
          .agg(min(col("unit_m")).as("cost_m"))
          .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
        val minPerPart = spe.groupBy(col("p_partkey").as("mp_partkey"))
          .agg(min(col("cost_m")).as("min_cost_m"))
        spe.join(broadcast(minPerPart),
            col("p_partkey") === col("mp_partkey") &&
              col("cost_m") === col("min_cost_m"))
          .select(col("s_acctbal_c"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_brand"), col("cost_m"))
          .orderBy(col("s_acctbal_c").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some("""
        WITH supply AS (
          SELECT l_partkey, l_suppkey,
                 min((CAST(round(l_extendedprice * 100) AS BIGINT) * 1000)
                     // CAST(l_quantity AS BIGINT)) AS cost_m
          FROM lineitem GROUP BY 1, 2),
        eur AS (
          SELECT s_suppkey, s_name, n_name,
                 CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_c
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          WHERE n_regionkey = 3),
        spe AS (
          SELECT p.p_partkey, p.p_brand, e.s_name, e.n_name, e.s_acctbal_c,
                 sp.cost_m
          FROM supply sp
          JOIN part p ON sp.l_partkey = p.p_partkey
            AND p.p_size = 15 AND p.p_type = 'LARGE'
          JOIN eur e ON sp.l_suppkey = e.s_suppkey)
        SELECT s_acctbal_c, s_name, n_name, p_partkey, p_brand, cost_m
        FROM spe
        WHERE cost_m = (SELECT min(cost_m) FROM spe i
                        WHERE i.p_partkey = spe.p_partkey)
        ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey
        LIMIT 100""")),

    QDef(
      "tpch_q9_product_type_profit",
      (s, dir) => {
        // TPC-H Q9 shape: profit by supplier nation and order year over
        // one part family — the 5-way star join. Part gate broadcasts
        // first (name prefix, ~1/8 of parts), supplier→nation is a
        // broadcast dim, and orders joins only for the year column.
        // Profit in exact c2 units: price_c*(100-disc) minus list
        // cost (retail_c * 100 * qty) — no ps_supplycost in the
        // schema, the list price stands in.
        val li = tbl(s, dir, "lineitem")
        val parts = tbl(s, dir, "part")
          .filter(col("p_name").startsWith("red"))
          .select(col("p_partkey"), cents(col("p_retailprice")).as("retail_c"))
        val suppNation = tbl(s, dir, "supplier")
          .join(broadcast(tbl(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))
        li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
          .join(tbl(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("profit_c2",
            cents(col("l_extendedprice")) *
              (lit(100L) - round(col("l_discount") * 100).cast("long")) -
              col("retail_c") * lit(100L) * col("l_quantity").cast("long"))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(col("profit_c2")).as("profit_c2"), count(lit(1)).as("n_lines"))
          .orderBy(col("n_name"), col("o_year").desc)
      },
      Some("""
        SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))
                 - CAST(round(p_retailprice * 100) AS BIGINT) * 100
                   * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_c2,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 ORDER BY n_name, o_year DESC""")),

    QDef(
      "tpch_q11_important_stock",
      (s, dir) => {
        // TPC-H Q11 shape: one nation's high-value parts — per-part
        // value gated by a fraction of the nation's total. The total
        // attaches as an uncorrelated scalar subquery over the SAME
        // aggregated frame (one fact scan, one 1-row lookup), and the
        // fraction gate cross-multiplies into integers
        // (value_c * 1000 > total_c) — no float threshold.
        val natSupp = tbl(s, dir, "supplier")
          .join(broadcast(tbl(s, dir, "nation").filter(col("n_name") === "NATION_7")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val value = tbl(s, dir, "lineitem")
          .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey"))
          .agg(sum(cents(col("l_extendedprice")) * col("l_quantity").cast("long"))
            .as("value_c"))
        val total = ColumnBridge.scalar(value.agg(sum(col("value_c")).as("t")))
        value.filter(col("value_c") * 1000 > total)
          .orderBy(col("value_c").desc, col("l_partkey"))
      },
      Some("""
        WITH v AS (
          SELECT l_partkey,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_c
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
          GROUP BY 1)
        SELECT l_partkey, value_c FROM v
        WHERE value_c * 1000 > (SELECT CAST(sum(value_c) AS BIGINT) FROM v)
        ORDER BY value_c DESC, l_partkey""")),

    QDef(
      "tpch_q12_shipmode_priority",
      (s, dir) => {
        // TPC-H Q12 shape: late-shipment priority split per mode —
        // conditional counts (FILTER clause) over one join pass.
        // "Late" is a ship lag of 30..120 whole days past the order
        // date (receipt-vs-commit stand-in), computed with datediff on
        // dates so both engines count identical integer days. The
        // returnflag plays the ship mode.
        val o = tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
        val li = tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
        val lag = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(lag >= 30 && lag < 120)
          .groupBy(col("l_returnflag"))
          .agg(
            count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
              .as("high_line_count"),
            count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
              .as("low_line_count"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
                 AS high_line_count,
               count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                 AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) >= 30
          AND date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) < 120
        GROUP BY 1 ORDER BY 1""")),

    QDef(
      "tpch_q20_excess_suppliers",
      (s, dir) => {
        // TPC-H Q20 shape: suppliers in one nation sitting on excess
        // stock of one part family — the nested-EXISTS chain becomes a
        // per-(supplier, part) aggregate with an integer gate
        // (2 * qty_1996 > qty_total: this year moved more than half of
        // everything ever shipped), then a semi join up to supplier.
        // The part-family gate broadcasts into the fact scan first.
        val familyParts = tbl(s, dir, "part")
          .filter(col("p_name").startsWith("small"))
          .select(col("p_partkey"))
        val perSuppPart = tbl(s, dir, "lineitem")
          .join(broadcast(familyParts), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(
            sum(when(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"),
              col("l_quantity").cast("long")).otherwise(0L)).as("qty_1996"),
            sum(col("l_quantity").cast("long")).as("qty_total"))
        val excess = perSuppPart
          .filter(col("qty_1996") > 0 && col("qty_1996") * 2 > col("qty_total"))
          .select(col("l_suppkey")).distinct()
        tbl(s, dir, "supplier")
          .join(broadcast(tbl(s, dir, "nation").filter(col("n_name") === "NATION_4")),
            col("s_nationkey") === col("n_nationkey"))
          .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"), cents(col("s_acctbal")).as("s_acctbal_c"))
          .orderBy(col("s_name"))
      },
      Some("""
        WITH psp AS (
          SELECT l_suppkey, l_partkey,
                 CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                            AND l_shipdate < TIMESTAMP '1997-01-01'
                          THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS qty_1996,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%'
          GROUP BY 1, 2)
        SELECT s_suppkey, s_name,
               CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_c
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_4'
          AND EXISTS (SELECT 1 FROM psp
                      WHERE psp.l_suppkey = s_suppkey
                        AND qty_1996 > 0 AND qty_1996 * 2 > qty_total)
        ORDER BY s_name""")),

    QDef(
      "tpch_q21_waiting_suppliers",
      (s, dir) => {
        // TPC-H Q21 shape: the supplier who SOLELY held up a
        // multi-supplier order — the EXISTS/NOT-EXISTS pair over
        // sibling lines becomes two cascaded aggregates on the fact
        // table's own grain: per (order, supplier) "was late at all",
        // then per order "how many suppliers / how many late". An
        // order qualifies when it has >= 2 suppliers and EXACTLY one
        // was late; that one supplier takes the blame. No correlated
        // rescan, no self-join on raw lines — the blame join runs on
        // the already-collapsed (order, supplier) grain.
        val fOrders = tbl(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate"))
        val lo = tbl(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(fOrders, col("l_orderkey") === col("o_orderkey"))
          .withColumn("late",
            (datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) > 60)
              .cast("int"))
        val perOrdSupp = lo.groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(col("late")).as("supp_late"))
        val perOrd = perOrdSupp.groupBy(col("l_orderkey").as("ok"))
          .agg(count(lit(1)).as("n_supp"), sum(col("supp_late")).as("n_late"))
          .filter(col("n_supp") >= 2 && col("n_late") === 1)
        perOrdSupp.filter(col("supp_late") === 1)
          .join(perOrd, col("l_orderkey") === col("ok"))
          .join(broadcast(tbl(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""
        WITH lo AS (
          SELECT l_orderkey, l_suppkey,
                 CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) > 60 THEN 1 ELSE 0 END AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'),
        pos AS (
          SELECT l_orderkey, l_suppkey, max(late) AS supp_late
          FROM lo GROUP BY 1, 2),
        po AS (
          SELECT l_orderkey AS ok, count(*) AS n_supp,
                 CAST(sum(supp_late) AS BIGINT) AS n_late
          FROM pos GROUP BY 1
          HAVING count(*) >= 2 AND CAST(sum(supp_late) AS BIGINT) = 1)
        SELECT s_name, count(*) AS numwait
        FROM pos JOIN po ON pos.l_orderkey = po.ok
        JOIN supplier ON pos.l_suppkey = s_suppkey
        WHERE pos.supp_late = 1
        GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100"""))
  )
}
