package graft.suite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Registry.tbl

/** Additional ordered/window/pivot coverage + the SQL surface of the
  * native graft_dot expression (registered via GraftExtensions).
  */
object WindowExtraQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  def all: Seq[QDef] = Seq(

    QDef(
      "win_trending_topk",
      (s, dir) => {
        // "what's trending each hour": per tumbling hour, the top-3
        // event types by volume. The count collapses the fact grain
        // FIRST (map-side combine to |hours|x|types| rows), so the rank
        // window partitions over a frame bounded by the type alphabet —
        // never the events themselves. Ties broken by name for a total,
        // engine-exact order.
        val hourly = tbl(s, dir, "events")
          .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_start"),
            col("event_type"))
          .agg(count(lit(1)).as("n_events"))
        val w = Window.partitionBy(col("hour_start"))
          .orderBy(col("n_events").desc, col("event_type"))
        hourly.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .orderBy("hour_start", "rk")
      },
      Some("""
        WITH hourly AS (
          SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_start,
                 event_type, count(*) AS n_events
          FROM events GROUP BY 1, 2)
        SELECT hour_start, event_type, n_events, CAST(rk AS INT) AS rk FROM (
          SELECT *, row_number() OVER (
            PARTITION BY hour_start ORDER BY n_events DESC, event_type) AS rk
          FROM hourly) t
        WHERE rk <= 3 ORDER BY hour_start, rk""")),

    QDef(
      "win_twap_daily",
      (s, dir) => {
        // time-weighted average value per day (the TWAP every metrics
        // pipeline wants when observations arrive unevenly): each
        // observation is weighted by the seconds until the NEXT
        // observation that day, so a value that held for an hour counts
        // 3600× one that held a second. All integer arithmetic —
        // v_cents·dt_seconds sums as longs, one double division at the
        // end — and the lead window partitions by DAY (parallel across
        // the calendar, never a global funnel; event_id breaks ts ties
        // for a total order).
        val e = tbl(s, dir, "events").select(
          unix_timestamp(date_trunc("day", col("ts"))).as("day"),
          unix_timestamp(col("ts")).as("t"),
          cents(col("value")).as("v"), col("event_id"))
        val w = Window.partitionBy(col("day")).orderBy(col("t"), col("event_id"))
        e.withColumn("dt", lead(col("t"), 1).over(w) - col("t"))
          .filter(col("dt").isNotNull)
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n_obs"),
            sum(col("v") * col("dt")).as("twap_num"),
            sum(col("dt")).as("twap_den"))
          .withColumn("twap_cents",
            when(col("twap_den") > 0,
              col("twap_num").cast("double") / col("twap_den").cast("double")))
          .orderBy("day")
      },
      Some("""
        WITH e AS (
          SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day,
                 CAST(floor(epoch(ts)) AS BIGINT) AS t,
                 CAST(round(value * 100) AS BIGINT) AS v, event_id
          FROM events),
        d AS (SELECT day, v,
                lead(t) OVER (PARTITION BY day ORDER BY t, event_id) - t AS dt
              FROM e)
        SELECT day, count(*) AS n_obs,
               CAST(sum(v * dt) AS BIGINT) AS twap_num,
               CAST(sum(dt) AS BIGINT) AS twap_den,
               CASE WHEN sum(dt) > 0 THEN
                 CAST(sum(v * dt) AS DOUBLE) / CAST(sum(dt) AS DOUBLE) END
                 AS twap_cents
        FROM d WHERE dt IS NOT NULL
        GROUP BY day ORDER BY day""")),

    QDef(
      "win_percentile_bands",
      (s, dir) =>
        // percent_rank + cume_dist per market segment over a TOTAL
        // order (balance cents, then custkey — ties broken, so rank ==
        // row_number and both engines evaluate the same integer ratios
        // (rank-1)/(n-1) and rank/n in IEEE doubles, bit-equal). The
        // window partitions by segment: parallel across groups, no
        // global funnel.
        tbl(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            round(col("c_acctbal") * 100).cast("long").as("bal_c"))
          .withColumn("pr", percent_rank().over(
            Window.partitionBy(col("c_mktsegment"))
              .orderBy(col("bal_c"), col("c_custkey"))))
          .withColumn("cd", cume_dist().over(
            Window.partitionBy(col("c_mktsegment"))
              .orderBy(col("bal_c"), col("c_custkey"))))
          .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, c_mktsegment,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
               percent_rank() OVER (PARTITION BY c_mktsegment
                 ORDER BY CAST(round(c_acctbal * 100) AS BIGINT), c_custkey) AS pr,
               cume_dist() OVER (PARTITION BY c_mktsegment
                 ORDER BY CAST(round(c_acctbal * 100) AS BIGINT), c_custkey) AS cd
        FROM customer ORDER BY c_custkey""")),

    QDef(
      "win_gap_median",
      (s, dir) => {
        // per-user cadence profile: the EXACT median inter-event gap.
        // Gaps come from a per-user lag (partitioned window); the
        // median reuses the exact-quantile-by-group operator — ranking
        // is parallel across users, no sketch, no global sort. Users
        // with one event have no gaps and drop out, exactly as the
        // oracle's lag-null filter does.
        val gaps = tbl(s, dir, "events")
          .select(col("user_id"), unix_timestamp(col("ts")).as("sec"),
            col("event_id"))
          .withColumn("prev", lag(col("sec"), 1).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("sec"), col("event_id"))))
          .filter(col("prev").isNotNull)
          .select(col("user_id"), (col("sec") - col("prev")).as("gap"),
            col("event_id"))
        graft.operators.Quantiles
          .exactQuantileByGroup(gaps, "user_id", "gap", "event_id", q = 0.5)
          .select(col("user_id"), col("gap").as("median_gap"),
            col("event_id"))
          .orderBy("user_id")
      },
      Some("""
        WITH g AS (SELECT user_id,
                     CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                           PARTITION BY user_id
                           ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
                       AS gap,
                     event_id
                   FROM events),
        t AS (SELECT * FROM g WHERE gap IS NOT NULL),
        r AS (SELECT user_id, gap, event_id,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY gap, event_id) - 1 AS r0,
                count(*) OVER (PARTITION BY user_id) AS n
              FROM t)
        SELECT user_id, gap AS median_gap, event_id
        FROM r WHERE r0 = CAST(floor(0.5 * (n - 1)) AS BIGINT)
        ORDER BY user_id""")),

    QDef(
      "win_max_concurrency",
      (s, dir) => {
        // peak concurrent sessions — the capacity-planning number: how
        // many users' sessions overlap at the busiest instant. Sessions
        // are the flagship islands (gap 1800s, min 3 events); the
        // sweep-line is +1 at each start, -1 just past each end,
        // collapsed to the distinct boundary grain and run through the
        // distributed global cumsum (range partition + offset map — no
        // single-partition window). Output: the peak and when it is
        // first reached.
        val ev = Registry.tbl(s, dir, "events")
          .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
        val sess = graft.operators.Islands
          .islands(ev, Seq("user_id"), "sec", maxGap = 1800L, minLen = 3L)
        val deltas = sess.select(col("island_start").as("t"), lit(1L).as("d"))
          .unionAll(sess.select((col("island_end") + lit(1L)).as("t"), lit(-1L).as("d")))
          .groupBy(col("t")).agg(sum(col("d")).as("d"))
        val swept = graft.operators.Windows.globalCumSum(deltas, "t", Seq("d"))
        val peak = org.apache.spark.sql.graft.ColumnBridge.scalar(
          swept.agg(max(col("cum_d")).as("m")))
        swept.filter(col("cum_d") === peak)
          .agg(min(col("t")).as("first_peak_t"), max(col("cum_d")).as("peak"))
      },
      Some("""
        WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        b AS (SELECT user_id, sec,
              CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec) > 1800
                   THEN 1 ELSE 0 END AS brk FROM e),
        g AS (SELECT user_id, sec,
              CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY sec
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island_id
              FROM b),
        s AS (SELECT user_id, island_id, min(sec) AS island_start, max(sec) AS island_end
              FROM g GROUP BY user_id, island_id HAVING count(*) >= 3),
        deltas AS (SELECT t, sum(d) AS d FROM (
                     SELECT island_start AS t, 1 AS d FROM s
                     UNION ALL SELECT island_end + 1 AS t, -1 AS d FROM s)
                   GROUP BY t),
        c AS (SELECT t, sum(d) OVER (ORDER BY t) AS cum FROM deltas),
        p AS (SELECT max(cum) AS peak FROM c)
        SELECT CAST(min(t) AS BIGINT) AS first_peak_t,
               CAST(max(cum) AS BIGINT) AS peak
        FROM c WHERE cum = (SELECT peak FROM p)""")),

    QDef(
      "win_change_points",
      (s, dir) => {
        // traffic change-point flags: hours whose event count exceeds
        // 2x the trailing-6-hour average, compared in cross-multiplied
        // INTEGERS (3*n > sum6 <=> n > 2*(sum6/6)) so no division ever
        // happens — engine-exact. The hourly rollup collapses the fact
        // grain first; the trailing window runs over the bounded hour
        // domain.
        val hourly = tbl(s, dir, "events")
          .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_start"))
          .agg(count(lit(1)).as("n"))
        val w = Window.orderBy(col("hour_start")).rowsBetween(-6, -1)
        hourly
          .withColumn("sum6", sum(col("n")).over(w))
          .withColumn("cnt6", count(col("n")).over(w))
          .filter(col("cnt6") === 6 && col("n") * 3 > col("sum6"))
          .select(col("hour_start"), col("n"), col("sum6"))
          .orderBy("hour_start")
      },
      Some("""
        WITH hourly AS (
          SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_start,
                 count(*) AS n
          FROM events GROUP BY 1),
        t AS (SELECT hour_start, n,
                sum(n) OVER (ORDER BY hour_start ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS sum6,
                count(n) OVER (ORDER BY hour_start ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS cnt6
              FROM hourly)
        SELECT hour_start, n, CAST(sum6 AS BIGINT) AS sum6
        FROM t WHERE cnt6 = 6 AND n * 3 > sum6
        ORDER BY hour_start""")),

    QDef(
      "win_funnel_conversion",
      (s, dir) => {
        // view -> purchase funnel within 1 hour, per user: the running
        // last-view time rides a RANGE frame (ties included regardless of
        // intra-second order — a ROWS frame would be order-dependent on
        // equal timestamps and thus nondeterministic under shuffle)
        val e = tbl(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_timestamp(col("ts")).as("sec"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("last_view",
            max(when(col("event_type") === "view", col("sec"))).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_purchases"),
            count(when(col("last_view") >= col("sec") - 3600, 1)).as("n_converted"))
          .orderBy("user_id")
      },
      Some("""
        WITH e AS (SELECT user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        v AS (SELECT user_id, event_type, sec,
               max(CASE WHEN event_type = 'view' THEN sec END) OVER (
                 PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view
              FROM e)
        SELECT user_id, count(*) AS n_purchases,
               count(*) FILTER (WHERE last_view >= sec - 3600) AS n_converted
        FROM v WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY 1""")),

    QDef(
      "win_ntile_quartiles",
      (s, dir) =>
        // equal-frequency bucketing (data binning for stratified jobs):
        // ntile over a total order — (price, orderkey) tiebreak makes the
        // assignment deterministic on any engine
        tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            ntile(4).over(
              Window.partitionBy(col("o_orderstatus"))
                .orderBy(col("o_totalprice"), col("o_orderkey")))
              .cast("long").as("quartile"))
          .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey, o_orderstatus,
               ntile(4) OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders ORDER BY o_orderkey""")),

    QDef(
      "win_moving_avg",
      (s, dir) => {
        // 3-row centered moving sum of integer cents per user over time —
        // exact (no FP), order pinned by (ts, event_id)
        val e = tbl(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            round(col("value") * 100).cast("long").as("v_c"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("event_id")).rowsBetween(-1, 1)
        e.withColumn("mov_sum_c", sum(col("v_c")).over(w))
          .withColumn("mov_n", count(lit(1)).over(w))
          .select("event_id", "user_id", "mov_sum_c", "mov_n")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id,
          CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS mov_sum_c,
          count(*) OVER w AS mov_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
        ORDER BY event_id""")),

    QDef(
      "win_lag_delta",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        tbl(s, dir, "events")
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap_us").isNotNull)
          .select("user_id", "event_id", "gap_us")
          .orderBy("event_id")
      },
      Some("""
        SELECT user_id, event_id, gap_us FROM (
          SELECT user_id, event_id,
            epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY event_id) AS gap_us
          FROM events) t
        WHERE gap_us IS NOT NULL ORDER BY event_id""")),

    QDef(
      "win_first_last_value",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        tbl(s, dir, "orders")
          .withColumn("first_order", first(col("o_orderkey")).over(w))
          .withColumn("last_order", last(col("o_orderkey")).over(w))
          .select("o_custkey", "o_orderkey", "first_order", "last_order")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
          first_value(o_orderkey) OVER w AS first_order,
          last_value(o_orderkey) OVER w AS last_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_orderkey""")),

    QDef(
      "agg_pivot",
      (s, dir) =>
        // order counts pivoted by status — fixed column set, exact counts
        tbl(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority,
          count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
          count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
          count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    QDef(
      "stream_tumbling_window",
      (s, dir) =>
        // fixed 10-min tumbling windows (the batch form of the streaming
        // window() aggregation; works identically under readStream)
        tbl(s, dir, "events")
          .groupBy(col("user_id"), window(col("ts"), "10 minutes").as("w"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"), unix_timestamp(col("w.start")).as("win_start"),
            col("n"))
          .orderBy("user_id", "win_start"),
      Some("""
        SELECT user_id,
          (epoch_us(ts) // 600000000) * 600 AS win_start,
          count(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    QDef(
      "stream_sliding_window",
      (s, dir) =>
        // sliding windows (10-min size, 5-min slide): every event lands
        // in exactly size/slide = 2 windows — window() expands the row
        // BEFORE the aggregation shuffle (a projection, not a join), and
        // the same code runs unchanged under readStream with a
        // watermark. The rate signal tumbling windows aliase away.
        tbl(s, dir, "events")
          .groupBy(col("event_type"),
            window(col("ts"), "10 minutes", "5 minutes").as("w"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("sum_cents"))
          .select(col("event_type"), unix_timestamp(col("w.start")).as("win_start"),
            col("n"), col("sum_cents"))
          .orderBy("event_type", "win_start"),
      Some("""
        WITH x AS (SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     unnest([(epoch_us(ts) // 300000000) * 300,
                             (epoch_us(ts) // 300000000) * 300 - 300]) AS win_start
                   FROM events)
        SELECT event_type, win_start, count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM x GROUP BY 1, 2 ORDER BY 1, 2""")),

    QDef(
      "stream_static_enrich",
      (s, dir) => {
        // stream-static enrichment: the event stream joined to the
        // customer→nation dimension chain (broadcast — Spark rescans
        // the static side per micro-batch with ZERO state, the
        // cheapest join a stream can do), then per-nation daily
        // revenue in exact cents. The batch form here and the
        // readStream form share this code path; StreamStaticSpec pins
        // stream == batch under AvailableNow. At 100 TB the stream
        // side never shuffles for the join — only the windowed
        // aggregate exchanges, map-side combined.
        val dim = tbl(s, dir, "customer")
          .select(col("c_custkey").as("user_id"), col("c_nationkey"))
          .join(broadcast(tbl(s, dir, "nation")
            .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
            Seq("c_nationkey"))
          .select(col("user_id"), col("n_name"))
        tbl(s, dir, "events")
          .join(broadcast(dim), Seq("user_id"))
          .groupBy(col("n_name"), window(col("ts"), "1 day").as("w"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("sum_cents"))
          .select(col("n_name"), unix_timestamp(col("w.start")).as("win_start"),
            col("n"), col("sum_cents"))
          .orderBy("n_name", "win_start")
      },
      Some("""
        SELECT n.n_name,
               (epoch_us(e.ts) // 86400000000) * 86400 AS win_start,
               count(*) AS n,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
                 AS sum_cents
        FROM events e
        JOIN customer c ON c.c_custkey = e.user_id
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QDef(
      "stream_windowed_topk",
      (s, dir) => {
        // trending: top-3 event types per 1-day tumbling window — the
        // batch form of the streaming leaderboard (graft.streaming
        // .Trending; TrendingSpec proves the watermarked readStream form
        // emits identical finalized windows). The rank runs over the
        // COUNTS frame (one row per window×type), so the expensive part
        // stays one map-side-combined aggregation of the event stream.
        val counts = graft.streaming.Trending.windowCounts(
          Registry.tbl(s, dir, "events"), "event_type", "1 day")
        graft.streaming.Trending.topK(counts, "event_type", 3)
          .select(unix_timestamp(col("w.start")).as("win_start"),
            col("event_type"), col("n"), col("rnk"))
          .orderBy("win_start", "rnk")
      },
      Some("""
        WITH c AS (SELECT (epoch_us(ts) // 86400000000) * 86400 AS win_start,
                     event_type, count(*) AS n
                   FROM events GROUP BY 1, 2),
        r AS (SELECT win_start, event_type, n,
                CAST(row_number() OVER (PARTITION BY win_start
                  ORDER BY n DESC, event_type) AS BIGINT) AS rnk
              FROM c)
        SELECT win_start, event_type, n, rnk FROM r
        WHERE rnk <= 3 ORDER BY win_start, rnk""")),

    QDef(
      "agg_decimal_money",
      (s, dir) => {
        // money math on the DECIMAL lane: discounted revenue per ship
        // month with every intermediate an exact decimal — cast to
        // DECIMAL(18,2) at ingest (the only rounding, applied to the
        // same double in both engines), exact ×/Σ in decimal(38,4), and
        // one integer ten-thousandths emission at the end. The decimal
        // pipeline is the audit-grade alternative to the repo's integer-
        // cents convention: same exactness, types carried by the engine.
        val d2 = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
        tbl(s, dir, "lineitem")
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
          .agg(sum(d2(col("l_extendedprice")) *
              (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
                d2(col("l_discount")))).as("rev"),
            count(lit(1)).as("n_items"))
          .select(col("ship_month"),
            (col("rev") * 10000).cast("long").as("rev_x10000"), col("n_items"))
          .orderBy("ship_month")
      },
      Some("""
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) -
                         CAST(l_discount AS DECIMAL(18,2)))) * 10000
                 AS BIGINT) AS rev_x10000,
               count(*) AS n_items
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    QDef(
      "sim_dot_sql",
      (s, dir) => {
        // the native expression through its SQL surface (GraftExtensions)
        tbl(s, dir, "embeddings").createOrReplaceTempView("emb_v")
        s.sql("""
          SELECT vec_id,
            graft_dot(transform(embedding, x -> CAST(x AS DOUBLE)),
                      transform(embedding, x -> CAST(x AS DOUBLE))) AS self_dot
          FROM emb_v ORDER BY vec_id""")
      },
      Some("""
        SELECT vec_id,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(list_zip(
              list_transform(embedding, x -> CAST(x AS DOUBLE)),
              list_transform(embedding, x -> CAST(x AS DOUBLE))),
              z -> z[1] * z[2])),
            (acc, x) -> acc + x) AS self_dot
        FROM embeddings ORDER BY vec_id""")),

    QDef(
      "win_trailing_range",
      (s, dir) => {
        // TIME-based frame (RANGE, not ROWS): per user, events + cents in
        // the trailing hour at each event — peers at the same second get
        // identical frames, so the result is order-independent under
        // ties (a ROWS frame would not be). The feature-engineering
        // staple for rate/velocity signals.
        val e = tbl(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            unix_timestamp(col("ts")).as("sec"),
            round(col("value") * 100).cast("long").as("cents"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
          .rangeBetween(-3600, 0)
        e.select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_1h"),
            sum(col("cents")).over(w).as("sum_cents_1h"))
          .orderBy("event_id")
      },
      Some("""
        WITH e AS (SELECT event_id, user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        SELECT event_id, user_id,
               CAST(count(*) OVER w AS BIGINT) AS n_1h,
               CAST(sum(cents) OVER w AS BIGINT) AS sum_cents_1h
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    QDef(
      "win_forward_fill",
      (s, dir) => {
        // gap-fill / LOCF (last observation carried forward): only
        // purchase events carry an observed value; every other event
        // inherits the user's most recent purchase amount. One
        // partitioned window with last(ignoreNulls) — a single shuffle
        // on user_id, no self-join, no loop; the standard sparse-to-
        // dense feature densification at any scale. Ordered by the
        // unique event_id (ts ties would make LOCF order-dependent).
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tbl(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            when(col("event_type") === "purchase",
              round(col("value") * 100).cast("long")).as("v"))
          .withColumn("filled_cents", last(col("v"), ignoreNulls = true).over(w))
          .select("user_id", "event_id", "filled_cents")
          .orderBy("event_id")
      },
      Some("""
        WITH t AS (SELECT user_id, event_id,
                     CASE WHEN event_type = 'purchase'
                          THEN CAST(round(value * 100) AS BIGINT) END AS v
                   FROM events)
        SELECT user_id, event_id,
               last_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
        FROM t ORDER BY event_id""")),

    QDef(
      "win_best_run",
      (s, dir) => {
        // best contiguous run (maximum-subarray / Kadane) per event
        // type: the window of consecutive events whose summed deviation
        // from the type's own mean is largest — "when was this stream
        // hottest, contiguously?". Distributed Kadane: prefix sums of
        // the deviation signal, then best_t = prefix_t − min(0, min of
        // prefixes before t) — two partitioned windows, no loop, no
        // self-join. The baseline is the exact integer mean (sum div n,
        // a broadcast |types|-row frame), so every signal, prefix, and
        // best value is an exact int64.
        import org.apache.spark.sql.expressions.Window
        val e = tbl(s, dir, "events")
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("cents"))
        val base = e.groupBy(col("event_type"))
          .agg(expr("sum(cents) div count(*)").as("avg_c"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        val pre = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val before = w.rowsBetween(Window.unboundedPreceding, -1)
        e.join(broadcast(base), Seq("event_type"))
          .withColumn("prefix",
            sum(col("cents") - col("avg_c")).over(pre))
          .withColumn("best",
            col("prefix") -
              least(lit(0L), coalesce(min(col("prefix")).over(before), lit(0L))))
          .withColumn("rn", row_number().over(Window.partitionBy(col("event_type"))
            .orderBy(col("best").desc, col("event_id"))))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("best").as("best_sum"),
            col("event_id").as("end_event_id"))
          .orderBy("event_type")
      },
      Some("""
        WITH e AS (SELECT event_type, event_id,
                     CAST(round(value * 100) AS BIGINT) AS cents
                   FROM events),
        b AS (SELECT event_type,
                CAST(sum(cents) AS BIGINT) // count(*) AS avg_c
              FROM e GROUP BY 1),
        p AS (SELECT e.event_type, e.event_id,
                CAST(sum(e.cents - b.avg_c) OVER (PARTITION BY e.event_type
                  ORDER BY e.event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS prefix
              FROM e JOIN b USING (event_type)),
        k AS (SELECT event_type, event_id,
                prefix - least(CAST(0 AS BIGINT),
                  coalesce(min(prefix) OVER (PARTITION BY event_type
                    ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    CAST(0 AS BIGINT))) AS best
              FROM p),
        r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                ORDER BY best DESC, event_id) AS rn FROM k)
        SELECT event_type, best AS best_sum, event_id AS end_event_id
        FROM r WHERE rn = 1 ORDER BY event_type""")),

    QDef(
      "win_interpolate_linear",
      (s, dir) => {
        // linear interpolation of a sparse hourly gauge: regularize the
        // per-type hourly revenue reading onto the dense hour spine
        // (generated distributedly per group, as in agg_gap_fill_hourly)
        // and fill interior gaps by interpolating between the nearest
        // observed hours — what a metrics backend does for sampled
        // gauges, where zero-fill would fabricate a reading. Two
        // partitioned window passes (last/first ignoreNulls over
        // one-sided frames) — one shuffle on event_type, no self-join.
        // Exactness: observations are integer cents, hours integer
        // epochs, so the interpolation numerator pv·(nh−h)+nv·(h−ph)
        // and denominator nh−ph are exact int64; v_interp is one IEEE
        // division of those. Leading/trailing gaps stay null (an edge
        // has one neighbor — interpolation would be extrapolation).
        val hourly = tbl(s, dir, "events")
          .select(col("event_type"),
            unix_timestamp(date_trunc("hour", col("ts"))).as("h"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "h").agg(sum(col("cents")).as("v"))
        val spine = hourly.groupBy("event_type")
          .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
          .select(col("event_type"),
            explode(sequence(col("lo"), col("hi"), lit(3600L))).as("h"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        val prevF = w.rowsBetween(Window.unboundedPreceding, -1)
        val nextF = w.rowsBetween(1, Window.unboundedFollowing)
        spine.join(hourly, Seq("event_type", "h"), "left")
          .withColumn("pv", last(col("v"), ignoreNulls = true).over(prevF))
          .withColumn("ph",
            last(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(prevF))
          .withColumn("nv", first(col("v"), ignoreNulls = true).over(nextF))
          .withColumn("nh",
            first(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(nextF))
          .select(col("event_type"), col("h").as("bucket_start"),
            col("v").as("v_obs"),
            (col("v").isNull && col("pv").isNotNull && col("nv").isNotNull)
              .as("filled"),
            when(col("v").isNotNull, col("v").cast("double"))
              .when(col("pv").isNotNull && col("nv").isNotNull,
                (col("pv") * (col("nh") - col("h")) +
                  col("nv") * (col("h") - col("ph"))).cast("double") /
                  (col("nh") - col("ph")))
              .as("v_interp"))
          .orderBy("event_type", "bucket_start")
      },
      Some("""
        WITH hourly AS (SELECT event_type,
                          CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS h,
                          CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
        b AS (SELECT event_type, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1),
        spine AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS h FROM b),
        j AS (SELECT s.event_type, s.h, hourly.v
              FROM spine s LEFT JOIN hourly
                ON hourly.event_type = s.event_type AND hourly.h = s.h),
        f AS (SELECT event_type, h, v,
                last_value(v IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
                last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ph,
                first_value(v IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY h
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
                first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY h
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nh
              FROM j)
        SELECT event_type, h AS bucket_start, v AS v_obs,
               (v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL) AS filled,
               CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                    WHEN pv IS NOT NULL AND nv IS NOT NULL
                    THEN CAST(pv * (nh - h) + nv * (h - ph) AS DOUBLE)
                         / (nh - ph)
               END AS v_interp
        FROM f ORDER BY event_type, bucket_start""")),

    QDef(
      "win_ewma",
      (s, dir) => {
        // truncated exponentially-weighted moving average (decay 1/2,
        // depth 8) per user — the smoothing signal EWMA features need,
        // WITHOUT the sequential recurrence that doesn't distribute: a
        // depth-8 truncation is just eight lags of one (user, event_id)
        // frame — term d = lag(cents, d) · 2⁻ᵈ — so the whole thing is
        // ONE window (one shuffle + per-user sort, zero joins). The
        // round-10 shape shifted contributions onto future row numbers
        // instead (explode ×8 + equi-join + re-aggregate: three wide
        // shuffles; sf1 6.2 s → this form ~1.5 s). Exactness is
        // unchanged: cents · 2⁻ᵈ scales by a power of two (exact), the
        // ≤8-term sums stay under 53 significand bits, so numerator and
        // denominator are order-independent exact doubles and the one
        // final division matches the oracle bit-for-bit.
        val wr = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val e = tbl(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            round(col("value") * 100).cast("long").as("cents"))
        val lags = e.select(
          col("user_id") +: col("event_id") +:
            (0 to 7).map(d => lag(col("cents"), d).over(wr).as(s"l$d")): _*)
        val num = (0 to 7).map(d =>
          coalesce(col(s"l$d").cast("double") * lit(math.pow(0.5, d)),
            lit(0.0))).reduce(_ + _)
        val den = (0 to 7).map(d =>
          when(col(s"l$d").isNotNull, lit(math.pow(0.5, d)))
            .otherwise(lit(0.0))).reduce(_ + _)
        val nt = (0 to 7).map(d =>
          when(col(s"l$d").isNotNull, 1L).otherwise(0L)).reduce(_ + _)
        // latent-input guard (driver-advice r11): a row whose 8 lags are
        // all NULL (possible only if `value` itself were NULL — the
        // current generator never emits one) would divide 0.0/0.0 = NaN;
        // emit NULL instead, matching the repo convention (da5e1b1).
        // No-op on non-null input: den >= 1.0 whenever l0 is present.
        lags.select(col("user_id"), col("event_id"),
          when(den === 0.0, lit(null)).otherwise(num / den).as("ewma_cents"),
          nt.as("n_terms"))
          .orderBy("event_id")
      },
      Some("""
        WITH e AS (SELECT user_id, event_id,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY event_id) AS rn
                   FROM events),
        c AS (SELECT user_id, rn + d AS rn_t, cents, d
              FROM e, (SELECT unnest(generate_series(0, 7)) AS d) ds)
        SELECT a.user_id, a.event_id,
               sum(c.cents * power(0.5, c.d)) / sum(power(0.5, c.d)) AS ewma_cents,
               count(*) AS n_terms
        FROM e a JOIN c ON a.user_id = c.user_id AND a.rn = c.rn_t
        GROUP BY a.user_id, a.event_id ORDER BY a.event_id"""))
  ) ++ Seq(

    QDef(
      "win_seasonal_decompose",
      (s, dir) => {
        // classical seasonal decomposition of the daily traffic series:
        // trend = 7-day centered moving average, seasonal index = that
        // weekday's mean share of the overall mean, residual = actual −
        // trend. The fact scan collapses to the ~date grain FIRST (one
        // map-side-combined count per day), so every window below runs
        // on a frame of |days| rows — the collapsed-grain pattern: at
        // 100 TB the expensive part stays a single aggregation. Exact
        // integer counts; each emitted double is one fixed division of
        // exact sums, identical in the oracle.
        val daily = tbl(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"))
        // Spark dayofweek: Sunday=1 … Saturday=7; DuckDB: Sunday=0.
        val dowd = daily.withColumn("dow", dayofweek(col("d")) - 1)
        val w7 = Window.orderBy(col("d")).rowsBetween(-3, 3)
        val wd = Window.partitionBy(col("dow"))
        val overall = org.apache.spark.sql.graft.ColumnBridge.scalar(
          daily.agg((sum(col("n")).cast("double") / count(lit(1))).as("m")))
        dowd
          .withColumn("trend",
            sum(col("n")).over(w7).cast("double") / count(lit(1)).over(w7))
          .withColumn("dow_index",
            (sum(col("n")).over(wd).cast("double") / count(lit(1)).over(wd)) /
              overall)
          .select(col("d"), col("n"), col("trend"),
            col("dow_index"), (col("n") - col("trend")).as("residual"))
          .orderBy(col("d"))
      },
      Some("""
        WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n
                       FROM events GROUP BY 1),
        m AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS m FROM daily),
        t AS (SELECT d, n, dayofweek(d) AS dow,
                CAST(sum(n) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                  AND 3 FOLLOWING) AS DOUBLE) /
                count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                  AND 3 FOLLOWING) AS trend
              FROM daily)
        SELECT d, n, trend,
               (CAST(sum(n) OVER (PARTITION BY dow) AS DOUBLE) /
                count(*) OVER (PARTITION BY dow)) / (SELECT m FROM m)
                 AS dow_index,
               n - trend AS residual
        FROM t ORDER BY d""")),

    QDef(
      "win_interval_coverage",
      (s, dir) => {
        // union length of all sessions — "how many seconds was ANYONE
        // active": merge every user's islands into a global covered-time
        // measure. Sweep-line +1/-1 boundaries through the distributed
        // global cumsum (same machinery as win_max_concurrency), then a
        // join-free trick closes the intervals: a boundary OPENS covered
        // time when its pre-cum (cum − d, available per-row without a
        // lead window) is 0, and CLOSES it when its cum returns to 0, so
        // coverage = Σ closes·t − Σ opens·t with no per-row lead over
        // the boundary frame.
        val ev = Registry.tbl(s, dir, "events")
          .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
        val sess = graft.operators.Islands
          .islands(ev, Seq("user_id"), "sec", maxGap = 1800L, minLen = 3L)
        val deltas = sess.select(col("island_start").as("t"), lit(1L).as("d"))
          .unionAll(sess.select((col("island_end") + lit(1L)).as("t"),
            lit(-1L).as("d")))
          .groupBy(col("t")).agg(sum(col("d")).as("d"))
        val swept = graft.operators.Windows.globalCumSum(deltas, "t", Seq("d"))
        swept.agg(
            sum(when(col("cum_d") === 0, col("t")).otherwise(lit(0L))).as("closes"),
            sum(when(col("cum_d") - col("d") === 0 && col("cum_d") > 0, col("t"))
              .otherwise(lit(0L))).as("opens"),
            sum(when(col("cum_d") === 0, 1L).otherwise(lit(0L))).as("n_merged"))
          .select((col("closes") - col("opens")).as("covered_sec"),
            col("n_merged"))
      },
      Some("""
        WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
                   FROM events),
        b AS (SELECT user_id, sec,
              CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec) > 1800
                   THEN 1 ELSE 0 END AS brk FROM e),
        g AS (SELECT user_id, sec,
              CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY sec
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS island_id FROM b),
        s AS (SELECT user_id, island_id, min(sec) AS island_start,
                     max(sec) AS island_end
              FROM g GROUP BY user_id, island_id HAVING count(*) >= 3),
        deltas AS (SELECT t, sum(d) AS d FROM (
                     SELECT island_start AS t, 1 AS d FROM s
                     UNION ALL SELECT island_end + 1 AS t, -1 AS d FROM s)
                   GROUP BY t),
        c AS (SELECT t, d, sum(d) OVER (ORDER BY t) AS cum FROM deltas)
        SELECT CAST(sum(CASE WHEN cum = 0 THEN t ELSE 0 END) -
                    sum(CASE WHEN cum - d = 0 AND cum > 0 THEN t ELSE 0 END)
               AS BIGINT) AS covered_sec,
               CAST(sum(CASE WHEN cum = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_merged
        FROM c""")),

    QDef(
      "win_cusum_alarm",
      (s, dir) => {
        // one-sided CUSUM drift detection per user: the textbook
        // recurrence Sₜ = max(0, Sₜ₋₁ + xₜ − k) looks inherently
        // sequential, but has the closed form Sₜ = Pₜ − min(0, min_{j≤t}
        // Pⱼ) over the prefix sums Pₜ = Σ(xᵢ − k) — so it runs as two
        // stacked window passes (cumsum, then running min), both
        // partitioned by user: embarrassingly parallel across users, no
        // iteration, exact integer cents throughout. The (user, sec)
        // collapse bounds each partition's window input first. Alarms
        // fire where Sₜ exceeds h.
        val K = 6000L  // allowed drift per observation, cents
        val H = 40000L // alarm threshold, cents
        val perSec = tbl(s, dir, "events")
          .groupBy(col("user_id"), unix_timestamp(col("ts")).as("sec"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        perSec
          .withColumn("pt", sum(col("cents") - lit(K)).over(w))
          .withColumn("cusum_cents",
            col("pt") - least(lit(0L), min(col("pt")).over(w)))
          .filter(col("cusum_cents") > H)
          .select(col("user_id"), col("sec"), col("cusum_cents"))
          .orderBy(col("user_id"), col("sec"))
      },
      Some(s"""
        WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        p AS (SELECT user_id, sec, sum(cents) AS cents FROM e GROUP BY 1, 2),
        c AS (SELECT user_id, sec,
                sum(cents - ${6000L}) OVER (PARTITION BY user_id ORDER BY sec)
                  AS pt FROM p),
        sx AS (SELECT user_id, sec,
                 pt - least(CAST(0 AS BIGINT),
                   min(pt) OVER (PARTITION BY user_id ORDER BY sec))
                   AS cusum_cents FROM c)
        SELECT user_id, sec, CAST(cusum_cents AS BIGINT) AS cusum_cents
        FROM sx WHERE cusum_cents > ${40000L}
        ORDER BY user_id, sec""")),

    QDef(
      "win_session_transitions",
      (s, dir) => {
        // within-session behavior Markov matrix: events sessionized by
        // the standard 1800 s gap (per-user lag + running break count —
        // both windows PARTITIONED by user), then each event paired
        // with its successor INSIDE the session via lead, and the
        // (from, to) transition counts collapsed. Ties on the second
        // grain break on event_id, so the sequence — and the hash — is
        // total-order deterministic. Everything is user-partitioned
        // windows + one tiny-domain groupBy; nothing global.
        val ev = tbl(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_timestamp(col("ts")).as("sec"))
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("sec"), col("event_id"))
        val sess = ev
          .withColumn("brk",
            when(col("sec") - lag(col("sec"), 1).over(wOrd) > 1800L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum(col("brk")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val wSess = Window.partitionBy(col("user_id"), col("sid"))
          .orderBy(col("sec"), col("event_id"))
        sess.withColumn("to_type", lead(col("event_type"), 1).over(wSess))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy("from_type", "to_type")
      },
      Some("""
        WITH e AS (SELECT user_id, event_id, event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        b AS (SELECT *, CASE WHEN sec - lag(sec) OVER
                   (PARTITION BY user_id ORDER BY sec, event_id) > 1800
                 THEN 1 ELSE 0 END AS brk FROM e),
        g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                   ORDER BY sec, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM b),
        t AS (SELECT event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id, sid
                  ORDER BY sec, event_id) AS to_type
              FROM g)
        SELECT from_type, to_type, count(*) AS n
        FROM t WHERE to_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QDef(
      "win_pareto_skyline",
      (s, dir) => {
        // 2-D Pareto skyline (minimize retail price, maximize size):
        // part p survives iff NO part is <= on price and >= on size
        // with at least one strict. The scalable form is the classic
        // sort-based sweep made distributed: collapse to the distinct-
        // price grain (max size per price), take the EXCLUSIVE global
        // running max of size over strictly-cheaper prices (two-phase
        // range partition — no single-task window), keep prices whose
        // max size beats it, and join survivors back to the part grain
        // (ties on both axes survive together — no strict dominance).
        // O(n log n) total vs the O(n²) dominance scan the ORACLE runs
        // — the green hash certifies the sweep exact.
        val p = tbl(s, dir, "part")
          .select(col("p_partkey"), cents(col("p_retailprice")).as("price_c"),
            col("p_size").cast("long").as("p_size"))
        val pg = p.groupBy(col("price_c")).agg(max(col("p_size")).as("msize"))
        val ex = graft.operators.Windows
          .globalCumMax(pg, "price_c", "msize", inclusive = false)
        val survivors = ex.filter(col("msize") > col("cummax_msize"))
          .select(col("price_c"), col("msize").as("p_size"))
        p.join(survivors, Seq("price_c", "p_size"))
          .select(col("p_partkey"), col("price_c"), col("p_size"))
          .orderBy("p_partkey")
      },
      Some("""
        WITH p AS (SELECT p_partkey,
                     CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
                     CAST(p_size AS BIGINT) AS p_size
                   FROM part)
        SELECT p_partkey, price_c, p_size
        FROM p a
        WHERE NOT EXISTS (SELECT 1 FROM p b
                          WHERE (b.price_c < a.price_c AND b.p_size >= a.p_size)
                             OR (b.price_c <= a.price_c AND b.p_size > a.p_size))
        ORDER BY p_partkey""")),

    QDef(
      "win_cusum_changepoint",
      (s, dir) => {
        // CUSUM drift detection over the daily event-volume series per
        // event_type — the classic sequential change-point monitor a
        // pipeline runs on its own throughput. EXACT integer form: with
        // S = Σn and D = |days| per type (scalar frame, joined back),
        // the mean-deviation cumsum is carried scaled by D —
        // cusum_d = Σ_{d'≤d} (n_d'·D − S) — so no division ever
        // happens; the alarm fires when |cusum| exceeds 20% of S·D
        // (i.e. |mean-scaled drift| > 0.2·S — threshold in the same
        // scaled units, exact in both engines). The fact scan collapses
        // to the (type, day) grain FIRST (map-side-combined count), so
        // the window runs over |types|·|days| rows — the
        // collapsed-grain pattern: at 100 TB the expensive part stays
        // one aggregation.
        val daily = tbl(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"))
        val tot = daily.groupBy(col("event_type"))
          .agg(sum(col("n")).as("s_tot"), count(lit(1)).as("n_days"))
        val wc = Window.partitionBy(col("event_type")).orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.join(broadcast(tot), Seq("event_type"))
          .withColumn("cusum_scaled",
            sum(col("n") * col("n_days") - col("s_tot")).over(wc))
          .select(col("event_type"), col("d"), col("n"), col("cusum_scaled"),
            (abs(col("cusum_scaled")) * lit(5L) >
              col("s_tot") * col("n_days")).as("drift_alarm"))
          .orderBy("event_type", "d")
      },
      Some("""
        WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                         count(*) AS n
                       FROM events GROUP BY 1, 2),
        t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS s_tot,
                count(*) AS n_days
              FROM daily GROUP BY 1)
        SELECT daily.event_type, d, n,
               CAST(sum(n * n_days - s_tot) OVER (
                 PARTITION BY daily.event_type ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cusum_scaled,
               abs(CAST(sum(n * n_days - s_tot) OVER (
                 PARTITION BY daily.event_type ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT)) * 5 > s_tot * n_days AS drift_alarm
        FROM daily JOIN t USING (event_type)
        ORDER BY event_type, d""")),

    QDef(
      "dq_benford_check",
      (s, dir) => {
        // Benford first-digit audit of the money column — the
        // fabricated-data / unit-mixup smell test (organic multi-scale
        // amounts follow log10(1+1/d); a constant-injected or truncated
        // feed doesn't). Expected per-mille masses enter as the NINE
        // FIXED INTEGERS everyone publishes (301, 176, ...), observed
        // masses as exact integer per-mille quotients, deviation in
        // per-mille — engine-exact end to end. One map-side-combined
        // 9-group aggregate; the total attaches as a scalar subquery.
        val exp = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)
        // the > 0 gate keeps the digit extraction total for ANY input:
        // cents = 0 would yield digit 0 (element_at(exp, 0) is an ANSI
        // error) and a negative amount a '-' first char (a CAST error
        // in the oracle). Prices are positive in this data — the gate
        // is the latent-input guard, with the identical predicate in
        // the oracle so both engines see the same rows by construction
        val li = tbl(s, dir, "lineitem")
          .select(cents(col("l_extendedprice")).as("c"))
          .filter(col("c") > 0)
          .select(substring(col("c").cast("string"), 1, 1)
            .cast("long").as("digit"))
        val total = org.apache.spark.sql.graft.ColumnBridge.scalar(
          li.agg(count(lit(1)).as("n")))
        val expCol = element_at(typedLit(exp), col("digit").cast("int"))
        li.groupBy(col("digit")).agg(count(lit(1)).as("n"))
          .withColumn("total", total)
          .select(col("digit"), col("n"),
            expr("n * 1000 div total").as("obs_pm"),
            expCol.as("benford_pm"),
            (expr("n * 1000 div total") - expCol).as("dev_pm"))
          .orderBy("digit")
      },
      Some("""
        WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                   FROM lineitem),
        d AS (SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
                AS digit
              FROM c WHERE c > 0),
        e(digit, benford_pm) AS (VALUES (1, 301), (2, 176), (3, 125),
          (4, 97), (5, 79), (6, 67), (7, 58), (8, 51), (9, 46)),
        g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1)
        SELECT g.digit, g.n,
               CAST(g.n * 1000 // (SELECT sum(n) FROM g) AS BIGINT) AS obs_pm,
               CAST(e.benford_pm AS BIGINT) AS benford_pm,
               CAST(g.n * 1000 // (SELECT sum(n) FROM g)
                 - e.benford_pm AS BIGINT) AS dev_pm
        FROM g JOIN e USING (digit)
        ORDER BY digit"""))
  )
}
