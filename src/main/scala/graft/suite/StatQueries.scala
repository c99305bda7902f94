package graft.suite

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.text.TextFunctions
import Registry.tbl

/** Mergeable-sketch and exact-moment statistics: the summary operators a
  * 100 TB profile pass runs where a full groupBy would be wasteful.
  *
  * All three follow the repo's exactness convention: bounded-state sketch
  * phases prune work, but every emitted number is either an exact integer
  * or one fixed IEEE expression over exact integer moments, so the DuckDB
  * oracle reproduces results bit-for-bit.
  */
object StatQueries {

  /** Misra–Gries candidate capacity / heavy-hitter threshold divisor:
    * emit words with frequency > totalTokens/Phi.
    */
  val Phi = 200

  /** KMV sketch size (k smallest distinct hash values kept). */
  val KmvK = 256

  /** HLL alpha constant in Q20 fixed point — see [[graft.operators.Hll]]. */
  private val HllA20 = graft.operators.Hll.A20

  /** Fixed-point scale of [[graft.functions.PortableLog]] results. */
  private val Q10 = graft.functions.PortableLog.Q

  /** KMV hash domain: portable LCG over [0, 2^31). Constants are the
    * classic glibc LCG; the pre-`% 2147483647` keeps the multiply inside
    * int64 for keys up to ~8.4e9 (sf ~1000) in both engines.
    */
  val KmvDomain = 2147483648L

  private def kmvHash(c: org.apache.spark.sql.Column) =
    ((c % 2147483647L) * 1103515245L + 12345L) % KmvDomain

  private def kmvHashSql(e: String) =
    s"(($e % 2147483647) * 1103515245 + 12345) % $KmvDomain"

  /** Misra–Gries summary of one partition: at most `phi` counters;
    * guarantees any item with in-partition frequency > n_p/phi survives.
    * Summing guarantees across partitions: any item with GLOBAL frequency
    * > N/phi survives in at least one partition summary, so the union of
    * summaries is a certified candidate superset for the exact recount.
    */
  private[suite] def misraGries(it: Iterator[Long], phi: Int): Iterator[Long] = {
    val counts = new java.util.HashMap[Long, Long](phi * 2)
    while (it.hasNext) {
      val w = it.next()
      val cur = counts.get(w)
      if (cur != 0L || counts.containsKey(w)) counts.put(w, cur + 1)
      else if (counts.size < phi) counts.put(w, 1L)
      else {
        // decrement-all step: drop every counter by 1, evict zeros
        val e = counts.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counts.keySet().asScala.iterator.map(k => k: Long)
  }

  def all: Seq[QDef] = Seq(

    QDef(
      "agg_heavy_hitters",
      (s, dir) => {
        // two-pass certified heavy hitters over the corpus vocabulary:
        // pass 1 runs Misra–Gries per partition (<= Phi counters of
        // bounded state, no shuffle) and unions the tiny candidate sets;
        // pass 2 recounts ONLY the candidates exactly (broadcast semi
        // join prunes the shuffle to heavy keys) and keeps those above
        // N/Phi. At 100 TB the full word groupBy shuffles the whole
        // token stream; this shape shuffles <= Phi rows per partition
        // plus the counts of ~Phi candidate words. Output is exact, so
        // the oracle is the plain HAVING query.
        import s.implicits._
        val words = tbl(s, dir, "documents")
          .select(explode(TextFunctions.tokens(col("text"))).as("word"))
          .select(graft.dedup.Dedup.wordId(col("word")).as("word_id"))
        val candidates = words.as[Long]
          .mapPartitions(it => misraGries(it, Phi))
          .toDF("word_id").distinct()
        val total = org.apache.spark.sql.graft.ColumnBridge.scalar(
          words.agg(count(lit(1)).as("total")))
        words
          .join(broadcast(candidates), Seq("word_id"), "left_semi")
          .groupBy(col("word_id")).agg(count(lit(1)).as("n"))
          .filter(col("n") > total / lit(Phi))
          .select(col("word_id"), col("n"))
          .orderBy(col("n").desc, col("word_id"))
      },
      Some(s"""
        WITH toks AS (SELECT unnest(string_split_regex(text, '\\s+')) AS word
                      FROM documents),
        h AS (SELECT ${DedupQueries.wordHashSql("word")} AS word_id, count(*) AS n
              FROM toks GROUP BY 1)
        SELECT word_id, n FROM h
        WHERE n > (SELECT count(*) FROM toks) / $Phi
        ORDER BY n DESC, word_id""")),

    QDef(
      "agg_kmv_distinct",
      (s, dir) => {
        // KMV (k-minimum-values) distinct-count sketch over order keys:
        // per-partition bottom-k of distinct portable hashes (bounded
        // TreeSet state, no shuffle), then a global bottom-k over the
        // <= k·P survivors (TakeOrderedAndProject: per-partition top-k +
        // tiny merge — never a global sort), estimate (k-1)·U/h_k. The
        // sketch is mergeable, so at 100 TB this is one narrow pass plus
        // a k-row reduce; the estimate lands <1% of truth at both test
        // scales. All arithmetic is exact-integer until the one final
        // double division, reproduced verbatim by the oracle.
        import s.implicits._
        val hashes = tbl(s, dir, "lineitem")
          .select(kmvHash(col("l_orderkey")).as("h"))
        val bottomPerPart = hashes.as[Long].mapPartitions { it =>
          val ts = new java.util.TreeSet[java.lang.Long]()
          it.foreach { h =>
            if (ts.size < KmvK) ts.add(h)
            else if (h < ts.last()) { ts.add(h); if (ts.size > KmvK) ts.pollLast() }
          }
          import scala.jdk.CollectionConverters._
          ts.iterator().asScala.map(Long2long)
        }.toDF("h")
        bottomPerPart.distinct()
          .orderBy(col("h")).limit(KmvK)
          .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_min_hash"))
          .select(col("k_used"), col("kth_min_hash"),
            when(col("k_used") < KmvK, col("k_used").cast("double"))
              .otherwise((col("k_used") - 1).cast("double") * lit(KmvDomain.toDouble) /
                col("kth_min_hash"))
              .as("est_distinct"))
      },
      Some(s"""
        WITH h AS (SELECT DISTINCT ${kmvHashSql("l_orderkey")} AS h FROM lineitem),
        k AS (SELECT h FROM h ORDER BY h LIMIT $KmvK)
        SELECT count(*) AS k_used, max(h) AS kth_min_hash,
               CASE WHEN count(*) < $KmvK THEN CAST(count(*) AS DOUBLE)
                    ELSE CAST(count(*) - 1 AS DOUBLE) * ${KmvDomain.toDouble} / max(h)
               END AS est_distinct
        FROM k""")),

    QDef(
      "agg_hll_distinct",
      (s, dir) => {
        // HyperLogLog distinct-count sketch per event_type PLUS a
        // register-MERGED '(all)' row — the merge is the point: the
        // global row is computed by MAXing the per-type registers,
        // never re-touching raw data, exactly how a 100 TB fleet
        // combines per-shard sketches (HLL registers are a max-
        // semilattice, so merge order and sharding cannot change
        // them). Everything is engine-exact integer arithmetic:
        //  - the hash is the repo's portable hashBucket over a 2^30
        //    domain; bucket = h % 256, w = h div 256 (22 bits);
        //  - rank = leading zeros of w + 1 = 23 - length(bin(w)) —
        //    the EXACT integer floor-log2, no float log anywhere;
        //  - Z is carried scaled by 2^23 (sum of shiftlefts — every
        //    term a power of two, absent buckets contribute 2^23);
        //  - alpha_256 = 0.7213/(1+1.079/256) enters as the scaled
        //    constant A20 = floor(alpha·2^20) = 753163, so the
        //    estimate is (A20·2^39 div z23) div 2^20, pure BIGINT
        //    (nested floor-divs compose: equal to dividing by
        //    z23·2^20 once).
        // No small-range correction on purpose: n_exact/abs_err_ppm
        // audit columns EXPOSE the raw estimator's bias rather than
        // hiding it (the observed error at both test scales is ~2-6%,
        // the textbook 1.04/sqrt(256) envelope).
        import graft.operators.Hll
        val ev = tbl(s, dir, "events")
          .select(col("event_type"), col("user_id"))
        val rk = Hll.registers(ev, Seq("event_type"), col("user_id"))
        val perType = Hll.estimate(rk, Seq("event_type"))
          .join(ev.groupBy(col("event_type"))
            .agg(countDistinct(col("user_id")).as("n_exact")),
            Seq("event_type"))
        val merged = Hll.merge(rk, Nil)
          .withColumn("event_type", lit("(all)"))
        val allRow = Hll.estimate(merged, Seq("event_type"))
          .withColumn("n_exact", org.apache.spark.sql.graft.ColumnBridge
            .scalar(ev.agg(countDistinct(col("user_id")).as("n"))))
        perType.unionByName(allRow)
          .select(col("event_type"), col("z23"), col("hll_est"),
            col("n_exact"),
            expr("abs(hll_est - n_exact) * 1000000 div n_exact")
              .as("abs_err_ppm"))
          .orderBy("event_type")
      },
      Some(s"""
        WITH e AS (SELECT event_type, user_id,
                     CAST(user_id AS VARCHAR) AS k FROM events
                   WHERE user_id IS NOT NULL),
        ${graft.operators.Hll.mixSqlCtes("e", "event_type")},
        rr AS (SELECT event_type, h % 256 AS bucket, h // 256 AS w FROM hmix),
        rk AS (SELECT event_type, bucket,
                 max(CASE WHEN w = 0 THEN 23
                     ELSE 23 - length(bin(w)) END) AS r
               FROM rr GROUP BY 1, 2),
        zt AS (SELECT event_type,
                 CAST(sum(1::BIGINT << (23 - r))
                   + (256 - count(*)) * 8388608 AS BIGINT) AS z23
               FROM rk GROUP BY 1),
        et AS (SELECT event_type, z23,
                 (($HllA20 * 549755813888) // z23) // 1048576 AS hll_est
               FROM zt),
        xt AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
               FROM e GROUP BY 1),
        rka AS (SELECT bucket, max(r) AS r FROM rk GROUP BY 1),
        za AS (SELECT CAST(sum(1::BIGINT << (23 - r))
                 + (256 - count(*)) * 8388608 AS BIGINT) AS z23 FROM rka),
        ea AS (SELECT '(all)' AS event_type, z23,
                 (($HllA20 * 549755813888) // z23) // 1048576 AS hll_est
               FROM za),
        xa AS (SELECT count(DISTINCT user_id) AS n_exact FROM e)
        SELECT event_type, z23, hll_est, n_exact,
               abs(hll_est - n_exact) * 1000000 // n_exact AS abs_err_ppm
        FROM (SELECT et.event_type, et.z23, et.hll_est, xt.n_exact
              FROM et JOIN xt USING (event_type)
              UNION ALL
              SELECT ea.event_type, ea.z23, ea.hll_est, xa.n_exact
              FROM ea, xa)
        ORDER BY event_type""")),

    QDef(
      "agg_ols_by_group",
      (s, dir) => {
        // per-group ordinary least squares (price-on-quantity) from EXACT
        // integer moments: built-in regr_slope accumulates doubles whose
        // value depends on partition order — useless for cross-engine
        // comparison. One map-side-combined pass collects n, Σx, Σy, Σx²,
        // Σy², Σxy as decimal(38) integers over cent-scaled inputs, and
        // slope/intercept/r² are each a single fixed IEEE expression over
        // those exact moments (same shape as agg_corr_exact).
        val cents = (c: org.apache.spark.sql.Column) => round(c * 100).cast("long")
        val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val li = tbl(s, dir, "lineitem")
          .select(col("l_returnflag"),
            cents(col("l_quantity")).as("x"),
            cents(col("l_extendedprice")).as("y"))
        val m = li.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
            sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
            sum(dec(col("x") * col("x"))).as("sxx"),
            sum(dec(col("y") * col("y"))).as("syy"),
            sum(dec(col("x") * col("y"))).as("sxy"))
        val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        m.select(col("l_returnflag"), col("n").cast("long").as("n"),
            slope.as("slope"),
            ((col("sy").cast("double") - slope * col("sx").cast("double")) /
              col("n").cast("double")).as("intercept_cents"),
            (slope *
              ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
               (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
              .as("r2"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        WITH t AS (SELECT l_returnflag,
                     CAST(round(l_quantity * 100) AS BIGINT) AS x,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS y
                   FROM lineitem),
        m AS (SELECT l_returnflag,
                CAST(count(*) AS HUGEINT) AS n,
                sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                sum(CAST(x AS HUGEINT) * x) AS sxx,
                sum(CAST(y AS HUGEINT) * y) AS syy,
                sum(CAST(x AS HUGEINT) * y) AS sxy
              FROM t GROUP BY 1)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n,
               CAST(n * sxy - sx * sy AS DOUBLE) /
                 CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
               (CAST(sy AS DOUBLE) -
                 (CAST(n * sxy - sx * sy AS DOUBLE) /
                  CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) /
                 CAST(n AS DOUBLE) AS intercept_cents,
               (CAST(n * sxy - sx * sy AS DOUBLE) /
                 CAST(n * sxx - sx * sx AS DOUBLE)) *
               (CAST(n * sxy - sx * sy AS DOUBLE) /
                 CAST(n * syy - sy * sy AS DOUBLE)) AS r2
        FROM m ORDER BY l_returnflag""")),

    QDef(
      "agg_max_drawdown",
      (s, dir) => {
        // maximum drawdown of the cumulative event-value series — the
        // classic "inherently sequential" scan statistic, done with NO
        // single-partition window: collapse to the per-second grain
        // (one aggregation), then the distributed global prefix SUM
        // builds the running balance and the distributed global prefix
        // MAX (Windows.globalCumMax, the new prefix-max sibling) builds
        // its high-water mark; drawdown = highwater − balance is a
        // projection. Two range shuffles total, every partition scanned
        // in parallel — the shape survives an arbitrarily long series.
        val perSec = tbl(s, dir, "events")
          .groupBy(unix_timestamp(col("ts")).as("sec"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        val cum = graft.operators.Windows
          .globalCumSum(perSec, "sec", Seq("cents"))
          .select(col("sec"), col("cum_cents"))
        val dd = graft.operators.Windows
          .globalCumMax(cum, "sec", "cum_cents")
          .select(col("sec").as("at_sec"),
            (col("cummax_cum_cents") - col("cum_cents")).as("max_drawdown_cents"))
        dd.orderBy(col("max_drawdown_cents").desc, col("at_sec")).limit(1)
      },
      Some("""
        WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        p AS (SELECT sec, sum(cents) AS cents FROM e GROUP BY 1),
        c AS (SELECT sec, sum(cents) OVER (ORDER BY sec) AS cum FROM p),
        d AS (SELECT sec AS at_sec,
                max(cum) OVER (ORDER BY sec) - cum AS dd FROM c)
        SELECT at_sec, CAST(dd AS BIGINT) AS max_drawdown_cents
        FROM d ORDER BY dd DESC, at_sec LIMIT 1""")),

    QDef(
      "agg_chi2_independence",
      (s, dir) => {
        // chi-squared test of independence between event_type and
        // day-of-week, emitted PER CELL so every number stays engine-exact:
        // observed counts and the (oN - rc)² numerator are exact
        // decimal(38) integers, and each cell's expected value and chi²
        // contribution is one double division over them — never a
        // cross-engine float accumulation (a global chi² total would sum
        // doubles in engine-dependent order). Day-of-week comes from pure
        // epoch arithmetic ((days+4) % 7), sidestepping the engines'
        // incompatible dayofweek() origins. Shape at scale: one fact-grain
        // groupBy collapses to ≤ |types|·7 cells; row/col margins reduce
        // the tiny cell frame and broadcast back — margins never touch the
        // fact table a second time.
        import org.apache.spark.sql.Column
        val d = (c: Column) => c.cast("decimal(38,0)")
        val e = tbl(s, dir, "events").select(col("event_type"),
          expr("((unix_timestamp(ts) div 86400) + 4) % 7").as("dow"))
        val cells = e.groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("o"))
        val rt = cells.groupBy(col("event_type")).agg(sum(col("o")).as("r_tot"))
        val ct = cells.groupBy(col("dow")).agg(sum(col("o")).as("c_tot"))
        val n = org.apache.spark.sql.graft.ColumnBridge.scalar(
          cells.agg(sum(col("o")).as("n")))
        val num = d(col("o")) * d(n) - d(col("r_tot")) * d(col("c_tot"))
        cells
          .join(broadcast(rt), Seq("event_type"))
          .join(broadcast(ct), Seq("dow"))
          .select(col("event_type"), col("dow"), col("o"),
            ((d(col("r_tot")) * d(col("c_tot"))).cast("double") /
              d(n).cast("double")).as("expected"),
            ((num * num).cast("double") /
              (d(n) * d(col("r_tot")) * d(col("c_tot"))).cast("double"))
              .as("chi2_contrib"))
          .orderBy(col("event_type"), col("dow"))
      },
      Some("""
        WITH e AS (SELECT event_type,
                     ((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7 AS dow
                   FROM events),
        cells AS (SELECT event_type, dow, count(*) AS o FROM e GROUP BY 1, 2),
        rt AS (SELECT event_type, sum(o) AS r_tot FROM cells GROUP BY 1),
        ct AS (SELECT dow, sum(o) AS c_tot FROM cells GROUP BY 1),
        n AS (SELECT sum(o) AS n FROM cells)
        SELECT c.event_type, c.dow, c.o,
               CAST(CAST(r.r_tot AS HUGEINT) * ct.c_tot AS DOUBLE) /
                 CAST(n.n AS DOUBLE) AS expected,
               CAST((CAST(c.o AS HUGEINT) * n.n -
                     CAST(r.r_tot AS HUGEINT) * ct.c_tot) *
                    (CAST(c.o AS HUGEINT) * n.n -
                     CAST(r.r_tot AS HUGEINT) * ct.c_tot) AS DOUBLE) /
                 CAST(CAST(n.n AS HUGEINT) * r.r_tot * ct.c_tot AS DOUBLE)
                 AS chi2_contrib
        FROM cells c
        JOIN rt r ON r.event_type = c.event_type
        JOIN ct ON ct.dow = c.dow
        CROSS JOIN n
        ORDER BY c.event_type, c.dow""")),

    QDef(
      "agg_welch_ttest",
      (s, dir) => {
        // Welch's unequal-variance t-test (weekday vs weekend value, per
        // event_type) from exact integer moments: the weekday/weekend
        // split is CONDITIONAL aggregation inside one groupBy — no
        // self-join, no theta join, one fact shuffle to |types| rows.
        // n/Σx/Σx² accumulate as exact decimal(38) cents; t and the
        // Welch–Satterthwaite df are each one fixed IEEE expression tree
        // over those moments (+, ×, ÷, sqrt are all correctly rounded,
        // so both engines produce identical bits).
        import org.apache.spark.sql.Column
        val d = (c: Column) => c.cast("decimal(38,0)")
        val dbl = (c: Column) => c.cast("double")
        val e = tbl(s, dir, "events").select(col("event_type"),
          (expr("((unix_timestamp(ts) div 86400) + 4) % 7").isin(0, 6))
            .as("wkend"),
          round(col("value") * 100).cast("long").as("cents"))
        val zero = lit(0L)
        val m = e.groupBy(col("event_type")).agg(
          sum(when(!col("wkend"), 1L).otherwise(zero)).as("n1"),
          sum(d(when(!col("wkend"), col("cents")).otherwise(zero))).as("s1"),
          sum(d(when(!col("wkend"), col("cents") * col("cents"))
            .otherwise(zero))).as("ss1"),
          sum(when(col("wkend"), 1L).otherwise(zero)).as("n2"),
          sum(d(when(col("wkend"), col("cents")).otherwise(zero))).as("s2"),
          sum(d(when(col("wkend"), col("cents") * col("cents"))
            .otherwise(zero))).as("ss2"))
        // a = s₁²/n₁, b = s₂²/n₂ with sample variance from exact moments:
        // s² = (n·Σx² − (Σx)²) / (n(n−1)), so s²/n has an exact integer
        // numerator and denominator and ONE double division each.
        val a = dbl(d(col("n1")) * col("ss1") - col("s1") * col("s1")) /
          dbl(d(col("n1")) * col("n1") * (d(col("n1")) - 1))
        val b = dbl(d(col("n2")) * col("ss2") - col("s2") * col("s2")) /
          dbl(d(col("n2")) * col("n2") * (d(col("n2")) - 1))
        val meanDiff = dbl(col("s1")) / dbl(col("n1")) -
          dbl(col("s2")) / dbl(col("n2"))
        m.select(col("event_type"),
            col("n1").as("n_weekday"), col("n2").as("n_weekend"),
            meanDiff.as("mean_diff_cents"),
            (meanDiff / sqrt(a + b)).as("t_stat"),
            (((a + b) * (a + b)) /
              (a * a / dbl(col("n1") - 1) + b * b / dbl(col("n2") - 1)))
              .as("df_welch"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH e AS (SELECT event_type,
                     ((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7
                       IN (0, 6) AS wkend,
                     CAST(round(value * 100) AS BIGINT) AS cents
                   FROM events),
        m AS (SELECT event_type,
                sum(CASE WHEN NOT wkend THEN 1 ELSE 0 END) AS n1,
                sum(CAST(CASE WHEN NOT wkend THEN cents ELSE 0 END AS HUGEINT)) AS s1,
                sum(CAST(CASE WHEN NOT wkend THEN cents * cents ELSE 0 END AS HUGEINT)) AS ss1,
                sum(CASE WHEN wkend THEN 1 ELSE 0 END) AS n2,
                sum(CAST(CASE WHEN wkend THEN cents ELSE 0 END AS HUGEINT)) AS s2,
                sum(CAST(CASE WHEN wkend THEN cents * cents ELSE 0 END AS HUGEINT)) AS ss2
              FROM e GROUP BY 1),
        x AS (SELECT event_type, n1, n2,
                CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md,
                CAST(CAST(n1 AS HUGEINT) * ss1 - s1 * s1 AS DOUBLE) /
                  CAST(CAST(n1 AS HUGEINT) * n1 * (n1 - 1) AS DOUBLE) AS a,
                CAST(CAST(n2 AS HUGEINT) * ss2 - s2 * s2 AS DOUBLE) /
                  CAST(CAST(n2 AS HUGEINT) * n2 * (n2 - 1) AS DOUBLE) AS b
              FROM m)
        SELECT event_type, CAST(n1 AS BIGINT) AS n_weekday,
               CAST(n2 AS BIGINT) AS n_weekend,
               md AS mean_diff_cents,
               md / sqrt(a + b) AS t_stat,
               ((a + b) * (a + b)) /
                 (a * a / CAST(n1 - 1 AS DOUBLE) +
                  b * b / CAST(n2 - 1 AS DOUBLE)) AS df_welch
        FROM x ORDER BY event_type""")),

    QDef(
      "agg_simpson_diversity",
      (s, dir) => {
        // per-source vocabulary diversity via the Simpson index
        // D = 1 − Σc(c−1)/(N(N−1)): the entropy-style corpus profile that
        // stays engine-exact — unlike Shannon entropy (a float log sum in
        // engine-dependent order), Simpson's numerator Σc(c−1) is an exact
        // integer reduce, and the index is one double division. Shape:
        // (source, word) groupBy collapses the token stream, then a
        // per-source reduce of the tiny count frame — two map-side-combined
        // shuffles, both shrinking.
        import org.apache.spark.sql.Column
        val d = (c: Column) => c.cast("decimal(38,0)")
        val wc = tbl(s, dir, "documents")
          .select(col("source"),
            explode(graft.text.TextFunctions.tokens(col("text"))).as("word"))
          .groupBy(col("source"), col("word")).agg(count(lit(1)).as("c"))
        wc.groupBy(col("source"))
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(d(col("c")) * (d(col("c")) - 1)).as("coll"))
          .select(col("source"), col("n_tokens"), col("n_types"),
            (lit(1.0) - col("coll").cast("double") /
              (d(col("n_tokens")) * (d(col("n_tokens")) - 1)).cast("double"))
              .as("simpson_index"))
          .orderBy(col("source"))
      },
      Some("""
        WITH toks AS (SELECT source,
                        unnest(string_split_regex(text, '\s+')) AS word
                      FROM documents),
        wc AS (SELECT source, word, count(*) AS c FROM toks GROUP BY 1, 2)
        SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
               1.0 - CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS DOUBLE) /
                 CAST(CAST(sum(c) AS HUGEINT) * (sum(c) - 1) AS DOUBLE)
                 AS simpson_index
        FROM wc GROUP BY source ORDER BY source""")),

    QDef(
      "agg_kmv_set_ops",
      (s, dir) => {
        // KMV sketch SET ALGEBRA: bottom-k hash sketches of two customer
        // sets (urgent-priority vs low-priority buyers) compose into
        // union/Jaccard/overlap estimates WITHOUT ever joining the raw
        // sets — the union sketch is the bottom-k of the two sketches'
        // union, and Jaccard is the fraction of union-sketch members
        // present in both sides (the standard k-minimum-values θ-sketch
        // estimator). At 100 TB each side reduces to ≤ k rows before
        // anything joins; the semi joins run over broadcast 256-row
        // frames. Exact-integer hashes end in two fixed double divisions,
        // so the oracle reproduces every bit.
        def bottomK(df: DataFrame) = df.distinct().orderBy(col("h")).limit(KmvK)
        val orders = tbl(s, dir, "orders")
        def side(p: String) = bottomK(orders
          .filter(col("o_orderpriority") === p)
          .select(kmvHash(col("o_custkey")).as("h")))
        val sa = side("1-URGENT")
        val sb = side("5-LOW")
        val u = bottomK(sa.unionAll(sb))
        val matches = org.apache.spark.sql.graft.ColumnBridge.scalar(
          u.join(broadcast(sa), Seq("h"), "left_semi")
            .join(broadcast(sb), Seq("h"), "left_semi")
            .agg(count(lit(1)).as("m")))
        u.agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_min_hash"))
          .withColumn("matches", matches)
          .select(col("k_used"), col("kth_min_hash"), col("matches"),
            (col("matches").cast("double") / col("k_used").cast("double"))
              .as("jaccard_est"),
            when(col("k_used") < KmvK, col("k_used").cast("double"))
              .otherwise((col("k_used") - 1).cast("double") *
                lit(KmvDomain.toDouble) / col("kth_min_hash"))
              .as("union_est"))
      },
      Some(s"""
        WITH a AS (SELECT DISTINCT ${kmvHashSql("o_custkey")} AS h
                   FROM orders WHERE o_orderpriority = '1-URGENT'),
        sa AS (SELECT h FROM a ORDER BY h LIMIT $KmvK),
        b AS (SELECT DISTINCT ${kmvHashSql("o_custkey")} AS h
              FROM orders WHERE o_orderpriority = '5-LOW'),
        sb AS (SELECT h FROM b ORDER BY h LIMIT $KmvK),
        u AS (SELECT DISTINCT h FROM
                (SELECT h FROM sa UNION ALL SELECT h FROM sb)
              ORDER BY h LIMIT $KmvK),
        m AS (SELECT count(*) AS matches FROM u
              WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb))
        SELECT count(*) AS k_used, max(h) AS kth_min_hash,
               (SELECT matches FROM m) AS matches,
               CAST((SELECT matches FROM m) AS DOUBLE) /
                 CAST(count(*) AS DOUBLE) AS jaccard_est,
               CASE WHEN count(*) < $KmvK THEN CAST(count(*) AS DOUBLE)
                    ELSE CAST(count(*) - 1 AS DOUBLE) * ${KmvDomain.toDouble} /
                      max(h)
               END AS union_est
        FROM u""")),

    QDef(
      "agg_hll_set_ops",
      (s, dir) => {
        // HLL sketch SET ALGEBRA — the companion to agg_kmv_set_ops on
        // the other sketch family: per-set register frames for two
        // customer populations (urgent vs low-priority buyers), the
        // UNION as the per-bucket register max (exact by the merge
        // law — never a join of raw sets), and the intersection by
        // inclusion–exclusion over the three estimates. At 100 TB each
        // side reduces to ≤ 256 register rows before anything
        // combines. All arithmetic BIGINT (est_intersect is signed —
        // inclusion–exclusion of two noisy estimates can undershoot);
        // exact audit columns ride along, so the sketch error is
        // visible per set operation.
        import graft.operators.Hll
        import org.apache.spark.sql.graft.ColumnBridge.scalar
        val orders = tbl(s, dir, "orders")
        def keys(p: String) = orders
          .filter(col("o_orderpriority") === p).select(col("o_custkey"))
        def regs(p: String) = Hll.registers(keys(p), Nil, col("o_custkey"))
        def est(r: DataFrame) =
          scalar(Hll.estimate(r, Nil).select(col("hll_est")))
        def exact(df: DataFrame) =
          scalar(df.agg(countDistinct(col("o_custkey")).as("n")))
        val eU = est(Hll.merge(
          regs("1-URGENT").unionByName(regs("5-LOW")), Nil))
        import s.implicits._
        Seq(1).toDF("one")
          .select(
            est(regs("1-URGENT")).as("est_a"),
            est(regs("5-LOW")).as("est_b"),
            eU.as("est_union"),
            exact(keys("1-URGENT")).as("n_a"),
            exact(keys("5-LOW")).as("n_b"),
            exact(keys("1-URGENT").unionByName(keys("5-LOW"))).as("n_union"))
          .withColumn("est_intersect",
            col("est_a") + col("est_b") - col("est_union"))
          .withColumn("n_intersect", col("n_a") + col("n_b") - col("n_union"))
          .select(col("est_a"), col("est_b"), col("est_union"),
            col("est_intersect"), col("n_a"), col("n_b"), col("n_union"),
            col("n_intersect"))
      },
      Some(s"""
        WITH base AS (
          SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a'
                 ELSE 'b' END AS sn,
                 o_custkey, CAST(o_custkey AS VARCHAR) AS k
          FROM orders
          WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
            AND o_custkey IS NOT NULL),
        ${graft.operators.Hll.mixSqlCtes("base", "sn")},
        rr AS (SELECT sn, h % 256 AS bucket, h // 256 AS w FROM hmix),
        rk AS (SELECT sn, bucket,
                 max(CASE WHEN w = 0 THEN 23
                     ELSE 23 - length(bin(w)) END) AS r
               FROM rr GROUP BY 1, 2),
        rku AS (SELECT bucket, max(r) AS r FROM rk GROUP BY 1),
        za AS (SELECT CAST(sum(1::BIGINT << (23 - r))
                 + (256 - count(*)) * 8388608 AS BIGINT) AS z23
               FROM rk WHERE sn = 'a'),
        zb AS (SELECT CAST(sum(1::BIGINT << (23 - r))
                 + (256 - count(*)) * 8388608 AS BIGINT) AS z23
               FROM rk WHERE sn = 'b'),
        zu AS (SELECT CAST(sum(1::BIGINT << (23 - r))
                 + (256 - count(*)) * 8388608 AS BIGINT) AS z23
               FROM rku),
        ea AS (SELECT ((${graft.operators.Hll.A20} * 549755813888) // z23)
                 // 1048576 AS e FROM za),
        eb AS (SELECT ((${graft.operators.Hll.A20} * 549755813888) // z23)
                 // 1048576 AS e FROM zb),
        eu AS (SELECT ((${graft.operators.Hll.A20} * 549755813888) // z23)
                 // 1048576 AS e FROM zu),
        xa AS (SELECT count(DISTINCT o_custkey) AS n FROM orders
               WHERE o_orderpriority = '1-URGENT'),
        xb AS (SELECT count(DISTINCT o_custkey) AS n FROM orders
               WHERE o_orderpriority = '5-LOW'),
        xu AS (SELECT count(DISTINCT o_custkey) AS n FROM orders
               WHERE o_orderpriority IN ('1-URGENT', '5-LOW'))
        SELECT (SELECT e FROM ea) AS est_a,
               (SELECT e FROM eb) AS est_b,
               (SELECT e FROM eu) AS est_union,
               (SELECT e FROM ea) + (SELECT e FROM eb)
                 - (SELECT e FROM eu) AS est_intersect,
               (SELECT n FROM xa) AS n_a,
               (SELECT n FROM xb) AS n_b,
               (SELECT n FROM xu) AS n_union,
               (SELECT n FROM xa) + (SELECT n FROM xb)
                 - (SELECT n FROM xu) AS n_intersect""")),

    QDef(
      "agg_countmin_estimate",
      (s, dir) => {
        // Count-Min sketch with a certified overestimate audit: d=4
        // pairwise-independent hash rows × w=1024 buckets build in ONE
        // map-side-combined pass (the 4× row explosion collapses to
        // ≤ 4096 counters per partition before the shuffle), then the
        // exact top-20 words read their estimates back via min over the
        // d bucket counts. CM guarantees est ≥ exact; the emitted
        // over_err column makes the guarantee auditable row by row —
        // and the whole sketch is integer arithmetic, so the oracle
        // rebuilds it bit-for-bit.
        val W = 1024
        val hashes = Seq((0, 1103515245L, 12345L), (1, 69069L, 1L),
          (2, 1664525L, 1013904223L), (3, 22695477L, 1L))
        val words = tbl(s, dir, "documents")
          .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("word"))
          .select(graft.dedup.Dedup.wordId(col("word")).as("word_id"))
        val bucketed = words.select(col("word_id"),
          explode(array(hashes.map { case (j, a, b) =>
            struct(lit(j).as("j"),
              (((col("word_id") * a + b) % 2147483647L) % W).as("bucket"))
          }: _*)).as("jb"))
          .select(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
        val cm = bucketed.groupBy(col("j"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
        val top = words.groupBy(col("word_id")).agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("word_id")).limit(20)
        val probes = top.select(col("word_id"), col("exact_n"),
          explode(array(hashes.map { case (j, a, b) =>
            struct(lit(j).as("j"),
              (((col("word_id") * a + b) % 2147483647L) % W).as("bucket"))
          }: _*)).as("jb"))
          .select(col("word_id"), col("exact_n"),
            col("jb.j").as("j"), col("jb.bucket").as("bucket"))
        probes.join(broadcast(cm), Seq("j", "bucket"))
          .groupBy(col("word_id"), col("exact_n"))
          .agg(min(col("cnt")).as("cm_est"))
          .select(col("word_id"), col("exact_n"), col("cm_est"),
            (col("cm_est") - col("exact_n")).as("over_err"))
          .orderBy(col("exact_n").desc, col("word_id"))
      },
      Some(s"""
        WITH toks AS (SELECT unnest(string_split_regex(text, '\\s+')) AS word
                      FROM documents),
        w AS (SELECT ${DedupQueries.wordHashSql("word")} AS word_id FROM toks),
        hj AS (SELECT * FROM (VALUES (0, 1103515245, 12345), (1, 69069, 1),
                 (2, 1664525, 1013904223), (3, 22695477, 1)) t(j, a, b)),
        cm AS (SELECT hj.j, ((w.word_id * hj.a + hj.b) % 2147483647) % 1024
                 AS bucket, count(*) AS cnt
               FROM w CROSS JOIN hj GROUP BY 1, 2),
        top AS (SELECT word_id, count(*) AS exact_n FROM w
                GROUP BY 1 ORDER BY exact_n DESC, word_id LIMIT 20),
        probes AS (SELECT t.word_id, t.exact_n, hj.j,
                     ((t.word_id * hj.a + hj.b) % 2147483647) % 1024 AS bucket
                   FROM top t CROSS JOIN hj)
        SELECT p.word_id, p.exact_n, CAST(min(c.cnt) AS BIGINT) AS cm_est,
               CAST(min(c.cnt) - p.exact_n AS BIGINT) AS over_err
        FROM probes p JOIN cm c ON c.j = p.j AND c.bucket = p.bucket
        GROUP BY p.word_id, p.exact_n
        ORDER BY p.exact_n DESC, p.word_id""")),

    QDef(
      "agg_entropy_by_group",
      (s, dir) => {
        // Shannon entropy of each event type's hour-of-day profile — the
        // temporal-regularity score (uniform 24h bot traffic ≈ log2 24,
        // bursty human traffic much lower). Engine-exact where a float
        // log sum could never be: PortableLog.log2q10 is an exact INTEGER
        // log2 (no libm on either side), so Σ c·log2q10(c) commutes
        // across partitions and H = (n·L(n) − Σ c·L(c))/n closes with
        // one double division over exact integers. Shape: two shrinking
        // map-side-combined shuffles, |types×24| then |types| rows.
        import graft.functions.PortableLog.log2q10
        val hc = tbl(s, dir, "events")
          .groupBy(col("event_type"), hour(col("ts")).as("hr"))
          .agg(count(lit(1)).as("c"))
        val g = hc.groupBy(col("event_type"))
          .agg(sum(col("c")).as("n"), count(lit(1)).as("n_hours"),
            sum(col("c") * log2q10(col("c"))).as("sl"))
        val hnum = col("n") * log2q10(col("n")) - col("sl")
        g.select(col("event_type"), col("n").as("n_events"), col("n_hours"),
            (hnum.cast("double") / (col("n") * Q10).cast("double"))
              .as("entropy_bits"),
            when(col("n_hours") > 1, hnum.cast("double") /
                (col("n") * log2q10(col("n_hours"))).cast("double"))
              .otherwise(lit(0.0)).as("entropy_norm"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        WITH ${graft.functions.PortableLog.l2tCte},
        hc AS (SELECT event_type, hour(ts) AS hr, count(*) AS c
               FROM events GROUP BY 1, 2),
        g AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
                count(*) AS n_hours,
                CAST(sum(c * ${graft.functions.PortableLog.log2q10Sql("c")})
                  AS BIGINT) AS sl
              FROM hc, l2t GROUP BY event_type),
        h AS (SELECT event_type, n, n_hours,
                n * ${graft.functions.PortableLog.log2q10Sql("n")} - sl AS hnum,
                ${graft.functions.PortableLog.log2q10Sql("n_hours")} AS lnh
              FROM g, l2t)
        SELECT event_type, n AS n_events, n_hours,
               CAST(hnum AS DOUBLE) / CAST(n * ${Q10} AS DOUBLE)
                 AS entropy_bits,
               CASE WHEN n_hours > 1
                    THEN CAST(hnum AS DOUBLE) / CAST(n * lnh AS DOUBLE)
                    ELSE 0.0 END AS entropy_norm
        FROM h ORDER BY event_type""")),

    QDef(
      "agg_mann_whitney",
      (s, dir) => {
        // Mann–Whitney U rank-sum test (weekday vs weekend value per
        // event_type) — the nonparametric sibling of agg_welch_ttest for
        // when values aren't normal. Midranks stay INTEGER by doubling:
        // 2·midrank = rmin + rmax = 2·rank + ties − 1, so rank sums,
        // U, and the tie-corrected variance numerator are all exact
        // integer/decimal moments; z closes with one division and one
        // (correctly-rounded) sqrt. The only global order is the
        // per-type rank window — same shape DuckDB runs, and at scale a
        // range-partitioned sort, not a single-node one.
        import org.apache.spark.sql.Column
        import org.apache.spark.sql.expressions.Window
        val d = (c: Column) => c.cast("decimal(38,0)")
        val dbl = (c: Column) => c.cast("double")
        val e = tbl(s, dir, "events").select(col("event_type"),
          (expr("((unix_timestamp(ts) div 86400) + 4) % 7").isin(0, 6))
            .as("wkend"),
          round(col("value") * 100).cast("long").as("cents"))
        val r = e
          .withColumn("rmin",
            rank().over(Window.partitionBy(col("event_type"))
              .orderBy(col("cents"))))
          .withColumn("tcnt",
            count(lit(1)).over(Window.partitionBy(col("event_type"),
              col("cents"))))
        val a = r.groupBy(col("event_type")).agg(
          sum(when(!col("wkend"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("wkend"), 1L).otherwise(0L)).as("n2"),
          sum(when(!col("wkend"), col("rmin") * 2 + col("tcnt") - 1)
            .otherwise(0L)).as("r1x2"))
        val t = e.groupBy(col("event_type"), col("cents"))
          .agg(count(lit(1)).as("tsz"))
          .groupBy(col("event_type"))
          .agg(sum(d(col("tsz")) * col("tsz") * col("tsz") - col("tsz"))
            .as("tie3"))
        val n = d(col("n1")) + col("n2")
        val u1x2 = d(col("r1x2")) - d(col("n1")) * (col("n1") + 1)
        val num = u1x2 - d(col("n1")) * col("n2")
        val vnum = d(col("n1")) * col("n2") * ((n * n * n - n) - col("tie3"))
        val vden = lit(12).cast("decimal(38,0)") * n * (n - 1)
        a.join(t, Seq("event_type"))
          .select(col("event_type"), col("n1").as("n_weekday"),
            col("n2").as("n_weekend"),
            (dbl(u1x2) / 2.0).as("u_stat"),
            (dbl(num) / (sqrt(dbl(vnum) / dbl(vden)) * 2.0)).as("z_stat"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH e AS (SELECT event_type,
                     ((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7
                       IN (0, 6) AS wkend,
                     CAST(round(value * 100) AS BIGINT) AS cents
                   FROM events),
        r AS (SELECT event_type, wkend,
                rank() OVER (PARTITION BY event_type ORDER BY cents) AS rmin,
                count(*) OVER (PARTITION BY event_type, cents) AS tcnt
              FROM e),
        a AS (SELECT event_type,
                sum(CASE WHEN NOT wkend THEN 1 ELSE 0 END) AS n1,
                sum(CASE WHEN wkend THEN 1 ELSE 0 END) AS n2,
                sum(CASE WHEN NOT wkend THEN rmin * 2 + tcnt - 1 ELSE 0 END)
                  AS r1x2
              FROM r GROUP BY 1),
        tg AS (SELECT event_type, cents, count(*) AS tsz FROM e GROUP BY 1, 2),
        tt AS (SELECT event_type,
                 sum(CAST(tsz AS HUGEINT) * tsz * tsz - tsz) AS tie3
               FROM tg GROUP BY 1),
        x AS (SELECT a.event_type, n1, n2,
                CAST(n1 + n2 AS HUGEINT) AS n,
                CAST(r1x2 AS HUGEINT) - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1x2,
                tie3
              FROM a JOIN tt ON tt.event_type = a.event_type)
        SELECT event_type, CAST(n1 AS BIGINT) AS n_weekday,
               CAST(n2 AS BIGINT) AS n_weekend,
               CAST(u1x2 AS DOUBLE) / 2.0 AS u_stat,
               CAST(u1x2 - CAST(n1 AS HUGEINT) * n2 AS DOUBLE) /
                 (sqrt(CAST(CAST(n1 AS HUGEINT) * n2 * ((n * n * n - n) - tie3)
                              AS DOUBLE) /
                       CAST(12 * n * (n - 1) AS DOUBLE)) * 2.0) AS z_stat
        FROM x ORDER BY event_type""")),

    QDef(
      "agg_gtest_independence",
      (s, dir) => {
        // G-test (log-likelihood ratio) of event_type × day-of-week
        // independence. agg_chi2_independence must emit PER CELL because
        // a float chi² total would sum in engine-dependent order; the
        // G statistic CLOSES GLOBALLY here because each cell's
        // o·(L(o·N) − L(r_tot·c_tot)) is an exact integer under
        // PortableLog — the whole table collapses to one hash-stable
        // row. G = 2·ln2·(Gq10/1024) converts fixed-point bits to the
        // conventional nats scale with one literal constant.
        // PRECISION CONTRACT: each log carries < 1/1024 bit of floor
        // quantization and every term weights it by o, so
        // |g_stat − G_true| ≤ 4·ln2·N/1024 ≈ N/369 nats — fine at the
        // ~1e4-cell-count scale of a dashboard, swamped by N at corpus
        // scale. `g_per_obs` (= G/N, the mutual-information-rate form,
        // I(X;Y) ≈ g_per_obs/2) is the scale-stable reading: its error
        // is ≤ 4·ln2/1024 ≈ 0.0027 nats INDEPENDENT of N. Shape: one
        // fact-grain groupBy to ≤ |types|·7 cells, margins broadcast
        // back, 1-row reduce.
        import graft.functions.PortableLog.log2q10
        val e = tbl(s, dir, "events").select(col("event_type"),
          expr("((unix_timestamp(ts) div 86400) + 4) % 7").as("dow"))
        val cells = e.groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("o"))
        val rt = cells.groupBy(col("event_type")).agg(sum(col("o")).as("r_tot"))
        val ct = cells.groupBy(col("dow")).agg(sum(col("o")).as("c_tot"))
        val n = org.apache.spark.sql.graft.ColumnBridge.scalar(
          cells.agg(sum(col("o"))))
        val terms = cells
          .join(broadcast(rt), Seq("event_type"))
          .join(broadcast(ct), Seq("dow"))
          .select(col("event_type"), col("dow"), col("o"),
            (col("o") * n).as("p_num"),
            (col("r_tot") * col("c_tot")).as("p_den"))
          .select(col("event_type"), col("dow"), col("o"),
            (col("o") * (log2q10(col("p_num")) - log2q10(col("p_den"))))
              .as("term"))
        terms.agg(count(lit(1)).as("n_cells"),
            countDistinct(col("event_type")).as("nr"),
            countDistinct(col("dow")).as("nc"),
            sum(col("o")).as("n_obs"), sum(col("term")).as("gq"))
          .select(col("n_cells"), col("n_obs"),
            ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
            (col("gq").cast("double") * (2.0 * 0.6931471805599453 / Q10))
              .as("g_stat"),
            ((col("gq").cast("double") * (2.0 * 0.6931471805599453 / Q10)) /
              col("n_obs").cast("double")).as("g_per_obs"))
      },
      Some(s"""
        WITH ${graft.functions.PortableLog.l2tCte},
        e AS (SELECT event_type,
                ((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7 AS dow
              FROM events),
        cells AS (SELECT event_type, dow, count(*) AS o FROM e GROUP BY 1, 2),
        rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r_tot
               FROM cells GROUP BY 1),
        ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c_tot
               FROM cells GROUP BY 1),
        nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        terms AS (SELECT c.event_type, c.dow, c.o,
                    c.o * (${graft.functions.PortableLog
                        .log2q10Sql("c.o * nn.n")}
                      - ${graft.functions.PortableLog
                        .log2q10Sql("r.r_tot * ct.c_tot")}) AS term
                  FROM cells c JOIN rt r ON r.event_type = c.event_type
                       JOIN ct ON ct.dow = c.dow, nn, l2t)
        SELECT count(*) AS n_cells, CAST(sum(o) AS BIGINT) AS n_obs,
               CAST((count(DISTINCT event_type) - 1) *
                    (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
               CAST(sum(term) AS DOUBLE) * (2.0 * 0.6931471805599453 / ${Q10})
                 AS g_stat,
               (CAST(sum(term) AS DOUBLE) * (2.0 * 0.6931471805599453 / ${Q10}))
                 / CAST(sum(o) AS DOUBLE) AS g_per_obs
        FROM terms""")),

    QDef(
      "stat_ols_slope",
      (s, dir) => {
        // distributed simple-OLS per event type: regress purchase value
        // (cents) on hour-of-day with the closed-form normal equations —
        // b1 = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). Every moment is an
        // order-free integer sum, and num/den are computed in
        // decimal(38,0) (HUGEINT on the DuckDB side): n·Σxy crosses
        // 2^63 at roughly 10^7 events per group, where a long would
        // silently null in non-ANSI Spark while DuckDB's CAST raises —
        // so no narrowing cast exists in the ARITHMETIC. The wide
        // integers cross the output boundary as DOUBLE: round-7 lesson —
        // DECIMAL(38,0) OUTPUT cells do not hash-canonicalize
        // identically across the two engines (the driver's compare
        // formats decimals differently), while decimal→double /
        // hugeint→double is the same IEEE round-to-nearest of the exact
        // integer in both. Keep exact wide types internal; emit floats.
        // Shape: one fact-grain map + one map-side-combined
        // groupBy — OLS at 100 TB is exactly one aggregation pass.
        val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val e = tbl(s, dir, "events")
          .select(col("event_type"),
            expr("(unix_timestamp(ts) div 3600) % 24").as("x"),
            round(col("value") * 100).cast("long").as("y"))
        e.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .select(col("event_type"), col("n"),
            (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
              .cast("double").as("b1_num"),
            (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
              .cast("double").as("b1_den"))
          .withColumn("slope_cents_per_hour", col("b1_num") / col("b1_den"))
          .orderBy("event_type")
      },
      Some("""
        WITH e AS (SELECT event_type,
                     ((CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24) AS x,
                     CAST(round(value * 100) AS BIGINT) AS y
                   FROM events),
        m AS (SELECT event_type, count(*) AS n,
                CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
                CAST(sum(x * x) AS HUGEINT) AS sxx,
                CAST(sum(x * y) AS HUGEINT) AS sxy
              FROM e GROUP BY 1)
        SELECT event_type, n,
               CAST(n * sxy - sx * sy AS DOUBLE) AS b1_num,
               CAST(n * sxx - sx * sx AS DOUBLE) AS b1_den,
               CAST(n * sxy - sx * sy AS DOUBLE) /
                 CAST(n * sxx - sx * sx AS DOUBLE)
                 AS slope_cents_per_hour
        FROM m ORDER BY event_type""")),

    QDef(
      "dq_key_skew",
      (s, dir) => {
        // join-key skew report — the ops-side tool that decides whether
        // a key needs salting: the 10 heaviest lineitem order keys, each
        // with its row count and the exact skew ratio against the mean
        // rows-per-key ((10^6·c·distinct_keys) div total_rows, integer).
        // One map-side-combined count + a TakeOrderedAndProject top-10;
        // the two corpus scalars ride in as scalar subqueries.
        val k = tbl(s, dir, "lineitem")
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
        val nKeys = org.apache.spark.sql.graft.ColumnBridge.scalar(
          k.agg(count(lit(1))))
        val nRows = org.apache.spark.sql.graft.ColumnBridge.scalar(
          k.agg(sum(col("c"))))
        k.select(col("l_orderkey"), col("c"), nKeys.as("n_keys"),
            nRows.as("n_rows"))
          .select(col("l_orderkey"), col("c"), col("n_keys"), col("n_rows"),
            expr("(1000000 * c * n_keys) div n_rows").as("skew_x1e6"))
          .orderBy(col("c").desc, col("l_orderkey")).limit(10)
      },
      Some("""
        WITH k AS (SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY 1),
        t AS (SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows
              FROM k)
        SELECT l_orderkey, c, n_keys, n_rows,
               (1000000 * c * n_keys) // n_rows AS skew_x1e6
        FROM k, t ORDER BY c DESC, l_orderkey LIMIT 10""")),

    QDef(
      "agg_log_histogram",
      (s, dir) => {
        // exponential (log2-bucketed) value histogram — the HdrHistogram
        // shape for long-tailed metrics (latencies, money, token
        // counts): constant relative precision, |buckets| = log2(max),
        // where a fixed-width histogram wastes all its bins on the
        // head. For an INTEGER floor-log2 no log table is needed at
        // all: bucket = bit length − 1 (PortableLog's own exponent
        // term) — a codegen'd string-length op, exact and identical in
        // both engines. (The first cut ran log2q10's 1024-entry
        // boundary filter per fact row: 29 s at sf0.1 vs 0.3 s this
        // way — the q10 fraction is for POST-aggregate frames, never
        // the fact grain.) One map-side-combined groupBy onto a
        // ~40-row domain.
        tbl(s, dir, "orders")
          .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
          .where(col("cents") >= 1)
          .select((length(bin(col("cents"))) - 1).cast("long").as("bucket"),
            col("cents"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), min(col("cents")).as("lo"),
            max(col("cents")).as("hi"))
          .orderBy("bucket")
      },
      Some("""
        WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                   FROM orders
                   WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 1),
        b AS (SELECT CAST(length(bin(cents)) - 1 AS BIGINT) AS bucket, cents
              FROM c)
        SELECT bucket, count(*) AS n, min(cents) AS lo, max(cents) AS hi
        FROM b GROUP BY bucket ORDER BY bucket""")),

    QDef(
      "stat_bootstrap_ci",
      (s, dir) => {
        // Poisson-bootstrap confidence interval for the mean order value
        // — THE distributed bootstrap (exact multinomial resampling needs
        // a global draw; giving each row an independent Poisson(1)
        // multiplicity per resample doesn't, which is why Chamandy et
        // al.'s Poisson bootstrap is what map-reduce fleets actually
        // run). Deterministic here: the multiplicity is a CASE over the
        // portable lattice hash of (order, resample) against the exact
        // per-mille Poisson(1) pmf thresholds (3679/3679/1839/613/153/37,
        // tail folded into 5), so both engines draw the identical
        // resamples. Shape at 100 TB: one fact scan exploded x32 with a
        // map-side-combined groupBy(b) — 32 resample rows out, never a
        // materialized resample; the 32 means collapse to one CI row via
        // a bounded collect_list (ci = 2nd / 31st order statistic, the
        // ~5%/95% band at B=32). Means are one IEEE division of exact
        // integer sums each, so sort order is engine-identical.
        val c = tbl(s, dir, "orders")
          .select(col("o_orderkey").as("k"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val fs = org.apache.spark.sql.graft.ColumnBridge.scalar(
          c.agg(sum(col("cents"))))
        val fn = org.apache.spark.sql.graft.ColumnBridge.scalar(
          c.agg(count(lit(1))))
        // materialize the raw hash, then the bucket, in their own
        // projections: the scramble reads the hash twice and the CASE
        // reads the bucket 5 times, and CollapseProject won't re-inline
        // a non-cheap expression into multiple uses — so the string
        // hash runs once per (row, resample), not 10 times (an earlier
        // form also had a filter(m > 0) that pushdown re-expanded into
        // the full hash-per-CASE-arm; m = 0 contributes zero to both
        // sums, so no filter is needed at all)
        val ph = graft.functions.Scalars.polyHash(
          concat(col("k").cast("string"), lit("|"), col("b").cast("string")))
        val hb = (((col("ph") % Sampling.MixQ1) * Sampling.MixA +
          col("ph") % Sampling.MixQ2) % Sampling.MixQ1) % 10000
        c.select(col("k"), col("cents"),
            explode(sequence(lit(0), lit(31))).as("b"))
          .select(col("b"), col("cents"), ph.as("ph"))
          .select(col("b"), col("cents"), hb.as("hb"))
          .select(col("b"), col("cents"),
            when(col("hb") < 3679, 0L).when(col("hb") < 7358, 1L)
              .when(col("hb") < 9197, 2L).when(col("hb") < 9810, 3L)
              .when(col("hb") < 9963, 4L).otherwise(5L).as("m"))
          .groupBy(col("b"))
          .agg(sum(col("m")).as("n"), sum(col("m") * col("cents")).as("sc"))
          .select((col("sc").cast("double") / col("n")).as("mean"))
          .agg(count(lit(1)).as("n_resamples"),
            sort_array(collect_list(col("mean"))).as("ms"))
          .select(col("n_resamples"),
            element_at(col("ms"), 2).as("ci_lo_mean"),
            element_at(col("ms"), 31).as("ci_hi_mean"),
            (fs.cast("double") / fn.cast("double")).as("full_mean_cents"))
      },
      Some(s"""
        WITH c AS (SELECT o_orderkey AS k,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                   FROM orders),
        bb AS (SELECT unnest(generate_series(0, 31)) AS b),
        hx AS (SELECT b, cents,
                 ${SamplingQueries.hashSql(
                   "CAST(k AS VARCHAR) || '|' || CAST(b AS VARCHAR)", 10000)} AS h
               FROM c, bb),
        mx AS (SELECT b, cents,
                 CASE WHEN h < 3679 THEN 0 WHEN h < 7358 THEN 1
                      WHEN h < 9197 THEN 2 WHEN h < 9810 THEN 3
                      WHEN h < 9963 THEN 4 ELSE 5 END AS m
               FROM hx),
        r AS (SELECT b, CAST(sum(m) AS BIGINT) AS n,
                CAST(sum(m * cents) AS BIGINT) AS sc
              FROM mx GROUP BY b),
        means AS (SELECT CAST(sc AS DOUBLE) / n AS mean FROM r),
        f AS (SELECT CAST(sum(cents) AS BIGINT) AS fs, count(*) AS fn FROM c)
        SELECT count(*) AS n_resamples,
               (list_sort(list(mean)))[2] AS ci_lo_mean,
               (list_sort(list(mean)))[31] AS ci_hi_mean,
               CAST(any_value(fs) AS DOUBLE) / any_value(fn) AS full_mean_cents
        FROM means, f""")),

    QDef(
      "dq_k_anonymity",
      (s, dir) => {
        // k-anonymity audit over the quasi-identifier pair
        // (nation, market segment) — the privacy gate a training-data
        // release runs before shipping user-derived rows: any QI group
        // smaller than k re-identifies its members by intersection.
        // One map-side-combined groupBy; output is the QI domain
        // (|nations|x|segments| rows), independent of corpus size.
        val k = 5
        tbl(s, dir, "customer")
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"))
          .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
            (col("n") < k).as("at_risk"))
          .orderBy("c_nationkey", "c_mktsegment")
      },
      Some("""
        SELECT c_nationkey, c_mktsegment, count(*) AS n,
               count(*) < 5 AS at_risk
        FROM customer GROUP BY 1, 2 ORDER BY 1, 2""")),

    QDef(
      "agg_distinct_growth",
      (s, dir) => {
        // cumulative-uniques curve (total distinct users through each
        // day) — the audience-growth metric. Naive cumulative
        // count-distinct re-scans the history per day; the exact
        // one-pass form is the FIRST-SEEN trick: a user contributes on
        // their first day only, so the curve is the running sum of
        // first-seen counts — one aggregate to the user grain, one to
        // the day domain, then the distributed global prefix sum
        // (operators/Windows.globalCumSum — range partition + offset
        // map, never a single-partition window).
        val e = tbl(s, dir, "events")
          .select(col("user_id"),
            unix_timestamp(date_trunc("day", col("ts"))).as("d"))
        val firstDay = e.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
        val daily = firstDay.groupBy(col("d0")).agg(count(lit(1)).as("n_new"))
        graft.operators.Windows.globalCumSum(daily, "d0", Seq("n_new"))
          .select(col("d0").as("day_start"), col("n_new"),
            col("cum_n_new").as("n_total_users"))
          .orderBy("day_start")
      },
      Some("""
        WITH f AS (SELECT user_id,
                     min(CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT))
                       AS d0
                   FROM events GROUP BY 1),
        d AS (SELECT d0, count(*) AS n_new FROM f GROUP BY 1)
        SELECT d0 AS day_start, n_new,
               CAST(sum(n_new) OVER (ORDER BY d0
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS n_total_users
        FROM d ORDER BY day_start""")),

    QDef(
      "agg_sliding_distinct",
      (s, dir) => {
        // EXACT trailing-7-day distinct users per day — the DAU/WAU
        // metric whose naive form (one count-distinct per window
        // position) re-scans the history |days| times. Exact and
        // one-pass-per-grain instead: collapse to the (user, active
        // day) grain, explode each active day to the ≤7 window-end
        // days it serves (bounded calendar fan-out, a map-side
        // projection), dedup (user, window) — a user active twice in
        // one window counts once — then count per window. Two
        // key-partitioned distincts + a calendar-domain aggregate;
        // no window function touches the fact grain at all.
        val ud = tbl(s, dir, "events")
          .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("d"))
          .distinct()
        val maxD = org.apache.spark.sql.graft.ColumnBridge.scalar(
          ud.agg(max(col("d"))))
        ud.select(col("user_id"),
            explode(sequence(lit(0), lit(6))).as("i"), col("d"))
          .select(col("user_id"), date_add(col("d"), col("i")).as("wend"))
          .filter(col("wend") <= maxD)
          .distinct()
          .groupBy(col("wend"))
          .agg(count(lit(1)).as("n_users_7d"))
          .orderBy("wend")
      },
      Some("""
        WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        w AS (SELECT DISTINCT user_id, d + CAST(t.i AS INTEGER) AS wend
              FROM ud, range(0, 7) t(i)
              WHERE d + CAST(t.i AS INTEGER) <= (SELECT max(d) FROM ud))
        SELECT wend, count(*) AS n_users_7d
        FROM w GROUP BY wend ORDER BY wend""")),

    QDef(
      "win_rolling_median",
      (s, dir) => {
        // EXACT trailing-7-day median event value per day — the robust
        // rolling central-tendency no built-in window offers (median
        // isn't an associative aggregate; percentile_approx changes the
        // answer). Fan-out mirrors agg_sliding_distinct (each event
        // serves ≤7 window-end days — a map-side calendar projection);
        // the median itself goes through the TWO-LEVEL bucket selection
        // (Quantiles.exactQuantileByGroupBucketed): the day domain is
        // ~30 keys, so a plain per-day rank window would sort the whole
        // fanned grain in ~30 tasks with per-task rows growing with the
        // corpus (measured 16.5 s at sf1); bucketed, the full grain only
        // shuffles on (day, bucket) with map-side combine and the rank
        // touches one bucket's rows per day (2.1 s at sf1). Discrete
        // median convention: r0 = floor((n-1)/2), ties by event_id.
        val e = tbl(s, dir, "events")
          .select(date_trunc("day", col("ts")).cast("date").as("d"),
            round(col("value") * 100).cast("long").as("cents"),
            col("event_id"))
        val maxD = org.apache.spark.sql.graft.ColumnBridge.scalar(
          e.agg(max(col("d"))))
        val fanned = e
          .select(explode(sequence(lit(0), lit(6))).as("i"),
            col("d"), col("cents"), col("event_id"))
          .select(date_add(col("d"), col("i")).as("wend"),
            col("cents"), col("event_id"))
          .filter(col("wend") <= maxD)
        graft.operators.Quantiles.exactQuantileByGroupBucketed(
            fanned, "wend", "cents", "event_id", q = 0.5, bucketWidth = 500L)
          .select(col("wend"), col("cents").as("med_cents"),
            col("n").as("n_in_window"))
          .orderBy("wend")
      },
      Some("""
        WITH e AS (SELECT CAST(ts AS DATE) AS d,
                     CAST(round(value * 100) AS BIGINT) AS cents, event_id
                   FROM events),
        f AS (SELECT d + CAST(t.i AS INTEGER) AS wend, cents, event_id
              FROM e, range(0, 7) t(i)
              WHERE d + CAST(t.i AS INTEGER) <= (SELECT max(d) FROM e)),
        r AS (SELECT wend, cents, event_id,
                row_number() OVER (PARTITION BY wend
                  ORDER BY cents, event_id) - 1 AS r0,
                count(*) OVER (PARTITION BY wend) AS n
              FROM f)
        SELECT wend, cents AS med_cents, n AS n_in_window
        FROM r WHERE r0 = (n - 1) // 2
        ORDER BY wend""")),

    QDef(
      "dq_freshness",
      (s, dir) => {
        // ingest-freshness audit — the lag report that pages the
        // on-call: per event type, last-seen time, lag behind the
        // freshest stream, and a staleness flag at 24 h. Reference
        // point is the corpus's own max timestamp (never wall-clock —
        // a query must be deterministic and replayable). One
        // map-side-combined aggregate + a |types|-row scalar; zeros in
        // the flag column are the visible proof the rule RAN (the
        // pipeline_dq_audit convention).
        val e = tbl(s, dir, "events")
          .select(col("event_type"), unix_timestamp(col("ts")).as("tsec"))
        val globalMax = org.apache.spark.sql.graft.ColumnBridge.scalar(
          e.agg(max(col("tsec"))))
        e.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"), max(col("tsec")).as("last_sec"))
          .select(col("event_type"), col("n_events"), col("last_sec"),
            (globalMax - col("last_sec")).as("lag_sec"),
            (globalMax - col("last_sec") > 86400L).as("stale_24h"))
          .orderBy("event_type")
      },
      Some("""
        WITH e AS (SELECT event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) AS tsec
                   FROM events),
        g AS (SELECT max(tsec) AS gmax FROM e)
        SELECT event_type, count(*) AS n_events, max(tsec) AS last_sec,
               any_value(gmax) - max(tsec) AS lag_sec,
               any_value(gmax) - max(tsec) > 86400 AS stale_24h
        FROM e, g GROUP BY event_type ORDER BY event_type""")),

    QDef(
      "dq_column_profile",
      (s, dir) => {
        // one-pass column census — the data-profiling report every
        // onboarding pipeline runs first: per column, row count, null
        // count, exact distinct count, lexicographic min/max of the
        // string rendering. Unpivot (stack) turns "one aggregate per
        // column" into ONE shuffle over (col_name, value) instead of a
        // scan per column; restricted to integer/string columns whose
        // string rendering is engine-identical (doubles and timestamps
        // format differently across engines).
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_returnflag", "l_linestatus")
        val stackArgs = cols.map(c => s"'$c', cast($c as string)").mkString(", ")
        tbl(s, dir, "lineitem")
          .select(expr(s"stack(${cols.length}, $stackArgs) as (col_name, val)"))
          .groupBy(col("col_name"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col("val")).as("n_distinct"),
            min(col("val")).as("min_v"), max(col("val")).as("max_v"))
          .orderBy("col_name")
      },
      Some {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_returnflag", "l_linestatus")
        val unions = cols.map(c =>
          s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS val FROM lineitem")
          .mkString("\n          UNION ALL ")
        s"""
        WITH u AS (
          $unions)
        SELECT col_name, count(*) AS n_rows,
               CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_null,
               count(DISTINCT val) AS n_distinct,
               min(val) AS min_v, max(val) AS max_v
        FROM u GROUP BY col_name ORDER BY col_name"""
      }),

    QDef(
      "dq_referential_integrity",
      (s, dir) => {
        // whole-schema referential-integrity audit in one result: for
        // every FK edge of the star schema, the child row count and how
        // many child rows point at a missing parent (a null FK is an
        // orphan by definition here, counted once — a null key matches
        // nothing in the outer join below). One DECLARATIVE plan
        // (round 11): the round-10 form ran 14 sequential driver-side
        // .count() jobs — a scheduling wall where each edge waited for
        // the previous one; this form unions the seven edges into one
        // job whose independent stages schedule concurrently (sf1:
        // 5.4 → ~1.5 s). Per edge the child collapses to its KEY GRAIN
        // first (map-side-combined groupBy carrying the row count), so
        // the membership join moves |distinct keys|, not |child rows|,
        // and the parent side is its deduped key set — broadcast when
        // small, shuffled-hash at scale; nothing quadratic, nothing
        // collected.
        def edge(child: org.apache.spark.sql.DataFrame, fk: String,
            parent: org.apache.spark.sql.DataFrame, pk: String,
            name: String) =
          child.groupBy(col(fk).as("k")).agg(count(lit(1)).as("n"))
            .join(parent.select(col(pk).as("k")).distinct()
              .withColumn("__hit", lit(1)), Seq("k"), "left_outer")
            .agg(sum(col("n")).as("n_child"),
              sum(when(col("__hit").isNull, col("n")).otherwise(0L))
                .as("n_orphans"))
            .select(lit(name).as("fk_edge"), col("n_child"),
              col("n_orphans"))
        Seq(
          edge(tbl(s, dir, "lineitem"), "l_orderkey",
            tbl(s, dir, "orders"), "o_orderkey", "lineitem->orders"),
          edge(tbl(s, dir, "lineitem"), "l_partkey",
            tbl(s, dir, "part"), "p_partkey", "lineitem->part"),
          edge(tbl(s, dir, "lineitem"), "l_suppkey",
            tbl(s, dir, "supplier"), "s_suppkey", "lineitem->supplier"),
          edge(tbl(s, dir, "orders"), "o_custkey",
            tbl(s, dir, "customer"), "c_custkey", "orders->customer"),
          edge(tbl(s, dir, "customer"), "c_nationkey",
            tbl(s, dir, "nation"), "n_nationkey", "customer->nation"),
          edge(tbl(s, dir, "supplier"), "s_nationkey",
            tbl(s, dir, "nation"), "n_nationkey", "supplier->nation"),
          edge(tbl(s, dir, "nation"), "n_regionkey",
            tbl(s, dir, "region"), "r_regionkey", "nation->region"))
          .reduce(_ unionByName _)
          .orderBy("fk_edge")
      },
      Some("""
        SELECT * FROM (
          SELECT 'lineitem->orders' AS fk_edge,
                 (SELECT count(*) FROM lineitem) AS n_child,
                 (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
                   AS n_orphans
          UNION ALL SELECT 'lineitem->part',
                 (SELECT count(*) FROM lineitem),
                 (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
          UNION ALL SELECT 'lineitem->supplier',
                 (SELECT count(*) FROM lineitem),
                 (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
          UNION ALL SELECT 'orders->customer',
                 (SELECT count(*) FROM orders),
                 (SELECT count(*) FROM orders o WHERE NOT EXISTS
                   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
          UNION ALL SELECT 'customer->nation',
                 (SELECT count(*) FROM customer),
                 (SELECT count(*) FROM customer c WHERE NOT EXISTS
                   (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
          UNION ALL SELECT 'supplier->nation',
                 (SELECT count(*) FROM supplier),
                 (SELECT count(*) FROM supplier s WHERE NOT EXISTS
                   (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
          UNION ALL SELECT 'nation->region',
                 (SELECT count(*) FROM nation),
                 (SELECT count(*) FROM nation n WHERE NOT EXISTS
                   (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)))
        ORDER BY fk_edge"""))
  )
}
