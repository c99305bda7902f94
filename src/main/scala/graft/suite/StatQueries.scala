package graft.suite

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
        FROM d ORDER BY dd DESC, at_sec LIMIT 1"""))
  )
}
