package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Scalars

/** Deterministic sampling / splitting for the training-data pipeline
  * extension: train/dev/test splits, per-stratum rate sampling, and
  * per-stratum fixed-size samples. Everything keys off the explicit
  * polynomial hash ([[Scalars.polyHash]]), so:
  *  - the same row lands in the same split on every run, any cluster
  *    size, any partitioning (no RNG, no seed plumbing);
  *  - membership is a pure projection — no shuffle at all for the rate
  *    forms — and the DuckDB oracle reproduces it bit-for-bit;
  *  - at 100 TB the split is embarrassingly parallel and composes with
  *    any downstream operator without re-shuffling.
  */
object Sampling {

  /** Hash bucket in [0, buckets) for a key column (cast to its canonical
    * string form first, so numeric and string keys hash identically in
    * Spark and the SQL oracle).
    *
    * The raw polynomial hash is LINEAR in the character values, so on
    * short fixed-length keys (e.g. sequential numeric ids) it is a
    * stride-1 lattice — order-preserving and badly non-uniform mod
    * `buckets`. The finalizer `((h % Q1) * A + (h % Q2)) % Q1` is a
    * two-residue scramble: every term stays below 2^63 (Q1*A < 2^62.4,
    * h < polyHashP < 2^53 < Q1*Q2), sequential ids scatter with stride
    * ~A mod Q1, and the arithmetic is plain BIGINT `*`/`%`/`+` so the
    * DuckDB oracle reproduces it bit-for-bit.
    */
  val MixQ1 = 2147483629L // largest prime < 2^31
  val MixQ2 = 1073741789L // largest prime < 2^30
  val MixA = 2654435761L  // Knuth's 2^32 / golden ratio

  def hashBucket(key: Column, buckets: Int): Column = {
    val h = Scalars.polyHash(key.cast("string"))
    (((h % MixQ1) * MixA + (h % MixQ2)) % MixQ1) % buckets
  }

  /** Assign each row a split label from cumulative percentage cut
    * points, e.g. `Seq(("train", 80), ("dev", 10), ("test", 10))`.
    * Pure projection (no shuffle); weights must sum to 100.
    */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split weights must sum to 100")
    val b = hashBucket(col(keyCol), 100)
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    val label = splits.zip(cuts).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), els) => when(b < cut, lit(name)).otherwise(els)
    }
    df.withColumn("split", label)
  }

  /** Keep ~`permille`/1000 of each stratum, deterministically: the key
    * is hashed together with its stratum so the same document can land
    * in different strata's samples independently. Pure projection.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      permille: Int): DataFrame =
    df.filter(
      hashBucket(concat_ws("|", col(stratumCol), col(keyCol)), 1000) < permille)

  /** Quality-weighted deterministic sampling: row kept iff
    * `hash(key) mod 1000 < clamp(floor(weight * scale), 0, 1000)` — the
    * acceptance rate is proportional to the row's weight (curriculum /
    * quality-biased sampling), yet membership stays a pure projection:
    * no RNG, no shuffle, reproducible on any cluster and in the SQL
    * oracle (floor of plain double arithmetic is IEEE-exact).
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weight: Column,
      scale: Double): DataFrame = {
    val cap = least(greatest(floor(weight * scale), lit(0.0)), lit(1000.0))
    df.filter(hashBucket(col(keyCol), 1000) < cap)
  }

  /** Exactly-n-per-stratum sample: the n rows with the smallest
    * (hash, key) per stratum — a deterministic reservoir. One shuffle on
    * the stratum; per-stratum work is a partitioned window (never a
    * global sort).
    */
  def topNPerStratum(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      n: Int): DataFrame = {
    val h = hashBucket(col(keyCol), 1000000000)
    df.withColumn("__h", h)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(col("__h"), col(keyCol))))
      .filter(col("__rn") <= n)
      .drop("__h", "__rn")
  }

  /** Balance strata to the minority class: keep exactly
    * min-over-strata(count) rows per stratum, chosen deterministically
    * by scrambled-hash rank — the balanced-eval-set / class-rebalance
    * unit. The minority size rides in as a scalar subquery (one
    * |strata|-row aggregate); the per-stratum rank is a partitioned
    * window, so the only data-grain shuffle is on the stratum key.
    */
  def balanceToMinority(
      df: DataFrame, stratumCol: String, keyCol: String): DataFrame = {
    val minN = org.apache.spark.sql.graft.ColumnBridge.scalar(
      df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
        .agg(min(col("n"))))
    val h = hashBucket(col(keyCol), 1000000000)
    df.withColumn("__h", h)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(col("__h"), col(keyCol))))
      .filter(col("__rn").cast("long") <= minN)
      .drop("__h", "__rn")
  }

  /** Deterministic corpus-wide shuffle: a total order by
    * (hash(key), key). The declarative orderBy is Spark's scalable
    * global sort — range sampling + a range-partitioned exchange, never
    * a single-partition sort — so the "random" order is reproducible on
    * any cluster with NO RNG and no driver state; hash collisions break
    * ties on the key itself. A training pipeline runs this once before
    * sequence packing so pack windows interleave sources instead of
    * replaying ingestion order.
    */
  def shuffleOrder(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("shuffle_key", hashBucket(col(keyCol), 1000000000))
      .orderBy(col("shuffle_key"), col(keyCol))

  /** Deterministic token-budget subsample: rows taken in reproducible
    * shuffle order until the running token total reaches `budgetTokens`
    * — the "give me ~N tokens of corpus" selection a training run
    * starts from. A row is kept when the running total BEFORE it is
    * still under budget, so the crossing document is included and the
    * selection is never empty for a positive budget.
    *
    * The global running sum uses the distributed two-level prefix sum:
    * per-bucket partial sums (buckets are contiguous shuffle_key
    * ranges, so bucket order == global order) collapse to a
    * `buckets`-row frame whose prefix is the only globally-ordered
    * window — bounded rows, broadcast back as offsets; the in-bucket
    * prefix is an ordinary partitioned window. No single-partition
    * window over the corpus anywhere.
    */
  /** Per-stratum token budget: every stratum fills `budgetTokens` of its
    * own docs in reproducible shuffle order — the "N tokens per domain"
    * selection a training mixture is specified in. The running sum is an
    * ordinary window partitioned by stratum (parallel across strata; a
    * single huge stratum would use [[tokenBudgetSample]]'s bucket
    * decomposition instead).
    */
  def tokenBudgetByStratum(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      nTokensCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "need a positive budget")
    val keyed = df.withColumn("shuffle_key", hashBucket(col(keyCol), 1000000000))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("shuffle_key"), col(keyCol))
    keyed
      .withColumn("start_tok", coalesce(sum(col(nTokensCol)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
      .filter(col("start_tok") < budgetTokens)
  }

  def tokenBudgetSample(
      df: DataFrame,
      keyCol: String,
      nTokensCol: String,
      budgetTokens: Long,
      buckets: Int = 256): DataFrame = {
    require(budgetTokens > 0 && buckets > 0, "need a positive budget and buckets")
    val bsz = 1000000000L / buckets + 1 // monotone bucketing of [0, 1e9)
    val keyed = df
      .withColumn("shuffle_key", hashBucket(col(keyCol), 1000000000))
      .withColumn("__b", expr(s"shuffle_key div $bsz"))
    val bucketOffsets = keyed
      .groupBy(col("__b")).agg(sum(col(nTokensCol)).as("__bt"))
      .withColumn("__boff", coalesce(sum(col("__bt")).over(
        Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__boff"))
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("shuffle_key"), col(keyCol))
    keyed
      .join(broadcast(bucketOffsets), Seq("__b"))
      .withColumn("start_tok",
        (col("__boff") + coalesce(sum(col(nTokensCol)).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))).cast("long"))
      .filter(col("start_tok") < budgetTokens)
      .drop("__b", "__boff")
  }

  /** Domain mixing: downsample every stratum to (approximately) the size
    * of the smallest one — the balanced-mixture pass a training pipeline
    * runs before interleaving sources. Two-phase shape that scales:
    * (1) one map-side-combined groupBy for stratum counts, joined back
    * as a broadcast dimension; (2) a per-row integer hash gate
    * `hash_bucket(key, 1M) * n_stratum < cap * 1M` — i.e. keep with
    * probability cap/n_stratum, but with NO floating point and NO RNG:
    * membership is exact, reproducible on any cluster, and the oracle
    * reproduces it bit-for-bit. (`n_stratum <= ~9.2e12` keeps the
    * product inside a long; corpus stratum counts sit far below that.)
    */
  def mixToSmallest(
      df: DataFrame, stratumCol: String, keyCol: String): DataFrame = {
    // Counts AND the global cap ride one tiny aggregated frame: the
    // unpartitioned window runs on the post-groupBy dim frame (bounded
    // by stratum cardinality, never the corpus), so the corpus is
    // scanned exactly once. The join is null-safe — a NULL stratum is a
    // stratum, not a row-drop — and the gate hashes stratum|key (like
    // [[stratifiedSample]]) so composing with hashSplit/weightedSample
    // on the bare key stays statistically independent.
    val counts = df
      .groupBy(col(stratumCol).as("__stratum")).agg(count(lit(1)).as("__n"))
      .withColumn("__cap", min(col("__n")).over(Window.partitionBy()))
    df.join(broadcast(counts), col(stratumCol) <=> col("__stratum"))
      .filter(
        hashBucket(concat_ws("|", col(stratumCol), col(keyCol)), 1000000) *
          col("__n") < col("__cap") * lit(1000000L))
      .drop("__stratum", "__n", "__cap")
  }

  /** Temperature-flattened domain sampling: keep each stratum with rate
    * `(n_min / n_d) ^ (1 - alpha)` — `alpha = 1` keeps the natural
    * distribution, `alpha = 0` flattens to [[mixToSmallest]]'s balanced
    * mix, values between interpolate (the standard multilingual /
    * multi-domain rebalancing exponent). Sampled sizes are then
    * proportional to `n_d ^ alpha`.
    *
    * Determinism: the keep-rate is materialized as an integer
    * per-million threshold — `floor(pow(n_min/n_d, 1-alpha) * 1e6)` is
    * two correctly-rounded IEEE ops on exact integer inputs, so the
    * oracle reproduces the exact gate; membership is the same
    * stratum|key hash as the other samplers. Same scale shape as
    * [[mixToSmallest]]: one counts groupBy, a broadcast of one row per
    * stratum, a pure-projection gate.
    */
  def temperatureSample(
      df: DataFrame, stratumCol: String, keyCol: String, alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    val counts = df
      .groupBy(col(stratumCol).as("__stratum")).agg(count(lit(1)).as("__n"))
      .withColumn("__min", min(col("__n")).over(Window.partitionBy()))
      .withColumn("__thresh", {
        // sqrt is correctly rounded everywhere (IEEE 754 requirement);
        // pow is only ~1 ulp — route the common alpha = 0.5 through sqrt
        // so the floored threshold is bit-identical in any SQL oracle
        // (alpha 0 and 1 are exact in pow too; other alphas carry a
        // last-ulp caveat)
        val ratio = col("__min").cast("double") / col("__n").cast("double")
        val rate = if (1.0 - alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1.0 - alpha))
        floor(rate * lit(1000000.0)).cast("long")
      })
    df.join(broadcast(counts), col(stratumCol) <=> col("__stratum"))
      .filter(
        hashBucket(concat_ws("|", col(stratumCol), col(keyCol)), 1000000) <
          col("__thresh"))
      .drop("__stratum", "__n", "__min", "__thresh")
  }
}
