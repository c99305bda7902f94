package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact HyperLogLog (m = 256 registers) on the repo's portable
  * hash — every number a BIGINT, so any engine reproduces estimates
  * bit-for-bit (the DuckDB oracle runs the identical formula).
  *
  * Construction (Flajolet et al. 2007, the HLL paper, raw estimator):
  *  - hash each value into a 2^30 domain ([[Sampling.hashBucket]] — the
  *    polyHash + lattice-scramble chain mirrored in SQL by
  *    `SamplingQueries.hashSql`);
  *  - bucket = h % 256; w = h div 256 (22 payload bits);
  *  - rank = leading zeros of w + 1, computed EXACTLY as
  *    23 - length(bin(w)) (floor-log2 via the binary string — no float
  *    log anywhere); w = 0 → 23.
  *  - register r(bucket) = max rank; Z carried scaled by 2^23
  *    (`z23 = Σ 2^(23-r)`, absent buckets contribute 2^23);
  *  - estimate = α·m²/Z with α_256 = 0.7213/(1+1.079/256) entering as
  *    [[A20]] = floor(α·2^20): `(A20·2^39 div z23) div 2^20` — nested
  *    positive floor-divs compose, so this equals one division by
  *    z23·2^20.
  *
  * No small-range correction on purpose: callers emit exact audit
  * columns next to the estimate rather than hiding the raw estimator's
  * bias (it matters only below ~2.5·m = 640 distincts).
  *
  * The scale story is the MERGE LAW: registers are a max-semilattice,
  * so per-shard register frames combine by `max` per bucket — grouping,
  * merge order, and re-sharding cannot change the result (HllSpec pins
  * merged == direct as EXACT equality, not an envelope).
  */
object Hll {

  /** Register count (2^8 buckets, ~6.5% standard error). */
  val M = 256

  /** floor(0.7213/(1+1.079/256) * 2^20) — alpha in Q20 fixed point. */
  val A20 = 753163L

  /** HLL needs avalanche-quality bits that the repo's sampling hash
    * chain does NOT have: polyHash + one multiply-mod scramble is
    * AFFINE mod Q1, so structured key sets (sequential ids, "user_N")
    * keep lattice structure and skew the leading-zero ranks — measured
    * estimates swung ±25% (4σ) before this. Interleaving xor-shifts
    * between THREE scramble rounds breaks the linearity (a python
    * sweep over six structured key sets landed every estimate within
    * ±11%, ≤1.6σ of the 1.04/√256 envelope). Every intermediate stays
    * a nonnegative BIGINT < 2^31, so xor and >> agree across engines;
    * the SQL mirror is [[mixSqlCtes]].
    */
  def mixed(value: Column): Column = {
    def scr(h: Column): Column =
      ((h % Sampling.MixQ1) * Sampling.MixA + (h % Sampling.MixQ2)) %
        Sampling.MixQ1
    def xs(c: Column, k: Int): Column =
      c.bitwiseXOR(shiftrightunsigned(c, k))
    scr(xs(scr(xs(scr(
      graft.functions.Scalars.polyHash(value.cast("string"))), 15)), 13)) %
      (1L << 30)
  }

  /** DuckDB mirror of [[mixed]] as chained CTE column steps: given a
    * CTE `src` holding columns (`cols`..., `k` = the key as VARCHAR),
    * returns CTE text whose final relation `hmix` carries
    * (`cols`..., `h` ∈ [0, 2^30)).
    */
  def mixSqlCtes(src: String, cols: String): String = {
    val Q1 = Sampling.MixQ1; val Q2 = Sampling.MixQ2; val A = Sampling.MixA
    val fold =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(k, ''), c -> CAST(ascii(c) AS BIGINT))),
          (acc, c) -> (acc * 131 + c) % ${graft.functions.Scalars.polyHashP})"""
    s"""h0 AS (SELECT $cols, $fold AS a FROM $src),
        h1 AS (SELECT $cols, ((a % $Q1) * $A + (a % $Q2)) % $Q1 AS a FROM h0),
        h2 AS (SELECT $cols, xor(a, a >> 15) AS a FROM h1),
        h3 AS (SELECT $cols, ((a % $Q1) * $A + (a % $Q2)) % $Q1 AS a FROM h2),
        h4 AS (SELECT $cols, xor(a, a >> 13) AS a FROM h3),
        hmix AS (SELECT $cols,
          (((a % $Q1) * $A + (a % $Q2)) % $Q1) % ${1L << 30} AS h FROM h4)"""
  }

  /** Register frame at (keys..., bucket) grain: `r` = max rank observed.
    * One map-side-combinable aggregation over the scan — the only
    * full-data shuffle, carrying ≤ |keys|·256 partial rows per split.
    */
  /** Column names the operator writes; a caller key named like one of
    * these would be silently shadowed (or ambiguous) mid-pipeline, so
    * collisions fail loudly instead (driver-advice r11).
    */
  private val reservedCols = Set("bucket", "r", "z23", "hll_est", "__h", "__w", "__rank")
  private def checkKeys(keys: Seq[String]): Unit =
    require(!keys.exists(reservedCols),
      s"HLL key columns ${keys.mkString(",")} collide with operator-internal " +
        s"names ${reservedCols.mkString(",")} — rename the key before aggregating")

  def registers(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    checkKeys(keys)
    // a NULL value carries no cardinality; unfiltered it would thread a
    // NULL bucket row through the register frame (engine-consistently,
    // but as a phantom 257th bucket in the absent-bucket arithmetic)
    df.filter(value.isNotNull)
      .withColumn("__h", mixed(value))
      .select(keys.map(col) :+ (col("__h") % M).as("bucket")
        :+ expr(s"__h div $M").as("__w"): _*)
      .select(keys.map(col) :+ col("bucket")
        :+ when(col("__w") === 0, lit(23))
          .otherwise(lit(23) - length(bin(col("__w")))).as("__rank"): _*)
      .groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(max(col("__rank")).as("r"))
  }

  /** Merge register frames (or re-key one) to a coarser grain: max per
    * (newKeys..., bucket). Exact — max is associative/commutative.
    */
  def merge(regs: DataFrame, newKeys: Seq[String]): DataFrame = {
    checkKeys(newKeys)
    regs.groupBy(newKeys.map(col) :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Per-key scaled harmonic sum `z23` and BIGINT estimate `hll_est`
    * from a register frame.
    */
  def estimate(regs: DataFrame, keys: Seq[String]): DataFrame = {
    checkKeys(keys)
    regs.groupBy(keys.map(col): _*)
      .agg((sum(expr("shiftleft(CAST(1 AS BIGINT), 23 - r)")) +
        (lit(M.toLong) - count(lit(1))) * lit(8388608L)).as("z23"))
      .withColumn("hll_est",
        expr(s"(($A20 * 549755813888) div z23) div 1048576"))
  }
}
