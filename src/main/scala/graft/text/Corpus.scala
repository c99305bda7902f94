package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Corpus-level statistics for the training-data pipeline: TF-IDF term
  * scoring and train/eval contamination detection.
  *
  * Scale shapes: TF and DF are each one map-side-combined groupBy; the
  * corpus size joins in as a broadcast single-row frame (never a global
  * window); contamination is an equi-join on shingle hashes with the
  * (small) eval side broadcast. All hash arithmetic is the explicit
  * integer polyHash family, so DuckDB oracles reproduce it exactly.
  */
object Corpus {

  /** Per-document top-k terms by TF-IDF, with an integer-exact rational
    * idf: `score = tf * ((N << 20) div df)`. The idf quotient is a
    * monotone transform of N/df (the quantity `ln` would be applied to),
    * kept in integer arithmetic on purpose: `ln` differs in the last ulp
    * across engines/libms, which flips ranks between near-equal scores
    * and breaks bit-reproducibility of the ranking — the integer form
    * makes the operator's output stable under any partitioning, engine,
    * or platform. Ties break by ascending word_id.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .select(col("doc_id"), Dedup.wordId(col("word")).as("word_id"))
      .groupBy(col("doc_id"), col("word_id"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("word_id")).agg(count(lit(1)).as("df"))
    // corpus size as an uncorrelated scalar subquery — evaluated once,
    // then a query constant on every task: no join node at all (the
    // earlier 1-row broadcast crossJoin planned a bounded
    // BroadcastNestedLoopJoin; a `count() over ()` window would
    // single-reduce the whole frame)
    val n = org.apache.spark.sql.graft.ColumnBridge.scalar(
      docs.select(countDistinct(col(idCol)).as("n_docs")))
    tf.join(dfreq, Seq("word_id"))
      .withColumn("n_docs", n)
      .withColumn("score", col("tf") * expr("(n_docs * 1048576) div df"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("word_id"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("word_id"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** BM25 ranked retrieval: score every document against a
    * corpus-derived query (the `nTerms` highest-total-frequency terms
    * whose df < N/2 — frequent enough to match broadly, rare enough to
    * carry strictly positive idf weight) and return the top `k` docs.
    *
    * All arithmetic is exact-integer fixed point so the ranking is
    * bit-reproducible across engines (the tfidf lesson: a libm `ln`
    * flips ranks between near-equal scores):
    *   - idf_q10 = L(2(N−df)+1) − L(2df+1), the Robertson
    *     (N−df+0.5)/(df+0.5) idf with numerator/denominator doubled to
    *     stay integral, in 1/1024-bit units via [[PortableLog]];
    *   - length norm nl_q10 = (dl·1024·N) div L ≈ 1024·dl/avgdl — a
    *     per-doc integer, overflow-safe at any corpus size (dl·1024·N
    *     < 2^63 for dl ≤ 10^5 docs of N ≤ 10^10);
    *   - k1 = 1.2, b = 0.75 as exact rationals: the saturation
    *     tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)), multiplied through by
    *     20·1024, is (idf_q10·tf·45056) div (20480·tf + 6144 + 18·nl_q10).
    *
    * Shape at 100 TB: token explode + two map-side-combined groupBys;
    * the query-term set is a TakeOrderedAndProject over the term
    * dictionary, broadcast into the tf frame (5-row build side); the
    * final top-k is TakeOrderedAndProject, never a global sort.
    */
  /** The (doc_id, word_id, tf) term-frequency frame BM25 scores against
    * — the reusable retrieval index half; the suite pins it as a shared
    * fingerprinted artifact so the tokenize+explode runs once per
    * corpus, not once per query execution.
    */
  def bm25Tf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .select(col("doc_id"), Dedup.wordId(col("word")).as("word_id"))
      .groupBy(col("doc_id"), col("word_id"))
      .agg(count(lit(1)).as("tf"))

  /** Per-term corpus statistics of a [[bm25Tf]] frame:
    * `(word_id, df, ttf)` — document frequency and total term
    * frequency, the persisted half of a text index. One map-side-
    * combined groupBy over the tf grain.
    */
  def termStats(tf: DataFrame): DataFrame =
    tf.groupBy(col("word_id"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("ttf"))

  /** Algebraic merge of two [[termStats]] frames over DISJOINT document
    * sets (the persisted index + a newly ingested batch): df and ttf
    * are both per-doc sums, so `merged(w) = base(w) + delta(w)` term by
    * term — a corpus append costs O(|batch|) tokenization plus one
    * vocabulary-grain merge, never a re-tokenize of the indexed corpus
    * (the incremental-aggregate pattern applied to the text index).
    * Union + re-aggregate rather than a full outer join: map-side
    * combinable at any vocabulary size, no per-column null-coalescing,
    * and n-way merges compose by chaining.
    */
  def mergeTermStats(base: DataFrame, delta: DataFrame): DataFrame =
    base.unionByName(delta)
      .groupBy(col("word_id"))
      .agg(sum(col("df")).as("df"), sum(col("ttf")).as("ttf"))

  def bm25TopDocs(docs: DataFrame, idCol: String, textCol: String,
      nTerms: Int, k: Int, tfOverride: Option[DataFrame] = None,
      dlOverride: Option[DataFrame] = None,
      dfOverride: Option[DataFrame] = None): DataFrame = {
    import graft.functions.PortableLog.log2q10
    // tf fans out to three consumers (scoring probe, dfreq, dl); pin it
    // so the tokenize+explode runs ONCE — plain reuse re-derives it per
    // consumer (join pushdown injects per-branch filters that defeat
    // exchange-reuse canonicalization; measured: three full Generate
    // passes otherwise). Callers with an artifact cache pass the shared
    // frame via tfOverride; standalone use cuts lineage with a
    // localCheckpoint (NOTE it stays pinned until the session clears
    // caches — a bench lap leaked these until Bench.resetCaches learned
    // to unpersist raw RDDs).
    val tf = tfOverride.getOrElse(
      bm25Tf(docs, idCol, textCol).localCheckpoint(true))
    // dl (per-doc length) and dfreq (per-term stats) are the OTHER two
    // persisted halves of a production BM25 index — callers with an
    // artifact cache pass them in (round 10: saves two full
    // map-side-combined passes over the tf grain per execution; a
    // production index stores doc lengths and term stats, it does not
    // recount them per query). Derived here otherwise.
    val dl = dlOverride.getOrElse(
      tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
    val dfreq = dfOverride.getOrElse(termStats(tf))
    val n = org.apache.spark.sql.graft.ColumnBridge.scalar(
      docs.select(countDistinct(col(idCol)).as("n_docs")))
    // Σ tf == Σ tokenCount(text); read the cheapest materialized form —
    // the doc-grain dl frame when the index provides it, else the
    // checkpointed tf (never a second regex-tokenize of the corpus)
    val l = org.apache.spark.sql.graft.ColumnBridge.scalar(
      dlOverride.map(d => d.agg(sum(col("dl")).as("toks_total")))
        .getOrElse(tf.agg(sum(col("tf")).as("toks_total"))))
    // strict: df = N/2 would make the Robertson idf exactly zero and the
    // term a no-op in every score
    val qterms = dfreq.withColumn("n_docs", n)
      .filter(col("df") * 2 < col("n_docs"))
      .orderBy(col("ttf").desc, col("word_id"))
      .limit(nTerms)
      // idf depends only on (df, N): compute it HERE, at TERM grain
      // (nTerms rows), and broadcast the finished number. log2q10 is a
      // 1024-boundary table scan per call; at posting grain the two
      // calls cost 2048 comparisons PER CANDIDATE ROW and dominated the
      // whole query (measured at sf1: 9.5 s → 0.9 s, identical rows —
      // the values are exact integers, so hoisting changes nothing)
      .withColumn("idf_q10",
        log2q10(col("n_docs") * 2 - col("df") * 2 + 1) -
          log2q10(col("df") * 2 + 1))
      .select(col("word_id"), col("idf_q10"))
    val scored = tf.join(broadcast(qterms), Seq("word_id"))
      .join(dl, Seq("doc_id"))
      .withColumn("n_docs", n).withColumn("toks_total", l)
      .withColumn("nl_q10", expr("(dl * 1024 * n_docs) div toks_total"))
      .withColumn("score_q",
        expr("(idf_q10 * tf * 45056) div (20480 * tf + 6144 + 18 * nl_q10)"))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("score_q")).as("bm25_q"))
    perDoc.orderBy(col("bm25_q").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("bm25_q").desc, col("doc_id"))))
      .select(col("doc_id"), col("n_terms"), col("bm25_q"), col("rank"))
  }

  /** Train/eval contamination: training documents sharing at least
    * `minShared` 3-word shingles with ANY eval document. Returns one row
    * per contaminated training doc: (doc_id, n_eval_hits, max_shared).
    *
    * The join is an equi-join on the shingle hash; at production scale
    * the eval set is orders of magnitude smaller than the training
    * corpus, so its shingle frame broadcasts and the scan of the
    * training side stays shuffle-free. The pre-aggregation to distinct
    * (doc, shingle) pairs happens inside shingles3FromText.
    */
  def contamination(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      minShared: Int): DataFrame = {
    val trSh = Dedup.shingles3FromText(train, idCol, textCol)
    val evSh = Dedup.shingles3FromText(eval_, idCol, textCol)
      .withColumnRenamed("doc_id", "eval_id")
    val shared = trSh
      .join(broadcast(evSh), Seq("shingle"))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    shared.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("shared")).as("max_shared"))
  }

  /** Per-document repetition signals (the Gopher-rules family): token
    * count, duplicate-word fraction (1 - distinct/total) and the fraction
    * of all word bigrams taken by the single most frequent bigram —
    * boilerplate and degenerate generations score high on both.
    *
    * Scale shape: the per-doc scalars are pure array expressions on the
    * scan (zero shuffle); the bigram mode needs two map-side-combined
    * groupBys keyed by (doc_id, bigram) then doc_id — no windows, no
    * per-doc sort. Docs with fewer than two tokens survive via the left
    * join (top_bigram_frac 0.0).
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("ts"))
      .withColumn("n_tok", size(col("ts")))
    val scalars = base.select(col("doc_id"), col("n_tok"),
      when(col("n_tok") > 0,
        lit(1.0) - size(array_distinct(col("ts"))).cast("double")
          / col("n_tok").cast("double"))
        .otherwise(lit(0.0)).as("dup_word_frac"))
    val bigrams = base.select(col("doc_id"),
      explode(zip_with(
        slice(col("ts"), lit(1), greatest(col("n_tok") - 1, lit(0))),
        slice(col("ts"), lit(2), greatest(col("n_tok") - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("bigram"))
    val bgStats = bigrams
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"), sum(col("c")).as("n_bg"))
    scalars.join(bgStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"),
        col("dup_word_frac"),
        coalesce(col("top_c").cast("double") / col("n_bg").cast("double"),
          lit(0.0)).as("top_bigram_frac"))
  }

  /** Inverted index over the corpus: one row per retained term with its
    * document frequency and the sorted posting list. `minDf`/`maxDf`
    * bound the index (hapax terms carry no retrieval signal; ubiquitous
    * terms explode posting lists — at 100 TB the df cap is what keeps
    * the widest rows bounded).
    *
    * Scale shape: distinct (word_id, doc_id) then one groupBy on word_id;
    * posting lists are sorted with `sort_array` inside the aggregation
    * (no window). Both shuffles map-side combine.
    */
  def invertedIndex(
      docs: DataFrame, idCol: String, textCol: String,
      minDf: Long, maxDf: Long): DataFrame = {
    val postings = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .select(Dedup.wordId(col("word")).as("word_id"), col("doc_id"))
      .distinct()
    postings.groupBy(col("word_id"))
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("doc_id"))).as("postings"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
  }

  /** [[invertedIndex]] with the posting list serialized to a compact
    * comma-joined string — the driver-comparable surface (the oracle
    * harness hash-compares scalar columns).
    */
  def invertedIndexFlat(
      docs: DataFrame, idCol: String, textCol: String,
      minDf: Long, maxDf: Long): DataFrame =
    invertedIndex(docs, idCol, textCol, minDf, maxDf)
      .select(col("word_id"), col("df"),
        concat_ws(",", col("postings")).as("doc_ids"))

  /** Stride-windowed chunking: split each document into fixed token
    * windows `chunkTokens` wide, advancing by `stride` tokens, so
    * consecutive chunks overlap by `chunkTokens - stride` — the
    * pre-tokenization step of every context-window training pipeline
    * (overlap preserves cross-boundary context; offsets keep chunks
    * traceable to their source span). Emits one row per chunk:
    * (doc_id, chunk_idx, start_tok, n_tok, chunk_text); the final chunk
    * of a document may be short (n_tok < chunkTokens).
    *
    * Scale shape: a pure per-row projection + explode — zero shuffles,
    * fully codegen'd, chunk fan-out is ceil(n_tok / stride) per
    * document. Unlike [[graft.operators.Packing]] (which bin-packs
    * whole documents into budgets), chunking is embarrassingly parallel
    * and needs no ordering guarantee.
    */
  def chunkDocuments(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1 && stride <= chunkTokens,
      "need 1 <= stride <= chunkTokens")
    // carryCols ride the projection (doc-level attributes like source or
    // lang repeat onto every chunk) — carrying them here is free, where a
    // downstream join back to the corpus to recover them would shuffle
    // both sides on doc_id
    val carried = carryCols.map(col)
    docs
      .select((col(idCol).as("doc_id") +:
        TextFunctions.tokens(col(textCol)).as("__ts") +: carried): _*)
      .select((col("doc_id") +: col("__ts") +:
        explode(sequence(lit(0L),
          greatest(size(col("__ts")).cast("long") - 1, lit(0L)),
          lit(stride.toLong))).as("start_tok") +: carried): _*)
      .select((col("doc_id") +:
        expr(s"start_tok div $stride").as("chunk_idx") +:
        col("start_tok") +:
        least(lit(chunkTokens.toLong),
          size(col("__ts")).cast("long") - col("start_tok")).as("n_tok") +:
        array_join(slice(col("__ts"), (col("start_tok") + 1).cast("int"),
          lit(chunkTokens)), " ").as("chunk_text") +: carried): _*)
  }
}
