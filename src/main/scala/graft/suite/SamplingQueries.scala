package graft.suite

import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.text.TextFunctions
import graft.functions.Scalars
import Registry.tbl

/** Deterministic sampling / splitting suite plus the composed
  * corpus-cleaning pipeline — the training-data operations a 100 TB
  * pretraining run needs between raw documents and a training set.
  * All membership decisions are explicit integer hashes, so every query
  * has an exact DuckDB oracle and every row's fate is reproducible on
  * any cluster.
  */
object SamplingQueries {

  /** Mirror of Sampling.hashBucket in DuckDB SQL: the polyHash fold,
    * then the two-residue lattice scramble, then the bucket mod — all
    * plain BIGINT arithmetic, bit-for-bit the Spark value.
    */
  private[suite] def hashSql(expr: String, buckets: Int): String = {
    val fold =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split($expr, ''), c -> CAST(ascii(c) AS BIGINT))),
          (acc, c) -> (acc * 131 + c) % ${Scalars.polyHashP})"""
    s"""(((($fold % ${Sampling.MixQ1}) * ${Sampling.MixA}
          + ($fold % ${Sampling.MixQ2})) % ${Sampling.MixQ1}) % $buckets)"""
  }

  def all: Seq[QDef] = Seq(

    QDef(
      "sample_hash_split",
      (s, dir) =>
        Sampling.hashSplit(tbl(s, dir, "documents"), "doc_id",
            Seq(("train", 80), ("dev", 10), ("test", 10)))
          .select(col("doc_id"), col("split"))
          .orderBy("doc_id"),
      Some(s"""
        SELECT doc_id,
          CASE WHEN ${hashSql("CAST(doc_id AS VARCHAR)", 100)} < 80 THEN 'train'
               WHEN ${hashSql("CAST(doc_id AS VARCHAR)", 100)} < 90 THEN 'dev'
               ELSE 'test' END AS split
        FROM documents ORDER BY doc_id""")),

    QDef(
      "sample_stratified",
      (s, dir) =>
        Sampling.stratifiedSample(tbl(s, dir, "documents"), "source", "doc_id", 200)
          .select(col("source"), col("doc_id"))
          .orderBy("source", "doc_id"),
      Some(s"""
        SELECT source, doc_id FROM documents
        WHERE ${hashSql("source || '|' || CAST(doc_id AS VARCHAR)", 1000)} < 200
        ORDER BY source, doc_id""")),

    QDef(
      "sample_reservoir_n",
      (s, dir) =>
        Sampling.topNPerStratum(tbl(s, dir, "documents"), "source", "doc_id", 5)
          .select(col("source"), col("doc_id"))
          .orderBy("source", "doc_id"),
      Some(s"""
        SELECT source, doc_id FROM (
          SELECT source, doc_id,
            row_number() OVER (PARTITION BY source
              ORDER BY ${hashSql("CAST(doc_id AS VARCHAR)", 1000000000)}, doc_id) AS rn
          FROM documents) t
        WHERE rn <= 5 ORDER BY source, doc_id""")),

    QDef(
      "sample_class_balance",
      (s, dir) =>
        // balanced eval/training subset: every label downsampled to the
        // minority label's count, membership a deterministic per-label
        // hash rank (Sampling.balanceToMinority) — the class-rebalance
        // step before training a classifier on skewed labels
        Sampling.balanceToMinority(
            tbl(s, dir, "embeddings")
              .select(col("vec_id"), col("label").cast("long").as("label")),
            "label", "vec_id")
          .orderBy("label", "vec_id"),
      Some(s"""
        WITH n AS (SELECT min(cnt) AS mn FROM (
                     SELECT count(*) AS cnt FROM embeddings GROUP BY label)),
        r AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                row_number() OVER (PARTITION BY label
                  ORDER BY ${hashSql("CAST(vec_id AS VARCHAR)", 1000000000)},
                    vec_id) AS rn
              FROM embeddings)
        SELECT vec_id, label FROM r, n WHERE rn <= mn
        ORDER BY label, vec_id""")),

    QDef(
      "sample_weighted_quality",
      (s, dir) =>
        // curriculum-style quality-weighted sampling: acceptance rate
        // proportional to the quality score, membership still a pure
        // deterministic hash projection (no RNG, no shuffle)
        Sampling.weightedSample(tbl(s, dir, "documents"), "doc_id",
            TextFunctions.qualityScore(col("text")), scale = 100.0)
          .select(col("doc_id"))
          .orderBy("doc_id"),
      Some(s"""
        WITH t AS (SELECT doc_id, text,
              string_split_regex(text, '\\s+') AS toks FROM documents),
        w AS (SELECT doc_id, ${TextQueries.qualitySql("text", "toks")} AS score
              FROM t)
        SELECT doc_id FROM w
        WHERE ${hashSql("CAST(doc_id AS VARCHAR)", 1000)}
              < least(greatest(floor(score * 100), 0), 1000)
        ORDER BY doc_id""")),

    QDef(
      "sample_weighted_ares",
      (s, dir) => {
        // weighted sampling WITHOUT replacement, exactly k per stratum
        // (Efraimidis–Spirakis A-ES): rank by -log(u)/w and keep the k
        // smallest — sample_weighted_quality's Bernoulli gate cannot
        // promise a fixed k. Deterministic and oracle-exact: u is the
        // doc-id hash uniform, log is PortableLog's integer q10 log2
        // (log2 vs ln is a positive constant factor — same ordering),
        // and the /w is ONE IEEE division both engines round
        // identically. Pure projection + one per-stratum rank window
        // (shuffle on source only). Weight = document length: longer
        // docs proportionally likelier, none guaranteed.
        import org.apache.spark.sql.expressions.Window
        import graft.functions.PortableLog
        val H = 1000000000L
        val keyed = tbl(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            greatest(col("n_chars").cast("long"), lit(1L)).as("weight"))
          .withColumn("__h",
            Sampling.hashBucket(col("doc_id"), H.toInt) + lit(1L))
          .withColumn("__key",
            (PortableLog.log2q10(lit(H)) - PortableLog.log2q10(col("__h")))
              .cast("double") / col("weight"))
        keyed
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("__key"), col("doc_id"))).cast("int"))
          .filter(col("rank") <= 5)
          .select(col("source"), col("rank"), col("doc_id"), col("weight"))
          .orderBy("source", "rank")
      },
      Some(s"""
        WITH ${graft.functions.PortableLog.l2tCte},
        d AS (SELECT source, doc_id,
                greatest(CAST(n_chars AS BIGINT), 1) AS weight,
                ${hashSql("CAST(doc_id AS VARCHAR)", 1000000000)} + 1 AS h
              FROM documents),
        k AS (SELECT source, doc_id, weight,
                CAST(${graft.functions.PortableLog.log2q10Sql("1000000000")}
                   - ${graft.functions.PortableLog.log2q10Sql("h")} AS DOUBLE)
                  / weight AS key
              FROM d, l2t),
        r AS (SELECT source, doc_id, weight,
                row_number() OVER (PARTITION BY source
                  ORDER BY key, doc_id) AS rank
              FROM k)
        SELECT source, CAST(rank AS INT) AS rank, doc_id, weight
        FROM r WHERE rank <= 5 ORDER BY source, rank""")),

    QDef(
      "pipeline_mix_domains",
      (s, dir) =>
        // balanced domain mixture over the (skewed) language strata:
        // every lang downsampled toward the smallest lang's size via an
        // integer-exact hash gate — counts ride a broadcast dimension,
        // membership is a pure projection (no RNG, no per-row shuffle).
        // The en stratum is ~3.4x the fr stratum in the synthetic
        // corpus, so the gate does real work here.
        Sampling.mixToSmallest(tbl(s, dir, "documents"), "lang", "doc_id")
          .select(col("lang"), col("doc_id"))
          .orderBy("lang", "doc_id"),
      Some(s"""
        WITH c AS (SELECT lang, count(*) AS n,
                          min(count(*)) OVER () AS cap
                   FROM documents GROUP BY 1)
        SELECT d.lang, d.doc_id
        FROM documents d JOIN c ON d.lang IS NOT DISTINCT FROM c.lang
        WHERE ${hashSql("concat_ws('|', d.lang, CAST(doc_id AS VARCHAR))", 1000000)} * n
              < cap * 1000000
        ORDER BY d.lang, doc_id""")),

    QDef(
      "pipeline_shuffle_order",
      (s, dir) =>
        // reproducible pre-packing corpus shuffle: the result ORDER is
        // the operator's contract (range-partitioned global sort by
        // hash, no RNG), so no extra orderBy is applied here
        Sampling.shuffleOrder(tbl(s, dir, "documents"), "doc_id")
          .select(col("doc_id"), col("shuffle_key")),
      Some(s"""
        SELECT doc_id,
               ${hashSql("CAST(doc_id AS VARCHAR)", 1000000000)} AS shuffle_key
        FROM documents
        ORDER BY shuffle_key, doc_id""")),

    QDef(
      "pipeline_pack_sequences",
      (s, dir) => {
        // concat-and-chunk packing into 512-token context windows, per
        // source, docs in id order — each doc's global offsets + the
        // window span it occupies
        val docs = tbl(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        graft.operators.Packing.packOffsets(docs, "source", "doc_id", "n_tokens", 512L)
          .select(col("source"), col("doc_id"), col("n_tokens"),
            col("start_off"), col("end_off"),
            col("first_window"), col("last_window"))
          .orderBy("source", "doc_id")
      },
      Some("""
        WITH t AS (SELECT source, doc_id,
          CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
          FROM documents),
        o AS (SELECT source, doc_id, n_tokens,
          CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
          FROM t)
        SELECT source, doc_id, n_tokens, start_off,
               CAST(start_off + n_tokens AS BIGINT) AS end_off,
               CAST(start_off // 512 AS BIGINT) AS first_window,
               CAST(greatest(start_off, start_off + n_tokens - 1) // 512 AS BIGINT) AS last_window
        FROM o ORDER BY source, doc_id""")),

    QDef(
      "pipeline_clean_corpus",
      (s, dir) => {
        // the composed cleaning pipeline: language gate -> quality gate ->
        // token-length band -> exact dedup (min-id survivor). Every stage
        // is a pure projection/filter except the final dedup groupBy —
        // one shuffle end to end.
        val docs = tbl(s, dir, "documents")
        val enriched = docs.select(col("doc_id"), col("text"),
          TextFunctions.langId(col("text")).as("lang"),
          TextFunctions.qualityScore(col("text")).as("score"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        enriched
          .filter(col("lang") === "en" && col("score") >= 6.0 &&
            col("n_tokens").between(20, 90))
          .groupBy(col("text"))
          .agg(min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_copies"),
            max(col("n_tokens")).as("n_tokens"))
          .select(col("doc_id"), col("n_tokens"), col("n_copies"))
          .orderBy("doc_id")
      },
      Some {
        val (scores, caseExpr) = TextQueries.langSql("toks")
        s"""WITH t AS (SELECT doc_id, text,
              string_split_regex(text, '\\s+') AS toks FROM documents),
            m AS (SELECT doc_id, text,
              CAST(len(toks) AS BIGINT) AS n_tokens,
              ${TextQueries.qualitySql("text", "toks")} AS score,
              $scores FROM t),
            kept AS (SELECT doc_id, text, n_tokens FROM m
              WHERE $caseExpr = 'en' AND score >= 6.0
                AND n_tokens BETWEEN 20 AND 90)
            SELECT min(doc_id) AS doc_id, max(n_tokens) AS n_tokens,
                   count(*) AS n_copies
            FROM kept GROUP BY text ORDER BY doc_id"""
      }),

    QDef(
      "pipeline_filter_funnel",
      (s, dir) => {
        // the cleaning pipeline's audit twin: per-stage rejection counts
        // for exactly the gates pipeline_clean_corpus applies, in the
        // order it applies them (sequential attribution — each stage
        // sees only the previous stage's survivors). One scan, one
        // single-row aggregate, stages unpivoted driver-free via
        // explode(array(struct)) — the "where did my corpus go" report
        // every large-scale filtering run ships with.
        val docs = tbl(s, dir, "documents")
        val flags = docs.select(
          (TextFunctions.langId(col("text")) === "en").as("g1"),
          (TextFunctions.qualityScore(col("text")) >= 6.0).as("g2"),
          TextFunctions.tokenCount(col("text")).cast("long")
            .between(20, 90).as("g3"),
          col("text"))
        val c = flags.agg(
          count(lit(1)).as("n0"),
          sum(when(!col("g1"), 1L).otherwise(0L)).as("r1"),
          sum(when(col("g1") && !col("g2"), 1L).otherwise(0L)).as("r2"),
          sum(when(col("g1") && col("g2") && !col("g3"), 1L).otherwise(0L)).as("r3"),
          sum(when(col("g1") && col("g2") && col("g3"), 1L).otherwise(0L)).as("n3o"),
          countDistinct(
            when(col("g1") && col("g2") && col("g3"), col("text"))).as("uniq"))
        c.select(explode(array(
            struct(lit("1_lang_gate").as("stage"), col("n0").as("n_in"),
              col("r1").as("n_rejected"), (col("n0") - col("r1")).as("n_out")),
            struct(lit("2_quality_gate").as("stage"),
              (col("n0") - col("r1")).as("n_in"), col("r2").as("n_rejected"),
              (col("n0") - col("r1") - col("r2")).as("n_out")),
            struct(lit("3_token_band").as("stage"),
              (col("n0") - col("r1") - col("r2")).as("n_in"),
              col("r3").as("n_rejected"), col("n3o").as("n_out")),
            struct(lit("4_exact_dedup").as("stage"), col("n3o").as("n_in"),
              (col("n3o") - col("uniq")).as("n_rejected"),
              col("uniq").as("n_out")))).as("f"))
          .select(col("f.stage"), col("f.n_in"), col("f.n_rejected"), col("f.n_out"))
          .orderBy("stage")
      },
      Some {
        val (scores, caseExpr) = TextQueries.langSql("toks")
        s"""WITH t AS (SELECT doc_id, text,
              string_split_regex(text, '\\s+') AS toks FROM documents),
            m AS (SELECT text,
              CAST(len(toks) AS BIGINT) AS n_tokens,
              ${TextQueries.qualitySql("text", "toks")} AS score,
              $scores FROM t),
            f AS (SELECT ($caseExpr = 'en') AS g1, (score >= 6.0) AS g2,
              (n_tokens BETWEEN 20 AND 90) AS g3, text FROM m),
            c AS (SELECT count(*) AS n0,
              CAST(sum(CASE WHEN NOT g1 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
              CAST(sum(CASE WHEN g1 AND NOT g2 THEN 1 ELSE 0 END) AS BIGINT) AS r2,
              CAST(sum(CASE WHEN g1 AND g2 AND NOT g3 THEN 1 ELSE 0 END)
                AS BIGINT) AS r3,
              CAST(sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n3o,
              count(DISTINCT CASE WHEN g1 AND g2 AND g3 THEN text END) AS uniq
              FROM f)
            SELECT stage, n_in, n_rejected, n_out FROM (
              SELECT '1_lang_gate' AS stage, n0 AS n_in, r1 AS n_rejected,
                     n0 - r1 AS n_out FROM c
              UNION ALL SELECT '2_quality_gate', n0 - r1, r2,
                     n0 - r1 - r2 FROM c
              UNION ALL SELECT '3_token_band', n0 - r1 - r2, r3, n3o FROM c
              UNION ALL SELECT '4_exact_dedup', n3o, n3o - uniq, uniq FROM c)
            ORDER BY stage"""
      }),

    QDef(
      "pipeline_chunk_documents",
      (s, dir) =>
        // stride-windowed chunking: 32-token windows advancing by 24
        // (8-token overlap), offsets traceable to the source span; a
        // zero-shuffle projection + explode (the orderBy exists only for
        // the deterministic oracle compare)
        graft.text.Corpus.chunkDocuments(
            tbl(s, dir, "documents"), "doc_id", "text",
            chunkTokens = 32, stride = 24)
          .orderBy("doc_id", "chunk_idx"),
      Some("""
        WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts
                   FROM documents),
        c AS (SELECT doc_id, ts,
              unnest(generate_series(0, greatest(len(ts) - 1, 0), 24)) AS start_tok
              FROM t)
        SELECT doc_id, start_tok // 24 AS chunk_idx, start_tok,
               least(32, len(ts) - start_tok) AS n_tok,
               array_to_string(ts[start_tok + 1 : start_tok + 32], ' ') AS chunk_text
        FROM c ORDER BY doc_id, chunk_idx""")),

    QDef(
      "pipeline_tombstone_delete",
      (s, dir) => {
        // compliance deletion (takedown/GDPR): a tombstone list must
        // vanish from the corpus AND every derived surface in the same
        // pass — here the chunk table derived from it. Both removals
        // are anti-joins on the doc id (broadcast at real tombstone
        // cardinality: the list is tiny next to the corpus); the
        // audited per-surface counts prove the propagation is
        // consistent (chunks deleted belong exactly to docs deleted).
        val docs = tbl(s, dir, "documents")
        val tomb = docs.filter(col("doc_id") % 97 === 0).select(col("doc_id"))
        val chunks = graft.text.Corpus.chunkDocuments(
          docs, "doc_id", "text", chunkTokens = 32, stride = 24)
        def audit(surface: String, df: org.apache.spark.sql.DataFrame) = {
          val kept = df.join(broadcast(tomb), Seq("doc_id"), "left_anti")
          df.agg(count(lit(1)).as("n_before"))
            .withColumn("n_after",
              org.apache.spark.sql.graft.ColumnBridge.scalar(
                kept.agg(count(lit(1)))))
            .select(lit(surface).as("surface"), col("n_before"),
              (col("n_before") - col("n_after")).as("n_deleted"),
              col("n_after"))
        }
        audit("1_documents", docs).unionByName(audit("2_chunks", chunks))
          .orderBy("surface")
      },
      Some("""
        WITH tomb AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0),
        t AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts
              FROM documents),
        c AS (SELECT doc_id FROM t,
              (SELECT unnest(generate_series(0, 1000, 24)) AS start_tok) s
              WHERE start_tok <= greatest(len(ts) - 1, 0))
        SELECT surface, n_before, n_deleted, n_before - n_deleted AS n_after
        FROM (
          SELECT '1_documents' AS surface, count(*) AS n_before,
                 count(*) FILTER (doc_id IN (SELECT doc_id FROM tomb))
                   AS n_deleted
          FROM documents
          UNION ALL
          SELECT '2_chunks', count(*),
                 count(*) FILTER (doc_id IN (SELECT doc_id FROM tomb))
          FROM c)
        ORDER BY surface""")),

    QDef(
      "pipeline_incremental_agg",
      (s, dir) => {
        // incremental materialized-view maintenance: per-source corpus
        // stats kept current by merging the EXISTING aggregate with the
        // new batch's partial aggregate — the new batch is the only
        // data touched (doc_id % 5 == 0 stands in for the ingest, the
        // same batch split the incremental-dedup family uses). Counts
        // and sums merge by +, max by max: the algebraic-aggregate
        // property that makes view maintenance O(batch) instead of
        // O(corpus). The oracle recomputes from scratch — merged state
        // must be indistinguishable from recomputation.
        val docs = tbl(s, dir, "documents")
        def stats(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("source")).agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            max(col("n_chars")).as("max_chars"))
        val existing = stats(docs.filter(col("doc_id") % 5 =!= 0))
        val batch = stats(docs.filter(col("doc_id") % 5 === 0))
        existing.unionByName(batch)
          .groupBy(col("source")).agg(
            sum(col("n_docs")).as("n_docs"),
            sum(col("sum_chars")).as("sum_chars"),
            max(col("max_chars")).as("max_chars"))
          .orderBy("source")
      },
      Some("""
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               max(n_chars) AS max_chars
        FROM documents GROUP BY source ORDER BY source""")),

    QDef(
      "sample_temperature",
      (s, dir) =>
        // alpha = 0.5 temperature rebalancing over the skewed lang
        // column (en is ~3x fr here): sampled stratum sizes become
        // proportional to sqrt(n_d) — between natural (alpha 1) and
        // balanced (alpha 0, = pipeline_mix_domains). sqrt route so the
        // per-million threshold floors identically in both engines.
        Sampling.temperatureSample(
            tbl(s, dir, "documents"), "lang", "doc_id", alpha = 0.5)
          .select(col("lang"), col("doc_id"))
          .orderBy("lang", "doc_id"),
      Some(s"""
        WITH n AS (SELECT lang AS st, count(*) AS nd FROM documents GROUP BY 1),
        t AS (SELECT st, CAST(floor(sqrt(CAST((SELECT min(nd) FROM n) AS DOUBLE)
                 / CAST(nd AS DOUBLE)) * 1000000.0) AS BIGINT) AS thresh FROM n)
        SELECT d.lang, d.doc_id
        FROM documents d JOIN t ON t.st = d.lang
        WHERE ${hashSql("lang || '|' || CAST(doc_id AS VARCHAR)", 1000000)} < t.thresh
        ORDER BY lang, doc_id""")),

    QDef(
      "pipeline_pack_chunks",
      (s, dir) => {
        // the composed chunk -> pack chain: stride-chunk every document
        // (here non-overlapping 32-token windows so no token is counted
        // twice), then concat-and-pack the CHUNKS into 512-token context
        // windows per source — chunking bounds item size, packing bounds
        // window fill; together they are the standard pretraining layout
        // for long documents
        val docs = tbl(s, dir, "documents")
        // source rides the chunk projection (carryCols) — no join back
        // to the corpus, so the whole item-prep stage is shuffle-free
        val items = graft.text.Corpus.chunkDocuments(
            docs, "doc_id", "text", chunkTokens = 32, stride = 32,
            carryCols = Seq("source"))
          .select(col("source"),
            (col("doc_id") * 1000 + col("chunk_idx")).as("chunk_key"),
            col("n_tok"))
        graft.operators.Packing.packOffsets(items, "source", "chunk_key",
            "n_tok", 512L)
          .select(col("source"), col("chunk_key"), col("n_tok"),
            col("start_off"), col("end_off"),
            col("first_window"), col("last_window"))
          .orderBy("source", "chunk_key")
      },
      Some("""
        WITH t AS (SELECT doc_id, source, string_split_regex(text, '\s+') AS ts
                   FROM documents),
        c AS (SELECT doc_id, source, len(ts) AS n,
              unnest(generate_series(0, greatest(len(ts) - 1, 0), 32)) AS start_tok
              FROM t),
        items AS (SELECT source,
                    doc_id * 1000 + start_tok // 32 AS chunk_key,
                    CAST(least(32, n - start_tok) AS BIGINT) AS n_tok
                  FROM c),
        o AS (SELECT source, chunk_key, n_tok,
              CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY chunk_key
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                AS start_off
              FROM items)
        SELECT source, chunk_key, n_tok, start_off,
               CAST(start_off + n_tok AS BIGINT) AS end_off,
               CAST(start_off // 512 AS BIGINT) AS first_window,
               CAST(greatest(start_off, start_off + n_tok - 1) // 512 AS BIGINT)
                 AS last_window
        FROM o ORDER BY source, chunk_key""")),

    QDef(
      "sample_token_budget",
      (s, dir) => {
        // deterministic token-budget fill: docs in reproducible shuffle
        // order until 10k tokens; the global prefix sum is the two-level
        // bucket form (the only globally-ordered window is over <=257
        // bucket rows)
        val docs = tbl(s, dir, "documents").select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        Sampling.tokenBudgetSample(docs, "doc_id", "n_tokens",
            budgetTokens = 10000L)
          .select(col("doc_id"), col("n_tokens"),
            col("shuffle_key"), col("start_tok"))
          .orderBy("start_tok")
      },
      Some(s"""
        WITH t AS (SELECT doc_id,
              CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
              ${hashSql("CAST(doc_id AS VARCHAR)", 1000000000)} AS shuffle_key
            FROM documents),
        o AS (SELECT doc_id, n_tokens, shuffle_key,
              CAST(coalesce(sum(n_tokens) OVER (ORDER BY shuffle_key, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_tok
              FROM t)
        SELECT doc_id, n_tokens, shuffle_key, start_tok
        FROM o WHERE start_tok < 10000 ORDER BY start_tok""")),

    QDef(
      "sample_token_budget_stratified",
      (s, dir) => {
        // "2000 tokens per source": each stratum fills its own budget in
        // reproducible shuffle order — the unit a training mixture is
        // specified in; ranking is an ordinary window partitioned by
        // source, parallel across strata
        val docs = tbl(s, dir, "documents").select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        Sampling.tokenBudgetByStratum(docs, "source", "doc_id", "n_tokens",
            budgetTokens = 2000L)
          .select(col("source"), col("doc_id"), col("n_tokens"),
            col("shuffle_key"), col("start_tok"))
          .orderBy("source", "start_tok", "doc_id")
      },
      Some(s"""
        WITH t AS (SELECT source, doc_id,
              CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
              ${hashSql("CAST(doc_id AS VARCHAR)", 1000000000)} AS shuffle_key
            FROM documents),
        o AS (SELECT source, doc_id, n_tokens, shuffle_key,
              CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
                ORDER BY shuffle_key, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_tok
              FROM t)
        SELECT source, doc_id, n_tokens, shuffle_key, start_tok
        FROM o WHERE start_tok < 2000
        ORDER BY source, start_tok, doc_id""")),

    QDef(
      "pipeline_interleave_sources",
      (s, dir) => {
        // deterministic round-robin source interleave: rank within each
        // source by reproducible hash (partitioned window, parallel
        // across sources), then order by (rank, source) — consecutive
        // output rows cycle through the sources, the balanced shard
        // order training writers use where shuffle_order gives the
        // random one. The result ORDER is the operator's contract.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("shuffle_key"), col("doc_id"))
        tbl(s, dir, "documents")
          .select(col("source"), col("doc_id"))
          .withColumn("shuffle_key",
            Sampling.hashBucket(col("doc_id"), 1000000000))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .orderBy(col("rnk"), col("source"), col("doc_id"))
          .select(col("rnk"), col("source"), col("doc_id"))
      },
      Some(s"""
        WITH t AS (SELECT source, doc_id,
              ${hashSql("CAST(doc_id AS VARCHAR)", 1000000000)} AS shuffle_key
            FROM documents)
        SELECT CAST(row_number() OVER (PARTITION BY source
                 ORDER BY shuffle_key, doc_id) AS BIGINT) AS rnk,
               source, doc_id
        FROM t ORDER BY rnk, source, doc_id""")),

    QDef(
      "sample_coordinated",
      (s, dir) => {
        // coordinated (consistent-hash) sampling across a foreign key:
        // both orders AND their lineitems are sampled by the SAME hash
        // of the order key, so the 10% order sample joins against a
        // pre-filtered 10% of lineitem — referential integrity of the
        // sample for free, and the join never touches the unsampled 90%
        // on either side (both filters push to the scans). The
        // per-priority census + revenue audits the sample end-to-end.
        val cents = (c: org.apache.spark.sql.Column) =>
          round(c * 100).cast("long")
        val o = tbl(s, dir, "orders")
          .filter(Sampling.hashBucket(col("o_orderkey"), 1000) < 100)
          .select(col("o_orderkey"), col("o_orderpriority"))
        val l = tbl(s, dir, "lineitem")
          .filter(Sampling.hashBucket(col("l_orderkey"), 1000) < 100)
          .select(col("l_orderkey"), cents(col("l_extendedprice")).as("cents"))
        o.join(l, col("o_orderkey") === col("l_orderkey"), "left")
          .groupBy(col("o_orderpriority"))
          .agg(countDistinct(col("o_orderkey")).as("n_orders"),
            count(col("l_orderkey")).as("n_items"),
            coalesce(sum(col("cents")), lit(0L)).as("rev_cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some(s"""
        WITH o AS (SELECT o_orderkey, o_orderpriority FROM orders
                   WHERE ${hashSql("CAST(o_orderkey AS VARCHAR)", 1000)} < 100),
        l AS (SELECT l_orderkey,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
              FROM lineitem
              WHERE ${hashSql("CAST(l_orderkey AS VARCHAR)", 1000)} < 100)
        SELECT o_orderpriority,
               count(DISTINCT o_orderkey) AS n_orders,
               count(l_orderkey) AS n_items,
               CAST(coalesce(sum(cents), 0) AS BIGINT) AS rev_cents
        FROM o LEFT JOIN l ON o_orderkey = l_orderkey
        GROUP BY 1 ORDER BY 1""")),

    QDef(
      "pipeline_corpus_training_set",
      (s, dir) => {
        // THE end-to-end corpus-to-training-set flow, every stage an
        // operator that is individually green elsewhere in the registry:
        //   clean (quality + length gates, eval source held out)
        //   -> near-dup dedup via the SHARED corpus index (survivors only)
        //   -> decontaminate (drop docs sharing >= 3 3-shingles with eval)
        //   -> temperature-mix over lang (alpha 0.5) on what survived
        //   -> chunk (non-overlapping 32-token windows, source carried)
        //   -> pack chunks into 512-token context windows per source
        //   -> reproducible hash shuffle of the packed items.
        // Shuffle count stays the production shape: the label/contract
        // joins are skinny frames against one corpus scan, chunking is a
        // zero-shuffle projection+explode, packing is one window per
        // source, the final order is the shuffle contract itself.
        val docs = tbl(s, dir, "documents")
        val cleaned = docs
          .select(col("doc_id"), col("text"), col("lang"), col("source"),
            TextFunctions.qualityScore(col("text")).as("score"),
            TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
          .filter(col("source") =!= "src0" &&
            col("score") >= 5.0 && col("n_tokens") >= 10)
        val labels = DedupQueries.survivorLabels(s, dir)
        val deduped = cleaned
          .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
          .filter(col("label").isNull || col("label") === col("doc_id"))
          .drop("label")
        // r13 (verdict #8, guide §7.2 duplicated subtrees): `survived`
        // has TWO consumers — temperatureSample's per-lang counts frame
        // and the sampled-row probe side — so everything upstream
        // planned twice, including the contamination shingle join (the
        // expensive stage: 2 Generates + 2 count exchanges per copy;
        // plans/r13/*_before.txt nodes 14-41 vs 55-82). Persisting the
        // SKINNY contaminated id set halves the shingle work and, once
        // materialized, gives AQE a real size for the anti-join side.
        // Per-execution cache, rebuilt every lap — not cross-run state.
        val contaminated = graft.text.Corpus.contamination(
            docs.filter(col("source") =!= "src0"),
            docs.filter(col("source") === "src0"),
            "doc_id", "text", minShared = 3)
          .select(col("doc_id"))
          .persist()
        val survived = deduped.join(contaminated, Seq("doc_id"), "left_anti")
        val mixed = Sampling.temperatureSample(survived, "lang", "doc_id", alpha = 0.5)
        val items = graft.text.Corpus.chunkDocuments(
            mixed, "doc_id", "text", chunkTokens = 32, stride = 32,
            carryCols = Seq("source"))
          .select(col("source"),
            (col("doc_id") * 1000 + col("chunk_idx")).as("chunk_key"),
            col("n_tok"))
        val packed = graft.operators.Packing.packOffsets(
          items, "source", "chunk_key", "n_tok", 512L)
        Sampling.shuffleOrder(packed, "chunk_key")
          .select(col("source"), col("chunk_key"), col("n_tok"),
            col("start_off"), col("end_off"),
            col("first_window"), col("last_window"), col("shuffle_key"))
      },
      Some {
        s"""WITH RECURSIVE ${DedupQueries.nearPairsCteSql},
            e AS (SELECT a AS u, b AS v FROM pairs
                  UNION SELECT b AS u, a AS v FROM pairs),
            reach(u, m) AS (
              SELECT u, u AS m FROM (SELECT DISTINCT u FROM e)
              UNION
              SELECT r.u, e.v AS m FROM reach r JOIN e ON r.m = e.u),
            comp AS (SELECT u AS doc_id, min(m) AS survivor_id
                     FROM reach GROUP BY u),
            t0 AS (SELECT doc_id, text, lang, source,
                     string_split_regex(text, '\\s+') AS tok0 FROM documents),
            cleaned AS (SELECT doc_id, text, lang, source FROM t0
              WHERE source != 'src0'
                AND ${TextQueries.qualitySql("text", "tok0")} >= 5.0
                AND len(tok0) >= 10),
            dd AS (SELECT c.* FROM cleaned c
                   LEFT JOIN comp ON comp.doc_id = c.doc_id
                   WHERE comp.survivor_id IS NULL OR comp.survivor_id = c.doc_id),
            tr AS (SELECT s.doc_id, s.shingle FROM shing s
                   JOIN documents d USING (doc_id) WHERE d.source != 'src0'),
            te AS (SELECT s.doc_id AS eval_id, s.shingle FROM shing s
                   JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
            contam AS (SELECT DISTINCT doc_id FROM (
                SELECT tr.doc_id, te.eval_id, count(*) AS shared
                FROM tr JOIN te USING (shingle) GROUP BY 1, 2) x
              WHERE shared >= 3),
            survived AS (SELECT d.* FROM dd d
                         LEFT JOIN contam c ON c.doc_id = d.doc_id
                         WHERE c.doc_id IS NULL),
            nst AS (SELECT lang AS st, count(*) AS nd FROM survived GROUP BY 1),
            th AS (SELECT st,
                     CAST(floor(sqrt(CAST((SELECT min(nd) FROM nst) AS DOUBLE)
                       / CAST(nd AS DOUBLE)) * 1000000.0) AS BIGINT) AS thresh
                   FROM nst),
            mixed AS (SELECT s.* FROM survived s
              JOIN th ON th.st IS NOT DISTINCT FROM s.lang
              WHERE ${hashSql("concat_ws('|', s.lang, CAST(s.doc_id AS VARCHAR))",
                1000000)} < th.thresh),
            ct AS (SELECT doc_id, source,
                     string_split_regex(text, '\\s+') AS ts FROM mixed),
            cc AS (SELECT doc_id, source, len(ts) AS n,
                   unnest(generate_series(0, greatest(len(ts) - 1, 0), 32))
                     AS start_tok
                   FROM ct),
            items AS (SELECT source,
                        doc_id * 1000 + start_tok // 32 AS chunk_key,
                        CAST(least(32, n - start_tok) AS BIGINT) AS n_tok
                      FROM cc),
            o AS (SELECT source, chunk_key, n_tok,
                  CAST(coalesce(sum(n_tok) OVER (PARTITION BY source
                    ORDER BY chunk_key
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS start_off
                  FROM items),
            packed AS (SELECT source, chunk_key, n_tok, start_off,
                   CAST(start_off + n_tok AS BIGINT) AS end_off,
                   CAST(start_off // 512 AS BIGINT) AS first_window,
                   CAST(greatest(start_off, start_off + n_tok - 1) // 512
                     AS BIGINT) AS last_window
                 FROM o)
            SELECT source, chunk_key, n_tok, start_off, end_off,
                   first_window, last_window,
                   ${hashSql("CAST(chunk_key AS VARCHAR)", 1000000000)}
                     AS shuffle_key
            FROM packed
            ORDER BY shuffle_key, chunk_key"""
      }),

    QDef(
      "pipeline_quality_curriculum",
      (s, dir) =>
        // curriculum ordering: high-quality bands first, reproducibly
        // shuffled WITHIN each band. Bands are fixed-width score buckets
        // (floor(score)) — a pure projection, deliberately NOT ntile,
        // whose global sort-and-count would serialize the corpus at
        // 100 TB — and the within-band order is the same hash key as
        // pipeline_shuffle_order, so the contract (band DESC,
        // shuffle_key) range-partitions into a distributed sort with no
        // single-task stage. Score is the shared qualityScore expression
        // tree, bit-equal across engines.
        tbl(s, dir, "documents")
          .select(col("doc_id"),
            TextFunctions.qualityScore(col("text")).as("score"))
          .withColumn("band", floor(col("score")).cast("long"))
          .withColumn("shuffle_key",
            Sampling.hashBucket(col("doc_id"), 1000000000))
          .select(col("doc_id"), col("score"), col("band"), col("shuffle_key"))
          .orderBy(col("band").desc, col("shuffle_key"), col("doc_id")),
      Some(s"""
        WITH t AS (SELECT doc_id, text,
              string_split_regex(text, '\\s+') AS toks FROM documents),
        sc AS (SELECT doc_id, ${TextQueries.qualitySql("text", "toks")} AS score
               FROM t)
        SELECT doc_id, score, CAST(floor(score) AS BIGINT) AS band,
               ${hashSql("CAST(doc_id AS VARCHAR)", 1000000000)} AS shuffle_key
        FROM sc ORDER BY band DESC, shuffle_key, doc_id"""))
  )
}
