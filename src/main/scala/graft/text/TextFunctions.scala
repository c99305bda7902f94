package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline extension
  * (builder brief): token counting, quality scoring, language ID,
  * fingerprinting. All pure codegen'd column expressions — no UDFs — so
  * they vectorize inside whole-stage codegen at any scale, and every one
  * is reproducible in ANSI SQL for the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokenizer (the BPE-ish regex variant splits on
    * non-word boundaries too; both are pure `split`).
    */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish pre-tokenization pattern: letter runs, digit runs, and
    * punctuation runs as separate tokens (the GPT-2 pre-tokenizer family
    * minus its lookahead clauses, so the SAME pattern runs verbatim
    * under Java regex and RE2/DuckDB — lookarounds are Java-only).
    */
  val BpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  def tokensBpeIsh(text: Column): Column =
    regexp_extract_all(text, lit(BpeIshPattern), lit(0))

  def tokenCountBpeIsh(text: Column): Column = size(tokensBpeIsh(text))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Fraction of tokens found in `words` (stopword ratio et al.).
    * Guarded against empty token lists.
    */
  def wordRatio(text: Column, words: Seq[String]): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => array_contains(typedLit(words), t)))
    when(size(toks) > 0, hits.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  def countHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(typedLit(words), t)))

  /** Heuristic quality score: mean token length + stopword ratio +
    * length band. Deterministic double arithmetic (single division).
    */
  val enStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val meanTokLen = when(nTok > 0, length(text).cast("double") / nTok).otherwise(lit(0.0))
    val stop = wordRatio(text, enStopwords)
    meanTokLen + stop * lit(10.0)
  }

  /** n-gram-heuristic language ID: count hits per language's marker list,
    * pick the first maximal language in alphabetical order (deterministic
    * tiebreak, mirrored exactly by the oracle's CASE chain).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "la", "los", "y", "que", "es"),
    "fr" -> Seq("le", "les", "et", "un", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, ws) => lang -> countHits(text, ws) }
    // no marker hit at all -> "und"; else the first lang (alphabetical)
    // whose score >= every other score
    val anyHit = scores.map(_._2).map(_ > 0).reduce(_ || _)
    val argmax = scores.foldRight(lit("und")) { case ((lang, s), els) =>
      val isMax = scores.map(_._2).map(o => s >= o).reduce(_ && _)
      when(isMax, lit(lang)).otherwise(els)
    }
    when(anyHit, argmax).otherwise(lit("und"))
  }

  /** Document fingerprint: polynomial rolling hash over characters
    * (graft.functions.Scalars.polyHash). Stable across engines: pure
    * integer fold, p < 2^53 so no overflow.
    */
  def fingerprint(text: Column): Column = graft.functions.Scalars.polyHash(text)

  // ---- PII scrubbing ----------------------------------------------------

  /** Conservative PII patterns, written in the regex subset common to
    * Java's engine and RE2 (no backrefs / lookaround), so the DuckDB
    * oracle runs the identical pattern. Real deployments swap in their
    * compliance team's patterns — the operator shape (codegen'd
    * regexp_count + regexp_replace on the scan, zero shuffle) is the
    * point here.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val phoneRe = "\\+?[0-9][0-9]{0,2}[- ][0-9]{3}[- ][0-9]{3,4}"

  def piiEmailCount(text: Column): Column = regexp_count(text, lit(emailRe))
  def piiPhoneCount(text: Column): Column = regexp_count(text, lit(phoneRe))

  /** Redact emails then phones with fixed placeholder tokens. Order
    * matters and is part of the contract (a phone inside an already
    * redacted email can't double-fire).
    */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
}
