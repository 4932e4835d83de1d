package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for the documents table (SURVEY.md §2.2
  * P15 + the LLM-pipeline north star). All are Catalyst built-in
  * compositions — codegen-friendly, no UDFs — and each has an exact
  * DuckDB twin so the oracle can hash-match.
  *
  * Tokenization is whitespace-based to match the corpus shape
  * (documents.text is space-joined words); `bpeishTokenCount` adds a
  * regex sub-word variant for byte-pair-encoding-style accounting.
  */
object TextOps {

  /** Small English stopword list used by langId/quality heuristics. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Sub-word-ish token count: alternating letter-runs and digit-runs,
    * the cheap proxy for a BPE tokenizer's segment count.
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "[^A-Za-z0-9]+"), t => length(t) > 0)).cast("long")

  /** Number of tokens that are stopwords (exact membership). */
  def stopwordHits(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords: _*))).cast("long")

  /** Stopword ratio in [0,1]; exact integer division in double. */
  def stopwordRatio(text: Column): Column =
    stopwordHits(text).cast("double") / tokenCount(text).cast("double")

  /** Rule-based language ID: stopword-ratio threshold. A real n-gram
    * model would score character trigrams per language; the declared
    * contract is the deterministic heuristic surface.
    */
  def langId(text: Column): Column =
    when(stopwordRatio(text) >= lit(0.05), "en").otherwise("unknown")

  /** Quality score in [0,1]: mean of three clamped sub-scores (token
    * volume, stopword density, character volume). Deterministic — the
    * identical expression tree evaluates identically in DuckDB.
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val tok  = tokenCount(text).cast("double")
    val tokenScore = least(lit(1.0), tok / lit(200.0))
    val stopScore  = least(lit(1.0), lit(10.0) * stopwordHits(text).cast("double") / tok)
    val charScore  = least(lit(1.0), nChars.cast("double") / lit(1000.0))
    (tokenScore + stopScore + charScore) / lit(3.0)
  }

  /** Canonical text form used for normalized dedup. */
  def normalized(text: Column): Column = lower(trim(text))

  /** 64-bit-hex document fingerprint over the normalized text. md5 is
    * available in both engines; xxhash64 (Spark-only) is used on internal
    * paths like MinHash where no oracle is needed.
    */
  def fingerprint(text: Column): Column =
    substring(md5(normalized(text)), 1, 16)

  /** Token-level rolling fingerprint: a single left fold
    * `h ← xxhash64(h, token)` over the token stream. Order-sensitive
    * (unlike a token-set hash) and one pass — the streaming-friendly
    * fingerprint for very long documents where md5 of the whole string
    * would need the full text materialized. Hash chaining instead of
    * polynomial arithmetic keeps it valid in ANSI-mode sessions, where
    * a multiply-accumulate over full-range 64-bit hashes would throw on
    * overflow.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(normalized(text)), lit(0L),
      (acc, tok) => xxhash64(acc, tok))
}
