package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines
  * (SURVEY §2 ops 53-56). All pure Column algebra over built-ins —
  * codegen'd, no UDFs, so they run inside whole-stage codegen at any
  * scale. Tokenization convention shared with the DuckDB oracles:
  * whitespace split of trimmed text.
  */
object Text {
  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: alpha runs, single digits, single punct. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Non-distinct word n-grams (frequency-preserving, for counting) —
    * native expression; the HOF chain was measured 5× slower.
    */
  def ngrams(text: Column, n: Int): Column =
    graft.expressions.WordShingles(text, n, distinct = false)

  /** Count of tokens found in a marker/stopword list. */
  def markerHits(toks: Column, words: Seq[String]): Column = {
    size(filter(toks, t => words.map(w => t === w).reduce(_ || _)))
  }

  /** Stopwords used by the quality score (and the oracle SQL). */
  val Stopwords = Seq("the", "a", "value", "data")

  /** Quality score in [0,1]: length norm + stopword ratio + punct penalty.
    * Pure arithmetic → bit-identical across engines.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val punct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double")
    val stop = markerHits(toks, Stopwords).cast("double")
    lit(0.4) * least(nChars / 200.0, lit(1.0)) +
      lit(0.4) * (stop / greatest(nTok, lit(1.0))) +
      lit(0.2) * (lit(1.0) - least(punct / greatest(nTok, lit(1.0)), lit(1.0)))
  }

  /** Language marker words, priority-ordered (first match wins). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "y", "las"))

  /** n-gram/stopword-heuristic language ID: language with the most marker
    * hits wins; priority order breaks ties; no hits → "unknown".
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (l, ws) => l -> markerHits(toks, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown")) { case ((l, s), acc) =>
      when(s > 0 && s === best, l).otherwise(acc)
    }
  }

  /** Text cleanup for corpus ingestion: control characters (C0 + DEL)
    * become spaces, whitespace runs collapse to one space, ends
    * trimmed. Byte-meaningful transforms only (no case folding, no
    * Unicode normalization — those are policy, this is hygiene). Pure
    * per-row regex algebra: map-only at any corpus size, and the same
    * two RE2-safe patterns replay in any engine.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x1f\\x7f]", " "), "\\s+", " "))

  /** Winnowing-style document fingerprint: lexicographic min of md5 over
    * rolling word 5-grams (rolling-hash fingerprinting; md5 hex keeps the
    * value engine-neutral). Docs shorter than 5 tokens hash what's there.
    * Native single-pass kernel — the declarative sequence/transform/md5
    * chain interpreted one lambda per shingle and topped the corpus
    * bench (see [[graft.expressions.ShingleMinHash]]).
    */
  def fingerprint(text: Column, k: Int = 5): Column =
    graft.expressions.ShingleMinHash(text, k)
}
