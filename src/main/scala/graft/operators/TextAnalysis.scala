package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All are composed from codegen'd
  * built-in functions (no UDFs) so they stay inside whole-stage codegen and scale
  * linearly with no shuffle — at 100 TB these run as pure map stages over the scan.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** Approximate BPE-ish subword count: words + extra splits for long words and
    * digit/punctuation boundaries (a cheap stand-in for a real tokenizer).
    */
  def subwordCount(text: Column): Column = {
    val words = tokenCount(text)
    val chars = length(text).cast("long")
    // ~4 chars/token heuristic, never below the word count
    greatest(words, ceil(chars.cast("double") / 4.0).cast("long"))
  }

  /** GPT-2-style pre-tokenizer pattern, lookahead-free so the identical regex runs on
    * Java regex (Spark) and RE2 (DuckDB, for the oracle): contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs.
    */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z一-鿿]+| ?[0-9]+| ?[^\\sA-Za-z0-9一-鿿]+"

  /** Pre-tokenization token count with the real BPE-style boundary rules (the unit a
    * byte-pair tokenizer would merge within). Codegen'd regexp_extract_all — a map
    * stage at any scale.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0))).cast("long")

  /** Occurrences of `needle` via the length-difference trick (portable to any SQL
    * engine, used so the DuckDB oracle can replicate the exact same arithmetic).
    */
  def countOccurrences(haystack: Column, needle: String): Column =
    ((length(haystack) - length(replace(haystack, lit(needle), lit("")))) / needle.length)
      .cast("int")

  private def occ(lowerPadded: Column, kw: String): Column =
    countOccurrences(lowerPadded, s" $kw ")

  /** Stopword-count language ID over {en, de, fr, es, zh}. CJK presence short-circuits
    * to zh; otherwise argmax of per-language stopword hits with a deterministic
    * tie-break (en > de > fr > es > unknown).
    *
    * Backed by the native [[graft.functions.StopwordLangId]] expression: the composed
    * Column form below expands to ~64 copies of the lowered text and overflows the
    * Janino method-size limit, knocking the whole projection out of whole-stage
    * codegen — the native form is one static call and lowers the text once per row.
    */
  def langId(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.StopwordLangId(
        org.apache.spark.sql.graft.Bridge.toExpression(
          org.apache.spark.sql.SparkSession.active, text)))

  /** The portable composed formulation of [[langId]] (kept for the bit-parity spec;
    * its arithmetic — the length-difference occurrence count over the padded lowered
    * text — is what the DuckDB oracle replicates).
    */
  private[graft] def langIdComposed(text: Column): Column = {
    val kws = graft.functions.StopwordLangId.keywords.toMap
    val t = concat(lit(" "), lower(text), lit(" "))
    val en = kws("en").map(occ(t, _)).reduce(_ + _)
    val de = kws("de").map(occ(t, _)).reduce(_ + _)
    val fr = kws("fr").map(occ(t, _)).reduce(_ + _)
    val es = kws("es").map(occ(t, _)).reduce(_ + _)
    when(text.rlike("[一-鿿]"), lit("zh"))
      .when(en >= de && en >= fr && en >= es && en > 0, lit("en"))
      .when(de >= fr && de >= es && de > 0, lit("de"))
      .when(fr >= es && fr > 0, lit("fr"))
      .when(es > 0, lit("es"))
      .otherwise(lit("unknown"))
  }

  /** Quality score in [0,1]: blend of length band, alpha ratio, punctuation ratio and
    * mean word length. Pure double arithmetic on integer counts — deterministic and
    * replicable in the oracle.
    */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z一-鿿]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val words = tokenCount(text).cast("double")
    val lenScore = when(n >= 200 && n <= 8000, lit(1.0))
      .when(n < 200, n / 200.0)
      .otherwise(lit(8000.0) / n)
    val alphaRatio = when(n === 0, lit(0.0)).otherwise(alpha / n)
    val punctPenalty = when(n === 0, lit(0.0)).otherwise(least(punct / n * 10.0, lit(1.0)))
    val meanWord = when(words === 0, lit(0.0)).otherwise(n / words)
    val wordScore = when(words === 0, lit(0.0))
      .when(meanWord >= 3.0 && meanWord <= 12.0, lit(1.0))
      .otherwise(lit(0.5))
    round(lenScore * 0.4 + alphaRatio * 0.3 + (lit(1.0) - punctPenalty) * 0.1 + wordScore * 0.2, 6)
  }

  /** Document fingerprint: md5 of the case/whitespace/punctuation-normalized text.
    * Identical normalization is expressible in any engine, so fingerprint equality is
    * portable; used as the exact-dedup key so the shuffle carries 32 hex chars, not
    * document bodies.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9一-鿿]", ""))
}
