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

  /** EXACT subword token count under a trained BPE merge table (the real
    * vocabulary-aware count [[subwordCount]] approximates) — train with
    * `Bpe.learnMergesFromCorpus`, count map-side via the native
    * [[graft.functions.BpeCountWords]] kernel.
    */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BpeCountWords(
        org.apache.spark.sql.graft.Bridge.toExpression(spark,
          graft.operators.Dedup.wordsArray(text)), merges))
  }

  /** The tokenized text itself (space-joined subwords in word order) under a trained
    * BPE merge table — the emit form of [[bpeTokenCount]], for pipelines whose
    * output column is the token sequence.
    */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BpeTokensWords(
        org.apache.spark.sql.graft.Bridge.toExpression(spark,
          graft.operators.Dedup.wordsArray(text)), merges))
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

  /** Non-distinct word n-grams of a word-array column (cf. [[Dedup.shingles]], which
    * distincts per doc — repetition metrics need every occurrence). The word array
    * must be a bound attribute, not a nested expression (the HOF re-evaluation
    * pitfall documented on Dedup.shingles).
    */
  private def allGrams(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Within-document repetition metrics — the Gopher (Rae et al. 2021) repetition
    * filters: documents dominated by repeated n-grams are low-quality (scrapes,
    * keyword stuffing, broken boilerplate). Emits
    * (id, n_2grams, dup_2gram_frac, dup_3gram_frac, top_2gram_frac):
    *
    *   - `dup_Ngram_frac`: fraction of n-gram occurrences that are repeats of an
    *     earlier occurrence (1 − distinct/total).
    *   - `top_2gram_frac`: occurrence share of the single most frequent 2-gram.
    *
    * Entirely map-only: the top-gram count is the longest run of equal adjacent
    * elements in the SORTED gram array (an `aggregate` fold with (prev, run, best)
    * struct state — the lambda touches only its own variables, so nothing outer is
    * re-evaluated per element), so the per-document mode never shuffles — at 100 TB
    * this stays a pure scan like the rest of the text metrics. The word and gram
    * arrays are staged as bound attributes across two projections (the HOF
    * re-evaluation pitfall documented on [[Dedup.shingles]]).
    */
  def repetitionScores(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String)
      : org.apache.spark.sql.DataFrame = {
    def dupFrac(g: Column): Column =
      when(size(g) === 0, lit(0.0)).otherwise(
        round((size(g) - size(array_distinct(g))).cast("double") /
          size(g).cast("double"), 6))
    def topFrac(g: Column): Column = {
      val st = aggregate(
        array_sort(g),
        struct(lit("").alias("prev"), lit(0L).alias("run"), lit(0L).alias("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
            .otherwise(lit(1L))
          struct(x.alias("prev"), run.alias("run"),
            greatest(acc.getField("best"), run).alias("best"))
        })
      when(size(g) === 0, lit(0.0)).otherwise(
        round(st.getField("best").cast("double") / size(g).cast("double"), 6))
    }
    df.select(col(idCol).alias("id"), Dedup.wordsArray(col(textCol)).alias("__w"))
      .select(col("id"),
        allGrams(col("__w"), 2).alias("__g2"), allGrams(col("__w"), 3).alias("__g3"))
      .select(col("id"),
        size(col("__g2")).cast("long").alias("n_2grams"),
        dupFrac(col("__g2")).alias("dup_2gram_frac"),
        dupFrac(col("__g3")).alias("dup_3gram_frac"),
        topFrac(col("__g2")).alias("top_2gram_frac"))
  }

  /** BM25-style lexical retrieval over the corpus for a FIXED query-term list —
    * the keyword-search complement to the vector ANN family. Per document:
    * per-term tf (occurrences in the normalized word array), dl (word count), and
    * the score
    *
    *   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * with the RATIONAL idf form idf(t) = (N − df + 0.5)/(df + 0.5) instead of the
    * classical ln of it: per-term it is the same monotone ordering, and avoiding
    * `ln` keeps every operation (+,−,×,÷) bit-identical across engines — `ln`
    * implementations legitimately differ in the last ulp, which is enough to swap
    * near-tie ranks under a hash-compare oracle. The terms sum in FIXED declaration
    * order as one projection expression (a groupBy sum of doubles would re-order).
    *
    * Scale shape: corpus stats (N, avgdl, per-term df) are a handful of scalars —
    * one aggregation pass, then a broadcast-free map-stage score (stats inline as
    * literals via a driver collect of ONE row) and a top-k TakeOrdered. Returns
    * (id, dl, tf_0.., score) ranked by (score desc, id).
    */
  def bm25(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int = 10, k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val staged = df.select(col(idCol).alias("id"),
      Dedup.wordsArray(col(textCol)).alias("__w"))
    // evaluated twice (stats pass + scoring pass): persist so the regex
    // normalization runs once over the corpus, not twice (cf. Dedup.minHashNearDup)
    val withTf = staged.select(
      (col("id") +: size(col("__w")).cast("long").alias("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("__w"), w => w === lit(t))).cast("long").alias(s"tf_$i")
        }): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one row of corpus stats: N, avgdl, df per term
    val statAggs =
      (sum(col("dl")).cast("double") / count(lit(1))).alias("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).alias(s"df_$i"))
    val statsRow = withTf.agg(count(lit(1)).alias("n"), statAggs: _*).head()
    val n = statsRow.getLong(0).toDouble
    val avgdl = statsRow.getDouble(1)
    val score = terms.indices.map { i =>
      val dfT = statsRow.getLong(2 + i).toDouble
      val idf = (n - dfT + 0.5) / (dfT + 0.5)
      val tf = col(s"tf_$i").cast("double")
      lit(idf) * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }.reduce(_ + _)
    withTf.withColumn("score", round(score, 6))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** C4-style heuristic line filtering (Raffel et al. 2020, arXiv:1910.10683 §2.2 —
    * the cleaning rules behind the C4 corpus, reused by FineWeb/RefinedWeb-class
    * pipelines). Line rules (a line survives iff ALL hold):
    *
    *   - ends with terminal punctuation (`.` `!` `?` `"`);
    *   - has at least `minLineWords` whitespace-separated words;
    *   - does not contain the word "javascript" (cookie/JS-warning boilerplate).
    *
    * Document rules: any document containing a substring from `dropDocSubstrings`
    * (default `lorem ipsum` placeholder text and `{`, the code heuristic) is dropped
    * whole, as is any document retaining fewer than `minKeptLines` lines. Survivors
    * are rebuilt from their kept lines.
    *
    * Emits (id, n_lines, n_kept, cleaned) for passing documents. Entirely map-only —
    * every rule is per-document, so at 100 TB this is a pure scan with no shuffle
    * (the output ordering, if requested, is the only exchange). The line array is
    * staged as a bound attribute before the HOF lambdas touch it (the re-evaluation
    * pitfall documented on [[Dedup.shingles]]).
    */
  def c4LineFilter(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      minLineWords: Int = 5, minKeptLines: Int = 3,
      dropDocSubstrings: Seq[String] = Seq("lorem ipsum", "{"))
      : org.apache.spark.sql.DataFrame = {
    val staged = df.select(col(idCol).alias("id"),
      transform(split(col(textCol), "\n"), l => trim(l)).alias("__lines"),
      lower(col(textCol)).alias("__lower"))
    val docOk = dropDocSubstrings
      .map(s => !col("__lower").contains(s))
      .reduceOption(_ && _).getOrElse(lit(true))
    val kept = filter(col("__lines"), l =>
      l.rlike("[.!?\"]$") &&
        size(filter(split(l, "\\s+"), w => length(w) > 0)) >= minLineWords &&
        !lower(l).contains("javascript"))
    staged.filter(docOk)
      .select(col("id"), size(col("__lines")).alias("n_lines"), kept.alias("__kept"))
      .filter(size(col("__kept")) >= minKeptLines)
      .select(col("id"), col("n_lines"), size(col("__kept")).alias("n_kept"),
        array_join(col("__kept"), "\n").alias("cleaned"))
  }

  /** Dependency-free HTML → text extraction: strip `<script>`/`<style>` blocks and
    * comments wholesale, drop every remaining tag, decode the six ubiquitous
    * entities, and collapse whitespace. Regexes stay inside the syntax subset Java
    * and RE2 share (`(?is)` flags, lazy `.*?`, no backreferences), so an oracle
    * engine replays the extraction verbatim; entities decode in a FIXED chain with
    * `&amp;` last, so `&amp;lt;` yields the literal `&lt;` exactly once in every
    * engine. Pure per-row column expression — a scan-shaped map at any scale.
    *
    * This is the deterministic skeleton of a trafilatura-class extractor: real-world
    * main-content scoring (link density, DOM weights) would slot in as a scoring
    * pass over the same stripped segments.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(?:script|style)\\b[^>]*>.*?</(?:script|style)>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&#39;" -> "'", "&quot;" -> "\"",
      "&gt;" -> ">", "&lt;" -> "<", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Document fingerprint: md5 of the case/whitespace/punctuation-normalized text.
    * Identical normalization is expressible in any engine, so fingerprint equality is
    * portable; used as the exact-dedup key so the shuffle carries 32 hex chars, not
    * document bodies.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9一-鿿]", ""))
}
