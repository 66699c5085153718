package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators (SURVEY.md §2 E8-E10) for
  * training-data pipelines: language ID, quality scoring, token
  * counting. Everything is built from codegen'd native functions
  * (split / higher-order filter / regexp) — a single projection per
  * row, no UDFs, so these run at scan speed over a 100 TB corpus and
  * are bit-reproducible in the DuckDB oracle.
  */
object TextAnalysis {

  /** Minimal per-language stopword lists for the scoring heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "les", "et", "une", "est", "du"))

  private def tokens(text: Column): Column = split(text, " ")

  /** Count of tokens that belong to `lang`'s stopword list
    * (duplicates counted — it's a ratio numerator). */
  def stopwordHits(text: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    size(filter(tokens(text), t => array_contains(sw, t)))
  }

  /** CJK codepoint count — the zh signal. */
  def cjkChars(text: Column): Column =
    length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))

  /** Language-ID heuristic: stopword hit-counts per latin language +
    * CJK char count; argmax with a fixed priority order, 'und' when
    * nothing scores. */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, "en"); val es = stopwordHits(text, "es")
    val de = stopwordHits(text, "de"); val fr = stopwordHits(text, "fr")
    val zh = cjkChars(text)
    when(zh > en && zh > es && zh > de && zh > fr, "zh")
      .when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: word pieces + each standalone punctuation
    * mark, the usual pre-tokenizer regex shape. */
  def tokenCountRegex(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_ ]"))

  /** Quality score in [0,1]: alphabetic density + length credit +
    * stopword density. Pure integer-ratio arithmetic and a fixed
    * combination order keep it bit-reproducible across engines. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val nTok = size(tokens(text)).cast("double")
    val alphaRatio = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / len
    val lenCredit = least(lit(1.0), nTok / lit(50.0))
    val stopRatio = stopwordHits(text, "en").cast("double") / nTok
    round(lit(0.5) * alphaRatio + lit(0.3) * lenCredit + lit(0.2) * stopRatio, 4)
  }

  /** Text normalization (E13): lowercase, strip non-alphanumerics,
    * collapse runs of spaces. One codegen projection. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Stopword-filtered token array of normalized text. */
  def contentTokens(text: Column, lang: String = "en"): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    filter(split(normalizeText(text), " "), t => !array_contains(sw, t))
  }

  // PII patterns: kept RE2-compatible (no backrefs/lookarounds) so the
  // same pattern runs in Spark (java.util.regex) and the oracle.
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String = "\\+?[0-9][0-9-]{7,}[0-9]"

  /** PII scrubbing (E14): mask emails and phone-shaped numbers. Order
    * matters (emails first — their local part can look phone-like). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "[EMAIL]"),
      phonePattern, "[PHONE]")

  def emailCount(text: Column): Column = regexp_count(text, lit(emailPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(phonePattern))
}
