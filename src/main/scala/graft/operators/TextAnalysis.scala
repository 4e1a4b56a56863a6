package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.{occurrences, rolling_hash, tokens}

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token statistics, and content fingerprinting.
  *
  * Every operator is a narrow (shuffle-free) projection over the
  * documents table — built-in string expressions only, fully inside
  * whole-stage codegen — so they parallelize embarrassingly at 100 TB.
  * All scores are exact integers (occurrence counts via literal replace
  * arithmetic) so results are engine-reproducible; ratios are left to the
  * consumer to avoid float-boundary nondeterminism.
  */
object TextAnalysis {

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "fr" -> Seq("le", "la", "les", "des", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  val langOrder = Seq("en", "es", "de", "fr", "zh")

  private def padded(text: Column): Column =
    concat(lit(" "), lower(trim(text)), lit(" "))

  private def langScore(text: Column, lang: String): Column =
    stopwords(lang).map(w => occurrences(padded(text), s" $w ")).reduce(_ + _)

  /** N-gram/stopword-heuristic language ID: score = total occurrences of
    * each language's marker words; prediction = argmax with a fixed
    * precedence order (en > es > de > fr > zh) as the deterministic
    * tie-break.
    */
  def langId(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val scores = langOrder.map(l => langScore(col(textCol), l).as(s"score_$l"))
    val scored = docs.select((col(idCol) +: col("lang") +: scores): _*)
    val mx = greatest(langOrder.map(l => col(s"score_$l")): _*)
    val pred = langOrder.init.foldRight(lit(langOrder.last): Column) {
      case (l, elseCol) => when(col(s"score_$l") === mx, lit(l)).otherwise(elseCol)
    }
    scored.select(col(idCol), col("lang"), pred.as("pred_lang"))
  }

  /** Integer quality signals: character count, token count, punctuation
    * hits ('.' + ','), stopword hits (' the ' + ' a ' occurrences).
    */
  def qualitySignals(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars_measured"),
      size(tokens(col(textCol))).as("n_tokens"),
      (occurrences(col(textCol), ".") + occurrences(col(textCol), ",")).as("punct_hits"),
      (occurrences(padded(col(textCol)), " the ") + occurrences(padded(col(textCol)), " a "))
        .as("stopword_hits"))

  /** Token statistics: total and distinct token counts per document. */
  def tokenStats(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      size(tokens(col(textCol))).as("n_tokens"),
      size(array_distinct(tokens(col(textCol)))).as("n_distinct_tokens"))

  /** Content fingerprint: md5 of the whitespace-collapsed, lowercased,
    * trimmed text — the canonical key for exact dedup across formatting
    * variants.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")).as("fingerprint"))

  /** Rolling-hash fingerprint (codegen'd 64-bit polynomial hash over the
    * normalized text) — cheaper than md5 per byte, and the primitive a
    * shingling pipeline composes chunk-wise.
    */
  def rollingFingerprint(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      rolling_hash(regexp_replace(lower(trim(col(textCol))), "\\s+", " "))
        .as("rolling_fp"))

  /** BPE-ish token count: letter runs, single digits, or single
    * punctuation marks — the pre-tokenizer shape GPT-style BPE vocabularies
    * assume, as a portable ASCII regex.
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCount(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit(bpeishPattern), lit(0)))
        .as("n_bpeish_tokens"))
}
