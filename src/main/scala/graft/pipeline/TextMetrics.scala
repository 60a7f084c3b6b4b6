package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text-analysis operators for training-data pipelines (north-star
  * extensions): language ID, quality scoring, token counting, document
  * fingerprinting. All pure Catalyst column expressions — per-row map
  * work with no shuffle, so these run at scan speed on any corpus size.
  */
object TextMetrics {

  /** Token statistics: whitespace tokens plus a BPE-ish subword estimate
    * (runs of letters / digits / single punctuation as separate tokens). */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokenize(col(textCol))
    docs.select(
      col(idCol),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"),
      size(split(col(textCol), "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")).as("n_subword_splits"),
      length(col(textCol)).as("n_chars"))
  }

  /** Quality score: length, punctuation ratio, stopword ratio, mean token
    * length — the standard cheap heuristics for corpus filtering. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokenize(col(textCol))
    val nChars = length(col(textCol))
    val punct = nChars - length(regexp_replace(col(textCol), "[^a-zA-Z0-9\\s]", ""))
    docs.select(
      col(idCol),
      nChars.as("n_chars"),
      (punct.cast("double") / nChars.cast("double")).as("punct_ratio"),
      TextFunctions.stopwordRatio(col(textCol)).as("stopword_ratio"),
      ((nChars - size(toks) + 1).cast("double") / size(toks).cast("double"))
        .as("mean_token_len"))
      .withColumn("quality",
        when(col("n_chars") >= 50 && col("punct_ratio") < 0.2 &&
          col("mean_token_len") >= 3 && col("mean_token_len") <= 12, 1.0)
          .otherwise(0.0))
  }

  /** Deterministic language ID via stopword-profile hit ratios. The
    * reference's cybozu langdetect is seed-nondeterministic (SURVEY.md M1)
    * — replaced by an order-fixed argmax over per-language stopword
    * profiles; ties resolve by profile order. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "los", "las", "es", "un", "una", "y"))

  def detectLanguage(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokenize(col(textCol))
    val hits = langProfiles.map { case (lang, words) =>
      (lang, size(filter(toks, t => array_contains(lit(words.toArray), t))))
    }
    // first profile with the max hit count; 'und' (undetermined) if none hit
    val maxHits = greatest(hits.map(_._2): _*)
    val detected = hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === maxHits && maxHits > 0, lang).otherwise(acc)
    }
    // foldRight means earlier profiles overwrite later ones on ties
    docs.select(col(idCol), detected.as("detected_lang"))
  }

  /** Document fingerprint: md5 plus a 15-hex-digit numeric fingerprint
    * (engine-portable); the rolling-hash variant lives in
    * [[TextFunctions.fingerprint]]. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      md5(col(textCol)).as("md5"),
      TextFunctions.fingerprint(col(textCol)).as("fingerprint64"))
}
