package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Text-analysis operators for the training-data pipeline, over a
 * `documents(doc_id, text, lang, ...)`-shaped table. All built-in Column
 * expressions (whole-stage codegen) except the sketch functions, which are
 * codegen StaticInvoke shims — no Scala UDF closures anywhere.
 */
object TextAnalysis {

  /** Tiny per-language stopword lexicons for the n-gram/stopword language-ID
    * heuristic. Deliberately small — language ID at crawl scale is a
    * lexicon-hit-ratio problem, and the operator shape (map-only, broadcast
    * lexicon) is what matters. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "dans", "que", "pour", "une"),
    "it" -> Seq("il", "la", "di", "che", "e", "per", "con", "del", "una", "sono"))

  private def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{Nd}]+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-count estimate: letter runs count ceil(len/4) tokens,
    * digits and punctuation 1 each — the shape of a GPT-style tokenizer
    * budget without a merges table. */
  def tokenCountBpe(text: Column): Column =
    aggregate(
      transform(regexp_extract_all(text, lit("[\\p{L}]+|[0-9]|[^\\p{L}0-9\\s]"), lit(0)),
        t => when(t.rlike("^[\\p{L}]+$"), ceil(length(t) / 4.0).cast("long")).otherwise(lit(1L))),
      lit(0L), (acc, x) => acc + x)

  private def hitRatio(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang).map(lit(_)): _*))) /
      greatest(size(toks), lit(1)).cast("double")

  /** Language ID: argmax stopword-hit ratio; CJK-codepoint presence short-
    * circuits to zh; "und" (undetermined) when no lexicon scores. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwords.keys.toSeq.sorted.map { l =>
      struct(hitRatio(toks, l).as("score"), lit(l).as("lang"))
    }
    val best = greatest(scored: _*)
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise("und")
  }

  /** Quality metrics + composite score in [0,1]: length band, token shape,
    * punctuation/digit load, stopword presence — the standard crawl-quality
    * heuristics (C4/Gopher-style rules) as pure SQL expressions. */
  def withQuality(docs: DataFrame, text: Column = col("text")): DataFrame = {
    val len = length(text)
    val nTok = tokenCountWs(text)
    val meanTokLen = (length(regexp_replace(text, "\\s+", "")) /
      greatest(nTok, lit(1)).cast("double"))
    val punctRatio = (len - length(regexp_replace(text, "[\\p{Punct}]", ""))) /
      greatest(len, lit(1)).cast("double")
    val digitRatio = (len - length(regexp_replace(text, "[0-9]", ""))) /
      greatest(len, lit(1)).cast("double")
    val enStop = hitRatio(tokens(text), "en")
    val lengthScore = least(nTok / lit(20.0), lit(1.0))
    val tokShapeScore = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.3)
    val score = greatest(lit(0.0), least(lit(1.0),
      lengthScore * 0.4 + tokShapeScore * 0.2 +
        (lit(1.0) - least(punctRatio * 5.0, lit(1.0))) * 0.2 +
        (lit(1.0) - least(digitRatio * 5.0, lit(1.0))) * 0.1 +
        least(enStop * 5.0, lit(1.0)) * 0.1))
    docs.withColumn("n_chars_m", len)
      .withColumn("n_tokens", nTok)
      .withColumn("mean_token_len", meanTokLen)
      .withColumn("punct_ratio", punctRatio)
      .withColumn("digit_ratio", digitRatio)
      .withColumn("stopword_ratio", enStop)
      .withColumn("quality_score", score)
  }

  /** Content fingerprints: fast 64-bit xxhash + winnowing fingerprint (robust
    * to local edits) + simhash. */
  def withFingerprints(docs: DataFrame, text: Column = col("text")): DataFrame =
    docs.withColumn("xxh64", xxhash64(text))
      .withColumn("winnow_fp", TextFunctions.winnow(text, lit(8), lit(16)))
      .withColumn("simhash", TextFunctions.simhash(text))
}
