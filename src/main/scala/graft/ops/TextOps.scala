package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language-ID
  * heuristics, quality scoring, token counting, rolling-hash document
  * fingerprinting. Pure column programs (codegen'd, no UDFs) — every
  * operator is a narrow projection over the corpus except the explicit
  * rollups.
  */
object TextOps {

  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is",
    "on", "for", "with", "as", "by", "at", "an", "or")

  private def toks(textCol: String): Column = split(col(textCol), " ")

  /** Stopword-ratio language scoring: appends n_tokens, n_stop, stop_ratio
    * and a pred_en flag (ratio ≥ threshold). */
  def langIdEn(df: DataFrame, textCol: String, threshold: Double = 0.08,
      stopwords: Seq[String] = EnStopwords): DataFrame = {
    val stopList = stopwords.map(s => s"'$s'").mkString(", ")
    df.withColumn("n_tokens", size(toks(textCol)).cast("long"))
      .withColumn("n_stop",
        expr(s"size(filter(split($textCol, ' '), t -> t in ($stopList)))").cast("long"))
      .withColumn("stop_ratio",
        round(col("n_stop").cast("double") / col("n_tokens").cast("double"), 6))
      .withColumn("pred_en", (col("stop_ratio") >= threshold).cast("int"))
  }

  /** Length/diversity quality metrics + a boolean gate. */
  def qualityMetrics(df: DataFrame, textCol: String, nCharsCol: String,
      minTokens: Int = 10, minDistinctRatio: Double = 0.3): DataFrame =
    df.withColumn("n_tokens", size(toks(textCol)).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks(textCol))).cast("long"))
      .withColumn("distinct_ratio",
        round(col("n_distinct").cast("double") / col("n_tokens").cast("double"), 6))
      .withColumn("avg_token_len",
        round((col(nCharsCol) - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens").cast("double"), 6))
      .withColumn("quality_ok",
        (col("n_tokens") >= minTokens && col("distinct_ratio") >= minDistinctRatio).cast("int"))

  /** Whitespace token count per row (cheap BPE-free budget estimator). */
  def tokenCount(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", size(toks(textCol)).cast("long"))

  /** BPE-ish subword-budget estimator: counts maximal runs of letters,
    * digits, and other-symbol spans (the word-level pre-split every BPE
    * tokenizer applies before merges) — a closer proxy for LLM token cost
    * than whitespace counting. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]+"
  def bpeTokenCount(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_bpe_tokens",
      size(expr(s"regexp_extract_all($textCol, '$BpePattern', 0)")).cast("long"))

  /** Corpus token totals grouped by the given dimensions. */
  def tokenRollup(df: DataFrame, textCol: String, nCharsCol: String,
      dims: String*): DataFrame =
    tokenCount(df, textCol)
      .groupBy(dims.map(col): _*)
      .agg(sum("n_tokens").as("tokens"), count(lit(1)).as("docs"),
        sum(nCharsCol).as("chars"))

  /** Winnowing-style fingerprint: minimum polynomial hash over character
    * 8-grams (integer math only — portable across engines). Computed by a
    * codegen'd native expression ([[graft.functions.TextFingerprint]]);
    * the equivalent SQL HOF formulation runs ~100× slower interpreted. */
  def fingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp", graft.functions.TextFunctions.text_fingerprint(col(textCol)))
}
