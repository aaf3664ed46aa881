package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming document-ingest event (a crawled page's extracted text). */
final case class DocEvent(
    doc_id: Long,
    text: String,
    source: String,
    eventTime: java.sql.Timestamp)

/** Streaming counterpart of the batch curation stages — the shape that
  * runs against a Kafka ingest topic: content dedup with BOUNDED keyed
  * state (`dropDuplicatesWithinWatermark` on the md5 content fingerprint —
  * re-crawls and mirror copies inside the watermark horizon are dropped;
  * the batch exact-dedup pass owns anything older), then per-row quality
  * gates — including the Gopher repetition gate — and PII redaction.
  *
  * Everything after the dedup is STATELESS on purpose: all gates are
  * per-row column programs (token counts, distinct ratio, stopword ratio,
  * repetition stats, regex redaction), append-mode-safe and shuffle-free.
  * The batch engine's `repetitionMetrics` is two grouped aggregations —
  * which in a stream would hold per-document aggregation state — so the
  * streaming gate instead computes the same per-document fractions through
  * the codegen'd [[graft.functions.RepetitionStats]] expression (one linear
  * pass over the row's own tokens; field-for-field equal to the batch
  * relational program, see RepetitionStatsSpec).
  */
object CurationStream {

  def curate(docs: Dataset[DocEvent],
      watermarkDelay: String = "1 hour",
      minTokens: Int = 5,
      minDistinctRatio: Double = 0.3,
      maxTopTokenFrac: Double = 0.12,
      maxTopBigramFrac: Double = 0.08): DataFrame = {
    val deduped = docs.toDF()
      .withWatermark("eventTime", watermarkDelay)
      .withColumn("fingerprint", md5(col("text")))
      .dropDuplicatesWithinWatermark("fingerprint")
    val toks = split(col("text"), " ")
    val gated = deduped
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("distinct_ratio",
        size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
      .withColumn("__rep", graft.functions.TextFunctions.repetition_stats(col("text")))
      .withColumn("top_token_frac", col("__rep.top_token_frac"))
      .withColumn("top_bigram_frac", col("__rep.top_bigram_frac"))
      .filter(col("n_tokens") >= minTokens &&
        col("distinct_ratio") >= minDistinctRatio &&
        // same verdict as the batch repetition_ok: sub-2-token docs have
        // no bigrams and pass the bigram gate (they fail minTokens anyway)
        col("top_token_frac") <= maxTopTokenFrac &&
        (col("top_bigram_frac").isNull || col("top_bigram_frac") <= maxTopBigramFrac))
      .drop("__rep")
    TextOps.piiRedact(gated, "text")
      .select("doc_id", "source", "eventTime", "fingerprint",
        "n_tokens", "distinct_ratio", "top_token_frac", "top_bigram_frac",
        "n_emails", "n_phones", "n_ips", "redacted")
  }
}
