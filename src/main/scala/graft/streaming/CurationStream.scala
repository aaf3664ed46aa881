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
  * gates and PII redaction.
  *
  * Everything after the dedup is STATELESS on purpose: the batch engine's
  * `repetitionMetrics` is two grouped aggregations, which in a stream would
  * hold per-document aggregation state — so the streaming gates use only
  * per-row column programs (token counts, distinct ratio, stopword ratio,
  * regex redaction), all append-mode-safe and shuffle-free.
  */
object CurationStream {

  def curate(docs: Dataset[DocEvent],
      watermarkDelay: String = "1 hour",
      minTokens: Int = 5,
      minDistinctRatio: Double = 0.3): DataFrame = {
    val deduped = docs.toDF()
      .withWatermark("eventTime", watermarkDelay)
      .withColumn("fingerprint", md5(col("text")))
      .dropDuplicatesWithinWatermark("fingerprint")
    val toks = split(col("text"), " ")
    TextOps.piiRedact(
      deduped
        .withColumn("n_tokens", size(toks).cast("long"))
        .withColumn("distinct_ratio",
          size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
        .filter(col("n_tokens") >= minTokens &&
          col("distinct_ratio") >= minDistinctRatio),
      "text")
      .select("doc_id", "source", "eventTime", "fingerprint",
        "n_tokens", "distinct_ratio", "n_emails", "n_phones", "n_ips", "redacted")
  }
}
