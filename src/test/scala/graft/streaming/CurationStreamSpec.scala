package graft.streaming

import graft.functions.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming curation: content dedup holds across micro-batches (bounded by
  * the watermark), quality gates — including the stateless per-row Gopher
  * repetition gate — drop degenerate docs, PII is redacted in the admitted
  * stream. */
class CurationStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def doc(id: Long, text: String, src: String, tSec: Int) =
    DocEvent(id, text, src, new Timestamp(tSec * 1000L))

  // 20 tokens, "the" ×2 (top_token_frac 0.1), 19 distinct bigrams
  // (top_bigram_frac 1/19 ≈ 0.053) — passes every gate
  private val good = "the quick brown fox jumps over a lazy dog while many " +
    "other animals watch from the tall green hill nearby"

  test("dedup across batches, quality gating, and redaction in one pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val out = CurationStream.curate(in.toDS(), watermarkDelay = "1 hour",
      minTokens = 5, minDistinctRatio = 0.5)
    val q = out.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      in.addData(
        doc(1, good, "a", 0),
        doc(2, good, "b", 1),                 // same content, different id → dup
        doc(3, "spam spam spam spam spam spam", "c", 2), // distinct_ratio 1/6
        doc(4, "too short", "d", 3))          // 2 tokens < minTokens
      q.processAllAvailable()
      in.addData(
        doc(5, good, "e", 10),                // re-discovery in batch 2 → dup
        doc(6, "please mail admin@ops.example the full quarterly report " +
          "with all updated revenue figures before friday noon thanks team", "f", 11))
      q.processAllAvailable()

      val rows = spark.table("curated")
        .select("doc_id", "redacted", "n_emails").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      // exactly ONE representative of the duplicated content is admitted
      // (within a micro-batch the survivor is arbitrary — the contract is
      // one-per-fingerprint, and batch-2's re-discovery (doc 5) must be
      // dropped by the carried state); 3 and 4 fail the quality gates
      val ids = rows.map(_._1).toSet
      assert(rows.length == 2 && ids.contains(6L) && ids.exists(Set(1L, 2L)),
        s"admitted $ids")
      assert(!ids.contains(5L), "cross-batch duplicate not dropped")
      val r6 = rows.find(_._1 == 6L).get
      assert(r6._2 == "please mail <EMAIL> the full quarterly report " +
        "with all updated revenue figures before friday noon thanks team")
      assert(r6._3 == 1L)
      assert(rows.find(r => Set(1L, 2L)(r._1)).get._3 == 0L)
    } finally q.stop()
  }

  test("repetition gate drops boilerplate in-stream that the other gates pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val out = CurationStream.curate(in.toDS(), watermarkDelay = "1 hour",
      minTokens = 5, minDistinctRatio = 0.5)
    val q = out.writeStream.format("memory").queryName("curated_rep")
      .outputMode("append").start()
    try {
      // 20 tokens, 18 distinct (ratio 0.9 ≥ 0.5), top token 2/20 = 0.1 ≤
      // 0.12 — but the repeated BIGRAM "alpha beta" is 2/19 ≈ 0.105 > 0.08:
      // only the repetition gate can catch this doc
      val bigramBoiler = "alpha beta alpha beta one two three four five six " +
        "seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen"
      // 20 tokens, "buy" ×4 = 0.2 > 0.12 top-token cap; distinct 17/20 = 0.85
      val tokenBoiler = "buy now buy cheap buy fast buy today best offer " +
        "great deal limited time only act soon please friend"
      // t >= 1: an event at exactly the initial watermark (epoch 0) is
      // dropped as late by dropDuplicatesWithinWatermark before any gate
      in.addData(
        doc(1, good, "a", 10),
        doc(2, bigramBoiler, "b", 11),
        doc(3, tokenBoiler, "c", 12))
      q.processAllAvailable()
      val ids = spark.table("curated_rep").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L), s"admitted $ids")
      // the admitted row carries the per-row stats the gate decided on
      val r = spark.table("curated_rep")
        .select("top_token_frac", "top_bigram_frac").head()
      assert(r.getDouble(0) == 0.1 && r.getDouble(1) < 0.08)
    } finally q.stop()
  }
}
