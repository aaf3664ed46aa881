package graft.functions

import graft.functions.{TextFunctions => TF}
import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The per-row repetition expression must be field-for-field (bit-level)
  * equal to the relational `TextOps.repetitionMetrics` the q33 oracle pins —
  * same tokenizer (split keeps trailing empties), same bigram join, same
  * round-half-up fractions, same null shape for sub-2-token docs — and stay
  * inside WholeStageCodegen (it runs per admitted row in the stream). */
class RepetitionStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bit-identical to the relational repetitionMetrics on a mixed corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("a", "b", "cat", "dog", "the", "統計")
    val randomDocs = Seq.tabulate(300) { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }
    val edgeDocs = Seq(
      (1000L, ""),               // split("") = [""] — one empty token
      (1001L, "solo"),           // 1 token, no bigrams → nulls
      (1002L, "x x"),            // minimal bigram, frac 1.0
      (1003L, "a  b"),           // double space → empty middle token
      (1004L, "a b "),           // trailing space → trailing empty token
      (1005L, "t t t t t t t t"))
    val docs = (randomDocs ++ edgeDocs).toDF("doc_id", "text")
    val batch = TextOps.repetitionMetrics(docs, "doc_id", "text")
    val perRow = docs.select($"doc_id",
      TF.repetition_stats($"text").as("r"))
      .select($"doc_id", $"r.n_tokens", $"r.top_token_frac",
        $"r.n_bigrams", $"r.top_bigram_frac")
    // bit-level: compare string renderings (catches 0.1 vs 0.100000 drift
    // in double bits, and null-vs-value) via an except in both directions
    def norm(df: org.apache.spark.sql.DataFrame) = df.select(
      $"doc_id", $"n_tokens",
      $"top_token_frac".cast("string").as("ttf"),
      $"n_bigrams", $"top_bigram_frac".cast("string").as("tbf"))
    assert(norm(perRow).except(norm(batch.select(perRow.columns.map(col): _*))).isEmpty)
    assert(norm(batch.select(perRow.columns.map(col): _*)).except(norm(perRow)).isEmpty)
    assert(perRow.count() == docs.count())
  }

  test("stays inside WholeStageCodegen and drives the same verdict as repetition_ok") {
    val docs = Seq(
      (1L, "a b a b c d e f g h i j k l m n o p q r"), // bigram "a b" ×2/19 > 0.08
      (2L, "x x x x x x"),                              // top token 1.0
      (3L, "the quick brown fox jumps over a lazy dog while many " +
        "other animals watch from that tall green hill nearby")) // passes both
      .toDF("doc_id", "text")
    val q = docs
      .withColumn("r", TF.repetition_stats($"text"))
      .filter($"r.top_token_frac" <= 0.12 &&
        ($"r.top_bigram_frac".isNull || $"r.top_bigram_frac" <= 0.08))
    // codegen asserted on a range-derived input (literal rows constant-fold
    // to a LocalTableScan before any physical Filter exists)
    val cgPlan = spark.range(4)
      .select(concat(lit("w x y z w x "), $"id").as("text"))
      .filter(TF.repetition_stats($"text").getField("top_token_frac") <= 0.5)
      .queryExecution.executedPlan.toString
    assert(cgPlan.contains("*(1) Filter"), cgPlan)
    val kept = q.select("doc_id").as[Long].collect().toSet
    val batchOk = TextOps.repetitionMetrics(docs, "doc_id", "text")
      .filter($"repetition_ok" === 1).select("doc_id").as[Long].collect().toSet
    assert(kept == batchOk)
  }

  test("SQL registration: repetition_stats callable from spark.sql") {
    TextFunctions.registerAll(spark)
    val r = spark.sql("SELECT repetition_stats('x x x').top_token_frac AS f")
      .head().getDouble(0)
    assert(r == 1.0)
  }
}
