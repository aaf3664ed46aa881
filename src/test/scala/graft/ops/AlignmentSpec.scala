package graft.ops

import graft.functions.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CLIP-score-style pair alignment ([[Multimodal.alignmentScore]] /
  * [[Multimodal.alignmentGate]]): exact cosine values on closed-form
  * vectors, the null-not-NaN contract for every unscorable shape (null /
  * mismatched / zero-norm embeddings), the gate's exact partition of its
  * input, and the scale shape — the score is a pure projection that stays
  * inside WholeStageCodegen. */
class AlignmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scored(rows: Seq[(Long, Seq[Double], Seq[Double])]) =
    rows.toDF("id", "ie", "ce")
      .withColumn("a", Multimodal.alignmentScore($"ie", $"ce"))

  test("exact cosine on closed-form vectors") {
    val df = scored(Seq(
      (1L, Seq(1.0, 0.0), Seq(1.0, 0.0)),   // identical direction → 1
      (2L, Seq(1.0, 0.0), Seq(0.0, 1.0)),   // orthogonal → 0
      (3L, Seq(3.0, 4.0), Seq(4.0, 3.0)),   // 24/25 → 0.96, exact dyadic-free
      (4L, Seq(1.0, 2.0), Seq(-1.0, -2.0)), // opposite → -1
      (5L, Seq(2.0, 0.0), Seq(5.0, 0.0))))  // scale-invariant → 1
    val got = df.orderBy("id").select("a").as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0, 0.96, -1.0, 1.0), got.toString)
  }

  test("unscorable shapes are NULL, never NaN (the >=-gate contract)") {
    val base = Seq(
      (1L, Seq(1.0, 2.0), Seq(1.0, 2.0)), // fine
      (2L, Seq(1.0, 2.0), Seq(1.0)),      // length mismatch
      (3L, Seq(0.0, 0.0), Seq(1.0, 2.0)), // zero-norm image side
      (4L, Seq(1.0, 2.0), Seq(0.0, 0.0))) // zero-norm caption side
      .toDF("id", "ie", "ce")
    val nullCe = Seq(5L).toDF("id")
      .withColumn("ie", typedLit(Seq(1.0, 2.0)))
      .withColumn("ce", lit(null).cast("array<double>"))
    val df = base.unionByName(nullCe)
      .withColumn("a", Multimodal.alignmentScore($"ie", $"ce"))
    assert(df.filter(isnan($"a")).count() == 0)
    assert(df.filter($"a".isNull).select("id").as[Long].collect().toSet ==
      Set(2L, 3L, 4L, 5L))
    // and a null score fails the gate instead of passing a NaN through it
    val (kept, audit) = Multimodal.alignmentGate(df.drop("a"), "ie", "ce", -10.0)
    assert(kept.select("id").as[Long].collect().toSet == Set(1L))
    assert(audit.select("id").as[Long].collect().toSet == Set(2L, 3L, 4L, 5L))
  }

  test("±Infinity embeddings score NULL and land in the audit, not kept") {
    // ∞ passes the `norm > 0` guard but scores NaN (∞/∞) — and Spark
    // orders NaN ABOVE every real value, so without the isnan fold a NaN
    // score would pass `>= minScore` into the KEPT side
    val df = Seq(
      (1L, Seq(1.0, 0.0), Seq(1.0, 0.0)),                        // fine → 1.0
      (2L, Seq(Double.PositiveInfinity, 0.0), Seq(1.0, 0.0)),    // ∞ norm
      (3L, Seq(1.0, Double.NegativeInfinity), Seq(0.5, 2.0)))    // mixed ∞
      .toDF("id", "ie", "ce")
    val s = df.withColumn("a", Multimodal.alignmentScore($"ie", $"ce"))
    assert(s.filter(isnan($"a")).count() == 0)
    assert(s.filter($"a".isNull).select("id").as[Long].collect().toSet ==
      Set(2L, 3L))
    val (kept, audit) = Multimodal.alignmentGate(df, "ie", "ce", 0.5)
    assert(kept.select("id").as[Long].collect().toSet == Set(1L))
    assert(audit.select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("gate partitions the input exactly at the threshold") {
    val df = scored(Seq(
      (1L, Seq(1.0, 0.0), Seq(1.0, 0.0)),    // 1.0   → kept
      (2L, Seq(3.0, 4.0), Seq(4.0, 3.0)),    // 0.96  → kept (boundary below)
      (3L, Seq(1.0, 0.0), Seq(0.0, 1.0)),    // 0.0   → dropped
      (4L, Seq(1.0, 2.0), Seq(-1.0, -2.0)))) // -1.0  → dropped
      .drop("a")
    val (kept, audit) = Multimodal.alignmentGate(df, "ie", "ce", 0.96)
    assert(kept.select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(audit.select("id").as[Long].collect().toSet == Set(3L, 4L))
    assert(kept.count() + audit.count() == df.count())
    // the audit carries the score for the drop ledger
    assert(audit.columns.contains("alignment"))
  }

  test("float embeddings cast through; scoring stays inside WholeStageCodegen") {
    // join-free scan→project so the codegen span is assertable pre-AQE
    // (the paired-join shape is the q57 oracle's job); self-alignment
    // must round to exactly 1.0 through the float→double cast
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = e.select($"vec_id",
      Multimodal.alignmentScore($"embedding", $"embedding").as("a"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("array_dot"), plan)
    val n = df.count()
    assert(n > 0 && df.filter($"a" === 1.0).count() == n)

    // and the q57 pairing shape delivers a full column of valid scores
    val pairs = e.filter(pmod($"vec_id", lit(2)) === 0)
      .select(($"vec_id" / 2).cast("long").as("pair_id"), $"embedding".as("ie"))
      .join(e.filter(pmod($"vec_id", lit(2)) === 1)
        .select((($"vec_id" - 1) / 2).cast("long").as("pair_id"),
          $"embedding".as("ce")), Seq("pair_id"))
      .select(Multimodal.alignmentScore($"ie", $"ce").as("a"))
    val m = pairs.count()
    assert(m > 0 && pairs.filter($"a".isNotNull && $"a" >= -1.0 && $"a" <= 1.0)
      .count() == m)
  }
}
