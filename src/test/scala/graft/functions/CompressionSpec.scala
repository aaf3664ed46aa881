package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `compression_ratio` — DEFLATE bytes over raw UTF-8 bytes, the
  * RedPajama-v2-class byte-level quality signal. zlib output is not a
  * portable constant (a few bytes of drift across JDK builds), so every
  * assertion pins BANDS and orderings, never exact values.
  */
class CompressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic "incompressible-ish" text: LCG-driven printable chars
  private def noise(n: Int): String = {
    var x = 88172645463325252L
    val sb = new StringBuilder
    while (sb.length < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      sb.append((33 + (math.abs(x) % 94)).toChar)
    }
    sb.toString
  }
  private val prose =
    "the quick brown fox jumps over the lazy dog while a crawler fetches " +
    "pages politely and writes image caption pairs into a snapshot table " +
    "for training data curation at considerable scale"

  test("bands: repetition compresses hard, noise barely, prose in between") {
    val r = CompressionKernels.ratio _
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val rep = r(u("spam " * 400))
    val pro = r(u(prose))
    val noi = r(u(noise(1000)))
    assert(rep < 0.05, s"repetitive ratio $rep")
    assert(noi > 0.6, s"noise ratio $noi")
    assert(pro > 0.3 && pro < 0.9, s"prose ratio $pro")
    assert(rep < pro && pro < noi)
    // single-token character repetition — invisible to token-level
    // repetition stats (one token, no bigrams), caught here
    assert(r(u("ab" * 800)) < 0.05)
    assert(r(u("")) == 1.0)
  }

  test("column expression: null-safe, SQL-registered, inside WholeStageCodegen") {
    val rows = Seq((1L, "spam " * 400), (2L, noise(1000)),
        (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select($"id", TextFunctions.compression_ratio($"text").as("cr"))
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getDouble(1) < 0.05)
    assert(rows(1).getDouble(1) > 0.6)
    assert(rows(2).isNullAt(1))

    TextFunctions.registerAll(spark)
    assert(spark.sql("SELECT compression_ratio('aaaaaaaaaaaaaaaaaaaaaaaa')")
      .head().getDouble(0) < 0.6)

    val cgPlan = spark.range(4)
      .select(concat(lit("body "), $"id".cast("string")).as("t"))
      .filter(TextFunctions.compression_ratio($"t") > 0.0)
      .queryExecution.executedPlan.toString
    assert(cgPlan.contains("*(1) Filter"), cgPlan)
  }
}
