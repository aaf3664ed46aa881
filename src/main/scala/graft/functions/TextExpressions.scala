package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object TextKernels {

  /** Winnowing-style document fingerprint: minimum polynomial hash over
    * character 8-grams — semantically identical to the SQL formulation
    *   array_min(transform(sequence(1, greatest(len-7, 1)),
    *     i -> aggregate(sequence(0,7), 0L, (acc,k) -> acc*31 + ascii(substr(s,i+k,1)))))
    * (characters past the end contribute 0, matching `ascii('') = 0`), but
    * runs as one JIT-compiled pass instead of per-position interpreted
    * higher-order-function lambdas — ~100× faster on long documents.
    */
  def rollingFingerprint(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    val positions = math.max(n - 7, 1)
    var minH = Long.MaxValue
    var i = 0
    while (i < positions) {
      var h = 0L
      var k = 0
      while (k < 8) {
        val c = if (i + k < n) str.charAt(i + k).toLong else 0L
        h = h * 31L + c
        k += 1
      }
      if (h < minH) minH = h
      i += 1
    }
    minH
  }
}

/** Codegen'd native expression for the document fingerprint (SURVEY.md
  * §2.10 pattern: custom Expression > interpreted HOFs > UDF). */
case class TextFingerprint(child: Expression)
    extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.rollingFingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.rollingFingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): TextFingerprint =
    copy(child = newChild)
}

object RepetitionKernels {

  private def round6(v: Double): Double =
    // Spark's Round(double, 6): BigDecimal.valueOf + HALF_UP — matched
    // exactly so the per-row stats are bit-identical to the relational
    // TextOps.repetitionMetrics the q33 oracle pins
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Per-row Gopher repetition stats over one document, matching
    * [[graft.ops.TextOps.repetitionMetrics]] field-for-field:
    * `split(text, ' ')` tokenization (trailing empties kept, like Spark's
    * `split` with limit -1), adjacent word bigrams joined with a space,
    * fractions rounded like `round(x, 6)`. One linear pass with a hash map
    * per side — the batch path's two grouped aggregations are the right
    * shape for a relational engine, but a STREAM needs a stateless per-row
    * verdict, and a row's own token histogram is driver-free O(len). */
  def stats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toString.split(" ", -1)
    val nTok = toks.length
    val tokCounts = new java.util.HashMap[String, Int](nTok * 2)
    var topTok = 0
    var i = 0
    while (i < nTok) {
      val c = tokCounts.merge(toks(i), 1, (a, b) => a + b)
      if (c > topTok) topTok = c
      i += 1
    }
    val tokFrac = round6(topTok.toDouble / nTok.toDouble)
    if (nTok < 2)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](nTok.toLong, tokFrac, null, null))
    else {
      val nBg = nTok - 1
      val bgCounts = new java.util.HashMap[String, Int](nBg * 2)
      var topBg = 0
      i = 0
      while (i < nBg) {
        val c = bgCounts.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
        if (c > topBg) topBg = c
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](nTok.toLong, tokFrac, nBg.toLong,
          round6(topBg.toDouble / nBg.toDouble)))
    }
  }
}

/** Codegen'd per-row repetition stats — the streaming-safe counterpart of
  * the batch `repetitionMetrics` relational program. Returns
  * `struct<n_tokens, top_token_frac, n_bigrams, top_bigram_frac>` (bigram
  * fields null for sub-2-token docs, like the batch left join). Stateless
  * per row, so `CurationStream` can run the Gopher repetition gate in
  * append mode with zero keyed state. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top_token_frac", DoubleType, nullable = false),
    StructField("n_bigrams", LongType, nullable = true),
    StructField("top_bigram_frac", DoubleType, nullable = true)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"
  override protected def nullSafeEval(input: Any): Any =
    RepetitionKernels.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionKernels.stats($c)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object CompressionKernels {
  /** DEFLATE size over raw UTF-8 size — the compression-ratio quality
    * signal of web-corpus pipelines (RedPajama-v2's
    * `ccnet_compression_ratio` class of filters): boilerplate and
    * character-level repetition compress far below normal prose, random
    * or base64-ish payloads barely compress at all, and BOTH tails are
    * junk for training. Catches what token-level repetition stats cannot
    * see (repeats inside one long token, byte-level patterns).
    *
    * Raw DEFLATE (nowrap, default level) on the UTF-8 bytes; empty text →
    * 1.0 (neutral — nothing to judge). The ratio is a heuristic gate
    * input, not a portable constant: zlib output can differ across JDK
    * builds by a few bytes, so specs (and any oracle) pin BANDS, never
    * exact values. One linear pass per row, no allocation proportional to
    * corpus size. */
  // one native Deflater per executor thread, reset() per row: allocating
  // and end()-ing a native zlib stream per document would dominate the
  // deflate work itself on short web docs (this runs once per row of the
  // text-curation hot path). reset() restores the initial stream state, so
  // the emitted bytes are identical to a fresh Deflater's.
  private val deflaters =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue() = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    }

  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n.toDouble / bytes.length
  }
}

/** Codegen'd compression-ratio signal (see [[CompressionKernels.ratio]]). */
case class CompressionRatio(child: Expression)
    extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "compression_ratio"
  override protected def nullSafeEval(input: Any): Any =
    CompressionKernels.ratio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressionKernels.ratio($c)")
  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
}

object TextFunctions {
  def text_fingerprint(c: Column): Column = CB.column(TextFingerprint(CB.expression(c)))
  def repetition_stats(c: Column): Column = CB.column(RepetitionStats(CB.expression(c)))
  def compression_ratio(c: Column): Column = CB.column(CompressionRatio(CB.expression(c)))

  def registerAll(spark: SparkSession): Unit =
    FunctionTable.register(spark, FunctionTable.byName(
      "text_fingerprint", "repetition_stats", "compression_ratio"))
}
