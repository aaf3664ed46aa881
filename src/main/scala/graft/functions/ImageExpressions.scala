package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}
import org.apache.spark.sql.types._

/** Native Catalyst expressions over the binary image column of the payload
  * table (`input_hint` schema) — codegen'd static calls into
  * [[ImageKernels]], same pattern as the URL expression family.
  */
trait BinaryInputCheck { self: Expression =>
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = self.children.filterNot(_.dataType == BinaryType)
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires BINARY arguments, got " +
        bad.map(_.dataType.catalogString).mkString(", "))
  }
}

/** 64-bit perceptual hash of encoded image bytes (dedup key — C8). */
case class PHash64(child: Expression) extends UnaryExpression with BinaryInputCheck {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "phash64"
  override protected def nullSafeEval(input: Any): Any =
    ImageKernels.phash64(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageKernels.phash64($c)")
  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}

/** Decoded-pixel PSNR (dB) between two encoded images (the ≥ 40 dB lossy
  * invariant from BASELINE.json `input_hint`). */
case class ImagePsnr(left: Expression, right: Expression)
    extends BinaryExpression with BinaryInputCheck {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "image_psnr"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ImageKernels.psnr(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ImageKernels.psnr($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ImagePsnr =
    copy(left = l, right = r)
}

/** Magic-byte container sniff (png/jpeg/gif/webp/tiff/bmp/unknown) — reads
  * ≤ 12 bytes of the payload, never decodes. The primitive behind the
  * fmt-vs-bytes consistency gate: the payload table's `fmt` column is
  * server-supplied and untrusted at crawl scale. */
case class SniffImageFormat(child: Expression)
    extends UnaryExpression with BinaryInputCheck {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sniff_image_format"
  override protected def nullSafeEval(input: Any): Any =
    ImageKernels.sniffFormat(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageKernels.sniffFormat($c)")
  override protected def withNewChildInternal(newChild: Expression): SniffImageFormat =
    copy(child = newChild)
}

/** One-decode luma statistics as a codegen'd column — the streaming-safe /
  * pure-column counterpart of [[graft.ops.Multimodal.imageQuality]]'s typed
  * path. Both delegate to [[ImageKernels.lumaStats]], so the two cannot
  * diverge (field definitions pinned by the q47 closed-form oracle). */
case class ImageStats(child: Expression)
    extends UnaryExpression with BinaryInputCheck {
  override def dataType: DataType = StructType(Seq(
    StructField("decodable", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("aspect", DoubleType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false),
    StructField("stddev_luma", DoubleType, nullable = false),
    StructField("entropy_bits", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "image_stats"
  override protected def nullSafeEval(input: Any): Any =
    ImageKernels.imageStatsRow(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageKernels.imageStatsRow($c)")
  override protected def withNewChildInternal(newChild: Expression): ImageStats =
    copy(child = newChild)
}

/** Combined perceptual hash + luma statistics from ONE decode — the
  * expression a writeback/curation pipeline wants when it needs both the
  * dedup key and the quality gates (separate `phash64` + `image_stats`
  * calls decode twice; the payload decode dominates the image hot path,
  * see BENCH.md). Field-for-field equal to the standalone expressions —
  * all three delegate to the same kernels. */
case class ImageSig(child: Expression)
    extends UnaryExpression with BinaryInputCheck {
  override def dataType: DataType = StructType(Seq(
    StructField("phash", LongType, nullable = false),
    StructField("decodable", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("aspect", DoubleType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false),
    StructField("stddev_luma", DoubleType, nullable = false),
    StructField("entropy_bits", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "image_sig"
  override protected def nullSafeEval(input: Any): Any =
    ImageKernels.imageSigRow(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageKernels.imageSigRow($c)")
  override protected def withNewChildInternal(newChild: Expression): ImageSig =
    copy(child = newChild)
}

object ImageFunctions {
  def phash64(c: Column): Column = CB.column(PHash64(CB.expression(c)))
  def image_psnr(a: Column, b: Column): Column =
    CB.column(ImagePsnr(CB.expression(a), CB.expression(b)))
  def sniff_image_format(c: Column): Column =
    CB.column(SniffImageFormat(CB.expression(c)))
  def image_stats(c: Column): Column = CB.column(ImageStats(CB.expression(c)))
  def image_sig(c: Column): Column = CB.column(ImageSig(CB.expression(c)))

  def registerAll(spark: SparkSession): Unit =
    FunctionTable.register(spark, FunctionTable.byName(
      "phash64", "image_psnr", "sniff_image_format", "image_stats", "image_sig"))
}
