package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
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

/** 64-bit difference hash (gradient-direction signature) — the second
  * perceptual signature ([[ImageKernels.dhashOf]]): pinned 9×8 integer
  * box-average resample + integer luma + left-to-right comparisons, fully
  * replayable by an external system (q60 oracle). Complements the DCT
  * phash: smooth gradients that collide in the phash's low-frequency block
  * separate here, so a conjunctive gate prunes false near-dup candidates
  * in signature space before any payload bytes ride a join. */
case class DHash64(child: Expression) extends UnaryExpression with BinaryInputCheck {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dhash64"
  override protected def nullSafeEval(input: Any): Any =
    ImageKernels.dhash64(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageKernels.dhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

/** Both perceptual signatures (phash + dhash) from ONE decode — the
  * `image_sig` discipline applied to the signature pair a conjunctive
  * near-dup candidate gate needs. Field-for-field equal to the standalone
  * expressions (all delegate to the same per-image kernels). */
case class ImageHashes(child: Expression)
    extends UnaryExpression with BinaryInputCheck {
  override def dataType: DataType = StructType(Seq(
    StructField("phash", LongType, nullable = false),
    StructField("dhash", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "image_hashes"
  override protected def nullSafeEval(input: Any): Any =
    ImageKernels.imageHashesRow(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageKernels.imageHashesRow($c)")
  override protected def withNewChildInternal(newChild: Expression): ImageHashes =
    copy(child = newChild)
}

/** All 8 dihedral-orientation phashes from ONE decode
  * ([[ImageKernels.phashOrientationsRow]]), in [[ImageKernels.orientOf]]'s
  * k-order — element 0 is the plain `phash64`. This is the NEAR-dup
  * signature set for orientation-robust candidate generation: explode and
  * hamming-join the elements (see `Multimodal.verifiedOrientationDup`) —
  * the min element alone ([[PHashCanonical64]]) is exact for LOSSLESS
  * re-posts but unstable under lossy perturbation (a re-encode can flip
  * which orientation is the numeric min, landing two near-identical
  * images on uncorrelated hashes). Undecodable → 8 zeros. */
case class PhashOrientations(child: Expression)
    extends UnaryExpression with BinaryInputCheck {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "phash_orientations"
  override protected def nullSafeEval(input: Any): Any =
    ImageKernels.phashOrientationsRow(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageKernels.phashOrientationsRow($c)")
  override protected def withNewChildInternal(newChild: Expression): PhashOrientations =
    copy(child = newChild)
}

/** Orientation-canonical perceptual hash
  * ([[ImageKernels.phashCanonicalOf]]): the MIN of the 8 dihedral
  * orientation phashes, computed from ONE decode (one bulk pixel grab +
  * 8 index-arithmetic resamples — NOT DCT coefficient surgery, which the
  * kernel documents as inexact under the floor resample grid). Exactly
  * invariant for lossless orientation re-posts, so they groupBy-collapse
  * on this value; for LOSSY near-dups use [[PhashOrientations]]'s full
  * set as the candidate signature (min-selection is unstable under
  * perturbation). Undecodable → 0L (the `phash64` convention). */
case class PHashCanonical64(child: Expression)
    extends UnaryExpression with BinaryInputCheck {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "phash_canonical64"
  override protected def nullSafeEval(input: Any): Any =
    ImageKernels.phashCanonical64(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageKernels.phashCanonical64($c)")
  override protected def withNewChildInternal(newChild: Expression): PHashCanonical64 =
    copy(child = newChild)
}

/** Orientation-aware PSNR ([[ImageKernels.psnrOriented]]): max PSNR over
  * the 8 dihedral orientations of the RIGHT image — the pixel verifier
  * paired with [[PHashCanonical64]] candidates. NaN when undecodable or no
  * orientation's dimensions match. */
case class ImagePsnrOriented(left: Expression, right: Expression)
    extends BinaryExpression with BinaryInputCheck {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "image_psnr_oriented"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ImageKernels.psnrOriented(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ImageKernels.psnrOriented($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ImagePsnrOriented =
    copy(left = l, right = r)
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

/** Header-only (width, height) probe — container-header parse (PNG IHDR /
  * JPEG SOF / GIF / BMP), never decodes pixel data. Tens of bytes read per
  * row vs megabytes for a decode: the scan-projection form of "how big is
  * this image" for banding, size gates, and batch assignment at crawl
  * scale. (-1, -1) when the header is missing or truncated. Trustworthy
  * where the table's recorded `w`/`h` columns are not: these dims come
  * from the payload itself. */
case class ImageDims(child: Expression)
    extends UnaryExpression with BinaryInputCheck {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "image_dims"
  override protected def nullSafeEval(input: Any): Any =
    ImageKernels.imageDimsRow(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageKernels.imageDimsRow($c)")
  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
}

/** Deterministic exact-target resample to lossless PNG bytes — the
  * codegen'd column form of [[ImageKernels.resampleOf]]'s pinned integer
  * sampling (`nearest` = floor-division point sample, `area` = integer-cell
  * box average, both stated in closed form so outputs are reproducible by
  * an external system). Returns NULL for undecodable payloads (one corrupt
  * crawl payload must gate, not crash) — hence nullable despite
  * nullIntolerant inputs. */
case class ImageResample(bytes: Expression, dstW: Expression, dstH: Expression,
    mode: Expression) extends QuaternaryExpression {
  override def first: Expression = bytes
  override def second: Expression = dstW
  override def third: Expression = dstH
  override def fourth: Expression = mode
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "image_resample"
  override def checkInputDataTypes(): TypeCheckResult = {
    val want = Seq(BinaryType, IntegerType, IntegerType, StringType)
    val got = children.map(_.dataType)
    if (got == want) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, INT, INT, STRING), got " +
        got.map(_.catalogString).mkString(", "))
  }
  override protected def nullSafeEval(b: Any, w: Any, h: Any, m: Any): Any =
    ImageKernels.resample(b.asInstanceOf[Array[Byte]], w.asInstanceOf[Int],
      h.asInstanceOf[Int], m.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, w, h, m) => s"""
      ${ev.value} = graft.functions.ImageKernels.resample($b, $w, $h, $m);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): ImageResample = copy(a, b, c, d)
}

/** Decode-free metadata strip ([[ImageKernels.stripMetadataJ]]): EXIF / XMP
  * / comment / text-chunk provenance removed from JPEG/PNG/WEBP containers
  * by byte-level segment surgery — the compressed pixel stream copies
  * verbatim, so the output decodes bit-identically. Unstrippable containers
  * (gif/bmp/tiff/unknown) and malformed payloads return unchanged, never
  * throw: this runs inside the scan projection at crawl scale, where one
  * corrupt payload must not fail the job. */
case class StripImageMetadata(child: Expression)
    extends UnaryExpression with BinaryInputCheck {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "strip_image_metadata"
  override protected def nullSafeEval(input: Any): Any =
    ImageKernels.stripMetadataJ(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageKernels.stripMetadataJ($c)")
  override protected def withNewChildInternal(newChild: Expression): StripImageMetadata =
    copy(child = newChild)
}

object ImageFunctions {
  def phash64(c: Column): Column = CB.column(PHash64(CB.expression(c)))
  def dhash64(c: Column): Column = CB.column(DHash64(CB.expression(c)))
  def phash_canonical64(c: Column): Column =
    CB.column(PHashCanonical64(CB.expression(c)))
  def phash_orientations(c: Column): Column =
    CB.column(PhashOrientations(CB.expression(c)))
  def image_psnr_oriented(a: Column, b: Column): Column =
    CB.column(ImagePsnrOriented(CB.expression(a), CB.expression(b)))
  def image_hashes(c: Column): Column = CB.column(ImageHashes(CB.expression(c)))
  def image_psnr(a: Column, b: Column): Column =
    CB.column(ImagePsnr(CB.expression(a), CB.expression(b)))
  def sniff_image_format(c: Column): Column =
    CB.column(SniffImageFormat(CB.expression(c)))
  def image_stats(c: Column): Column = CB.column(ImageStats(CB.expression(c)))
  def image_sig(c: Column): Column = CB.column(ImageSig(CB.expression(c)))
  def image_dims(c: Column): Column = CB.column(ImageDims(CB.expression(c)))
  def strip_image_metadata(c: Column): Column =
    CB.column(StripImageMetadata(CB.expression(c)))
  def image_resample(c: Column, dstW: Int, dstH: Int, mode: String): Column =
    CB.column(ImageResample(CB.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(dstW),
      org.apache.spark.sql.catalyst.expressions.Literal(dstH),
      org.apache.spark.sql.catalyst.expressions.Literal.create(mode, StringType)))
  def image_resample(c: Column, dstW: Column, dstH: Column, mode: Column): Column =
    CB.column(ImageResample(CB.expression(c), CB.expression(dstW),
      CB.expression(dstH), CB.expression(mode)))

  def registerAll(spark: SparkSession): Unit =
    FunctionTable.register(spark, FunctionTable.byName(
      "phash64", "dhash64", "phash_canonical64", "phash_orientations",
      "image_hashes",
      "image_psnr", "image_psnr_oriented", "sniff_image_format",
      "image_stats", "image_sig", "image_dims", "image_resample",
      "strip_image_metadata"))
}
