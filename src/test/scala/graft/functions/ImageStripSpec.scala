package graft.functions

import graft.functions.{ImageFunctions => IF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.util.zip.CRC32

/** `strip_image_metadata` — decode-free provenance scrub
  * ([[ImageKernels.stripMetadataJ]]): EXIF/XMP/comment segments and PNG
  * text chunks removed by byte-level container surgery while the pixel
  * stream copies verbatim. Every positive case asserts (a) the metadata is
  * gone, (b) the output decodes PIXEL-IDENTICALLY to the input, (c) the
  * strip is idempotent. Negative cases pin the never-corrupt contract:
  * unstrippable or malformed payloads return unchanged.
  */
class ImageStripSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def img(w: Int, h: Int, f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, f(x, y))
    im
  }

  private def pixels(bytes: Array[Byte]): Seq[Int] = {
    val im = ImageKernels.decode(bytes)
    for (y <- 0 until im.getHeight; x <- 0 until im.getWidth)
      yield im.getRGB(x, y)
  }

  /** JPEG marker segment: FF <marker> <len+2 BE> <payload>. */
  private def jpegSeg(marker: Int, payload: Array[Byte]): Array[Byte] = {
    val len = payload.length + 2
    Array(0xff.toByte, marker.toByte, ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++
      payload
  }

  /** PNG chunk with a correct CRC over type+data. */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("ISO-8859-1")
    val crc = new CRC32(); crc.update(t); crc.update(data)
    val c = crc.getValue
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    be32(data.length.toLong) ++ t ++ data ++ be32(c)
  }

  private def markers(bytes: Array[Byte]): Seq[Int] = {
    // walk JPEG segments up to SOS, return the marker bytes seen
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 2
    var done = false
    while (!done && i + 3 < bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) i += 1
      else {
        val m = bytes(i + 1) & 0xff
        out += m
        if (m == 0xda || m == 0xd9) done = true
        else if (m == 0xff) i += 1
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
        else i += 2 + (((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff))
      }
    }
    out.toSeq
  }

  test("jpeg: injected EXIF (APP1) + COM stripped; pixels identical; idempotent") {
    val clean = ImageKernels.encode(img(16, 12, (x, y) => (x * 16) << 16 | (y * 20) << 8), "jpeg")
    val exif = jpegSeg(0xe1, "Exif\u0000\u0000II*\u0000fake-gps-payload".getBytes("ISO-8859-1"))
    val com = jpegSeg(0xfe, "shot on camera X, serial 12345".getBytes("ISO-8859-1"))
    val tainted = clean.take(2) ++ exif ++ com ++ clean.drop(2)
    assert(ImageKernels.sniffFormatJ(tainted) == "jpeg")
    assert(markers(tainted).contains(0xe1) && markers(tainted).contains(0xfe))

    val stripped = ImageKernels.stripMetadataJ(tainted)
    assert(!markers(stripped).exists(m => (m >= 0xe1 && m <= 0xef) || m == 0xfe),
      s"metadata markers survive: ${markers(stripped).map(_.toHexString)}")
    assert(stripped.length < tainted.length)
    assert(pixels(stripped) == pixels(tainted), "pixel stream changed")
    assert(ImageKernels.stripMetadataJ(stripped).sameElements(stripped), "not idempotent")
    // provenance text truly gone from the byte stream
    assert(!new String(stripped, "ISO-8859-1").contains("fake-gps-payload"))
    assert(!new String(stripped, "ISO-8859-1").contains("serial 12345"))
  }

  test("jpeg: APP14 (Adobe transform) and ICC APP2 are kept — they change how pixels decode") {
    // APP14 tells decoders the component layout (YCCK/CMYK vs RGB); the
    // ICC profile changes decoded colors in color-managed decoders.
    // Stripping either breaks the decodes-identically contract, so both
    // must survive — while EXIF and a NON-ICC APP2 (FlashPix) still drop.
    val clean = ImageKernels.encode(img(12, 10, (x, y) => (x * 9) << 16 | (y * 11)), "jpeg")
    val adobe = jpegSeg(0xee, ("Adobe" + "d\u0000\u0000\u0000\u0000\u0002")
      .getBytes("ISO-8859-1")) // transform=2 (YCCK)
    val icc = jpegSeg(0xe2, ("ICC_PROFILE\u0000\u0001\u0001" + "profile-bytes")
      .getBytes("ISO-8859-1"))
    val flashpix = jpegSeg(0xe2, "FPXR\u0000provenance".getBytes("ISO-8859-1"))
    val exif = jpegSeg(0xe1, "Exif\u0000\u0000II*\u0000gps".getBytes("ISO-8859-1"))
    val tainted = clean.take(2) ++ exif ++ icc ++ flashpix ++ adobe ++ clean.drop(2)

    val stripped = ImageKernels.stripMetadataJ(tainted)
    val ms = markers(stripped)
    assert(ms.contains(0xee), s"APP14 stripped: ${ms.map(_.toHexString)}")
    assert(ms.contains(0xe2), s"ICC APP2 stripped: ${ms.map(_.toHexString)}")
    assert(!ms.contains(0xe1), "EXIF survived")
    val s = new String(stripped, "ISO-8859-1")
    assert(s.contains("ICC_PROFILE") && s.contains("Adobe"))
    assert(!s.contains("FPXR") && !s.contains("gps"), "non-ICC APP2 / EXIF survived")
    assert(pixels(stripped) == pixels(tainted))
    assert(ImageKernels.stripMetadataJ(stripped).sameElements(stripped), "not idempotent")
  }

  test("jpeg: APP0 (JFIF density) is kept") {
    val clean = ImageKernels.encode(img(8, 8, (_, _) => 0x446688), "jpeg")
    assume(markers(clean).contains(0xe0), "encoder emits JFIF APP0")
    val stripped = ImageKernels.stripMetadataJ(clean)
    assert(markers(stripped).contains(0xe0))
    assert(pixels(stripped) == pixels(clean))
  }

  test("png: tEXt/zTXt/iTXt/eXIf/tIME chunks stripped; pixels identical; idempotent") {
    val clean = ImageKernels.encode(img(10, 10, (x, y) => (x * y * 97) & 0xffffff), "png")
    // inject after IHDR (8-byte sig + 25-byte IHDR chunk)
    val at = 8 + 25
    val tainted = clean.take(at) ++
      pngChunk("tEXt", "Author\u0000Jane Roe".getBytes("ISO-8859-1")) ++
      pngChunk("iTXt", "XML:com.adobe.xmp\u0000\u0000\u0000\u0000\u0000<x:xmpmeta/>".getBytes("ISO-8859-1")) ++
      pngChunk("tIME", Array[Byte](0x07, 0xe9.toByte, 8, 19, 12, 0, 0)) ++
      clean.drop(at)
    assert(pixels(tainted) == pixels(clean), "tainted fixture must still decode")

    val stripped = ImageKernels.stripMetadataJ(tainted)
    val s = new String(stripped, "ISO-8859-1")
    assert(!s.contains("tEXt") && !s.contains("iTXt") && !s.contains("tIME"))
    assert(s.contains("IHDR") && s.contains("IDAT") && s.contains("IEND"))
    assert(!s.contains("Jane Roe") && !s.contains("xmpmeta"))
    assert(pixels(stripped) == pixels(clean))
    assert(ImageKernels.stripMetadataJ(stripped).sameElements(stripped))
  }

  test("webp: EXIF/XMP RIFF chunks dropped, VP8X flags cleared, RIFF size rewritten") {
    def fourcc(s: String) = s.getBytes("ISO-8859-1")
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val vp8x = fourcc("VP8X") ++ le32(10) ++
      Array((0x08 | 0x04 | 0x10).toByte) ++ Array.fill[Byte](9)(0) // EXIF+XMP+alpha flags
    val vp8 = fourcc("VP8 ") ++ le32(6) ++ "pixels".getBytes("ISO-8859-1")
    val exif = fourcc("EXIF") ++ le32(7) ++ "gps-fix".getBytes("ISO-8859-1") ++
      Array[Byte](0) // odd size → pad byte
    val xmp = fourcc("XMP ") ++ le32(4) ++ "meta".getBytes("ISO-8859-1")
    val body = fourcc("WEBP") ++ vp8x ++ vp8 ++ exif ++ xmp
    val webp = fourcc("RIFF") ++ le32(body.length) ++ body
    assert(ImageKernels.sniffFormatJ(webp) == "webp")

    val stripped = ImageKernels.stripMetadataJ(webp)
    val s = new String(stripped, "ISO-8859-1")
    assert(!s.contains("EXIF") && !s.contains("XMP ") && !s.contains("gps-fix"))
    assert(s.contains("VP8X") && s.contains("pixels"))
    // VP8X flag byte: EXIF/XMP bits cleared, alpha bit intact
    val fi = s.indexOf("VP8X") + 8
    assert((stripped(fi) & 0x0c) == 0, "EXIF/XMP flag bits not cleared")
    assert((stripped(fi) & 0x10) == 0x10, "alpha flag must survive")
    // RIFF size field = file length - 8
    val riffSz = (stripped(4) & 0xff) | ((stripped(5) & 0xff) << 8) |
      ((stripped(6) & 0xff) << 16) | ((stripped(7) & 0xff) << 24)
    assert(riffSz == stripped.length - 8)
    assert(ImageKernels.stripMetadataJ(stripped).sameElements(stripped))
  }

  test("never-corrupt contract: gif/bmp/tiff/unknown/truncated return unchanged") {
    val gray = img(6, 6, (_, _) => 0x777777)
    for (payload <- Seq(
        ImageKernels.encode(gray, "gif"),
        ImageKernels.encode(gray, "bmp"),
        "II*\u0000tiff-ifd-tree".getBytes("ISO-8859-1"),
        "not an image at all".getBytes("ISO-8859-1"),
        Array[Byte](0xff.toByte, 0xd8.toByte), // SOI only
        Array.empty[Byte])) {
      val out = ImageKernels.stripMetadataJ(payload)
      assert(out.sameElements(payload), "unstrippable payload was modified")
    }
    // truncated mid-segment JPEG: must not throw, must still sniff as jpeg
    val clean = ImageKernels.encode(gray, "jpeg")
    val cut = clean.take(clean.length / 3)
    val out = ImageKernels.stripMetadataJ(cut)
    assert(ImageKernels.sniffFormatJ(out) == "jpeg")
    assert(ImageKernels.stripMetadataJ(null) == null)
  }

  test("mutation fuzz: 3,000 corrupted/truncated/noise buffers never throw") {
    val rnd = new scala.util.Random(20260819L)
    val seeds = Seq(
      ImageKernels.encode(img(12, 9, (x, y) => (x * y * 31) & 0xffffff), "jpeg"),
      ImageKernels.encode(img(12, 9, (x, y) => (x * y * 31) & 0xffffff), "png"),
      // minimal synthetic webp container
      ("RIFF" + "\u0010\u0000\u0000\u0000" + "WEBPVP8 ").getBytes("ISO-8859-1"))
    var checked = 0
    for (_ <- 0 until 1000; seed <- seeds) {
      val b = seed.clone()
      rnd.nextInt(3) match {
        case 0 => // bit flips
          for (_ <- 0 to rnd.nextInt(8))
            b(rnd.nextInt(b.length)) = (b(rnd.nextInt(b.length)) ^ (1 << rnd.nextInt(8))).toByte
          val out = ImageKernels.stripMetadataJ(b)
          assert(out != null); checked += 1
        case 1 => // truncation
          val out = ImageKernels.stripMetadataJ(b.take(rnd.nextInt(b.length + 1)))
          assert(out != null); checked += 1
        case 2 => // pure noise with a magic-byte prefix grafted on
          val noise = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
          val out = ImageKernels.stripMetadataJ(b.take(rnd.nextInt(16)) ++ noise)
          assert(out != null); checked += 1
      }
    }
    assert(checked == 3000)
  }

  test("column expression: SQL-registered, null-safe, stays inside WholeStageCodegen") {
    val clean = ImageKernels.encode(img(5, 5, (_, _) => 0x123456), "jpeg")
    val exif = jpegSeg(0xe1, "Exif\u0000\u0000payload".getBytes("ISO-8859-1"))
    val tainted = clean.take(2) ++ exif ++ clean.drop(2)
    val df = Seq((1L, tainted), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bytes")
      .select($"id", IF.strip_image_metadata($"bytes").as("out"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).getAs[Array[Byte]]("out").length < tainted.length)
    assert(rows(1).isNullAt(1))

    ImageFunctions.registerAll(spark)
    val viaSql = spark.sql(
      s"SELECT octet_length(strip_image_metadata(X'${tainted.map("%02x".format(_)).mkString}'))")
      .head().getInt(0)
    assert(viaSql == rows(0).getAs[Array[Byte]]("out").length)

    val cgPlan = spark.range(3)
      .select(concat(lit(tainted), encode($"id".cast("string"), "UTF-8")).as("bs"))
      .filter(octet_length(IF.strip_image_metadata($"bs")) > 0)
      .queryExecution.executedPlan.toString
    assert(cgPlan.contains("*(1) Filter"), cgPlan)
  }
}
