package graft.functions

import graft.functions.{ImageFunctions => IF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd image column family: `sniff_image_format` (magic-byte
  * container identification — the fmt-vs-bytes trust gate) and
  * `image_stats` (one-decode luma statistics), which must be
  * field-for-field equal to the typed `Multimodal.imageQuality` path —
  * both delegate to `ImageKernels.lumaStats`, and this spec pins the
  * equality so a refactor of either cannot silently diverge. */
class ImageStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def img(w: Int, h: Int, f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, f(x, y))
    im
  }
  private def b(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("sniff matrix: real encoder outputs, synthetic containers, boundaries") {
    val gray = img(8, 6, (_, _) => 0x808080)
    assert(ImageKernels.sniffFormatJ(ImageKernels.encode(gray, "png")) == "png")
    assert(ImageKernels.sniffFormatJ(ImageKernels.encode(gray, "jpg")) == "jpeg")
    assert(ImageKernels.sniffFormatJ(ImageKernels.encode(gray, "gif")) == "gif")
    assert(ImageKernels.sniffFormatJ(ImageKernels.encode(gray, "bmp")) == "bmp")
    assert(ImageKernels.sniffFormatJ(b("RIFF\u0001\u0002\u0003\u0004WEBPVP8 ")) == "webp")
    assert(ImageKernels.sniffFormatJ(b("RIFF1234WAVEfmt ")) == "unknown") // RIFF but not WEBP
    assert(ImageKernels.sniffFormatJ(b("II*\u0000rest")) == "tiff")
    assert(ImageKernels.sniffFormatJ(b("MM\u0000*rest")) == "tiff")
    assert(ImageKernels.sniffFormatJ(b("GIF87a")) == "gif")
    assert(ImageKernels.sniffFormatJ(b("BM")) == "bmp") // exactly at the 2-byte boundary
    assert(ImageKernels.sniffFormatJ(Array[Byte](0x00, 0x01, 0x02)) == "unknown")
    assert(ImageKernels.sniffFormatJ(Array.empty[Byte]) == "unknown")
    // truncated PNG signature (7 of 8 bytes) is not a png
    assert(ImageKernels.sniffFormatJ(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a)) == "unknown")
  }

  test("image_stats expression ≡ Multimodal.imageQuality field-for-field") {
    val rows = Seq.tabulate(40) { i =>
      val bytes: Array[Byte] =
        if (i % 5 == 4) Array.tabulate(10)(j => ((i + j) % 251).toByte) // undecodable
        else {
          val w = 9 + i % 7; val h = 5 + i % 5
          ImageKernels.encode(
            img(w, h, (x, y) => if ((x + y + i) % 3 == 0) 0x204060 else 0xC0A080),
            if (i % 2 == 0) "png" else "jpg")
        }
      (i.toLong, bytes)
    }
    // bit-level equality via string renderings, both except directions
    val viaExpr = rows.toDF("id", "bytes")
      .select($"id", IF.image_stats($"bytes").as("s"))
      .select($"id", $"s.decodable", $"s.width", $"s.height",
        $"s.aspect".cast("string").as("a"),
        $"s.mean_luma".cast("string").as("m"),
        $"s.stddev_luma".cast("string").as("sd"),
        $"s.entropy_bits".cast("string").as("e"))
    val media = rows.map { case (id, bs) =>
      graft.ops.MediaRow(id.toString, "image", bs, Map.empty) }
    val viaTyped = graft.ops.Multimodal.imageQuality(spark.createDataset(media)).toDF()
      .select($"media_id".cast("long").as("id"), $"decodable", $"width", $"height",
        $"aspect".cast("string").as("a"),
        $"mean_luma".cast("string").as("m"),
        $"stddev_luma".cast("string").as("sd"),
        $"entropy_bits".cast("string").as("e"))
    assert(viaExpr.except(viaTyped).isEmpty && viaTyped.except(viaExpr).isEmpty)
    assert(viaExpr.count() == 40)
  }

  test("image_sig ≡ phash64 + image_stats from one decode") {
    val rows = Seq.tabulate(30) { i =>
      val bytes: Array[Byte] =
        if (i % 6 == 5) Array.tabulate(12)(j => ((i + j) % 251).toByte) // undecodable
        else ImageKernels.encode(
          img(12 + i % 9, 8 + i % 6,
            (x, y) => if ((x * 3 + y * (1 + i % 4)) % 5 < 2) 0x102030 else 0xE0D0C0),
          if (i % 2 == 0) "png" else "jpg")
      (i.toLong, bytes)
    }
    val bad = rows.toDF("id", "bytes")
      .select($"id", IF.image_sig($"bytes").as("g"),
        IF.phash64($"bytes").as("p"), IF.image_stats($"bytes").as("s"))
      .filter($"g.phash" =!= $"p" ||
        $"g.decodable" =!= $"s.decodable" || $"g.width" =!= $"s.width" ||
        $"g.height" =!= $"s.height" || $"g.aspect" =!= $"s.aspect" ||
        $"g.mean_luma" =!= $"s.mean_luma" ||
        $"g.stddev_luma" =!= $"s.stddev_luma" ||
        $"g.entropy_bits" =!= $"s.entropy_bits")
    assert(bad.isEmpty, bad.collect().mkString("\n"))
  }

  test("both expressions stay inside WholeStageCodegen") {
    val png = ImageKernels.encode(img(4, 4, (_, _) => 0x112233), "png")
    // range-derived varying bytes (trailing junk after IEND still decodes;
    // sniff reads only the prefix) so constant folding can't eat the filter
    val cgPlan = spark.range(3)
      .select(concat(lit(png), encode($"id".cast("string"), "UTF-8")).as("bs"))
      .filter(IF.sniff_image_format($"bs") === "png" &&
        IF.image_stats($"bs").getField("decodable"))
      .queryExecution.executedPlan.toString
    assert(cgPlan.contains("*(1) Filter"), cgPlan)
  }

  test("formatReason ladder: unknown_container, mismatch, claim normalization") {
    val png = ImageKernels.encode(img(4, 4, (_, _) => 0x333333), "png")
    val jpg = ImageKernels.encode(img(4, 4, (_, _) => 0x333333), "jpg")
    val out = Seq(
      (1L, png, "png"), (2L, png, " PNG "), (3L, jpg, "jpg"), (4L, jpg, "jpeg"),
      (5L, jpg, "png"), (6L, Array[Byte](1, 2, 3), "png"),
      (7L, png, null.asInstanceOf[String]), (8L, png, ""))
      .toDF("id", "bytes", "fmt")
      .select($"id", coalesce(
        graft.ops.Multimodal.formatReason($"bytes", $"fmt"), lit("kept")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "kept", 2L -> "kept", 3L -> "kept", 4L -> "kept",
      5L -> "format_mismatch", 6L -> "unknown_container",
      7L -> "kept", 8L -> "kept"))
  }

  test("SQL registration: callable from spark.sql") {
    ImageFunctions.registerAll(spark)
    assert(spark.sql("SELECT sniff_image_format(X'89504E470D0A1A0A') AS f")
      .head().getString(0) == "png")
    assert(!spark.sql("SELECT image_stats(X'00').decodable AS d").head().getBoolean(0))
  }
}
