package graft.functions

import graft.functions.{ImageFunctions => IF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The second perceptual signature: 64-bit difference hash (`dhash64`) and
  * the one-decode `image_hashes` pair. dhash is built entirely from PINNED
  * integer arithmetic (the `area` resample's round-half-up box average +
  * the BT.601 integer luma), so this spec checks it in closed form — the
  * same construction the q60 oracle replays in SQL — plus the conventions
  * the near-dup operator relies on: true duplicates (re-encodes, 1-px
  * edits) stay within a small radius while the hash differs across
  * gradient DIRECTIONS, which is exactly the axis the DCT phash's
  * low-frequency block is blind to. */
class DHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gray(w: Int, h: Int, f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    im
  }

  // the q60 corpus: 9×8 gray PNG — identity under the 9×8 area resample
  // (every box is one pixel; round-half-up of an integer is itself), gray
  // luma is the value itself, so every comparison bit is stated by the
  // generator arithmetic alone
  private def q60Bytes(id: Long): Array[Byte] =
    ImageKernels.encode(
      gray(9, 8, (x, y) => ((id * 7 + x * 13 + y * 29) % 256).toInt), "png")
  private def q60Expected(id: Long): Long = {
    var bits = 0L
    for (y <- 0 until 8; x <- 0 until 8) {
      val p = (id * 7 + x * 13 + y * 29) % 256
      val c = (id * 7 + (x + 1) * 13 + y * 29) % 256
      if (c > p) bits |= 1L << (y * 8 + x)
    }
    bits
  }

  test("closed form: 9×8 identity-resample corpus matches the generator arithmetic") {
    val bad = (0L until 256L).filter(id =>
      ImageKernels.dhash64(q60Bytes(id)) != q60Expected(id))
    assert(bad.isEmpty, s"ids ${bad.take(5)}")
  }

  test("kernel consistency at real sizes: dhash64 == resampleOf + integer luma recompute") {
    // independent recompute: resample with the public pinned kernel, then
    // replay the luma comparisons — the spec's own reimplementation of the
    // bit rule over NON-identity sizes (so the resample path is exercised)
    for (k <- 0L until 24L) {
      val img = graft.sources.ImageGen.render(k, seed = 31L,
        w = 40 + (k % 13).toInt, h = 25 + (k % 7).toInt)
      val g = ImageKernels.resampleOf(img, 9, 8, "area")
      def luma(x: Int, y: Int): Int = {
        val p = g.getRGB(x, y)
        (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
      }
      var want = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (luma(x + 1, y) > luma(x, y)) want |= 1L << (y * 8 + x)
      assert(ImageKernels.dhashOf(img) == want, s"content $k")
    }
  }

  test("true duplicates stay close; gradient direction separates") {
    // archival-quality re-encode: the near-dup gate's recall premise
    val reencMax = (0L until 64L).map { k =>
      val img = graft.sources.ImageGen.render(k, seed = 23L, w = 48, h = 36)
      ImageKernels.hamming64(
        ImageKernels.dhash64(ImageKernels.encode(img, "png")),
        ImageKernels.dhash64(ImageKernels.encode(img, "jpg")))
    }.max
    assert(reencMax <= 6, s"png→jpg re-encode moved dhash by $reencMax")
    // a 1-px edit (the q53 plant) does not move a 9×8 box average's sign
    val img = graft.sources.ImageGen.render(5L, seed = 19L, w = 45, h = 35)
    val a = ImageKernels.dhashOf(img)
    val rgb = img.getRGB(1, 1)
    img.setRGB(1, 1, (rgb & 0xffff00ff) | ((((rgb >> 8) & 0xff) ^ 1) << 8))
    assert(ImageKernels.hamming64(a, ImageKernels.dhashOf(img)) == 0)
    // opposite gradient directions: identical luma HISTOGRAM (phash-family
    // stats can't see the flip axis), near-complement comparison signs
    val asc = gray(36, 24, (x, _) => x * 7)
    val desc = gray(36, 24, (x, _) => (35 - x) * 7)
    val d = ImageKernels.hamming64(ImageKernels.dhashOf(asc), ImageKernels.dhashOf(desc))
    assert(d >= 48, s"mirrored gradient only $d bits apart")
  }

  test("failure conventions match phash64: undecodable → 0, null → null") {
    assert(ImageKernels.dhash64(Array[Byte](1, 2, 3)) == 0L)
    assert(ImageKernels.dhash64(Array.empty[Byte]) == 0L)
    // truncated PNG: recognized container, throwing reader — must gate
    val png = ImageKernels.encode(gray(16, 12, (x, y) => x * y), "png")
    assert(ImageKernels.dhash64(png.take(30)) == 0L)
    val row = Seq((1L, null: Array[Byte])).toDF("id", "bytes")
      .select(IF.dhash64($"bytes")).head()
    assert(row.isNullAt(0))
  }

  test("image_hashes == (phash64, dhash64) from one decode; undecodable → (0,0)") {
    val rows = ((0L until 16L).map(k => (k,
      ImageKernels.encode(graft.sources.ImageGen.render(k, seed = 7L, w = 33, h = 22),
        if (k % 2 == 0) "png" else "jpg"))) :+ ((99L, Array[Byte](9, 9)))).toDF("id", "bytes")
    val bad = rows.select(
        IF.image_hashes($"bytes").as("h"),
        IF.phash64($"bytes").as("p"), IF.dhash64($"bytes").as("d"))
      .filter($"h.phash" =!= $"p" || $"h.dhash" =!= $"d")
    assert(bad.isEmpty, bad.collect().mkString("\n"))
  }

  test("dhash64 and image_hashes stay inside WholeStageCodegen; SQL-registered") {
    val png = ImageKernels.encode(gray(4, 4, (x, y) => x + y), "png")
    val cgPlan = spark.range(3)
      .select(concat(lit(png), encode($"id".cast("string"), "UTF-8")).as("bs"))
      .filter(IF.dhash64($"bs") =!= 0L &&
        IF.image_hashes($"bs").getField("dhash") =!= 1L)
      .queryExecution.executedPlan.toString
    assert(cgPlan.contains("*(1) Filter"), cgPlan)
    ImageFunctions.registerAll(spark)
    val viaSql = spark.sql(
      s"SELECT dhash64(X'${png.map("%02X".format(_)).mkString}') AS d").head().getLong(0)
    assert(viaSql == ImageKernels.dhash64(png))
    assert(spark.sql("SELECT image_hashes(X'00').dhash").head().getLong(0) == 0L)
  }
}
