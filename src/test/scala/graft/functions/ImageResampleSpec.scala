package graft.functions

import graft.functions.{ImageFunctions => IF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pinned-sampling resample + header-only dims probe: `image_resample`'s
  * two modes are stated in closed form (nearest = floor-division point
  * sample, area = integer-cell box average with round-half-up), so this
  * spec verifies exact output PIXELS, not just shapes; `image_dims` must
  * agree with the real decoder's dimensions on every container the engine
  * encodes, while reading only the header. */
class ImageResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def img(w: Int, h: Int, f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, f(x, y))
    im
  }
  private def px(im: java.awt.image.BufferedImage): Seq[Int] =
    for (y <- 0 until im.getHeight; x <- 0 until im.getWidth)
      yield im.getRGB(x, y) & 0xffffff

  test("nearest 4x4 -> 2x2 picks the floor-division sample points") {
    // pixel value encodes its coordinates: rgb = x*16 + y (all < 256, blue channel)
    val src = img(4, 4, (x, y) => x * 16 + y)
    val out = ImageKernels.resampleOf(src, 2, 2, "nearest")
    // dst(x,y) <- src(x*4/2, y*4/2) = src(2x, 2y)
    assert(px(out) == Seq(0 * 16 + 0, 2 * 16 + 0, 0 * 16 + 2, 2 * 16 + 2))
  }

  test("area 4x4 -> 2x2 box-averages each 2x2 cell with round-half-up") {
    // cell (0,0) holds blues {0,1,2,3} -> mean 1.5 -> rounds to 2
    val src = img(4, 4, (x, y) => (x % 2) * 2 + (y % 2))
    val out = ImageKernels.resampleOf(src, 2, 2, "area")
    assert(px(out) == Seq(2, 2, 2, 2))
    // distinct cells: value = quadrant id * 10 -> averages are exact
    val src2 = img(4, 4, (x, y) => (x / 2 + (y / 2) * 2) * 10)
    assert(px(ImageKernels.resampleOf(src2, 2, 2, "area")) == Seq(0, 10, 20, 30))
  }

  test("same-size resample is the identity; upscale replicates pixels") {
    val src = img(3, 2, (x, y) => x * 40 + y * 7)
    assert(px(ImageKernels.resampleOf(src, 3, 2, "nearest")) == px(src))
    assert(px(ImageKernels.resampleOf(src, 3, 2, "area")) == px(src))
    // 1x1 -> 2x2: all four pixels are the source pixel, both modes
    val dot = img(1, 1, (_, _) => 0x123456)
    assert(px(ImageKernels.resampleOf(dot, 2, 2, "nearest")) == Seq.fill(4)(0x123456))
    assert(px(ImageKernels.resampleOf(dot, 2, 2, "area")) == Seq.fill(4)(0x123456))
  }

  test("expression: PNG round-trip preserves pinned pixels; undecodable -> NULL") {
    val src = ImageKernels.encode(img(6, 4, (x, y) => x * 30 + y * 5), "png")
    val rows = Seq((1L, src), (2L, Array.tabulate[Byte](16)(_.toByte)))
      .toDF("id", "bytes")
      .select($"id", IF.image_resample($"bytes", 3, 2, "nearest").as("r"))
      .collect().sortBy(_.getLong(0))
    val dec = ImageKernels.decode(rows(0).getAs[Array[Byte]]("r"))
    // dst(x,y) <- src(2x, 2y): value 2x*30 + 2y*5
    assert(px(dec) == (for (y <- 0 until 2; x <- 0 until 3) yield x * 60 + y * 10))
    assert(rows(1).isNullAt(1), "undecodable payload must resample to NULL")
  }

  test("image_dims agrees with the decoder on every encoded container, header-only") {
    for (fmt <- Seq("png", "jpg", "gif", "bmp"); (w, h) <- Seq((7, 5), (640, 1), (1, 480))) {
      val bytes = ImageKernels.encode(img(w, h, (x, y) => (x * 3 + y) % 200), fmt)
      assert(ImageKernels.dimsFastJ(bytes) == (w, h), s"$fmt ${w}x$h")
    }
    // truncation: header cut off mid-field -> (-1,-1), never a throw
    val png = ImageKernels.encode(img(9, 3, (_, _) => 0x445566), "png")
    for (n <- Seq(0, 2, 8, 15, 23))
      assert(ImageKernels.dimsFastJ(png.take(n)) == (-1, -1), s"truncated at $n")
    assert(ImageKernels.dimsFastJ(null) == (-1, -1))
    // JPEG: probe must skip APPn/DQT/DHT segments to reach SOF
    val jpg = ImageKernels.encode(img(31, 17, (x, y) => x * 8 + y * 3), "jpg")
    assert(ImageKernels.dimsFastJ(jpg) == (31, 17))
    assert(ImageKernels.dimsFastJ(jpg.take(4)) == (-1, -1)) // SOI only: no frame
  }

  test("image_dims and image_resample stay inside WholeStageCodegen") {
    val png = ImageKernels.encode(img(4, 4, (_, _) => 0x112233), "png")
    val cgPlan = spark.range(3)
      .select(concat(lit(png), encode($"id".cast("string"), "UTF-8")).as("bs"))
      .filter(IF.image_dims($"bs").getField("width") === 4 &&
        IF.image_resample($"bs", 2, 2, "nearest").isNotNull)
      .queryExecution.executedPlan.toString
    assert(cgPlan.contains("*(1) Filter"), cgPlan)
  }

  test("SQL registration: image_dims and image_resample callable from spark.sql") {
    ImageFunctions.registerAll(spark)
    val png = ImageKernels.encode(img(5, 3, (_, _) => 0x777777), "png")
    spark.createDataset(Seq(png)).toDF("bs").createOrReplaceTempView("t_resample")
    val r = spark.sql(
      """SELECT image_dims(bs).width AS w, image_dims(bs).height AS h,
        |       image_resample(bs, 2, 1, 'area') AS rb FROM t_resample""".stripMargin).head()
    assert(r.getInt(0) == 5 && r.getInt(1) == 3)
    val dec = ImageKernels.decode(r.getAs[Array[Byte]]("rb"))
    assert(dec.getWidth == 2 && dec.getHeight == 1)
  }

  test("trainingBatches: header banding, complete batches, exact target dims") {
    // 23 images: ids 0..22; width 8/12/20 by id%3 at height 8 -> milli-aspect
    // 1000/1500/2500 -> bands square(<1250)/wide(<2000)/ultrawide; one row
    // with a corrupt header must drop before assignment
    val rows = (0L until 23L).map { id =>
      val w = Seq(8, 12, 20)((id % 3).toInt)
      (id, ImageKernels.encode(img(w, 8, (x, y) => ((x + y + id) % 250).toInt), "png"))
    } :+ (99L, Array.tabulate[Byte](20)(_.toByte))
    val targets = Map("tall" -> ((4, 8)), "square" -> ((6, 6)),
      "wide" -> ((8, 4)), "ultrawide" -> ((12, 4)))
    val out = graft.ops.Multimodal.trainingBatches(
      rows.toDF("id", "bytes"), "id", "bytes", targets,
      batchSize = 3, shards = 1, resampleMode = "area")
    // plan: batch numbering runs over the slim (id, band) projection — no
    // Window node may see the payload column (bytes cross one equi-join
    // AFTER assignment, never a sort)
    val winInputs = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.child.output.map(_.name)
    }
    assert(winInputs.nonEmpty &&
      winInputs.forall(cols => !cols.contains("bytes")), winInputs.toString)
    out.cache()
    val got = out.select($"id", $"band", $"batch_ix", $"slot", $"width", $"height", $"bytes")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getAs[Array[Byte]](6))))
      .toMap
    assert(!got.contains(99L), "corrupt header must be dropped at banding")
    // per band: 8 members with dropIncomplete -> 6 survive (2 batches of 3)
    val byBand = got.values.groupBy(_._1)
    assert(byBand.keySet == Set("square", "wide", "ultrawide"))
    for ((band, members) <- byBand) {
      assert(members.size == 6, s"$band: ${members.size}")
      assert(members.map(m => (m._2, m._3)).toSet ==
        (for (b <- 0 to 1; s <- 0 to 2) yield (b.toLong, s.toLong)).toSet)
      val (tw, th) = targets(band)
      for (m <- members) {
        assert((m._4, m._5) == (tw, th))
        val dec = ImageKernels.decode(m._6)
        assert((dec.getWidth, dec.getHeight) == (tw, th), band)
      }
    }
    // ids are assigned in id order within a band: square band = ids 0,3,..,21
    // (w=8); first batch holds the three smallest
    val sq = got.collect { case (id, (b, bi, sl, _, _, _)) if b == "square" => (id, bi, sl) }
    assert(sq.toSeq.sorted.take(3).map(t => (t._2, t._3)) == Seq((0L, 0L), (0L, 1L), (0L, 2L)))
    out.unpersist()
  }
}
