package graft.ops

import graft.functions.{ImageKernels, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Image-side quality gates ([[Multimodal.imageQuality]] /
  * [[Multimodal.curateImages]]): the pre-training image filters —
  * undecodable, too-small, extreme-aspect, near-constant — with exact
  * statistics on constructed images (PNG is lossless, so luma/entropy/
  * stddev have closed forms). */
class ImageCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def img(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, px(x, y))
    ImageKernels.encode(im, "png")
  }
  private def gray(v: Int): Int = (v << 16) | (v << 8) | v
  private def row(id: String, bytes: Array[Byte], kind: String = "image") =
    MediaRow(id, kind, bytes, Map.empty)

  test("imageQuality: exact stats on constructed images") {
    val media = Seq(
      row("flat", img(16, 12)((_, _) => gray(77))),
      row("checker", img(16, 12)((x, y) => if ((x + y) % 2 == 0) 0 else 0xFFFFFF)),
      row("corrupt", Array[Byte](1, 2, 3))).toDS()
    val q = Multimodal.imageQuality(media).collect().map(r => r.media_id -> r).toMap
    val f = q("flat")
    assert(f.decodable && f.width == 16 && f.height == 12)
    assert(f.mean_luma == 77.0 && f.stddev_luma == 0.0 && f.entropy_bits == 0.0)
    val c = q("checker")
    assert(c.mean_luma == 127.5 && c.stddev_luma == 127.5 && c.entropy_bits == 1.0)
    val bad = q("corrupt")
    assert(!bad.decodable && bad.width == -1)
  }

  test("curateImages: each gate fires with its reason; good images and non-images pass") {
    val noise = img(64, 48)((x, y) =>
      gray((graft.sources.SiteGraph.mix(7L, x.toLong, y.toLong) >>> 40).toInt & 0xff))
    val media = Seq(
      row("good", noise),
      row("flat", img(64, 48)((_, _) => gray(200))),
      row("tiny", img(8, 8)((x, y) => gray((x * 31 + y * 17) % 256))),
      row("banner", img(256, 48)((x, y) => gray((x * 31 + y * 17) % 256))),
      row("corrupt", Array[Byte](9, 9, 9)),
      row("clip", Array[Byte](1), kind = "audio")).toDS()
    val (kept, audit) = Multimodal.curateImages(media,
      minW = 32, minH = 32, maxAspect = 4.0, minEntropyBits = 1.0)
    assert(kept.collect().map(_.media_id).toSet == Set("good", "clip"))
    val reasons = audit.select("media_id", "reason").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reasons == Map("flat" -> "low_entropy", "tiny" -> "too_small",
      "banner" -> "extreme_aspect", "corrupt" -> "undecodable"))
  }

  test("ingestCurated: gated writeback inserts only quality-passing images, audit carries reasons") {
    import graft.model.{CrawlConfig, PageRow}
    import graft.operators.{FrontierCrawler, ImageWriteback}
    import graft.sources.{IceLite, ImageGen, ImageRow}
    val pages = Seq(
      PageRow("http://i.com/", 200, None, Seq("/a", "/b"), None, Some("text/html"), None, Some("good")),
      PageRow("http://i.com/a", 200, None, Nil, None, Some("text/html"), None, Some("flat")),
      PageRow("http://i.com/b", 200, None, Nil, None, Some("text/html"), None, Some("corrupt")))
    val good = ImageGen.imageFor(3L, seed = 7L, dupEvery = 1000).copy(image_id = "good")
    val imgs = Seq(good,
      ImageRow("flat", img(64, 48)((_, _) => gray(10)), 64, 48, "png", "cap#flat", 111L),
      ImageRow("corrupt", Array[Byte](5), 4, 4, "png", "cap#c", 222L))
    val out = new FrontierCrawler(spark, pages.toDS(), CrawlConfig(maxConcurrent = 8))
      .crawl("http://i.com/")
    val t = new IceLite(spark,
      java.nio.file.Files.createTempDirectory("icelite-cur-").toString)
    val (inserted, audit) = ImageWriteback.ingestCurated(out, pages.toDS(), imgs.toDS(), t)
    assert(inserted == 1L)
    val reasons = audit.select("media_id", "reason").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reasons == Map("flat" -> "low_entropy", "corrupt" -> "undecodable"))
    assert(t.read().select("image_id").as[String].collect().toSeq == Seq("good"))
  }
}
