package graft.operators

import graft.functions.{ImageFunctions, ImageKernels, TestSpark}
import graft.model.CrawlConfig
import graft.sources.{IceLite, ImageGen, SiteGraph}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The image+caption payload path (BASELINE.json `input_hint`): phash, the
  * decoded-pixel PSNR ≥ 40 dB invariant, caption equality, and the
  * Iceberg-style MERGE-on-phash writeback with snapshot time travel.
  */
class ImagePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private lazy val images = ImageGen.localImages(40, seed = 42L, dupEvery = 10)

  test("phash: deterministic; planted duplicates collide; distinct content mostly distinct") {
    val again = ImageGen.localImages(40, seed = 42L, dupEvery = 10)
    assert(images.map(_.phash) == again.map(_.phash))
    // every 10th image (from id 19 on) repeats content of id-10 → equal phash
    assert(images(19).phash == images(9).phash)
    assert(images(29).phash == images(19).phash)
    assert(images(19).image_id != images(9).image_id)
    val distinctFrac = images.map(_.phash).distinct.size.toDouble / images.size
    assert(distinctFrac > 0.6, s"phash collapsing too much: $distinctFrac")
  }

  test("PSNR ≥ 40 dB for lossy formats, exact bytes for lossless (input_hint invariant)") {
    images.foreach { im =>
      val ck = im.caption.split("#").last.toLong
      val reference = ImageKernels.encode(ImageGen.render(ck, 42L, im.w, im.h), "png")
      val p = ImageKernels.psnr(im.bytes, reference)
      if (im.fmt == "jpg") assert(p >= 40.0, s"${im.image_id} ($im.fmt) PSNR $p < 40")
      else assert(p.isPosInfinity, s"${im.image_id} (${im.fmt}) lossless not exact: $p")
    }
  }

  test("PHash64 / ImagePsnr expressions match kernels through a Spark plan (and SQL)") {
    val df = images.take(8).toDF()
    val got = df.select($"image_id", ImageFunctions.phash64($"bytes").as("ph"),
      ImageFunctions.image_psnr($"bytes", $"bytes").as("self"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byId = images.map(i => i.image_id -> i).toMap
    got.foreach { case (id, ph, self) =>
      assert(ph == byId(id).phash)
      assert(self.isPosInfinity)
    }
    ImageFunctions.registerAll(spark)
    df.createOrReplaceTempView("imgs")
    val sqlPh = spark.sql("select phash64(bytes) from imgs where image_id = 'img_00000000'")
      .head().getLong(0)
    assert(sqlPh == byId("img_00000000").phash)
  }

  test("icelite: append, MERGE-on-phash dedup, snapshot time travel, atomic pointer") {
    val t = new IceLite(spark, Files.createTempDirectory("icelite-").toString)
    val (a, b) = images.splitAt(25)
    assert(t.mergeInsert(a.toDF(), "phash") == a.map(_.phash).distinct.size)
    val v1 = t.currentVersion()
    val v1Count = t.read().count()
    // second merge overlaps: only phashes unseen in v1 insert
    val inserted = t.mergeInsert(b.toDF(), "phash")
    val expectedNew = b.map(_.phash).distinct.toSet.diff(a.map(_.phash).toSet).size
    assert(inserted == expectedNew)
    assert(t.read().count() == v1Count + expectedNew)
    // full re-merge is a no-op and does not advance the snapshot
    val vBefore = t.currentVersion()
    assert(t.mergeInsert(images.toDF(), "phash") == 0)
    assert(t.currentVersion() == vBefore)
    // time travel: v1 still readable and unchanged
    assert(t.readAt(v1).count() == v1Count)
    // table is keyed: no duplicate phash
    assert(t.read().select("phash").distinct().count() == t.read().count())
  }

  test("icelite phash partitioning: merge ≡ unpartitioned; only touched partitions read") {
    val plain = new IceLite(spark, Files.createTempDirectory("icelite-plain-").toString)
    val parted = new IceLite(spark, Files.createTempDirectory("icelite-part-").toString,
      partition = Some(IceLite.phashPartition()))
    val (a, b) = images.splitAt(25)
    assert(parted.mergeInsert(a.toDF(), "phash") == plain.mergeInsert(a.toDF(), "phash"))
    assert(parted.mergeInsert(b.toDF(), "phash") == plain.mergeInsert(b.toDF(), "phash"))
    // identical table content (modulo row order), partition column not exposed
    assert(parted.read().columns.sorted.toSeq == plain.read().columns.sorted.toSeq)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("phash", "image_id", "caption").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(key(parted.read()) == key(plain.read()))

    // pruning: a merge touching a strict subset of partition values reads
    // only those partitions' directories
    val allParts = images.map(i => i.phash >>> 56).distinct.map(_.toString)
    assert(allParts.size > 1, "fixture spans one partition — weak test")
    val touched = Seq(allParts.head)
    val prunedDirs = parted.partitionDirs(touched)
    val allDirs = parted.partitionDirs(allParts)
    assert(prunedDirs.nonEmpty && prunedDirs.size < allDirs.size)
    assert(prunedDirs.forall(_.contains(s"__p=${allParts.head}")))
    // and the pruned read-set contains files only under those directories
    val files = spark.read.parquet(prunedDirs: _*).inputFiles
    assert(files.nonEmpty && files.forall(f => prunedDirs.exists(f.contains)))
  }

  test("pair-gated writeback: caption/container/stats gates filter the MERGE") {
    import graft.model.PageRow
    val pages = (1 to 8).map(i => PageRow(s"http://h.com/$i", 200, None,
      if (i < 8) Seq(s"http://h.com/${i + 1}") else Nil, None,
      Some("text/html"), None, Some(s"img$i")))
    val base = (1 to 8).map(i =>
      ImageGen.imageFor(i.toLong, seed = 11L, dupEvery = 100).copy(image_id = s"img$i"))
    def enc(i: Int, w: Int, h: Int, flat: Boolean) = {
      val img =
        if (flat) {
          val im = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = im.createGraphics()
          g.setColor(new java.awt.Color(90, 90, 90)); g.fillRect(0, 0, w, h); g.dispose()
          im
        } else ImageGen.render(i.toLong, 11L, w, h)
      ImageKernels.encode(img, base(i - 1).fmt)
    }
    val imgs = base.map(r => r.image_id match {
      case "img2" => r.copy(caption = "x")                     // caption_too_short
      case "img3" => r.copy(fmt = "gif")                       // claim lies about container
      case "img4" => r.copy(bytes = Array[Byte](1, 2, 3))      // not an image at all
      case "img5" => r.copy(bytes = enc(5, 16, 12, flat = false)) // too_small
      case "img6" => r.copy(bytes = enc(6, 40, 32, flat = true))  // low_entropy
      case "img7" => r.copy(bytes = enc(7, 200, 40, flat = false)) // extreme_aspect
      case _ => r
    })
    val out = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(maxConcurrent = 8)).crawl("http://h.com/1")
    val t = new IceLite(spark, Files.createTempDirectory("icelite-pairs-").toString)
    val (inserted, audit) = ImageWriteback.ingestCuratedPairs(
      out, pages.toDS(), imgs.toDS(), t)
    assert(inserted == 2) // img1 + img8 survive every gate
    assert(t.read().select("image_id").as[String].collect().toSet == Set("img1", "img8"))
    val reasons = audit.as[(String, String)].collect().toMap
    assert(reasons == Map(
      "img2" -> "caption_too_short", "img3" -> "format_mismatch",
      "img4" -> "unknown_container", "img5" -> "too_small",
      "img6" -> "low_entropy", "img7" -> "extreme_aspect"))
  }

  test("pair-gated writeback with stripMetadata: stored bytes are scrubbed, phash intact") {
    import graft.model.PageRow
    def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val tb = typ.getBytes("ISO-8859-1")
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      be32(data.length.toLong) ++ tb ++ data ++ be32(crc.getValue)
    }
    val pages = (1 to 2).map(i => PageRow(s"http://m.com/$i", 200, None,
      if (i < 2) Seq(s"http://m.com/${i + 1}") else Nil, None,
      Some("text/html"), None, Some(s"img$i")))
    val base = (1 to 2).map { i =>
      val b = ImageKernels.encode(ImageGen.render(i.toLong, 13L, 48, 36), "png")
      graft.sources.ImageRow(s"img$i", b, 48, 36, "png",
        s"a photo of test scene $i", ImageKernels.phash64(b))
    }
    val pngIdx = 0
    // inject a provenance chunk after IHDR (8-byte sig + 25-byte IHDR);
    // pixel stream untouched, so the row's precomputed phash stays correct
    val tainted = base(pngIdx).bytes.take(33) ++
      pngChunk("tEXt", "Author Jane Roe, GPS fix".getBytes("ISO-8859-1")) ++
      base(pngIdx).bytes.drop(33)
    val imgs = base.updated(pngIdx, base(pngIdx).copy(bytes = tainted))
    val out = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(maxConcurrent = 8)).crawl("http://m.com/1")
    val t = new IceLite(spark, Files.createTempDirectory("icelite-strip-").toString)
    val (inserted, _) = ImageWriteback.ingestCuratedPairs(
      out, pages.toDS(), imgs.toDS(), t, stripMetadata = true)
    assert(inserted == 2)
    val stored = t.read().select("image_id", "bytes", "phash").collect()
      .map(r => r.getString(0) -> ((r.getAs[Array[Byte]]("bytes"), r.getLong(2)))).toMap
    val (sb, sp) = stored(base(pngIdx).image_id)
    assert(!new String(sb, "ISO-8859-1").contains("Jane Roe"),
      "provenance reached the snapshot table")
    assert(sb.length < tainted.length)
    assert(ImageKernels.phash64(sb) == sp, "stored phash no longer describes stored bytes")
  }

  test("pair-gated writeback with storeOrientations: stored arrays serve incremental orientation dedup with zero corpus re-decodes") {
    import graft.model.PageRow
    val pages = (1 to 2).map(i => PageRow(s"http://o.com/$i", 200, None,
      if (i < 2) Seq(s"http://o.com/${i + 1}") else Nil, None,
      Some("text/html"), None, Some(s"img$i")))
    val imgs = (1 to 2).map(i =>
      ImageGen.imageFor(i.toLong, seed = 29L, dupEvery = 100).copy(image_id = s"img$i"))
    val out = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(maxConcurrent = 8)).crawl("http://o.com/1")
    val t = new IceLite(spark, Files.createTempDirectory("icelite-orients-").toString)
    val (inserted, _) = ImageWriteback.ingestCuratedPairs(
      out, pages.toDS(), imgs.toDS(), t, storeOrientations = true)
    assert(inserted == 2)
    // the stored array is the real 8-orientation hash set of the stored
    // bytes (element 0 = the stored phash), ready for signature-space use
    val stored = t.read().select("image_id", "bytes", "phash", "phash_orients")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Array[Byte]]("bytes"), r.getLong(2), r.getSeq[Long](3)))).toMap
    stored.values.foreach { case (b, ph, orients) =>
      assert(orients.length == 8)
      assert(orients.head == ph, "element 0 must be the stored phash")
      assert(orients == ImageKernels.phashOrientationsOf(ImageKernels.decode(b)).toSeq)
    }
    // a rotated re-post of a stored image arrives later: the incremental
    // sweep finds it against the STORED arrays — the corpus side carries
    // no decode (bytes attach to candidate pairs only). Lossless rotation
    // keeps this fixture exact-by-construction; the LOSSY robustness of
    // the exploded-set join is OrientationDupSpec's job.
    val (srcBytes, _, _) = stored("img1")
    val delta = Seq(("delta1",
        ImageKernels.encode(ImageKernels.orientOf(ImageKernels.decode(srcBytes), 6), "png")),
      ("delta2", ImageKernels.encode(ImageGen.render(77L, 29L, 40, 30), "png")))
      .toDF("image_id", "bytes")
    val dup = graft.ops.Multimodal.verifiedOrientationDupIncremental(
      t.read(), delta, "image_id", "bytes", maxHamming = 6, minPsnrDb = 40.0)
      .select("d1", "d2").as[(String, String)].collect().toSet
    assert(dup == Set(("delta1", "img1")), dup.toString)
  }

  test("re-crawl writeback: keep-best upsert replaces lower-res copies, keeps better ones") {
    import graft.model.PageRow
    import graft.sources.ImageRow
    def pg(i: Int, img: String) = PageRow(s"http://r.com/$i", 200, None,
      if (i < 3) Seq(s"http://r.com/${i + 1}") else Nil, None,
      Some("text/html"), None, Some(img))
    val pages = (1 to 3).map(i => pg(i, s"im$i"))
    def row(id: String, ph: Long, w: Int, h: Int) =
      ImageRow(id, Array[Byte](1, 2), w, h, "png", s"cap $id", ph)
    val t = new IceLite(spark, Files.createTempDirectory("icelite-best-").toString,
      partition = Some(IceLite.phashPartition()))
    val out = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(maxConcurrent = 8)).crawl("http://r.com/1")
    // first pass: three fresh phashes insert
    val first = Seq(row("im1", 100L, 10, 10), row("im2", 200L, 20, 20),
      row("im3", 300L, 30, 30))
    assert(ImageWriteback.ingestBest(out, pages.toDS(), first.toDS(), t) == ((3L, 0L)))
    // re-crawl: im1 re-fetched at higher resolution (same phash) → replaces;
    // im2 re-fetched smaller → no-op; a brand-new phash inserts
    val second = Seq(row("im1", 100L, 50, 40), row("im2", 200L, 5, 5),
      row("im3", 400L, 8, 8))
    assert(ImageWriteback.ingestBest(out, pages.toDS(), second.toDS(), t) == ((1L, 1L)))
    val got = t.read().select("phash", "w").as[(Long, Int)].collect().toMap
    assert(got == Map(100L -> 50, 200L -> 20, 300L -> 30, 400L -> 8))
  }

  test("crawl → writeback: visited pages' payloads land deduped; captions round-trip exactly") {
    val pages = SiteGraph.localPages(SiteGraph.GraphParams(nHosts = 1, pagesPerHost = 40,
      linksPerPage = 4, redirectFrac = 0.05, errorFrac = 0.05, seed = 3L))
    // payload table keyed by the pages' imageId pointers
    val ids = pages.flatMap(_.imageId)
    val imgs = ids.zipWithIndex.map { case (id, i) =>
      ImageGen.imageFor(i.toLong, seed = 7L, dupEvery = 8).copy(image_id = id)
    }
    val seed = pages.find(_.status == 200).get.url
    val out = new FrontierCrawler(spark, pages.toDS(), CrawlConfig(maxConcurrent = 8)).crawl(seed)

    val t = new IceLite(spark, Files.createTempDirectory("icelite-wb-").toString,
      partition = Some(IceLite.phashPartition()))
    val inserted = ImageWriteback.ingest(out, pages.toDS(), imgs.toDS(), t)

    val visited = out.sortedFound.toSet
    val visitedImageIds = pages.filter(p => visited(p.url)).flatMap(_.imageId).toSet
    val expected = imgs.filter(i => visitedImageIds(i.image_id)).map(_.phash).distinct.size
    assert(inserted == expected, "MERGE inserted row count mismatch")

    // caption equality per input_hint: table rows carry the source captions
    val src = imgs.map(i => i.phash -> i.caption).toMap
    val back = t.read().select("phash", "caption").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    back.foreach { case (ph, cap) => assert(src.values.toSet.contains(cap) && src.contains(ph)) }
    // and pixels: stored bytes are exactly the source bytes for these rows
    val pairs = t.read().as[graft.sources.ImageRow].collect()
    val byId = imgs.map(i => i.image_id -> i).toMap
    pairs.foreach { row =>
      val p = ImageKernels.psnr(row.bytes, byId(row.image_id).bytes)
      assert(p.isPosInfinity, s"stored bytes differ for ${row.image_id}")
    }
  }
}
