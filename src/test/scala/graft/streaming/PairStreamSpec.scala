package graft.streaming

import graft.functions.{ImageKernels, TestSpark}
import graft.sources.IceLite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming image+caption pair curation: staged stateless gates (caption /
  * container / decoded stats), phash dedup bounded by the watermark, and a
  * foreachBatch MERGE into the snapshot table — the full writeback path as
  * a stream, emitting the payload-table shape with PROVEN w/h/fmt. */
class PairStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def img(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, f(x, y))
    ImageKernels.encode(im, "png")
  }
  private def checker(w: Int, h: Int) =
    img(w, h, (x, y) => if ((x + y) % 2 == 0) 0x000000 else 0xFFFFFF)
  // 4 even luma bands (entropy ≈ 2 bits, clears the gate) along a
  // seed-dependent gradient direction so every seed lands on a distinct
  // phash (different orientation → different low-frequency DCT)
  private def textured(seed: Int) = {
    val d = 40 * seed + 30 * (11 - seed)
    img(40, 30, (x, y) => ((x * seed + y * (11 - seed)) * 4 / d) match {
      case 0 => 0x000000
      case 1 => 0x555555
      case 2 => 0xAAAAAA
      case _ => 0xFFFFFF
    })
  }

  private val goodCap = "a photo of a red barn"
  private def ev(id: String, bytes: Array[Byte], fmt: String, cap: String, tSec: Int) =
    PairEvent(id, bytes, fmt, cap, new Timestamp(tSec * 1000L))

  test("staged gates, cross-batch phash dedup, payload shape, MERGE sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = new IceLite(spark, Files.createTempDirectory("pairstream-").toString)
    val in = MemoryStream[PairEvent]
    val out = CurationStream.curatePairs(in.toDS(), watermarkDelay = "1 hour",
      minW = 16, minH = 12)
    val q = out.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        table.mergeInsert(batch.drop("eventTime"), "phash"); ()
      }.start()
    try {
      val aBytes = textured(1)
      in.addData(
        ev("a", aBytes, "png", goodCap, 0),
        ev("a-dup", aBytes, "png", "same bytes different caption here", 1),
        ev("b", textured(2), "png", goodCap, 2),
        ev("bad-cap", textured(3), "png", "x", 3),          // caption_too_short
        ev("mismatch", textured(4), "jpeg", goodCap, 4),    // png bytes claimed jpeg
        ev("garbage", Array[Byte](1, 2, 3, 4), "png", goodCap, 5), // unknown container
        ev("tiny", checker(8, 6), "png", goodCap, 6),       // too_small
        ev("flat", img(40, 30, (_, _) => 0x777777), "png", goodCap, 7)) // low_entropy
      q.processAllAvailable()
      in.addData(
        ev("a-again", aBytes, "png", goodCap, 10),          // cross-batch dup
        ev("c", textured(5), "png", goodCap, 11))
      q.processAllAvailable()
    } finally q.stop()

    val rows = table.read()
      .select("image_id", "w", "h", "fmt", "caption", "phash")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getString(3), r.getString(4), r.getLong(5)))
    val ids = rows.map(_._1).toSet
    // exactly one of {a, a-dup} admitted in batch 1; a-again dropped by state
    assert(rows.length == 3, s"got $rows")
    assert(ids.contains("b") && ids.contains("c") && ids.exists(Set("a", "a-dup")))
    assert(!ids.contains("a-again"), "cross-batch duplicate not dropped")
    // proven metadata: decoded dims + sniffed container, real phash
    assert(rows.forall(r => r._2 == 40 && r._3 == 30 && r._4 == "png"))
    assert(rows.map(_._6).distinct.length == 3)
  }

  test("stripMetadata: admitted rows emit scrubbed bytes; phash still describes them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val tb = typ.getBytes("ISO-8859-1")
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      be32(data.length.toLong) ++ tb ++ data ++ be32(crc.getValue)
    }
    val clean = textured(6)
    // tEXt provenance injected after IHDR (8-byte sig + 25-byte IHDR)
    val tainted = clean.take(33) ++
      pngChunk("tEXt", "Author Jane Roe, GPS fix".getBytes("ISO-8859-1")) ++
      clean.drop(33)
    val table = new IceLite(spark, Files.createTempDirectory("pairstream-strip-").toString)
    val in = MemoryStream[PairEvent]
    val out = CurationStream.curatePairs(in.toDS(), watermarkDelay = "1 hour",
      minW = 16, minH = 12, stripMetadata = true)
    val q = out.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        table.mergeInsert(batch.drop("eventTime"), "phash"); ()
      }.start()
    try {
      // ts > 0: a lone epoch-0 event ties the INITIAL watermark and the
      // state store treats it as late — unrelated to the strip under test
      in.addData(ev("t", tainted, "png", goodCap, 10))
      q.processAllAvailable()
    } finally q.stop()
    val row = table.read().select("bytes", "phash").head()
    val sb = row.getAs[Array[Byte]]("bytes")
    assert(!new String(sb, "ISO-8859-1").contains("Jane Roe"),
      "provenance reached the sink")
    assert(sb.length < tainted.length)
    // the emitted phash key was computed pre-strip and must still describe
    // the stored bytes (the strip is pixel-preserving)
    assert(ImageKernels.phash64(sb) == row.getLong(1))
  }

  test("near-dup MERGE sink: a hamming-radius re-encode of a stored image is NOT inserted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = new IceLite(spark, Files.createTempDirectory("pairstream-nd-").toString)
    // seeded smooth gradient + 1-pixel green bump: flips a few phash bits
    // at archival PSNR (the planted-near-dup pattern — the banded
    // `textured` fixtures are DCT-stable under single-pixel edits, and
    // JPEG re-encodes of smooth synthetics flip too many bits to pin)
    def grad(edit: Boolean): Array[Byte] = {
      val im = graft.sources.ImageGen.render(17L, seed = 31L, w = 40, h = 30)
      if (edit) {
        val rgb = im.getRGB(1, 1)
        val g = (rgb >> 8) & 0xff
        im.setRGB(1, 1, (rgb & 0xffff00ff) | ((if (g == 255) g - 1 else g + 1) << 8))
      }
      ImageKernels.encode(im, "png")
    }
    val aBytes = grad(edit = false)
    val aEdit = grad(edit = true)
    val hd = ImageKernels.hamming64(
      ImageKernels.phash64(aBytes), ImageKernels.phash64(aEdit))
    assert(hd >= 1 && hd <= 6, s"fixture drift: edit hamming $hd")

    val in = MemoryStream[PairEvent]
    val out = CurationStream.curatePairs(in.toDS(), watermarkDelay = "1 hour",
      minW = 16, minH = 12)
    val q = out.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.ImageWriteback.mergeInsertNearDup(
          table, batch.drop("eventTime")); ()
      }.start()
    try {
      // tSec 100+: a first event at exactly epoch 0 sits ON the initial
      // watermark and dropDuplicatesWithinWatermark discards it as late
      in.addData(ev("a", aBytes, "png", goodCap, 100),
        ev("b", textured(2), "png", goodCap, 101))
      q.processAllAvailable()
      in.addData(
        // hamming-`hd` re-encode: DIFFERENT phash, so neither the stream's
        // exact-dedup state nor the MERGE key catches it — only the
        // incremental verified near-dup against the standing table does
        ev("a-re", aEdit, "png", goodCap, 200),
        // exact cross-batch dup: unchanged behavior (MERGE key drops it)
        ev("b-again", textured(2), "png", goodCap, 201),
        // genuinely new content: must still insert
        ev("c", textured(5), "png", goodCap, 202))
      q.processAllAvailable()
    } finally q.stop()

    val ids = table.read().select("image_id").as[String].collect().toSet
    assert(ids == Set("a", "b", "c"), s"got $ids")
  }

  test("orientation MERGE sink: a ROTATED re-post of a stored image is NOT inserted; table stays self-sustaining") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = new IceLite(spark, Files.createTempDirectory("pairstream-or-").toString)
    val aBytes = textured(3)
    // lossless rot90: pixel-identical content, but the PLAIN phash moves
    // far beyond any radius — only the orientation rung can suppress it
    val aRot = ImageKernels.encode(
      ImageKernels.orientOf(ImageKernels.decode(aBytes), 6), "png")
    val plainDist = ImageKernels.hamming64(
      ImageKernels.phash64(aBytes), ImageKernels.phash64(aRot))
    assert(plainDist > 6, s"fixture drift: rotation only moved $plainDist bits")

    val in = MemoryStream[PairEvent]
    val out = CurationStream.curatePairs(in.toDS(), watermarkDelay = "1 hour",
      minW = 16, minH = 12)
    val q = out.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.ImageWriteback.mergeInsertNearDup(
          table, batch.drop("eventTime"), orientation = true); ()
      }.start()
    try {
      in.addData(ev("a", aBytes, "png", goodCap, 100),
        ev("b", textured(2), "png", goodCap, 101))
      q.processAllAvailable()
      in.addData(
        ev("a-rot", aRot, "png", goodCap, 200),   // rotated re-post → suppressed
        ev("c", textured(5), "png", goodCap, 201)) // genuinely new → inserts
      q.processAllAvailable()
    } finally q.stop()

    val rows = table.read().select("image_id", "bytes", "phash", "phash_orients")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Array[Byte]]("bytes"), r.getLong(2), r.getSeq[Long](3)))).toMap
    assert(rows.keySet == Set("a", "b", "c"), s"got ${rows.keySet}")
    // every insert (empty-table path AND near-dup path) carried its array,
    // and the stored arrays are the real hashes of the stored bytes
    rows.values.foreach { case (bytes, ph, orients) =>
      assert(orients.length == 8 && orients.head == ph)
      assert(orients ==
        ImageKernels.phashOrientationsOf(ImageKernels.decode(bytes)).toSeq)
    }
  }

  test("pairReasons audit annotation labels every gate; batch and stream shapes agree") {
    import spark.implicits._
    val batch = Seq(
      ev("ok", textured(6), "png", goodCap, 0),
      ev("no-cap", textured(7), "png", "", 1),
      ev("long-cap", textured(8), "png", Seq.fill(130)("w").mkString(" "), 2),
      ev("digits", textured(9), "png", "1 2 3 4 5 6", 3),
      ev("claimed-gif", textured(10), "gif", goodCap, 4),
      ev("not-image", Array[Byte](9, 9, 9), "png", goodCap, 5),
      ev("tiny", checker(8, 6), "png", goodCap, 6),
      ev("stretch", checker(80, 16), "png", goodCap, 7),
      ev("flat", img(40, 30, (_, _) => 0x313131), "png", goodCap, 8)).toDF()
    val reasons = CurationStream.pairReasons(batch, minW = 16, minH = 12)
      .select("image_id", "reason").as[(String, Option[String])].collect().toMap
    assert(reasons == Map(
      "ok" -> None,
      "no-cap" -> Some("caption_missing"),
      "long-cap" -> Some("caption_too_long"),
      "digits" -> Some("caption_low_alpha"),
      "claimed-gif" -> Some("format_mismatch"),
      "not-image" -> Some("unknown_container"),
      "tiny" -> Some("too_small"),
      "stretch" -> Some("extreme_aspect"),
      "flat" -> Some("low_entropy")))
  }

  test("captionBudget: lifetime per-caption admission across micro-batches, other captions unaffected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[PairEvent]
    val out = CurationStream.captionBudget(
      CurationStream.curatePairs(in.toDS(), watermarkDelay = "1 hour",
        minW = 16, minH = 12), cap = 2)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("capbudget").start()
    try {
      // batch 1: three distinct images with the SAME caption (distinct
      // phash so dedup admits all three) + one other-caption image;
      // in-batch order must admit the 2 smallest ids
      in.addData(
        ev("h3", textured(3), "png", goodCap, 0),
        ev("h1", textured(1), "png", goodCap, 1),
        ev("h2", textured(2), "png", goodCap, 2),
        ev("u1", textured(4), "png", "a photo of a blue door", 3))
      q.processAllAvailable()
      // batch 2: the budget is LIFETIME — two more same-caption images
      // get nothing even though this batch alone is under the cap; the
      // other caption still has room
      in.addData(
        ev("h4", textured(5), "png", goodCap, 10),
        ev("h5", textured(6), "png", goodCap, 11),
        ev("u2", textured(7), "png", "a photo of a blue door", 12))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT image_id FROM capbudget")
      .as[String].collect().toSet
    assert(got == Set("h1", "h2", "u1", "u2"), got.toString)
  }
}
