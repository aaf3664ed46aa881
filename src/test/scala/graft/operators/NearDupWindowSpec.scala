package graft.operators

import graft.functions.{ImageKernels, TestSpark}
import graft.sources.IceLite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** `mergeInsertNearDup`'s bounded-recency corpus window
  * ([[graft.sources.IceLite.readRecent]]): the near-dup check covers the
  * newest K commits — re-encodes of the recent corpus are suppressed,
  * older duplicates land (the batch sweep's job), and the full-table
  * default is unchanged. The windowed contract SCALE.md §7d prescribes
  * for tables too large to scan per trigger. */
class NearDupWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Smooth gradient + e green ±1 nudges — on smooth images the 8×8 DCT
    * coefficients cluster near the phash median, so tiny (PSNR ≈ 84 dB)
    * edits flip hash bits (noise images need PSNR-failing perturbations
    * to move the hash at all). */
  private def gradient(k: Long, edits: Int): Array[Byte] = {
    val img = graft.sources.ImageGen.render(k, seed = 29L, w = 48, h = 36)
    (0 until edits).foreach { e =>
      val rgb = img.getRGB(1 + e, 1)
      val g = (rgb >> 8) & 0xff
      val g2 = if (g == 255) g - 1 else g + 1
      img.setRGB(1 + e, 1, (rgb & 0xffff00ff) | (g2 << 8))
    }
    ImageKernels.encode(img, "png")
  }

  /** A re-encode of `k`'s image at hamming 1..6 AND PSNR ≥ 41 dB from the
    * original — searched, not assumed, so suppression can neither come
    * from the exact-dup MERGE key (hamming 0) nor be skipped by the
    * verify (PSNR < 40). */
  private def nearCopy(k: Long): Array[Byte] = {
    val orig = gradient(k, 0)
    val base = ImageKernels.phash64(orig)
    (1 to 32).iterator.map(gradient(k, _))
      .find { b =>
        val h = java.lang.Long.bitCount(ImageKernels.phash64(b) ^ base)
        h >= 1 && h <= 6 && ImageKernels.psnr(orig, b) >= 41.0
      }
      .getOrElse(fail(s"no edit strength lands hamming 1..6 for k=$k"))
  }

  /** 3 gradient seeds pairwise FAR (> 8 bits) in phash space — distinct
    * gradients can collide, which would suppress a row the test keeps. */
  private lazy val farSeeds: Seq[Long] = {
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var k = 0L
    while (picked.size < 3 && k < 64) {
      val ph = ImageKernels.phash64(gradient(k, 0))
      if (picked.forall(p => java.lang.Long.bitCount(p._2 ^ ph) > 8))
        picked += ((k, ph))
      k += 1
    }
    assert(picked.size == 3, s"only ${picked.size} mutually-far seeds in 0..63")
    picked.map(_._1).toSeq
  }

  private def payload(rows: Seq[(String, Array[Byte])]): DataFrame = {
    import spark.implicits._
    rows.toDF("image_id", "bytes")
      .withColumn("w", lit(48)).withColumn("h", lit(36))
      .withColumn("fmt", lit("png"))
      .withColumn("caption", concat(lit("a photo of "), col("image_id")))
      .withColumn("phash", graft.functions.ImageFunctions.phash64(col("bytes")))
  }

  private def ids(df: DataFrame): Set[String] =
    df.select("image_id").collect().map(_.getString(0)).toSet

  test("corpusWindow bounds the near-dup check to the newest commits; default covers all") {
    val Seq(k1, k2, k3) = farSeeds
    def freshTable(): IceLite = {
      val t = new IceLite(spark,
        Files.createTempDirectory("neardup-window-").toString)
      // two separate commits: batch-00001 holds old, batch-00002 recent
      ImageWriteback.mergeInsertNearDup(t, payload(Seq("old" -> gradient(k1, 0))))
      ImageWriteback.mergeInsertNearDup(t, payload(Seq("recent" -> gradient(k2, 0))))
      assert(ids(t.readRecent(1)) == Set("recent")) // window read is exact
      assert(ids(t.readRecent(2)) == Set("old", "recent"))
      t
    }
    val batch = payload(Seq("old-near" -> nearCopy(k1),
      "recent-near" -> nearCopy(k2), "new" -> gradient(k3, 0)))
    // window = 1 newest commit: the recent re-encode is suppressed, the
    // OLD one lands (the documented miss the batch sweep owns), new inserts
    val windowed = freshTable()
    ImageWriteback.mergeInsertNearDup(windowed, batch, corpusWindow = 1)
    assert(ids(windowed.read()) == Set("old", "recent", "old-near", "new"))
    // default full-table corpus: both re-encodes suppressed
    val full = freshTable()
    ImageWriteback.mergeInsertNearDup(full, batch)
    assert(ids(full.read()) == Set("old", "recent", "new"))
  }
}
