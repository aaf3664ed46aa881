package graft.ops

import graft.functions.{ImageKernels, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact payload dedup (sha-256 content identity): winners, copy
  * counts, the NULL-bytes passthrough, and determinism under
  * repartitioning — against a brute-force in-test grouping over real
  * encoded PNG bytes. */
class ByteExactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def png(seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) {
      val v = ((seed * 19 + x * 7 + y * 11) % 256).toInt
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    ImageKernels.encode(img, "png")
  }

  // 24 rows, content a function of id % 5 → 5 byte-identical groups
  private def corpus = (0L until 24L)
    .map(id => (id, png(id % 5))).toDF("image_id", "bytes")

  test("winners: min id per byte-identical group with exact copy counts") {
    val got = Multimodal.byteExactWinners(corpus, "bytes", "image_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // groups 0..4: ids {0,5,10,15,20}, {1,6,11,16,21}, ... → winner = g,
    // copies = 5 for g in 0..3 and 4 for g == 4 (24 ids)
    val expected = (0L until 5L).map(g => (g, if (g < 4) 5L else 4L)).toSet
    assert(got == expected)
  }

  test("dedup filter: winners survive, copies drop, total preserved") {
    val kept = Multimodal.byteExactDedup(corpus, "bytes", "image_id")
    val ids = kept.select("image_id").as[Long].collect().toSet
    assert(ids == (0L until 5L).toSet)
    // content is preserved verbatim for the winners
    val bytesBack = kept.filter($"image_id" === 2L)
      .select("bytes").as[Array[Byte]].head()
    assert(java.util.Arrays.equals(bytesBack, png(2L)))
  }

  test("NULL-bytes rows pass through: not grouped, not dropped") {
    val withNulls = corpus.unionByName(
      Seq((100L, null.asInstanceOf[Array[Byte]]),
          (101L, null.asInstanceOf[Array[Byte]])).toDF("image_id", "bytes"))
    val kept = Multimodal.byteExactDedup(withNulls, "bytes", "image_id")
      .select("image_id").as[Long].collect().toSet
    // both null rows kept (distinct "no payload" rows are NOT copies of
    // each other), alongside the 5 content winners
    assert(kept == (0L until 5L).toSet ++ Set(100L, 101L))
    val winners = Multimodal.byteExactWinners(withNulls, "bytes", "image_id")
    assert(winners.count() == 5) // null rows never form a winner group
  }

  test("deterministic under any partitioning") {
    val base = Multimodal.byteExactWinners(corpus, "bytes", "image_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (n <- Seq(1, 3, 13)) {
      val got = Multimodal
        .byteExactWinners(corpus.repartition(n), "bytes", "image_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == base, s"repartition($n)")
    }
  }

  test("single-bit payload difference separates groups (digest sensitivity)") {
    val a = png(1L)
    val b = a.clone(); b(b.length - 9) = (b(b.length - 9) ^ 1).toByte
    val df = Seq((0L, a), (1L, a.clone()), (2L, b)).toDF("image_id", "bytes")
    val got = Multimodal.byteExactWinners(df, "bytes", "image_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 2L), (2L, 1L)))
  }
}
