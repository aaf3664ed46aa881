package graft.ops

import graft.functions.{ImageKernels, TestSpark}
import graft.functions.{ImageFunctions => IF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Orientation-canonical image dedup: `phash_canonical64` (min DCT phash
  * over the 8 dihedral orientations, derived from ONE decode + ONE DCT by
  * coefficient sign/transpose surgery), `image_psnr_oriented` (max PSNR
  * over the right image's orientations), and the
  * [[Multimodal.verifiedOrientationDup]] operator over them. The central
  * claim — coefficient-space surgery ≡ pixel-space re-hash — is pinned
  * DIFFERENTIALLY on real encodes: for every orientation k, the canonical
  * hash of the k-rotated/mirrored encode equals the original's, and the
  * brute-force min over 8 per-orientation `phash64` values equals the
  * one-decode canonical value. */
class OrientationDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random RGB image — irregular content so no DCT
    * coefficient sits near a median tie (which would let floating-point
    * summation-order noise flip a bit between the coefficient-space and
    * pixel-space paths). */
  private def randImg(w: Int, h: Int, seed: Long): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(seed)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rnd.nextInt() & 0xffffff)
    im
  }

  private def png(im: java.awt.image.BufferedImage): Array[Byte] =
    ImageKernels.encode(im, "png")

  test("canonical hash is invariant under all 8 dihedral orientations (differential vs pixel-space)") {
    // non-square on purpose: rotations swap w/h, exercising the resample
    // commutation argument, not just in-place flips
    for (seed <- Seq(1L, 7L, 99L)) {
      val base = randImg(21, 13, seed)
      val canon = ImageKernels.phashCanonical64(png(base))
      val perOrientation = (0 until 8).map { k =>
        val rotated = png(ImageKernels.orientOf(base, k))
        assert(ImageKernels.phashCanonical64(rotated) == canon,
          s"seed $seed orientation $k: canonical hash not invariant")
        ImageKernels.phash64(rotated)
      }
      // the one-decode coefficient-space min equals the brute-force
      // 8-decode pixel-space min — the exactness claim itself
      assert(perOrientation.min == canon,
        s"seed $seed: coefficient-space canonical ${canon.toHexString} != " +
          s"pixel-space min ${perOrientation.min.toHexString}")
      // and the orientations genuinely differ under the PLAIN phash
      // (otherwise this spec would test nothing)
      assert(perOrientation.distinct.size > 1, s"seed $seed: degenerate fixture")
    }
  }

  test("distinct images keep distinct canonical hashes; undecodable → 0") {
    val hs = (0L until 12L).map(s => ImageKernels.phashCanonical64(png(randImg(20, 14, s))))
    assert(hs.distinct.size == hs.size, "canonical hash collided on distinct images")
    assert(ImageKernels.phashCanonical64("not an image".getBytes) == 0L)
  }

  test("oriented PSNR: +Inf on a lossless rotation, NaN where plain PSNR is too") {
    val base = randImg(18, 11, 5L)
    val a = png(base)
    val rot = png(ImageKernels.orientOf(base, 6)) // transpose + vflip (a rot90)
    // plain PSNR cannot even compare them (18×11 vs 11×18)
    assert(ImageKernels.psnr(a, rot).isNaN)
    assert(ImageKernels.psnrOriented(a, rot) == Double.PositiveInfinity)
    // a 1-px edit of the rotated copy: high but finite
    val edited = {
      val im = ImageKernels.orientOf(base, 6)
      im.setRGB(0, 0, im.getRGB(0, 0) ^ 0x000004)
      png(im)
    }
    val p = ImageKernels.psnrOriented(a, edited)
    assert(p > 40.0 && !p.isInfinite, s"edited rotation PSNR $p")
    // incompatible dimensions in every orientation → NaN
    assert(ImageKernels.psnrOriented(a, png(randImg(7, 7, 1L))).isNaN)
    // undecodable side → NaN
    assert(ImageKernels.psnrOriented(a, "junk".getBytes).isNaN)
    assert(ImageKernels.psnrOriented("junk".getBytes, a).isNaN)
  }

  test("verifiedOrientationDup finds planted mirrored/rotated re-posts; plain verified near-dup is blind to them") {
    // 10 distinct images; image 0 re-posted mirrored (id 100) and
    // rotated 90° (id 101); image 3 re-posted unmodified (id 103)
    val base = (0L until 10L).map(i => (i, randImg(24, 16, 1000L + i)))
    val rows = base.map { case (i, im) => (i, png(im)) } ++ Seq(
      (100L, png(ImageKernels.orientOf(base(0)._2, 1))), // h-mirror
      (101L, png(ImageKernels.orientOf(base(0)._2, 6))), // rot90
      (103L, png(base(3)._2)))                           // exact re-post
    val df = rows.toDF("id", "bytes")

    val got = Multimodal.verifiedOrientationDup(df, "id", "bytes", maxHamming = 2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 100L), (0L, 101L), (100L, 101L), (3L, 103L)), got.toString)

    // the plain pipeline at the same radius sees only the exact re-post:
    // orientation changes scatter the PLAIN phash far beyond the radius
    val plain = Multimodal.verifiedPhashDup(df, "id", "bytes", maxHamming = 2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(plain == Set((3L, 103L)), plain.toString)
  }

  test("incremental: a rotated re-post in the delta is found against stored canonical hashes, corpus never re-decodes") {
    val base = (0L until 4L).map(i => (i, randImg(22, 15, 500L + i)))
    val corpus = base.map { case (i, im) =>
      val b = png(im)
      (i, b, ImageKernels.phashCanonical64(b))
    }.toDF("id", "bytes", "phash_canonical")
    val delta = Seq(
      (200L, png(ImageKernels.orientOf(base(1)._2, 6))), // rot90 of corpus 1
      (201L, png(randImg(22, 15, 999L))))                // genuinely new
      .toDF("id", "bytes")
    val got = Multimodal.verifiedOrientationDupIncremental(
      corpus, delta, "id", "bytes", maxHamming = 2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 200L)), got.toString)
    // the PLAIN incremental path over stored plain hashes misses it
    val corpusPlain = corpus.withColumn("phash",
      graft.functions.ImageFunctions.phash64($"bytes"))
    val plain = Multimodal.verifiedPhashDupIncremental(
      corpusPlain, delta, "id", "bytes", maxHamming = 2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(plain.isEmpty, plain.toString)
  }

  test("SQL registration and codegen: phash_canonical64 stays inside WholeStageCodegen") {
    graft.functions.ImageFunctions.registerAll(spark)
    val b = png(randImg(10, 10, 77L))
    val viaSql = spark.sql(
      s"SELECT phash_canonical64(X'${b.map("%02x".format(_)).mkString}')")
      .head().getLong(0)
    assert(viaSql == ImageKernels.phashCanonical64(b))

    // range-based frame: a 1-row local relation would constant-fold the
    // whole filter at plan time (ConvertToLocalRelation) and show no span
    val plan = spark.range(3)
      .select(concat(lit(b), encode($"id".cast("string"), "UTF-8")).as("bytes"))
      .filter(IF.phash_canonical64($"bytes") =!= 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter"), plan)

    // null-safety through the column API (nullIntolerant → null out)
    val out = Seq((1L, b), (2L, null.asInstanceOf[Array[Byte]])).toDF("id", "bytes")
      .select($"id", IF.phash_canonical64($"bytes").as("h"),
        IF.image_psnr_oriented($"bytes", $"bytes").as("p"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getLong(1) == ImageKernels.phashCanonical64(b))
    assert(out(0).getDouble(2) == Double.PositiveInfinity)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }
}
