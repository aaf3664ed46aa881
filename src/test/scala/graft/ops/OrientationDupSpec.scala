package graft.ops

import graft.functions.{ImageKernels, TestSpark}
import graft.functions.{ImageFunctions => IF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Orientation-aware image dedup: `phash_orientations` (all 8 dihedral
  * orientation phashes from ONE decode — one bulk pixel grab + 8
  * index-arithmetic resamples, element 0 = the plain phash),
  * `phash_canonical64` (the array min — exactly invariant for LOSSLESS
  * orientation re-posts), `image_psnr_oriented` (max PSNR over the right
  * image's orientations), and [[Multimodal.verifiedOrientationDup]] which
  * hamming-joins the EXPLODED hash sets (lossy-robust: a re-encode can
  * flip WHICH orientation is the numeric min, so the canonical value
  * alone would land perturbed pairs on uncorrelated hashes). The
  * index-arithmetic kernel is pinned DIFFERENTIALLY on real encodes: for
  * every orientation k, the canonical hash of the k-rotated/mirrored
  * encode equals the original's, and the brute-force min over 8
  * per-orientation `phash64` values (each a real decode of a real
  * re-encode) equals the one-decode canonical value. */
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

  /** Box-blurred grayscale noise — the JPEG-compatible lossy fixture.
    * Why not raw noise: JPEG quantizes away the high frequencies noise
    * lives in (phash drift 30+ bits at quality 0.95). Why not pure
    * sinusoids: with only a handful of spectral components, most of the
    * 63 AC coefficients cluster at ~0 right where the phash median sits,
    * so microscopic re-encode noise flips many near-tie bits (measured
    * 6-24). One blur pass of noise has a broadband, decaying spectrum —
    * coefficients spread away from the median — giving DRIFT 0 on every
    * aligned orientation at ≥ 42 dB, while distinct orientations stay
    * ~30 bits apart (probed over 40 seeds). */
  private def blurNoise(w: Int, h: Int, seed: Long): java.awt.image.BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val g0 = Array.fill(h, w)(rnd.nextInt(256).toDouble)
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      var s = 0.0; var c = 0
      for (dy <- -1 to 1; dx <- -1 to 1) {
        val yy = y + dy; val xx = x + dx
        if (yy >= 0 && yy < h && xx >= 0 && xx < w) { s += g0(yy)(xx); c += 1 }
      }
      val v = (s / c).toInt.max(0).min(255)
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    im
  }

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
      // the one-decode index-arithmetic min equals the brute-force
      // 8-decode pixel-space min — the bit-exactness claim itself
      assert(perOrientation.min == canon,
        s"seed $seed: index-arithmetic canonical ${canon.toHexString} != " +
          s"pixel-space min ${perOrientation.min.toHexString}")
      // and the full orientation array matches the 8 per-encode hashes
      // element-wise in k-order (PNG round-trips pixels exactly)
      assert(ImageKernels.phashOrientationsOf(
        ImageKernels.decode(png(base))).toSeq == perOrientation)
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

  test("LOSSY rotated re-post: found via the exploded hash set even when min-canonicalization flips orientation") {
    // the instability the exploded-set design exists for: a JPEG
    // re-encode perturbs every orientation hash by a few bits, which can
    // change WHICH orientation is the numeric min — two near-identical
    // images then carry uncorrelated canonical values, and a canonical-
    // hash hamming join would silently lose the pair. The exploded join
    // meets the pair through its ALIGNED orientation regardless.
    val imgs = (0 until 40).map(s => blurNoise(96, 72, 3000L + s))
    val rows = imgs.zipWithIndex.map { case (im, i) => (i.toLong, png(im)) } ++
      imgs.zipWithIndex.map { case (im, i) =>
        // rotated + lossy re-encoded copy of every image
        (1000L + i, ImageKernels.encode(ImageKernels.orientOf(im, 6), "jpeg"))
      }
    val df = rows.toDF("id", "bytes")
    val got = Multimodal.verifiedOrientationDup(df, "id", "bytes",
      maxHamming = 6, minPsnrDb = 40.0)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val want = (0 until 40).map(i => (i.toLong, 1000L + i)).toSet
    // every planted pair is recovered; nothing spurious survives PSNR
    assert(got == want, s"missing: ${want -- got}; spurious: ${got -- want}")
    // at least one planted pair genuinely flips its canonical orientation
    // under the re-encode — the scenario a canonical-only join loses
    val flipped = rows.toMap
    val canonFlips = (0 until 40).count { i =>
      val ha = ImageKernels.phashOrientationsOf(ImageKernels.decode(flipped(i.toLong)))
      val hb = ImageKernels.phashOrientationsOf(ImageKernels.decode(flipped(1000L + i)))
      ImageKernels.hamming64(ha.min, hb.min) > 6
    }
    assert(canonFlips > 0, "fixture no longer exercises the min-flip instability")
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

  test("incremental: a rotated re-post in the delta is found against stored orientation arrays, corpus never re-decodes") {
    val base = (0L until 4L).map(i => (i, blurNoise(64, 48, 500L + i)))
    val corpus = base.map { case (i, im) =>
      val b = png(im)
      (i, b, ImageKernels.phashOrientationsOf(ImageKernels.decode(b)).toSeq)
    }.toDF("id", "bytes", "phash_orients")
    val delta = Seq(
      (200L, ImageKernels.encode(ImageKernels.orientOf(base(1)._2, 6), "jpeg")), // lossy rot90 of corpus 1
      (201L, png(randImg(22, 15, 999L))))                // genuinely new
      .toDF("id", "bytes")
    val got = Multimodal.verifiedOrientationDupIncremental(
      corpus, delta, "id", "bytes", maxHamming = 6, minPsnrDb = 40.0)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 200L)), got.toString)
    // the PLAIN incremental path over stored plain hashes misses it
    val corpusPlain = corpus.withColumn("phash",
      graft.functions.ImageFunctions.phash64($"bytes"))
    val plain = Multimodal.verifiedPhashDupIncremental(
      corpusPlain, delta, "id", "bytes", maxHamming = 6)
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
