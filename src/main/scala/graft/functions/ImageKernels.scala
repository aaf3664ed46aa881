package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Image kernels for the image+caption payload table (BASELINE.json
  * `input_hint`): decode via JDK `javax.imageio` (no external deps),
  * 64-bit perceptual hash (32×32 grayscale DCT, top-left 8×8 AC
  * coefficients thresholded at the median — the classic pHash recipe), and
  * PSNR for the decoded-pixel invariant (≥ 40 dB for lossy formats).
  */
object ImageKernels {

  // ImageIO defaults to a FILE-backed stream cache: every decode and every
  // encode spools through a temp file in a shared directory. Under 32
  // executor threads that inverts scaling outright (measured 12.5k
  // images/s at local[8] vs 7.1k at local[32] before this flag). All our
  // payloads are in-memory byte arrays — cache in memory.
  ImageIO.setUseCache(false)

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    if (fmt == "jpg" || fmt == "jpeg") {
      // no-alpha raster + explicit high quality: the ≥ 40 dB decoded-pixel
      // invariant presumes archival-quality lossy encoding, not the
      // ImageIO default (0.75 ≈ 28 dB on smooth gradients)
      val rgb = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
      val g = rgb.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
      val writer = ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(0.95f)
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(rgb, null, null), param)
      } finally { ios.close(); writer.dispose() }
    } else require(ImageIO.write(img, fmt, bos), s"no encoder for $fmt")
    bos.toByteArray
  }

  private def grayAt(img: BufferedImage, x: Int, y: Int): Double = {
    val rgb = img.getRGB(x, y)
    0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
  }

  /** Area-average resample to n×n grayscale. */
  private def grayResample(img: BufferedImage, n: Int): Array[Array[Double]] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = Array.ofDim[Double](n, n)
    var gy = 0
    while (gy < n) {
      val y0 = gy * h / n; val y1 = math.max(y0 + 1, (gy + 1) * h / n)
      var gx = 0
      while (gx < n) {
        val x0 = gx * w / n; val x1 = math.max(x0 + 1, (gx + 1) * w / n)
        var s = 0.0; var y = y0
        while (y < y1) { var x = x0; while (x < x1) { s += grayAt(img, x, y); x += 1 }; y += 1 }
        out(gy)(gx) = s / ((y1 - y0) * (x1 - x0))
        gx += 1
      }
      gy += 1
    }
    out
  }

  private val N = 32
  private val dctCos: Array[Array[Double]] = Array.tabulate(N, N) { (k, x) =>
    math.cos(math.Pi * k * (2 * x + 1) / (2.0 * N))
  }

  /** 64-bit perceptual hash of encoded image bytes (SURVEY.md §2.3 C8).
    * A recognized-but-corrupt container (truncated JPEG) makes ImageIO's
    * reader THROW rather than return null — treated the same as
    * undecodable (0L), like [[lumaStats]] does, so one bad crawl payload
    * cannot crash a whole dedup job. */
  def phash64(bytes: Array[Byte]): Long = {
    val img = try decode(bytes) catch { case _: Exception => null }
    if (img == null) 0L else phashOf(img)
  }

  /** [[phash64]] over an already-decoded image — shared with
    * [[imageSigRow]] so the one-decode combined signature cannot diverge
    * from the standalone hash. */
  def phashOf(img: BufferedImage): Long = bitsOf(dctBlockOf(img))

  /** The 8×8 low-frequency block of the 2-D DCT-II over the 32×32
    * grayscale resample — the shared intermediate of [[phashOf]] and
    * [[phashCanonicalOf]]. */
  private def dctBlockOf(img: BufferedImage): Array[Array[Double]] =
    dctOfGrid(grayResample(img, N))

  private def dctOfGrid(g: Array[Array[Double]]): Array[Array[Double]] = {
    val block = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0; var y = 0
        while (y < N) {
          var x = 0
          while (x < N) { s += g(y)(x) * dctCos(u)(y) * dctCos(v)(x); x += 1 }
          y += 1
        }
        block(u)(v) = s
        v += 1
      }
      u += 1
    }
    block
  }

  /** Median-threshold bit extraction over the 63 AC coefficients of an
    * 8×8 DCT block (row-major, DC excluded) — the tail of the classic
    * pHash recipe, split out so [[phashCanonicalOf]] can re-run it per
    * orientation variant (sign flips reorder the AC distribution, so the
    * median must be recomputed for each). */
  private def bitsOf(block: Array[Array[Double]]): Long = {
    val ac = (for (i <- 0 until 8; j <- 0 until 8 if !(i == 0 && j == 0)) yield block(i)(j)).toArray
    val sorted = ac.sorted
    val median = (sorted(31) + sorted(32)) / 2.0
    var bits = 0L
    var i = 0
    while (i < 63) { if (ac(i) > median) bits |= (1L << i); i += 1 }
    bits
  }

  /** Orientation-canonical perceptual hash: the minimum of [[phashOf]]
    * over the image's 8 dihedral orientations (identity, the three
    * rotations, and the four mirror images). A mirrored or rotated
    * re-post — the standard orientation-dup class of a crawled image
    * corpus — canonicalizes to the SAME 64-bit value (exactly, for a
    * lossless re-encode), so orientation dups collapse in an exact
    * groupBy on this hash.
    *
    * Cost: ONE decode, then 8 cheap remaps of the decoded raster — the
    * decode dominates the image hot path, so this prices like one plain
    * `phash64` on real payloads. Exactness: [[orientOf]] enumerates the
    * full dihedral group, so the SET of 8 oriented rasters is identical
    * (pixel-for-pixel) for an image and for any of its orientations; the
    * min over that set is therefore exactly invariant — no floating-point
    * caveats.
    *
    * Why NOT the tempting one-DCT shortcut (derive all 8 hashes from one
    * coefficient block by sign flips and transposes — DCT-II of a flipped
    * signal is the original block with (−1)^u / (−1)^v sign surgery):
    * that is only exact if the 32×32 resample commutes with flips, and
    * [[grayResample]] uses FLOOR cell boundaries (`gx·w/32`), whose
    * partition is NOT mirror-symmetric unless 32 divides the dimension —
    * a 21-px-wide image resamples its mirror into DIFFERENT boxes and the
    * surgery-derived hashes drift by real bits (measured, not
    * hypothetical). The raster-space min is exact for every size and
    * costs only remaps. Undecodable → 0L, the [[phash64]] convention. */
  def phashCanonicalOf(img: BufferedImage): Long = {
    val hs = phashOrientationsOf(img)
    var best = hs(0); var k = 1
    while (k < 8) { if (hs(k) < best) best = hs(k); k += 1 }
    best
  }

  /** All 8 dihedral-orientation phashes, in [[orientOf]]'s k-order —
    * element 0 is the plain [[phashOf]]. The full set is the LOSSY-robust
    * near-dup signature: a re-encode perturbs each orientation hash by a
    * few bits, so hamming-joining the exploded elements finds the pair
    * through the ALIGNED orientation — whereas the min alone
    * ([[phashCanonicalOf]]) can flip WHICH orientation is the numeric min
    * under perturbation, landing two near-identical images on
    * uncorrelated (~32-bit-apart) canonical values. Since element 0 is
    * the plain phash, candidates generated from this set are a strict
    * superset of plain-phash candidates at equal radius. */
  def phashOrientationsOf(img: BufferedImage): Array[Long] = {
    // one bulk pixel grab + one luma precompute, then each orientation's
    // 32×32 box-resample reads the luma array through index arithmetic —
    // bit-identical to `phashOf(orientOf(img, k))` (same luma expression,
    // same box bounds in oriented coordinates, same summation order) but
    // without materializing 8 BufferedImages through per-pixel
    // getRGB/setRGB, which measured 6× the decode on small payloads
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val lu = new Array[Double](w * h)
    var i = 0
    while (i < lu.length) {
      val rgb = px(i)
      lu(i) = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
      i += 1
    }
    val out = new Array[Long](8)
    var k = 0
    while (k < 8) {
      // oriented(x, y) = source(sx, sy): pre-transpose (X, Y), then the
      // flip bits — the same mapping [[orientOf]] writes pixel-by-pixel
      val t = (k & 4) != 0
      val ow = if (t) h else w; val oh = if (t) w else h
      val g = Array.ofDim[Double](N, N)
      var gy = 0
      while (gy < N) {
        val y0 = gy * oh / N; val y1 = math.max(y0 + 1, (gy + 1) * oh / N)
        var gx = 0
        while (gx < N) {
          val x0 = gx * ow / N; val x1 = math.max(x0 + 1, (gx + 1) * ow / N)
          var s = 0.0; var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val xx = if (t) y else x; val yy = if (t) x else y
              val sx = if ((k & 1) != 0) w - 1 - xx else xx
              val sy = if ((k & 2) != 0) h - 1 - yy else yy
              s += lu(sy * w + sx)
              x += 1
            }
            y += 1
          }
          g(gy)(gx) = s / ((y1 - y0) * (x1 - x0))
          gx += 1
        }
        gy += 1
      }
      out(k) = bitsOf(dctOfGrid(g))
      k += 1
    }
    out
  }

  /** [[phashCanonicalOf]] over encoded bytes; undecodable → 0L. */
  def phashCanonical64(bytes: Array[Byte]): Long = {
    val img = try decode(bytes) catch { case _: Exception => null }
    if (img == null) 0L else phashCanonicalOf(img)
  }

  /** [[phashOrientationsOf]] over encoded bytes as Catalyst array data —
    * the codegen entry for [[graft.functions.PhashOrientations]].
    * Undecodable → 8 zeros (each element follows the [[phash64]]
    * convention). */
  def phashOrientationsRow(bytes: Array[Byte])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val img = try decode(bytes) catch { case _: Exception => null }
    val hs = if (img == null) new Array[Long](8) else phashOrientationsOf(img)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(hs)
  }

  /** The `k`-th dihedral orientation of `img`, k ∈ [0, 8): bit 0 =
    * horizontal flip, bit 1 = vertical flip, bit 2 = transpose — the same
    * enumeration [[phashCanonicalOf]] minimizes over. */
  def orientOf(img: BufferedImage, k: Int): BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val t = (k & 4) != 0
    val out = new BufferedImage(if (t) h else w, if (t) w else h,
      BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val sx = if ((k & 1) != 0) w - 1 - x else x
        val sy = if ((k & 2) != 0) h - 1 - y else y
        if (t) out.setRGB(y, x, img.getRGB(sx, sy))
        else out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** 64-bit difference hash (dHash): area-resample to 9×8 via the PINNED
    * integer box-average kernel ([[resampleOf]] `area` — round-half-up,
    * stated in closed form), integer BT.601 luma per cell (the
    * [[lumaStats]] formula), bit `y*8+x` set iff `luma(x+1,y) > luma(x,y)`.
    * A gradient-direction signature that is deliberately NOT the DCT
    * phash: distinct content that collides in the phash's low-frequency
    * block (smooth gradients — the q53 plant) separates here, so a
    * conjunctive (phash, dhash) candidate gate prunes false near-dup
    * candidates in SIGNATURE space, before any payload bytes ride a join.
    * Every step is integer arithmetic an external system can replay —
    * the q60 oracle recomputes the full 64-bit value in SQL. */
  def dhashOf(img: BufferedImage): Long = {
    val g = resampleOf(img, 9, 8, "area")
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      var prev = {
        val p = g.getRGB(0, y)
        (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
      }
      while (x < 8) {
        val p = g.getRGB(x + 1, y)
        val cur = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
        if (cur > prev) bits |= 1L << (y * 8 + x)
        prev = cur
        x += 1
      }
      y += 1
    }
    bits
  }

  /** [[dhashOf]] over encoded bytes; undecodable → 0L (the [[phash64]]
    * failure convention — one corrupt crawl payload gates, never crashes). */
  def dhash64(bytes: Array[Byte]): Long = {
    val img = try decode(bytes) catch { case _: Exception => null }
    if (img == null) 0L else dhashOf(img)
  }

  /** Codegen entry for [[graft.functions.ImageHashes]] — phash + dhash
    * from ONE decode (the `image_sig` discipline applied to the two
    * perceptual signatures: separate `phash64` + `dhash64` calls decode
    * twice, and the decode dominates the image hot path). Undecodable →
    * (0L, 0L), matching both standalone kernels. */
  def imageHashesRow(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val img = try decode(bytes) catch { case _: Exception => null }
    if (img == null)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L))
    else
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](phashOf(img), dhashOf(img)))
  }

  /** PSNR in dB between two encoded images' decoded pixels; +Inf for
    * identical, NaN when undecodable/size-mismatched. */
  def psnr(aBytes: Array[Byte], bBytes: Array[Byte]): Double = {
    // corrupt containers throw (see phash64) — NaN, per the documented
    // 'undecodable candidates PSNR to NaN and drop' contract
    val a = try decode(aBytes) catch { case _: Exception => null }
    val b = try decode(bBytes) catch { case _: Exception => null }
    if (a == null || b == null) return Double.NaN
    psnrOf(a, b)
  }

  /** PSNR between two decoded images (no re-decode) — the [[psnr]] core.
    * NaN on size mismatch, +Inf when identical. */
  private def psnrOf(a: BufferedImage, b: BufferedImage): Double = {
    if (a.getWidth != b.getWidth || a.getHeight != b.getHeight) return Double.NaN
    var se = 0.0
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        var c = 0
        while (c < 3) {
          val d = ((pa >> (8 * c)) & 0xff) - ((pb >> (8 * c)) & 0xff)
          se += d.toDouble * d
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val mse = se / (a.getWidth.toLong * a.getHeight * 3)
    if (mse == 0.0) Double.PositiveInfinity else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** Orientation-aware PSNR: the MAXIMUM of [[psnr]] over the 8 dihedral
    * orientations of the SECOND image — the pixel-verification partner of
    * [[phashCanonical64]] (a rotated re-post PSNRs to NaN/garbage against
    * the original in its stored orientation; against the right orientation
    * it verifies like any near-dup). Decodes each side ONCE; only the 8
    * cheap pixel remaps and comparisons repeat, and orientation k is
    * skipped when its dimensions cannot match. NaN when either side is
    * undecodable or no orientation matches dimensions — same drop
    * semantics as [[psnr]]. */
  def psnrOriented(aBytes: Array[Byte], bBytes: Array[Byte]): Double = {
    val a = try decode(aBytes) catch { case _: Exception => null }
    val b = try decode(bBytes) catch { case _: Exception => null }
    if (a == null || b == null) return Double.NaN
    var best = Double.NaN
    var k = 0
    while (k < 8) {
      val dimsMatch =
        if ((k & 4) == 0) b.getWidth == a.getWidth && b.getHeight == a.getHeight
        else b.getHeight == a.getWidth && b.getWidth == a.getHeight
      if (dimsMatch) {
        val p = psnrOf(a, orientOf(b, k))
        if (best.isNaN || p > best) best = p
      }
      k += 1
    }
    best
  }

  /** Deterministic exact-target resample with PINNED integer sampling —
    * unlike [[graft.ops.Multimodal.resizeImages]]' fit-within bilinear
    * (whose Graphics2D filter taps are JDK-internal), both modes here are
    * stated in closed form so an external system (or a SQL oracle) can
    * reproduce every output pixel from the input pixels:
    *
    *  - `nearest`: dst(x,y) = src(x·srcW/dstW, y·srcH/dstH) — floor
    *    integer division (non-negative operands).
    *  - `area`: box average over the integer cell
    *    [x0,x1)×[y0,y1), x0 = x·srcW/dstW, x1 = max(x0+1, (x+1)·srcW/dstW)
    *    (the same cell bounds [[grayResample]] uses), each RGB channel
    *    averaged with round-half-up: (2·sum + n) / (2·n).
    *
    * `area` is the downscale mode a training pipeline wants (every source
    * pixel contributes); `nearest` is the bit-pinnable mode contract
    * queries verify. Upscaling degenerates both to pixel replication. */
  def resampleOf(img: BufferedImage, dstW: Int, dstH: Int, mode: String): BufferedImage = {
    require(dstW > 0 && dstH > 0, s"bad target ${dstW}x$dstH")
    val (sw, sh) = (img.getWidth, img.getHeight)
    val out = new BufferedImage(dstW, dstH, BufferedImage.TYPE_INT_RGB)
    val nearest = mode match {
      case "nearest" => true
      case "area"    => false
      case m         => throw new IllegalArgumentException(s"unknown resample mode: $m")
    }
    var y = 0
    while (y < dstH) {
      var x = 0
      while (x < dstW) {
        val rgb =
          if (nearest) img.getRGB(x * sw / dstW, y * sh / dstH) & 0xffffff
          else {
            val x0 = x * sw / dstW; val x1 = math.max(x0 + 1, (x + 1) * sw / dstW)
            val y0 = y * sh / dstH; val y1 = math.max(y0 + 1, (y + 1) * sh / dstH)
            var r = 0L; var g = 0L; var b = 0L
            var sy = y0
            while (sy < y1) {
              var sx = x0
              while (sx < x1) {
                val p = img.getRGB(sx, sy)
                r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
                sx += 1
              }
              sy += 1
            }
            val n = (x1 - x0).toLong * (y1 - y0)
            val rr = ((2 * r + n) / (2 * n)).toInt
            val gg = ((2 * g + n) / (2 * n)).toInt
            val bb = ((2 * b + n) / (2 * n)).toInt
            (rr << 16) | (gg << 8) | bb
          }
        out.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    out
  }

  /** [[resampleOf]] over encoded bytes, re-encoded as lossless PNG (so the
    * pinned pixels survive the round-trip bit-exactly). Undecodable or
    * corrupt payloads return null — the expression layer surfaces that as
    * a NULL column value, matching the 'drop undecodable' curation
    * contract (never crash the job on one bad crawl payload). */
  def resampleJ(bytes: Array[Byte], dstW: Int, dstH: Int, mode: String): Array[Byte] = {
    val img = try decode(bytes) catch { case _: Exception => null }
    if (img == null) null else encode(resampleOf(img, dstW, dstH, mode), "png")
  }

  /** Codegen entry for [[graft.functions.ImageResample]]. */
  def resample(bytes: Array[Byte], dstW: Int, dstH: Int,
      mode: org.apache.spark.unsafe.types.UTF8String): Array[Byte] =
    resampleJ(bytes, dstW, dstH, mode.toString)

  /** Header-only dimension probe: (width, height) parsed from the
    * container header — PNG IHDR, JPEG SOF scan, GIF/BMP fixed fields —
    * WITHOUT decoding any pixel data. Reads tens of bytes where a decode
    * touches megabytes: at 100 TB this is what lets aspect banding, batch
    * assignment, and size gates run as a near-free scan projection while
    * the one real decode waits until a row has earned it. Unlike the
    * payload table's recorded `w`/`h` columns (server-supplied, untrusted),
    * these dims come from the payload container itself — they are what the
    * decoder will actually produce. Unparseable/truncated → (-1, -1). */
  def dimsFastJ(bytes: Array[Byte]): (Int, Int) = {
    if (bytes == null) return (-1, -1)
    @inline def u8(i: Int) = bytes(i) & 0xff
    @inline def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    @inline def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    try sniffFormatJ(bytes) match {
      case "png" if bytes.length >= 24 =>
        // 8-byte signature + 4-byte length + "IHDR" + w,h big-endian
        (be32(16), be32(20))
      case "jpeg" =>
        // walk marker segments to the first SOFn frame header
        var i = 2
        var out = (-1, -1)
        var done = false
        while (!done && i + 9 < bytes.length) {
          if (u8(i) != 0xff) { i += 1 } // filler/garbage between segments
          else {
            val m = u8(i + 1)
            if (m == 0xff) i += 1 // fill bytes before a marker
            else if (m == 0xd9) done = true // EOI before any SOF: no frame
            else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone
            else if ((m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc) {
              out = (be16(i + 7), be16(i + 5)); done = true // SOFn: h then w
            } else i += 2 + be16(i + 2) // segment length includes itself
          }
        }
        out
      case "gif" if bytes.length >= 10 => (le16(6), le16(8))
      case "bmp" if bytes.length >= 26 => (le32(18), math.abs(le32(22)))
      case _ => (-1, -1)
    } catch { case _: IndexOutOfBoundsException => (-1, -1) }
  }

  /** Codegen entry for [[graft.functions.ImageDims]] — header dims as an
    * InternalRow (width, height). */
  def imageDimsRow(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val (w, h) = dimsFastJ(bytes)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](w, h))
  }

  /** Magic-byte container sniff over the payload's first bytes — the
    * primitive behind the fmt-vs-bytes consistency gate (the claimed `fmt`
    * column of the payload table is server-supplied and untrusted; at
    * crawl scale a measurable fraction of content types lie). Reads at
    * most 12 bytes, never decodes. Returns the canonical container name —
    * jpg normalizes to "jpeg" — or "unknown". */
  def sniffFormatJ(bytes: Array[Byte]): String = {
    @inline def at(i: Int, v: Int) = (bytes(i) & 0xff) == v
    if (bytes == null) "unknown"
    else if (bytes.length >= 8 && at(0, 0x89) && at(1, 'P') && at(2, 'N') &&
      at(3, 'G') && at(4, 0x0d) && at(5, 0x0a) && at(6, 0x1a) && at(7, 0x0a)) "png"
    else if (bytes.length >= 3 && at(0, 0xff) && at(1, 0xd8) && at(2, 0xff)) "jpeg"
    else if (bytes.length >= 6 && at(0, 'G') && at(1, 'I') && at(2, 'F') &&
      at(3, '8') && (at(4, '7') || at(4, '9')) && at(5, 'a')) "gif"
    else if (bytes.length >= 12 && at(0, 'R') && at(1, 'I') && at(2, 'F') &&
      at(3, 'F') && at(8, 'W') && at(9, 'E') && at(10, 'B') && at(11, 'P')) "webp"
    else if (bytes.length >= 4 && ((at(0, 'I') && at(1, 'I') && at(2, 0x2a) && at(3, 0)) ||
      (at(0, 'M') && at(1, 'M') && at(2, 0) && at(3, 0x2a)))) "tiff"
    else if (bytes.length >= 2 && at(0, 'B') && at(1, 'M')) "bmp"
    else "unknown"
  }

  /** Codegen entry for [[graft.functions.SniffImageFormat]]. */
  def sniffFormat(bytes: Array[Byte]): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(sniffFormatJ(bytes))

  /** One-decode luma-histogram statistics. The field definitions are the
    * [[graft.ops.ImageQuality]] contract (integer BT.601 luma, 256-bin
    * Shannon entropy, aspect = max/min side) — pinned by the q47 oracle
    * and shared by BOTH `Multimodal.imageQuality` (the batch mapPartitions
    * path) and the [[graft.functions.ImageStats]] expression (the codegen
    * column path), so the two cannot diverge. Undecodable payloads report
    * `decodable = false` with -1 dimensions and zeroed stats. */
  final case class LumaStats(decodable: Boolean, width: Int, height: Int,
      aspect: Double, meanLuma: Double, stddevLuma: Double, entropyBits: Double)

  def lumaStats(bytes: Array[Byte]): LumaStats = {
    val img = try decode(bytes) catch { case _: Exception => null }
    if (img == null) LumaStats(decodable = false, -1, -1, 0.0, 0.0, 0.0, 0.0)
    else lumaStatsOf(img)
  }

  /** [[lumaStats]] over an already-decoded image (shared with
    * [[imageSigRow]]). */
  def lumaStatsOf(img: BufferedImage): LumaStats = {
    {
      val (w, h) = (img.getWidth, img.getHeight)
      val hist = new Array[Long](256)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          hist(luma) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      var sum = 0.0; var sumSq = 0.0; var ent = 0.0
      var i = 0
      while (i < 256) {
        val c = hist(i)
        if (c > 0) {
          sum += i.toDouble * c
          sumSq += i.toDouble * i * c
          val p = c.toDouble / n
          ent -= p * (math.log(p) / math.log(2.0))
        }
        i += 1
      }
      val mean = sum / n
      val variance = math.max(0.0, sumSq / n - mean * mean)
      LumaStats(decodable = true, w, h,
        math.max(w, h).toDouble / math.min(w, h),
        mean, math.sqrt(variance), ent + 0.0) // +0.0: never emit -0.0
    }
  }

  /** Codegen entry for [[graft.functions.ImageStats]] — [[lumaStats]] as
    * an InternalRow matching the expression's struct schema. */
  def imageStatsRow(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val s = lumaStats(bytes)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](s.decodable, s.width, s.height, s.aspect,
        s.meanLuma, s.stddevLuma, s.entropyBits))
  }

  /** Codegen entry for [[graft.functions.ImageSig]] — phash + luma stats
    * from ONE decode ([[phashOf]] + [[lumaStatsOf]] over the same
    * BufferedImage), for pipelines that need both (dedup key + quality
    * gates): per-row decoder cost halves vs calling `phash64` and
    * `image_stats` separately. Undecodable → (0L, false, -1, -1, 0…),
    * matching both standalone kernels. */
  def imageSigRow(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val img = try decode(bytes) catch { case _: Exception => null }
    if (img == null)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, false, -1, -1, 0.0, 0.0, 0.0, 0.0))
    else {
      val s = lumaStatsOf(img)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](phashOf(img), s.decodable, s.width, s.height, s.aspect,
          s.meanLuma, s.stddevLuma, s.entropyBits))
    }
  }

  /** Byte-level metadata strip — the privacy scrub a crawled-image training
    * corpus needs (EXIF GPS fixes, camera serials, XMP author blocks, PNG
    * text/time chunks) performed WITHOUT a decode: the compressed pixel
    * stream is copied verbatim, so the output decodes bit-identically to
    * the input while the provenance metadata is gone. Per container:
    *  - JPEG: drops APP1–APP15 and COM marker segments (EXIF and XMP ride
    *    APP1) EXCEPT the two that change how the pixels themselves decode:
    *    APP14 (the Adobe color-transform marker — without it decoders
    *    mis-infer YCCK/CMYK vs RGB component layout and produce wrong
    *    colors) and APP2 when it carries an ICC profile (color-managed
    *    decoders apply it to the output pixels). Stripping either would
    *    break the decodes-identically contract below, so both are kept;
    *    APP0 (JFIF) is kept too (pixel density, no provenance). From SOS
    *    on, bytes copy verbatim (entropy-coded data, no markers to parse).
    *  - PNG: drops tEXt / zTXt / iTXt / eXIf / tIME ancillary chunks;
    *    critical and rendering-relevant chunks copy verbatim.
    *  - WEBP: drops the EXIF and XMP RIFF chunks, clears the matching VP8X
    *    feature-flag bits (0x08 / 0x04), and rewrites the RIFF size field.
    *  - everything else (gif / bmp / tiff / unknown, or any truncated /
    *    malformed container): returned UNCHANGED — a strip that cannot be
    *    parsed safely must never corrupt the payload. TIFF is deliberately
    *    untouched: its EXIF lives in the same IFD tree as the image
    *    structure, so stripping requires a rewrite, not a copy — gate on
    *    `sniff_image_format` upstream if TIFF provenance matters. */
  def stripMetadataJ(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null) return null
    @inline def u8(i: Int) = bytes(i) & 0xff
    @inline def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    @inline def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    try sniffFormatJ(bytes) match {
      case "jpeg" =>
        val out = new ByteArrayOutputStream(bytes.length)
        out.write(bytes, 0, 2) // SOI
        var i = 2
        while (i < bytes.length) {
          if (u8(i) != 0xff || i + 1 >= bytes.length) {
            out.write(bytes(i)); i += 1 // stray byte — keep, stay robust
          } else {
            val m = u8(i + 1)
            if (m == 0xff) { out.write(0xff); i += 1 } // fill byte
            else if (m == 0xda) { // SOS: entropy data to EOI, copy verbatim
              out.write(bytes, i, bytes.length - i); i = bytes.length
            } else if (m == 0xd8 || m == 0xd9 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
              out.write(bytes, i, 2); i += 2 // standalone marker
            } else if (i + 3 >= bytes.length || i + 2 + be16(i + 2) > bytes.length) {
              out.write(bytes, i, bytes.length - i); i = bytes.length // truncated seg
            } else {
              val len = be16(i + 2)
              // APP2 is kept only as an ICC profile container — the
              // profile changes decoded colors; other APP2 payloads
              // (e.g. FlashPix) are provenance and drop like the rest
              val iccApp2 = m == 0xe2 && len >= 14 &&
                new String(bytes, i + 4, 12,
                  java.nio.charset.StandardCharsets.ISO_8859_1) == "ICC_PROFILE\u0000"
              val strip = ((m >= 0xe1 && m <= 0xef) || m == 0xfe) &&
                m != 0xee && !iccApp2 // keep APP14 (Adobe) + ICC APP2
              if (!strip) out.write(bytes, i, 2 + len)
              i += 2 + len
            }
          }
        }
        out.toByteArray
      case "png" =>
        val strip = Set("tEXt", "zTXt", "iTXt", "eXIf", "tIME")
        val out = new ByteArrayOutputStream(bytes.length)
        out.write(bytes, 0, 8) // signature
        var i = 8
        while (i < bytes.length) {
          if (i + 8 > bytes.length || be32(i) < 0 || i + 12L + be32(i) > bytes.length) {
            out.write(bytes, i, bytes.length - i); i = bytes.length // malformed tail
          } else {
            val len = be32(i)
            val typ = new String(bytes, i + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
            if (!strip(typ)) out.write(bytes, i, 12 + len) // len+type+data+crc
            i += 12 + len
          }
        }
        out.toByteArray
      case "webp" =>
        val out = new ByteArrayOutputStream(bytes.length)
        out.write(bytes, 0, 12) // RIFF size fixed up below
        var i = 12
        while (i < bytes.length) {
          if (i + 8 > bytes.length) { out.write(bytes, i, bytes.length - i); i = bytes.length }
          else {
            val sz = le32(i + 4)
            val total = 8L + sz + (sz & 1) // chunks pad to even
            if (sz < 0 || i + total > bytes.length) {
              out.write(bytes, i, bytes.length - i); i = bytes.length
            } else {
              val fourcc = new String(bytes, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
              if (fourcc != "EXIF" && fourcc != "XMP ") {
                val at = out.size()
                out.write(bytes, i, total.toInt)
                if (fourcc == "VP8X" && sz >= 1) {
                  // clear the EXIF (0x08) / XMP (0x04) feature bits in place
                  val arr = out.toByteArray
                  arr(at + 8) = (arr(at + 8) & ~0x0c).toByte
                  out.reset(); out.write(arr, 0, arr.length)
                }
              }
              i += total.toInt
            }
          }
        }
        val arr = out.toByteArray
        val riffSz = arr.length - 8
        arr(4) = (riffSz & 0xff).toByte; arr(5) = ((riffSz >> 8) & 0xff).toByte
        arr(6) = ((riffSz >> 16) & 0xff).toByte; arr(7) = ((riffSz >> 24) & 0xff).toByte
        arr
      case _ => bytes
    } catch { case _: Exception => bytes }
  }
}
