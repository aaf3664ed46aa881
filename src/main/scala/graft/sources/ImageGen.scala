package graft.sources

import graft.functions.ImageKernels
import java.awt.image.BufferedImage
import org.apache.spark.sql.{Dataset, SparkSession}

/** One row of the payload table — the exact `input_hint` schema from
  * BASELINE.json: (image_id:string, bytes:binary, w:int32, h:int32,
  * fmt:string, caption:string, phash:int64). */
final case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long)

/** Deterministic in-process synthetic images (FIXTURES.md §2) — smooth
  * seeded gradients (JPEG-friendly so the ≥ 40 dB PSNR invariant is
  * meaningful), encoded with JDK `javax.imageio`; captions deterministic;
  * duplicates planted on purpose to exercise the MERGE-on-phash dedup.
  */
object ImageGen {

  private val Fmts = Array("png", "jpg", "bmp")
  private val Words = Array("red", "blue", "ochre", "teal", "plasma", "dune",
    "ridge", "mist", "tide", "ember", "field", "arc")

  /** Pixel-content seed for image `id`: every `dupEvery`-th image repeats
    * the content of the canonical image `dupEvery-1` (same pixels ⇒ same
    * bytes ⇒ same phash ⇒ MERGE duplicate), under a fresh image_id. */
  private def contentKey(id: Long, dupEvery: Int): Long =
    if (dupEvery > 0 && id % dupEvery == (dupEvery - 1)) dupEvery - 1 else id

  /** Smooth seeded gradient: continuous (clamped, never wrapping) channels
    * so high-quality JPEG stays comfortably above the 40 dB invariant —
    * hard wrap edges would put ringing artifacts everywhere. */
  def render(contentKey: Long, seed: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val r = SiteGraph.mix(seed, contentKey)
    val a1 = SiteGraph.unit(SiteGraph.mix(r, 1L)) * 3 + 0.5
    val a2 = SiteGraph.unit(SiteGraph.mix(r, 2L)) * 3 + 0.5
    val chroma = SiteGraph.unit(SiteGraph.mix(r, 3L)) * 60
    def clamp(v: Double): Int = math.max(0, math.min(255, v.toInt))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val fx = x.toDouble / w; val fy = y.toDouble / h
        val luma = (math.sin(a1 * fx * math.Pi) * 0.5 + 0.5) * 180 + 40 * fy
        val red = clamp(luma + chroma * math.sin(a2 * fy * math.Pi))
        val grn = clamp(luma)
        val blu = clamp(luma + chroma * fx * fy)
        img.setRGB(x, y, (red << 16) | (grn << 8) | blu)
        x += 1
      }
      y += 1
    }
    img
  }

  def imageFor(id: Long, seed: Long, dupEvery: Int): ImageRow = {
    val ck = contentKey(id, dupEvery)
    val rr = SiteGraph.mix(seed, 100L, ck)
    val w = 48 + ((SiteGraph.mix(rr, 1L) >>> 33) % 48).toInt
    val h = 32 + ((SiteGraph.mix(rr, 2L) >>> 33) % 48).toInt
    val fmt = Fmts(((SiteGraph.mix(rr, 3L) >>> 33) % Fmts.length).toInt)
    val bytes = ImageKernels.encode(render(ck, seed, w, h), fmt)
    val caption = {
      val n = 3 + ((SiteGraph.mix(rr, 4L) >>> 33) % 4).toInt
      (0 until n).map(i => Words(((SiteGraph.mix(rr, 5L + i) >>> 33) % Words.length).toInt))
        .mkString(" ") + s" #$ck"
    }
    ImageRow(f"img_$id%08d", bytes, w, h, fmt, caption, ImageKernels.phash64(bytes))
  }

  def localImages(n: Int, seed: Long = 42L, dupEvery: Int = 10): Seq[ImageRow] =
    (0L until n.toLong).map(imageFor(_, seed, dupEvery))

  /** Distributed generation — narrow map over `spark.range`, no shuffle. */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L, dupEvery: Int = 10): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .map(id => imageFor(id, seed, dupEvery))
  }
}
