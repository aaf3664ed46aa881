package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Receipt for the header-only `image_dims` probe: aspect-band assignment
  * over the same generated corpus computed two ways — from `image_stats`
  * (full pixel decode per row) and from `image_dims` (container-header
  * parse, tens of bytes per row). The band histograms must come out
  * identical (asserted); the wall-clock gap is what the training-batch
  * assembly path saves by never decoding during assignment. Both paths are
  * timed at local[8] and local[32] (the two-parallelism scaling evidence,
  * ScalingBench methodology: interleaved passes, best wall per cell).
  * Appends the measured table to `BENCH.md`. */
object DimsBench {
  def main(args: Array[String]): Unit = {
    val nImages = sys.env.getOrElse("SPARK_GRAFT_IMAGES", "120000").toLong
    val corpus = Files.createTempDirectory("dims-corpus-").toString

    import org.apache.spark.sql.{DataFrame, functions => F}
    import graft.functions.{ImageFunctions => IF}
    def bandOf(wh: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val mil = F.floor(wh.getField("width").cast("long") * 1000 /
        wh.getField("height")).cast("long")
      F.when(mil < 800, "tall").when(mil < 1250, "square")
        .when(mil < 2000, "wide").otherwise("ultrawide")
    }
    def hist(bytes: DataFrame, viaDims: Boolean): Map[String, Long] = {
      val wh = if (viaDims) IF.image_dims(F.col("bytes"))
        else IF.image_stats(F.col("bytes"))
      bytes.select(bandOf(wh).as("band")).groupBy("band").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }

    // generate once at full width, then JVM-wide decode warmup (see
    // ImageScalingBench: unwarmed imageio measures the JIT, not the engine)
    locally {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-scratch")
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      import s.implicits._
      s.range(0, nImages, 1, 32)
        .map(id => graft.sources.SiteGraph.mix(13L, id))
        .map(k => graft.sources.ImageGen.imageFor(k & 0xffffff, seed = 13L, dupEvery = 64))
        .write.mode("overwrite").parquet(corpus)
      val b = s.read.parquet(corpus).select("bytes")
      (1 to 3).foreach { _ => hist(b, viaDims = true); hist(b, viaDims = false) }
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    // (cpus, path) cells, interleaved twice, best wall each
    val cells = Seq(8, 32, 8, 32).flatMap { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-scratch")
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val bytes = spark.read.parquet(corpus).select("bytes")
      val out = Seq(true, false).map { viaDims =>
        val t0 = System.nanoTime()
        val h = hist(bytes, viaDims)
        val secs = (System.nanoTime() - t0) / 1e9
        (cpus, viaDims, secs, h)
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      out
    }
    val hists = cells.map(_._4).distinct
    require(hists.size == 1, s"band histograms diverge: $hists")
    def best(cpus: Int, viaDims: Boolean) =
      cells.filter(c => c._1 == cpus && c._2 == viaDims).map(_._3).min
    val (d8, d32) = (best(8, viaDims = true), best(32, viaDims = true))
    val (s8, s32) = (best(8, viaDims = false), best(32, viaDims = false))
    val speedup32 = s32 / d32
    val effDims = (nImages / d32) / (nImages / d8) / 4.0
    println(f"""{"metric":"image_dims_banding_speedup","value":$speedup32%.2f,"unit":"ratio","images":$nImages,"dims_sec8":$d8%.2f,"dims_sec32":$d32%.2f,"decode_sec8":$s8%.2f,"decode_sec32":$s32%.2f,"dims_images_per_sec32":${nImages / d32}%.1f,"decode_images_per_sec32":${nImages / s32}%.1f,"dims_eff_8_to_32":$effDims%.3f}""")
    val md =
      f"""
         |### Header-probe banding (`image_dims`) vs decode banding (`image_stats`)
         |
         |Identical aspect-band histograms (asserted) over the same
         |$nImages%d-image parquet corpus — the only difference is whether band
         |assignment reads the container header (tens of bytes) or decodes the
         |pixels. This is the scan the training-batch assembly path runs
         |before any decode has been earned:
         |
         || path | local[8] wall (s) | local[32] wall (s) | images/s @32 |
         ||---|---|---|---|
         || `image_dims` (header only) | $d8%.2f | $d32%.2f | ${nImages / d32}%.1f |
         || `image_stats` (full decode) | $s8%.2f | $s32%.2f | ${nImages / s32}%.1f |
         |
         |Header probe is **$speedup32%.1f×** the decode path at local[32]
         |(${s8 / d8}%.1f× at local[8], where cores are scarce). The probe
         |path's near-flat 8→32 wall (efficiency $effDims%.3f) is the point,
         |not a defect: banding cost collapses to the parquet scan itself —
         |8 cores already saturate the column read — so assignment no longer
         |spends decode CPU, which stays available for the one real decode
         |the resample stage pays after batch membership is settled.
         |""".stripMargin
    Files.write(Paths.get("BENCH.md"), md.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
