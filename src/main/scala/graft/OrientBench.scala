package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Cost receipt for the orientation-canonical hash: `phash64(bytes)` vs
  * `phash_canonical64(bytes)` scans over the same generated corpus, timed
  * at local[8] and local[32] (the two-parallelism scaling evidence,
  * ScalingBench methodology: interleaved passes, best wall per cell).
  * The claim under test is the kernel's cost story — the canonical hash
  * is ONE decode plus 8 cheap raster remaps, so its scan should price
  * near the plain hash on decode-dominated payloads, not 8× it. Per-cell
  * aggregates are asserted stable across parallelism. Appends the
  * measured table to `BENCH.md`. */
object OrientBench {
  def main(args: Array[String]): Unit = {
    val nImages = sys.env.getOrElse("SPARK_GRAFT_IMAGES", "60000").toLong
    val corpus = Files.createTempDirectory("orient-corpus-").toString

    import org.apache.spark.sql.{DataFrame, functions => F}
    import graft.functions.{ImageFunctions => IF}
    def agg(bytes: DataFrame, canonical: Boolean): Long = {
      val h = if (canonical) IF.phash_canonical64(F.col("bytes"))
        else IF.phash64(F.col("bytes"))
      bytes.select(h.as("h")).agg(F.expr("bit_xor(h)")).head().getLong(0)
    }

    // generate once, then JVM-wide decode warmup (unwarmed imageio
    // measures the JIT, not the engine — see ImageScalingBench)
    locally {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-scratch")
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      import s.implicits._
      s.range(0, nImages, 1, 32)
        .map(id => graft.sources.SiteGraph.mix(23L, id))
        .map(k => graft.sources.ImageGen.imageFor(k & 0xffffff, seed = 23L, dupEvery = 64))
        .write.mode("overwrite").parquet(corpus)
      val b = s.read.parquet(corpus).select("bytes")
      (1 to 3).foreach { _ => agg(b, canonical = true); agg(b, canonical = false) }
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
      val out = Seq(true, false).map { canonical =>
        val t0 = System.nanoTime()
        val x = agg(bytes, canonical)
        val secs = (System.nanoTime() - t0) / 1e9
        (cpus, canonical, secs, x)
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      out
    }
    for (canonical <- Seq(true, false)) {
      val xs = cells.filter(_._2 == canonical).map(_._4).distinct
      require(xs.size == 1, s"canonical=$canonical aggregate diverges: $xs")
    }
    def best(cpus: Int, canonical: Boolean) =
      cells.filter(c => c._1 == cpus && c._2 == canonical).map(_._3).min
    val (c8, c32) = (best(8, canonical = true), best(32, canonical = true))
    val (p8, p32) = (best(8, canonical = false), best(32, canonical = false))
    val ratio32 = c32 / p32
    val effC = (nImages / c32) / (nImages / c8) / 4.0
    println(f"""{"metric":"phash_canonical_cost_ratio","value":$ratio32%.2f,"unit":"ratio","images":$nImages,"canonical_sec8":$c8%.2f,"canonical_sec32":$c32%.2f,"plain_sec8":$p8%.2f,"plain_sec32":$p32%.2f,"canonical_images_per_sec32":${nImages / c32}%.1f,"plain_images_per_sec32":${nImages / p32}%.1f,"canonical_eff_8_to_32":$effC%.3f}""")
    val md =
      f"""
         |### Orientation-canonical hash (`phash_canonical64`) vs plain `phash64`
         |
         |Same $nImages%d-image parquet corpus, one shuffle-free scan each; the
         |canonical path additionally remaps the decoded raster 8 ways and
         |hashes each orientation (per-cell aggregates asserted stable):
         |
         || path | local[8] wall (s) | local[32] wall (s) | images/s @32 |
         ||---|---|---|---|
         || `phash64` (1 decode, 1 hash) | $p8%.2f | $p32%.2f | ${nImages / p32}%.1f |
         || `phash_canonical64` (1 decode, 8 remaps+hashes) | $c8%.2f | $c32%.2f | ${nImages / c32}%.1f |
         |
         |Canonicalization costs **$ratio32%.2f×** the plain hash at local[32]
         |(8→32 strong efficiency $effC%.3f) — the 8 extra orientation hashes
         |ride the ALREADY-DECODED raster, so mirrored/rotated re-post
         |coverage prices far below the naive 8-decode bound. At fleet scale
         |the signature is computed once per ingested image and stored
         |(`phash_canonical` column), so serving-path dedup pays zero extra
         |decodes — this cell measures the worst case, hashing at scan time.
         |""".stripMargin
    Files.write(Paths.get("BENCH.md"), md.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
