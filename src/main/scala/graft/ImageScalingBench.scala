package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Two-parallelism scaling evidence for the PAYLOAD axis: the image
  * decode + quality-analysis hot path ([[Bench.imageBench]]) at local[8]
  * vs local[32] on the same generated corpus. Two interleaved passes per
  * level, best wall per level (the ScalingBench methodology). Appends the
  * measured table to `BENCH.md`. */
object ImageScalingBench {
  def main(args: Array[String]): Unit = {
    val nImages = sys.env.getOrElse("SPARK_GRAFT_IMAGES", "120000").toLong
    val corpus = Files.createTempDirectory("image-corpus-").toString
    // JVM-wide warmup: the imageio decode path is a large method graph that
    // takes several full corpus passes to reach C2 steady state — unwarmed,
    // every cell measures the JIT, not the engine (first runs are 3-4×
    // slower and noisy enough to invert orderings)
    locally {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-scratch")
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      (1 to 3).foreach(_ => Bench.imageBench(s, nImages, corpus))
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    val runs = Seq(8, 32, 8, 32).map { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/spark-scratch")
        // multi-KB binary payload scans: the default 4096-row column batch
        // makes every scan task grow ~32MB on-heap vectors through repeated
        // doubling copies — measured 3.0k images/s at local[32] vs 55.5k
        // with 256-row batches (the 8-core run barely moves). See BENCH.md.
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val (s1, _) = Bench.imageBench(spark, nImages, corpus)
      val (s2, n) = Bench.imageBench(spark, nImages, corpus)
      val secs = math.min(s1, s2)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      (cpus, secs, n)
    }
    def best(cpus: Int) = runs.filter(_._1 == cpus).minBy(_._2)
    val (_, s8, n8) = best(8)
    val (_, s32, n32) = best(32)
    val (t8, t32) = (n8 / s8, n32 / s32)
    val eff = (t32 / t8) / 4.0
    println(f"""{"metric":"image_scaling_efficiency","value":$eff%.3f,"unit":"ratio","images":$n8,"t8_images_per_sec":$t8%.1f,"t32_images_per_sec":$t32%.1f,"sec8":$s8%.1f,"sec32":$s32%.1f}""")
    val md =
      f"""
         |### Image decode/analysis hot path (payload axis, map-only)
         |
         |PNG/JPG decode (`javax.imageio`) + the full quality histogram pass
         |(BT.601 luma mean/stddev, 256-bin entropy, aspect) over a generated
         |$n8%d-image corpus read from parquet — the per-byte profile of the
         |image-curation stage, shuffle-free:
         |
         || parallelism | wall (s) | images analyzed | images/s |
         ||---|---|---|---|
         || local[8]  | $s8%.1f | $n8 | $t8%.1f |
         || local[32] | $s32%.1f | $n32 | $t32%.1f |
         |
         |Image hot-path scaling efficiency (T_32 / T_8) / 4 = **$eff%.3f**.
         |""".stripMargin
    Files.write(Paths.get("BENCH.md"), md.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    // corpus is in /tmp; leave cleanup to the OS tmp reaper
  }
}
