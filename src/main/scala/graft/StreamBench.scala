package graft

import graft.sources.IceLite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Receipt for the STREAMING pair-curation ingest path — the one axis
  * without a two-parallelism number: a file-source stream (the Kafka
  * stand-in this sandbox allows) of image+caption pair events driven
  * through `CurationStream.curatePairs` (staged no-decode gates → one
  * `image_sig` decode → watermarked phash dedup) into the REAL sink,
  * `ImageWriteback.mergeInsertNearDup` (per-micro-batch PSNR-verified
  * near-dup suppression against the standing IceLite table + MERGE), at
  * local[8] and local[32] on the same event corpus. Same methodology as
  * DimsBench: interleaved cells, best wall per cell, JVM-wide decoder
  * warmup before any timed pass; determinism is asserted — every cell
  * must land the same curated row count (same files, same
  * maxFilesPerTrigger ⇒ same micro-batch boundaries ⇒ same verdicts).
  * Appends the measured table to `BENCH.md`. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "96000").toLong
    val nFiles = 32
    val filesPerTrigger = 4 // → 8 micro-batches per run
    val corpus = Files.createTempDirectory("stream-corpus-").toString

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-scratch")
        // KB-binary payload scan rule (BENCH.md round 4 / SCALE.md §7a-bis)
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    def fresh(): Unit = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    // generate once: honest pairs from ImageGen (≈6% planted exact dups via
    // dupEvery=16) with two planted gate-failure strains that drop BEFORE
    // any decode — caption_too_short every 13th, container/claim mismatch
    // every 17th — so the stream pays the staged-gate shape a real ingest
    // topic has. Then a JVM-wide decoder warmup (imageio JIT is static
    // state: unwarmed first cells would measure the JIT, not the engine).
    locally {
      val s = session(32)
      import s.implicits._
      s.range(0, nEvents, 1, 32)
        .map { id =>
          val r = graft.sources.ImageGen.imageFor(id, seed = 17L, dupEvery = 16)
          val caption = if (id % 13 == 5) "x" else r.caption
          val fmt = if (id % 17 == 7) "gif" else r.fmt
          (r.image_id, r.bytes, fmt, caption,
            new java.sql.Timestamp(1767225600000L + id * 1000L))
        }.toDF("image_id", "bytes", "fmt", "caption", "eventTime")
        .repartition(nFiles)
        .write.mode("overwrite").parquet(corpus)
      val warm = s.read.parquet(corpus)
        .select(graft.functions.ImageFunctions.image_sig(
          org.apache.spark.sql.functions.col("bytes")).as("g"))
      (1 to 2).foreach(_ => warm.filter("g.decodable").count())
      s.stop(); fresh()
    }

    def cell(cpus: Int): (Double, Long) = {
      val spark = session(cpus)
      import spark.implicits._
      val table = new IceLite(spark,
        Files.createTempDirectory(s"stream-table-$cpus-").toString)
      val schema = spark.read.parquet(corpus).schema
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", filesPerTrigger).parquet(corpus)
        .as[graft.streaming.PairEvent]
      val out = graft.streaming.CurationStream.curatePairs(
        in, minEntropyBits = 0.0)
      val t0 = System.nanoTime()
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("stream-ckpt-").toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.operators.ImageWriteback
            .mergeInsertNearDup(table, batch.drop("eventTime"))
          ()
        }.start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val kept = table.read().count()
      spark.stop(); fresh()
      (wall, kept)
    }

    val cells = Seq(8, 32, 8, 32).map(cpus => (cpus, cell(cpus)))
    val keptCounts = cells.map(_._2._2).distinct
    require(keptCounts.size == 1,
      s"curated row counts diverge across cells: $cells")
    val kept = keptCounts.head
    def best(cpus: Int) = cells.filter(_._1 == cpus).map(_._2._1).min
    val (w8, w32) = (best(8), best(32))
    val (r8, r32) = (nEvents / w8, nEvents / w32)
    val eff = (w8 / w32) / 4.0
    println(f"""{"metric":"stream_curation_events_per_sec","value":$r32%.1f,"unit":"rows/sec","events":$nEvents,"kept":$kept,"sec8":$w8%.2f,"sec32":$w32%.2f,"events_per_sec8":$r8%.1f,"eff_8_to_32":$eff%.3f}""")
    val md =
      f"""
         |### Streaming pair curation (file-source stream → gates → decode → MERGE sink)
         |
         |$nEvents%d pair events (≈6%% planted exact dups, two pre-decode
         |gate-failure strains) in 8 micro-batches (`maxFilesPerTrigger`,
         |`Trigger.AvailableNow`), each batch running the staged gates, ONE
         |`image_sig` decode per survivor, watermarked phash dedup, then the
         |real `mergeInsertNearDup` sink — per-batch PSNR-verified near-dup
         |suppression against the standing snapshot table + MERGE INTO.
         |Curated rows identical across every cell (asserted): $kept%d.
         |
         || parallelism | wall (s) | events/s |
         ||---|---|---|
         || local[8]  | $w8%.1f | $r8%.1f |
         || local[32] | $w32%.1f | $r32%.1f |
         |
         |Ingest scaling efficiency (T_8/T_32)/4 = **$eff%.3f**. The stream
         |inherits the batch engine's scan/decode discipline (staged gates,
         |single decode, signatures-only candidate joins); the residue is
         |the per-micro-batch serial floor — 8 trigger plans + 8 MERGE
         |commits whose driver cost does not shrink with cores. On a real
         |cluster the same query runs continuous triggers with executors
         |decoding in parallel while the driver plans the next batch.
         |""".stripMargin
    Files.write(Paths.get("BENCH.md"), md.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
