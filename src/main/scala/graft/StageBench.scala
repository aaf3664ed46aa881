package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Two-parallelism receipt for the round-5 curation stages added on top of
  * the dedup ladder: benchmark decontamination
  * ([[graft.ops.Multimodal.imageDecontaminate]]), the caption-frequency
  * cap ([[graft.ops.Multimodal.captionCap]] — measured ON its hot-key
  * case: 40% of the corpus under one caption), and the leakage-safe split
  * ([[graft.ops.Dedup.leakageSafeSplit]]). ScalingBench methodology:
  * interleaved local[8]/local[32] passes, best wall per cell, result
  * checksums asserted identical across every cell. Appends to BENCH.md.
  *
  * All three run in SIGNATURE/label space (longs and small strings) —
  * the corpora here are generated columns, because at fleet scale that is
  * exactly what these stages see: payload bytes never enter any of them. */
object StageBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_STAGE_ROWS", "16000000").toLong
    val evalN = sys.env.getOrElse("SPARK_GRAFT_STAGE_EVAL", "50000").toLong

    val cells = Seq(8, 32, 8, 32).flatMap { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-scratch")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._

      // corpus signatures: 64-bit mixes; eval set plants one 1-bit
      // perturbation of every (id*177)-th corpus signature, ids offset
      // into their own space (the operator's distinct-id contract)
      val corpus = spark.range(0, rows, 1, 64)
        .select(col("id"), expr("xxhash64(id)").as("sig"))
      val evalSet = spark.range(0, evalN, 1, 8)
        .select((col("id") + 2000000000L).as("id"),
          expr(s"xxhash64((id * 177) % $rows)").as("base"),
          pmod(col("id"), lit(64L)).as("bit"))
        .select(col("id"),
          expr("base ^ shiftleft(1L, cast(bit AS int))").as("sig"))

      val t0 = System.nanoTime()
      val dec = graft.ops.Multimodal.imageDecontaminate(
          corpus, evalSet, "id", "sig", maxHamming = 2)
        .agg(count(lit(1)), sum("n_eval_hits"), sum("min_hamming")).head()
      val decSec = (System.nanoTime() - t0) / 1e9
      val decSum = (dec.getLong(0), dec.getLong(1), dec.getLong(2))

      // caption cap on the hot-key regime: 40% of rows carry ONE caption
      val caps = spark.range(0, rows, 1, 64)
        .select(col("id"),
          when(pmod(col("id"), lit(5L)) < 2, lit("stock photo"))
            .otherwise(concat(lit("cap-"),
              pmod(expr("xxhash64(id + 7)"), lit(200000L)))).as("caption"))
      val t1 = System.nanoTime()
      val cc = graft.ops.Multimodal.captionCap(caps, "id", "caption",
          cap = 1000, saltBuckets = 64)
        .agg(sum(when(col("kept"), 1L).otherwise(0L)),
          sum("caption_freq")).head()
      val capSec = (System.nanoTime() - t1) / 1e9
      val capSum = (cc.getLong(0), cc.getLong(1))

      // leakage-safe split: 30% of ids chained to their successor
      val half = rows / 2
      val ids = spark.range(0, half, 1, 64).toDF("id")
      val pairs = spark.range(0, half, 1, 64)
        .filter(pmod(col("id"), lit(10L)) < 3)
        .select(col("id").as("d1"), (col("id") + 1).as("d2"))
      val t2 = System.nanoTime()
      val sp = graft.ops.Dedup.leakageSafeSplit(ids, "id", pairs,
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
      val splitSec = (System.nanoTime() - t2) / 1e9

      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      Seq((cpus, decSec, capSec, splitSec, (decSum, capSum, sp.toString)))
    }

    val sums = cells.map(_._5).distinct
    require(sums.size == 1, s"stage checksums diverge across cells: $sums")
    val ((decFlagged, decHits, _), (capKept, _), splitCounts) = sums.head
    require(decFlagged > 0 && decHits >= decFlagged, "decontam premise broken")
    require(capKept > 0, "caption-cap premise broken")
    def best(cpus: Int, f: ((Int, Double, Double, Double, _)) => Double) =
      cells.filter(_._1 == cpus).map(f).min
    val (d8, d32) = (best(8, _._2), best(32, _._2))
    val (c8, c32) = (best(8, _._3), best(32, _._3))
    val (s8, s32) = (best(8, _._4), best(32, _._4))
    def eff(a: Double, b: Double) = (1.0 / b) / (1.0 / a) / 4.0
    println(f"""{"metric":"stage_bench_rows","value":$rows,"unit":"rows","decontam_sec8":$d8%.2f,"decontam_sec32":$d32%.2f,"decontam_eff":${eff(d8, d32)}%.3f,"cap_sec8":$c8%.2f,"cap_sec32":$c32%.2f,"cap_eff":${eff(c8, c32)}%.3f,"split_sec8":$s8%.2f,"split_sec32":$s32%.2f,"split_eff":${eff(s8, s32)}%.3f,"flagged":$decFlagged,"kept":$capKept}""")
    val md =
      f"""
         |### Round-5 curation stages (`StageBench`): decontam / caption cap / leakage split
         |
         |$rows%,d-row signature/label corpora (the shapes these stages see at
         |fleet scale — payload bytes never enter any of them), interleaved
         |8/32-core cells, best wall per cell, checksums identical across
         |cells. Decontamination: $evalN%,d-signature eval set, every eval row a
         |planted 1-bit perturbation ($decFlagged%,d corpus rows flagged).
         |Caption cap: 40%% of rows under ONE caption (the hot key the salted
         |two-phase top-k exists for), cap 1000 ($capKept%,d kept). Split: 30%%
         |of ids pair-chained; counts $splitCounts.
         |
         || stage | local[8] (s) | local[32] (s) | eff 8→32 |
         ||---|---|---|---|
         || decontam (pigeonhole delta join) | $d8%.2f | $d32%.2f | ${eff(d8, d32)}%.3f |
         || caption cap (salted two-phase top-k) | $c8%.2f | $c32%.2f | ${eff(c8, c32)}%.3f |
         || leakage split (components + column program) | $s8%.2f | $s32%.2f | ${eff(s8, s32)}%.3f |
         |""".stripMargin
    Files.write(Paths.get("BENCH.md"), md.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
