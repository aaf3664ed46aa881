package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Receipt for span-level exact-substring dedup
  * ([[graft.ops.Dedup.dropDuplicateSpans]]): the operator timed end-to-end
  * over a generated corpus with planted boilerplate, at local[8] and
  * local[32] (ScalingBench methodology — interleaved passes, best wall per
  * cell), with the removal totals asserted identical across every cell.
  * Appends the measured table to `BENCH.md`.
  *
  * Corpus shape: `docs` documents of ~48 vocabulary tokens; one doc in
  * `dupEvery` carries one of 40 distinct 12-token boilerplate spans
  * spliced at a hash-derived position — the CommonCrawl-ish regime where
  * a few percent of the corpus shares navigation/footer boilerplate. */
object SpanBench {
  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("SPARK_GRAFT_SPAN_DOCS", "600000").toLong
    val dupEvery = 20
    val corpus = Files.createTempDirectory("span-corpus-").toString

    import graft.sources.SiteGraph.mix
    def word(k: Long): String = "w" + (math.abs(k) % 1000)
    // deterministic doc text: 48 vocab tokens; every dupEvery-th doc gets a
    // 12-token boilerplate span (id mod 40 selects which) spliced mid-doc
    def textFor(id: Long): String = {
      val base = (0 until 48).map(i => word(mix(7L, id, i.toLong)))
      if (id % dupEvery != 0) base.mkString(" ")
      else {
        val b = id % 40
        val span = (0 until 12).map(i => "bp" + b + "x" + i)
        val at = (math.abs(mix(9L, id)) % 36).toInt
        (base.take(at) ++ span ++ base.drop(at)).mkString(" ")
      }
    }

    locally { // generate once; all cells read the same parquet
      val s = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-scratch")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      import s.implicits._
      s.range(0, docs, 1, 64).map(id => (id, textFor(id)))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(corpus)
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    val cells = Seq(8, 32, 8, 32).flatMap { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-scratch")
        // text is a KB-scale payload column (SCALE.md §7a-bis)
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val df = spark.read.parquet(corpus)
      val out = Seq(false, true).map { hashed =>
        val t0 = System.nanoTime()
        val agg = graft.ops.Dedup.dropDuplicateSpans(df, "doc_id", "text",
            n = 8, hashWindows = hashed)
          .selectExpr("sum(n_removed) AS removed",
            "sum(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS touched",
            "count(*) AS n")
          .head()
        val secs = (System.nanoTime() - t0) / 1e9
        (cpus, hashed, secs, (agg.getLong(0), agg.getLong(1), agg.getLong(2)))
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      out
    }
    val totals = cells.map(_._4).distinct
    require(totals.size == 1, s"removal totals diverge across cells: $totals")
    val (removed, touched, n) = totals.head
    require(touched > 0 && removed > 0, "fixture premise broken: nothing deduped")
    def best(cpus: Int, hashed: Boolean) =
      cells.filter(c => c._1 == cpus && c._2 == hashed).map(_._3).min
    val (w8, w32) = (best(8, hashed = false), best(32, hashed = false))
    val (h8, h32) = (best(8, hashed = true), best(32, hashed = true))
    val eff = (n / w32) / (n / w8) / 4.0
    println(f"""{"metric":"span_dedup_docs_per_sec32","value":${n / w32}%.1f,"unit":"docs/s","docs":$n,"removed_tokens":$removed,"touched_docs":$touched,"sec8":$w8%.2f,"sec32":$w32%.2f,"hashed_sec8":$h8%.2f,"hashed_sec32":$h32%.2f,"eff_8_to_32":$eff%.3f}""")
    val md =
      f"""
         |### Span-level exact-substring dedup (`dropDuplicateSpans`, q58 operator)
         |
         |End-to-end over a $n%d-doc generated corpus (~48 tokens/doc, 5%% of
         |docs carrying one of 40 planted 12-token boilerplate spans):
         |window generation → corpus-wide occurrence aggregation → covered-
         |position join-back → per-row reconstruction. Removal totals
         |asserted identical across every cell AND both key variants
         |($removed%d tokens removed from $touched%d docs).
         |
         || cell | string windows (s) | hashed windows (s) | docs/s (string) |
         ||---|---|---|---|
         || local[8]  | $w8%.2f | $h8%.2f | ${n / w8}%.1f |
         || local[32] | $w32%.2f | $h32%.2f | ${n / w32}%.1f |
         |
         |Strong-scaling efficiency 8→32: **$eff%.3f** (same fixed-input
         |regime as the other strong rows — bounded by this box's shared
         |memory bandwidth, see the round-4 map-only control at 0.59-0.70).
         |The plan is two narrow exchanges (windows as (id, pos, win); one
         |hash agg) + one id equi-join — document text never rides a
         |shuffle, so per-node cost at fleet scale is scan + window
         |generation, exactly what these cells measure. `hashWindows = true`
         |(SCALE.md §7e's petabyte switch) shuffles 8-byte xxhash64 keys
         |instead of window strings — at these ~60-byte windows the gap is
         |modest on one box; on a fleet the shuffle VOLUME drop is the point.
         |""".stripMargin
    Files.write(Paths.get("BENCH.md"), md.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
