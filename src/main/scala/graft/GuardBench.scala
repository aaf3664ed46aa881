package graft

import org.apache.spark.sql.SparkSession

/** Overhead measurement for the opt-in crawl guards on the 10M-page
  * workload: baseline vs trap guard (`trapPatternCap`) vs mirror
  * suppression (`contentDedup`), same graph, same rounds, local[32].
  * Prints one JSON line; numbers are quoted in BENCH.md.
  *
  * The synthetic graph's URLs are near-worst-case for the trap guard —
  * `/p<digits>` paths collapse onto ONE pattern per host, so the pattern
  * window sees the entire per-host link volume. The cap is set above the
  * heaviest host's page count so it never binds — the found set and total
  * work stay identical to baseline while the full guard dataflow (pattern
  * window + state join + per-round count merge) is paid; the realistic
  * case has many patterns per host and strictly smaller windows.
  */
object GuardBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(tweak: graft.model.CrawlConfig => graft.model.CrawlConfig) = {
      val (secs, work, _) = Bench.crawlBench(spark, nHosts = 128,
        pagesPerHost = 80000, budget = 16384, maxRounds = 4,
        cachePages = false, bloomExpected = 16L * 1000 * 1000, tweak = tweak)
      work / secs
    }
    // untimed warm pass: the first crawl on a fresh JVM pays codegen/JIT
    // and populates the page cache — without it the first measured variant
    // reads ~15% slow and the comparison is meaningless
    Bench.crawlBench(spark, nHosts = 4, pagesPerHost = 40, budget = 8, maxRounds = 2)
    val base1 = run(identity)
    val trap = run(_.copy(trapPatternCap = 10000000))
    val mirror = run(_.copy(contentDedup = true))
    val base2 = run(identity) // bracket VM drift across the session
    val base = (base1 + base2) / 2
    println(f"""{"metric":"guard_overhead","base_urls_per_sec":[$base1%.1f,$base2%.1f],"trap_urls_per_sec":$trap%.1f,"mirror_urls_per_sec":$mirror%.1f,"trap_overhead_pct":${100 * (base - trap) / base}%.1f,"mirror_overhead_pct":${100 * (base - mirror) / base}%.1f,"cpus":$cpus}""")
    spark.stop()
  }
}
