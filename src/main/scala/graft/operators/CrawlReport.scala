package graft.operators

import graft.io.StateFs
import org.apache.spark.sql.DataFrame
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Crawl-report sink — the reference's report folder contract
  * (`/root/reference/src/utils/report_generator.py:21-143`): a timestamped
  * run directory containing `run_details.txt` (9 `key: value` lines) and
  * three URL files sorted ascending, one URL per line.
  *
  * Scale path: each URL file is produced by a Spark range-partitioned sort
  * (`orderBy(url)`); part files come out in ascending key ranges and are
  * concatenated in filename order, so "one sorted text file" (inherently a
  * single-writer contract) costs one streaming merge, never a single-task
  * sort. Every byte — details file, part listing, concat, read-back — goes
  * through [[graft.io.StateFs]], so `runsDir` may be `file:`, `hdfs:`,
  * `s3a:` or any registered scheme: the one state surface that was still
  * `java.nio`-bound in round 3 now follows the same rule as checkpoints,
  * seen-filter buckets and the snapshot table.
  */
object CrawlReport {

  private val TsDir = DateTimeFormatter.ofPattern("yyyy-MM-dd_HH-mm-ss")
  private val TsLine = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Python `str(timedelta)` — `[D day[s], ]H:MM:SS[.ffffff]`
    * (`report_generator.py:122` writes `Total Time: {timedelta}`). */
  def pythonTimedelta(totalMicros: Long): String = {
    val micros = ((totalMicros % 1000000) + 1000000) % 1000000
    val totalSecs = Math.floorDiv(totalMicros, 1000000L)
    val days = Math.floorDiv(totalSecs, 86400L)
    val rem = Math.floorMod(totalSecs, 86400L)
    val h = rem / 3600; val m = (rem % 3600) / 60; val s = rem % 60
    val base = f"$h%d:$m%02d:$s%02d"
    val frac = if (micros > 0) f".$micros%06d" else ""
    val dayPart =
      if (days == 0) "" else if (days == 1) "1 day, " else s"$days days, "
    s"$dayPart$base$frac"
  }

  def write(
      outcome: CrawlOutcome,
      baseUrl: String,
      startTime: LocalDateTime,
      endTime: LocalDateTime,
      runsDir: String): String = {
    val sfs = StateFs(outcome.found.sparkSession)
    val runFolder = sfs.child(runsDir, startTime.format(TsDir))
    sfs.mkdirs(runFolder)

    val totalMicros = java.time.Duration.between(startTime, endTime).toNanos / 1000
    val details = Seq(
      s"Base URL: $baseUrl",
      s"Start Time: ${startTime.format(TsLine)}",
      s"End Time: ${endTime.format(TsLine)}",
      s"Total Time: ${pythonTimedelta(totalMicros)}",
      s"URLs Found/Visited: ${outcome.stats.visitedCount}",
      s"Error URLs: ${outcome.errorUrls.count()}",
      s"Redirect URLs: ${outcome.redirectUrls.count()}",
      s"Total Errors: ${outcome.stats.errorCount}",
      s"Total Redirects: ${outcome.stats.redirectCount}")
    sfs.writeAtomic(sfs.child(runFolder, "run_details.txt")) { out =>
      out.write((details.mkString("\n") + "\n").getBytes("UTF-8"))
    }

    writeSortedUrls(sfs, outcome.found.select("url"), runFolder, "all_found_urls.txt")
    writeSortedUrls(sfs, outcome.errorUrls, runFolder, "all_error_urls.txt")
    writeSortedUrls(sfs, outcome.redirectUrls, runFolder, "all_redirect_urls.txt")
    runFolder
  }

  /** `sorted(urls)`, one per line (`report_generator.py:131-143`).
    *
    * The global sort is distributed (range partitioning); part files come
    * out in ascending key ranges, so concatenating them in filename order
    * yields the globally sorted file without funneling the sort itself
    * through one task.
    */
  private def writeSortedUrls(sfs: StateFs, urls: DataFrame, runFolder: String,
      name: String): Unit = {
    val tmp = sfs.child(runFolder, s".$name.spark")
    urls.orderBy("url").write.mode("overwrite").text(tmp)
    val parts = sfs.listNames(tmp).filter(_.startsWith("part-")).sorted
    sfs.writeAtomic(sfs.child(runFolder, name)) { out =>
      parts.foreach { p =>
        val in = sfs.open(sfs.child(tmp, p))
        try in.transferTo(out) finally in.close()
      }
    }
    sfs.delete(tmp)
  }

  /** A run folder read back as relations — the report SOURCE completing
    * the sink's round trip: the reference (and this engine) persists crawl
    * results only as these text files, so downstream analysis over past
    * runs starts here. Stats parse from `run_details.txt`'s fixed 9-line
    * contract; each URL file loads as a sorted one-column relation. */
  final case class RunReport(
      baseUrl: String,
      stats: Map[String, String],
      found: DataFrame,
      errors: DataFrame,
      redirects: DataFrame)

  def read(spark: org.apache.spark.sql.SparkSession, runFolder: String): RunReport = {
    val sfs = StateFs(spark)
    val in = sfs.open(sfs.child(runFolder, "run_details.txt"))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val kv = lines.filter(_.contains(": "))
      .map { l => val i = l.indexOf(": "); l.substring(0, i) -> l.substring(i + 2) }
      .toMap
    def urls(name: String) =
      spark.read.text(sfs.child(runFolder, name))
        .toDF("url").filter(org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("url")) > 0)
    RunReport(
      baseUrl = kv.getOrElse("Base URL", ""),
      stats = kv,
      found = urls("all_found_urls.txt"),
      errors = urls("all_error_urls.txt"),
      redirects = urls("all_redirect_urls.txt"))
  }
}
