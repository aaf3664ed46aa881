package graft

import graft.model.{CrawlConfig, PageRow}
import graft.operators.{CrawlReport, FrontierCrawler}
import org.apache.spark.sql.SparkSession
import java.time.LocalDateTime

/** CLI crawl entry (S1 in SURVEY.md §2.1) — the `bin/web-crawler` contract
  * (`/root/reference/bin/web-crawler:18-43`) as a spark-submit main:
  *
  *   spark-submit --class graft.CrawlCli <jar> <base-url> --pages <parquet>
  *     [--delay 0.1] [--max-redirects 10] [--max-concurrent 10]
  *     [--runs-dir crawling_runs] [--checkpoint-dir <dir>] [--polite]
  *
  * `--pages` points at a parquet relation with the [[graft.model.PageRow]]
  * schema (the synthetic web; a live HTTP fetcher would replace that scan).
  * Prints all found URLs sorted ascending (`src/web_crawler.py:308-309`)
  * and writes the 4-file report folder.
  */
object CrawlCli {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: CrawlCli <base-url> --pages <parquet> " +
        "[--delay D] [--max-redirects N] [--max-concurrent N] " +
        "[--runs-dir DIR] [--checkpoint-dir DIR] [--polite]")
      sys.exit(2)
    }
    val baseUrl = args(0)
    val opts = args.drop(1).sliding(2, 2).collect {
      case Array(k, v) => k -> v
    }.toMap
    val flags = args.drop(1).filter(_ == "--polite").toSet
    val pagesPath = opts.getOrElse("--pages",
      { System.err.println("--pages <parquet> is required"); sys.exit(2); "" })

    val spark = SparkSession.builder()
      .appName("graft-crawl")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = CrawlConfig(
      delay = opts.get("--delay").map(_.toDouble).getOrElse(0.1),
      maxRedirects = opts.get("--max-redirects").map(_.toInt).getOrElse(10),
      maxConcurrent = opts.get("--max-concurrent").map(_.toInt).getOrElse(10),
      fifoParity = !flags.contains("--polite"),
      sameDomainOnly = !flags.contains("--polite"),
      checkpointDir = opts.get("--checkpoint-dir"))
    val pages = spark.read.parquet(pagesPath).as[PageRow]

    val start = LocalDateTime.now()
    val crawler = new FrontierCrawler(spark, pages, cfg)
    val out =
      if (cfg.fifoParity) crawler.crawl(baseUrl)
      else crawler.crawlSeeds(Seq(baseUrl).toDF("url"))
    val end = LocalDateTime.now()

    out.sortedFound.foreach(println) // stdout contract (S4)
    val reportDir = CrawlReport.write(out, baseUrl, start, end,
      opts.getOrElse("--runs-dir", "crawling_runs"))
    System.err.println(s"report: $reportDir  stats: ${out.stats}")
    spark.stop()
  }
}
