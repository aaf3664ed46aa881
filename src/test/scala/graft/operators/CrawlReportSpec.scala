package graft.operators

import graft.functions.TestSpark
import graft.model.CrawlConfig
import graft.oracle.ReferenceCrawler
import graft.sources.SiteGraph
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.time.LocalDateTime
import scala.jdk.CollectionConverters._

/** Report-folder sink parity (`/root/reference/src/utils/report_generator.py`
  * + `test/utils/test_report_generator.py:40-127`). */
class CrawlReportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("python timedelta formatting") {
    assert(CrawlReport.pythonTimedelta(0L) == "0:00:00")
    assert(CrawlReport.pythonTimedelta(65000000L) == "0:01:05")
    assert(CrawlReport.pythonTimedelta(3661000000L) == "1:01:01")
    assert(CrawlReport.pythonTimedelta(500000L) == "0:00:00.500000")
    assert(CrawlReport.pythonTimedelta(90061000000L) == "1 day, 1:01:01")
    assert(CrawlReport.pythonTimedelta(2L * 86400000000L + 125000000L) == "2 days, 0:02:05")
  }

  test("report folder: run_details.txt lines + 3 sorted URL files") {
    val pages = SiteGraph.redirects
    val cfg = CrawlConfig(maxConcurrent = 3)
    val out = new FrontierCrawler(spark, pages.toDS(), cfg).crawl("http://r.com")
    val oracle = ReferenceCrawler.crawl(pages.map(p => p.url -> p).toMap, "http://r.com", cfg)

    val runsDir = Files.createTempDirectory("graft-report-").toString
    val start = LocalDateTime.of(2026, 8, 16, 12, 0, 0)
    val end = LocalDateTime.of(2026, 8, 16, 12, 1, 5)
    val folder = CrawlReport.write(out, "http://r.com", start, end, runsDir)

    assert(folder == Paths.get(runsDir, "2026-08-16_12-00-00").toString)
    val details = Files.readAllLines(Paths.get(folder, "run_details.txt")).asScala.toSeq
    assert(details == Seq(
      "Base URL: http://r.com",
      "Start Time: 2026-08-16 12:00:00",
      "End Time: 2026-08-16 12:01:05",
      "Total Time: 0:01:05",
      s"URLs Found/Visited: ${oracle.found.size}",
      s"Error URLs: ${oracle.errorUrls.size}",
      s"Redirect URLs: ${oracle.redirectUrls.size}",
      s"Total Errors: ${oracle.errorCount}",
      s"Total Redirects: ${oracle.redirectCount}"))

    def lines(name: String): Seq[String] =
      Files.readAllLines(Paths.get(folder, name)).asScala.toSeq
    assert(lines("all_found_urls.txt") == oracle.found.toSeq.sorted)
    assert(lines("all_error_urls.txt") == oracle.errorUrls.toSeq.sorted)
    assert(lines("all_redirect_urls.txt") == oracle.redirectUrls.toSeq.sorted)

    // round trip: the report SOURCE reads the folder back into the same
    // relations and stats the sink wrote
    val rr = CrawlReport.read(spark, folder)
    assert(rr.baseUrl == "http://r.com")
    assert(rr.stats("URLs Found/Visited") == oracle.found.size.toString)
    assert(rr.stats("Total Time") == "0:01:05")
    assert(rr.found.as[String].collect().toSet == oracle.found)
    assert(rr.errors.as[String].collect().toSet == oracle.errorUrls)
    assert(rr.redirects.as[String].collect().toSet == oracle.redirectUrls)
  }

  test("report sink + source on a non-default Hadoop scheme (graftfs://)") {
    // the last round-3 java.nio surface: a cluster user pointing runsDir at
    // distributed storage must get a working report folder, not a crash
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[graft.io.GraftTestFs].getName)
    val pages = SiteGraph.redirects
    val cfg = CrawlConfig(maxConcurrent = 3)
    val out = new FrontierCrawler(spark, pages.toDS(), cfg).crawl("http://r.com")
    val oracle = ReferenceCrawler.crawl(pages.map(p => p.url -> p).toMap, "http://r.com", cfg)

    val local = Files.createTempDirectory("graft-report-fs-").toString
    val runsDir = s"graftfs:$local/runs"
    val start = LocalDateTime.of(2026, 8, 17, 9, 30, 0)
    val folder = CrawlReport.write(out, "http://r.com", start,
      start.plusSeconds(7), runsDir)
    assert(folder.startsWith("graftfs:"), folder)
    // bytes really landed on the backing store via the registered scheme
    val backing = Paths.get(local, "runs", "2026-08-17_09-30-00")
    assert(Files.exists(backing.resolve("run_details.txt")))
    assert(Files.readAllLines(backing.resolve("all_found_urls.txt"))
      .asScala.toSeq == oracle.found.toSeq.sorted)
    // and the source reads it back through the same scheme
    val rr = CrawlReport.read(spark, folder)
    assert(rr.found.as[String].collect().toSet == oracle.found)
    assert(rr.stats("Total Time") == "0:00:07")
  }
}
