package graft.operators

import graft.functions.TestSpark
import graft.model.{CrawlConfig, PageRow}
import graft.oracle.ReferenceCrawler
import graft.sources.SiteGraph
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end parity: the Spark frontier engine vs the driver-side replay of
  * the reference algorithm (SURVEY.md §5.2 item 3) — found-URL set, crawl
  * ordering, error/redirect sets and counters must all be equal
  * ("matching the reference's crawl ordering and URL-seen set",
  * BASELINE.json `north_rule`).
  */
class CrawlerParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def firstOkUrl(pages: Seq[PageRow]): String =
    pages.find(p => p.status == 200).get.url

  private def runBoth(pages: Seq[PageRow], seed: String, cfg: CrawlConfig): Unit = {
    val oracle = ReferenceCrawler.crawl(pages.map(p => p.url -> p).toMap, seed, cfg)
    val engine = new FrontierCrawler(spark, pages.toDS(), cfg).crawl(seed)

    assert(engine.sortedFound == oracle.found.toSeq.sorted, "found-URL set mismatch")
    val order = engine.visitLog.orderBy("round", "batchIdx")
      .collect().map(r => (r.getInt(0), r.getLong(1).toInt, r.getString(2))).toSeq
    assert(order == oracle.visitOrder.toSeq, "crawl-ordering mismatch")
    assert(engine.errorUrls.as[String].collect().toSet == oracle.errorUrls, "error set mismatch")
    assert(engine.redirectUrls.as[String].collect().toSet == oracle.redirectUrls,
      "redirect set mismatch")
    assert(engine.stats.errorCount == oracle.errorCount, "error count mismatch")
    assert(engine.stats.redirectCount == oracle.redirectCount, "redirect count mismatch")
    assert(engine.stats.visitedCount == oracle.found.size)
  }

  test("reference fixture graph: same-domain filter, subdomain/mailto/tel/fragment exclusion") {
    runBoth(SiteGraph.referenceFixture, "http://example.com", CrawlConfig(maxConcurrent = 10))
  }

  test("diamond graph with duplicate discovery, batch size 1") {
    runBoth(SiteGraph.diamond, "http://d.com", CrawlConfig(maxConcurrent = 1))
  }

  test("diamond graph, batch size 2 (dupes within batch window)") {
    runBoth(SiteGraph.diamond, "http://d.com", CrawlConfig(maxConcurrent = 2))
  }

  test("redirect graph: chains, reverse/circular/self loops, external redirect, 404, dead link") {
    runBoth(SiteGraph.redirects, "http://r.com", CrawlConfig(maxConcurrent = 3))
  }

  test("generated single-host graph (errors+redirects+dead links), maxConcurrent 5") {
    val p = SiteGraph.GraphParams(nHosts = 1, pagesPerHost = 60, linksPerPage = 4,
      redirectFrac = 0.1, errorFrac = 0.1, deadLinkFrac = 0.05, crossHostFrac = 0.0)
    val pages = SiteGraph.localPages(p)
    runBoth(pages, firstOkUrl(pages), CrawlConfig(maxConcurrent = 5))
  }

  test("generated multi-host graph: cross-host links excluded; bloom prefilter on") {
    val p = SiteGraph.GraphParams(nHosts = 3, pagesPerHost = 25, linksPerPage = 3,
      redirectFrac = 0.08, errorFrac = 0.08, deadLinkFrac = 0.03, crossHostFrac = 0.25,
      seed = 7L)
    val pages = SiteGraph.localPages(p)
    val seed = pages.find(p0 => p0.status == 200 && p0.url.contains("site1.")).get.url
    runBoth(pages, seed, CrawlConfig(maxConcurrent = 6,
      bloomEnabled = true, bloomExpectedItems = 100000L, bloomMinFrontierRows = 0L))
  }

  test("invalid seed raises, like the reference (`src/web_crawler.py:205-206`)") {
    val pages = SiteGraph.diamond
    val c = new FrontierCrawler(spark, pages.toDS(), CrawlConfig())
    intercept[IllegalArgumentException](c.crawl("ftp://d.com"))          // security: scheme
    intercept[IllegalArgumentException](c.crawl("http://localhost/x"))   // security: localhost
    intercept[IllegalArgumentException](c.crawl("http://nosuch.test"))   // reserved TLD
    intercept[IllegalArgumentException](c.crawl("http://unreachable.com")) // no DNS/page
    intercept[IllegalArgumentException](c.crawl("not a url"))
  }

  test("exact resume from checkpoint: interrupted run equals uninterrupted run") {
    val p = SiteGraph.GraphParams(nHosts = 1, pagesPerHost = 40, linksPerPage = 3,
      redirectFrac = 0.1, errorFrac = 0.1, seed = 11L)
    val pages = SiteGraph.localPages(p)
    val seed = firstOkUrl(pages)
    val full = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(maxConcurrent = 5)).crawl(seed)

    val dir = java.nio.file.Files.createTempDirectory("graft-resume-").toString
    // run the first 2 rounds only, then resume from the checkpoint
    new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(maxConcurrent = 5, maxRounds = 2, checkpointDir = Some(dir))).crawl(seed)
    val resumed = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(maxConcurrent = 5, checkpointDir = Some(dir))).crawl(seed)

    assert(resumed.sortedFound == full.sortedFound)
    def order(o: CrawlOutcome) = o.visitLog.orderBy("round", "batchIdx")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSeq
    assert(order(resumed) == order(full))
    assert(resumed.stats == full.stats)
  }

  test("crash tolerance: orphan files from a half-written round are invisible to resume") {
    val p = SiteGraph.GraphParams(nHosts = 1, pagesPerHost = 40, linksPerPage = 3,
      redirectFrac = 0.1, errorFrac = 0.1, seed = 11L)
    val pages = SiteGraph.localPages(p)
    val seed = firstOkUrl(pages)
    val full = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(maxConcurrent = 5)).crawl(seed)

    val dir = java.nio.file.Files.createTempDirectory("graft-crash-").toString
    new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(maxConcurrent = 5, maxRounds = 2, checkpointDir = Some(dir))).crawl(seed)
    // simulate a crash mid-round-2: state deltas partially written (and
    // corrupt), but no manifest committed for the round — resume must
    // overwrite them without ever reading them
    import java.nio.file.{Files => F, Paths}
    for (sub <- Seq("visitlog/round=2", "sides/round=2", "visited/round=2", "frontier/seg=3")) {
      val d = Paths.get(dir, sub)
      F.createDirectories(d)
      F.write(d.resolve("part-00000-garbage.parquet"), Array[Byte](1, 2, 3))
    }
    val resumed = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(maxConcurrent = 5, checkpointDir = Some(dir))).crawl(seed)
    assert(resumed.sortedFound == full.sortedFound)
    assert(resumed.stats == full.stats)
  }
}
