package graft

import graft.functions.TestSpark
import graft.model.{CrawlConfig, PageRow}
import graft.operators.FrontierCrawler
import graft.sources.SiteGraph
import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.Await
import scala.concurrent.duration.Duration

/** The reference's convenience surface: `crawl`/`crawl_async` facades
  * (`src/web_crawler.py:339-381`), the per-fetch timeout
  * (`src/web_crawler.py:27`), argparse-parity CLI handling
  * (`bin/web-crawler:18-43`), and the logged-only seed robots probe
  * (`url_verifier.py:200-211`).
  */
class FacadeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pg(url: String, links: Seq[String], latencyMs: Option[Int] = None): PageRow =
    PageRow(url, 200, None, links, None, Some("text/html"), None, None, latencyMs)

  test("WebCrawler.crawlUrls / crawlAsync match the engine's found set") {
    val pages = SiteGraph.localPages(SiteGraph.GraphParams(
      nHosts = 1, pagesPerHost = 30, linksPerPage = 4,
      redirectFrac = 0.05, errorFrac = 0.05, seed = 11L))
    val seed = pages.find(_.status == 200).get.url
    val engine = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig()).crawl(seed).sortedFound.toSet
    assert(WebCrawler.crawlUrls(spark, pages.toDS(), seed) == engine)
    import scala.concurrent.ExecutionContext.Implicits.global
    val async = Await.result(WebCrawler.crawlAsync(spark, pages.toDS(), seed), Duration.Inf)
    assert(async == engine)
  }

  test("timeout: a page slower than the budget is a network error; faster is fetched") {
    val pages = Seq(
      pg("http://t.com/root", Seq("/slow", "/fast")),
      pg("http://t.com/slow", Seq("/never"), latencyMs = Some(3000)),
      pg("http://t.com/fast", Nil, latencyMs = Some(500)),
      pg("http://t.com/never", Nil))
    def found(timeoutSec: Int) = {
      val out = new FrontierCrawler(spark, pages.toDS(),
        CrawlConfig(timeout = timeoutSec)).crawl("http://t.com/root")
      (out.sortedFound.toSet, out.errorUrls.as[String].collect().toSet)
    }
    // 1 s budget: /slow times out → network error; its links never crawled
    val (f1, e1) = found(1)
    assert(f1 == Set("http://t.com/root", "http://t.com/slow", "http://t.com/fast"))
    assert(e1 == Set("http://t.com/slow"))
    // 10 s budget: everything resolves
    val (f10, e10) = found(10)
    assert(f10 == Set("http://t.com/root", "http://t.com/slow",
      "http://t.com/fast", "http://t.com/never"))
    assert(e10.isEmpty)
  }

  test("config defaults and request headers match the reference") {
    val c = CrawlConfig() // reference test_default_config / test_get_headers
    assert(c.delay == 0.1 && c.maxRedirects == 10 && c.maxConcurrent == 10 && c.timeout == 10)
    assert(c.userAgent.contains("MyCrawler/1.0"))
    val h = c.requestHeaders
    assert(h("User-Agent") == c.userAgent)
    assert(h("Accept") == "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8")
    assert(h("Accept-Encoding") == "gzip, deflate")
    assert(h("Accept-Language") == "en-US,en;q=0.5")
    val custom = CrawlConfig(delay = 0.5, maxRedirects = 5, maxConcurrent = 20,
      timeout = 30, userAgent = "CustomBot/1.0")
    assert(custom.requestHeaders("User-Agent") == "CustomBot/1.0")
  }

  test("CLI parse: argparse-parity errors, help, flags") {
    import CrawlCli.{parseArgs, CliUsageError, HelpRequested}
    val ok = parseArgs(Array("http://a.com", "--pages", "p.parquet",
      "--delay", "0.5", "--polite"))
    assert(ok == ("http://a.com", Map("--pages" -> "p.parquet", "--delay" -> "0.5"),
      Set("--polite")))
    val guarded = parseArgs(Array("http://a.com", "--pages", "p.parquet",
      "--polite", "--trap-cap", "100", "--content-dedup"))
    assert(guarded == ("http://a.com",
      Map("--pages" -> "p.parquet", "--trap-cap" -> "100"),
      Set("--polite", "--content-dedup")))
    intercept[CliUsageError](parseArgs(Array("http://a.com", "--pages", "p", "--trap-cap")))
    intercept[HelpRequested](parseArgs(Array("--help")))
    intercept[HelpRequested](parseArgs(Array("-h")))
    intercept[CliUsageError](parseArgs(Array.empty[String]))                       // no base-url
    intercept[CliUsageError](parseArgs(Array("http://a.com")))                     // no --pages
    intercept[CliUsageError](parseArgs(Array("http://a.com", "--pages")))          // missing value
    intercept[CliUsageError](parseArgs(Array("http://a.com", "--pages", "p", "--bogus"))) // unknown
    intercept[CliUsageError](parseArgs(Array("http://a.com", "extra", "--pages", "p")))   // 2 positionals
  }

  test("seed verify probes robots.txt but never gates on it") {
    val withRobots = Seq(pg("http://r.com/", Nil), pg("http://r.com/robots.txt", Nil))
    val c1 = new FrontierCrawler(spark, withRobots.toDS(), CrawlConfig())
    c1.verifySeed("http://r.com/")
    assert(c1.seedRobotsProbe.contains("http://r.com/robots.txt" -> true))
    val noRobots = Seq(pg("http://r.com/", Nil))
    val c2 = new FrontierCrawler(spark, noRobots.toDS(), CrawlConfig())
    c2.verifySeed("http://r.com/") // absent robots must not fail the verify
    assert(c2.seedRobotsProbe.contains("http://r.com/robots.txt" -> false))
  }
}
