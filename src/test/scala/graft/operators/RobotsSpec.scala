package graft.operators

import graft.functions.TestSpark
import graft.model.CrawlConfig
import graft.sources.SiteGraph
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parseBody: star group, specific groups, comments, last-group-wins") {
    assert(Robots.parseBody("User-agent: *\nDisallow: /") == (true, None))
    assert(Robots.parseBody("User-agent: *\nDisallow: /admin\nCrawl-delay: 2.5") ==
      (false, Some(2.5)))
    // the googlebot group must not apply to *
    assert(Robots.parseBody("User-agent: googlebot\nDisallow: /\n\nUser-agent: *\nDisallow:") ==
      (false, None))
    // consecutive agents share a group
    assert(Robots.parseBody("User-agent: a\nUser-agent: *\nDisallow: /") == (true, None))
    // comments + junk tolerated; later * group overrides the earlier one
    assert(Robots.parseBody(
      "# hi\nUser-agent: *\nDisallow: /\n\nUser-agent: *\nDisallow: /x\nCrawl-delay: 1") ==
      (false, Some(1.0)))
    assert(Robots.parseBody("") == (false, None))
    assert(Robots.parseBody("garbage without colon\nDisallow: /") == (false, None))
  }

  test("parsed bodies drive the polite scheduler exactly like a hand-built cache") {
    val p = SiteGraph.GraphParams(nHosts = 3, pagesPerHost = 20, linksPerPage = 3,
      redirectFrac = 0.0, errorFrac = 0.0, deadLinkFrac = 0.0, crossHostFrac = 0.3, seed = 21L)
    val pages = SiteGraph.localPages(p)
    val seeds = (0 until 3).flatMap(h =>
      pages.find(r => r.status == 200 && r.url.startsWith(s"http://site$h.com")).map(_.url))
    val robots = Robots.parse(Seq(
      ("site1.com", "User-agent: *\nDisallow: /"),
      ("site2.com", "User-agent: *\nCrawl-delay: 0.2")).toDS())
    val cfg = CrawlConfig(fifoParity = false, sameDomainOnly = false,
      delay = 0.1, perHostBudget = 4, bloomEnabled = false)
    val out = new FrontierCrawler(spark, pages.toDS(), cfg, robots = Some(robots))
      .crawlSeeds(seeds.toDF("url"))
    import graft.functions.UrlFunctions.url_host
    import org.apache.spark.sql.functions._
    val log = out.visitLog.withColumn("host", url_host($"url")).cache()
    assert(log.filter($"host" === "site1.com").count() == 0)
    val over = log.filter($"host" === "site2.com")
      .groupBy("round").count().filter($"count" > 2).count()
    assert(over == 0)
    assert(log.filter($"host" === "site0.com").count() > 0)
    log.unpersist()
  }
}
