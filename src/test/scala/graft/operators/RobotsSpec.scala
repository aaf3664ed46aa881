package graft.operators

import graft.functions.TestSpark
import graft.model.CrawlConfig
import graft.sources.SiteGraph
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  import Robots.RobotsRules

  test("parseBody: star group, specific groups, comments, last-group-wins") {
    assert(Robots.parseBody("User-agent: *\nDisallow: /") == RobotsRules(true, Nil, Nil, None))
    assert(Robots.parseBody("User-agent: *\nDisallow: /admin\nCrawl-delay: 2.5") ==
      RobotsRules(false, Seq("/admin"), Nil, Some(2.5)))
    // the googlebot group must not apply to *
    assert(Robots.parseBody("User-agent: googlebot\nDisallow: /\n\nUser-agent: *\nDisallow:") ==
      RobotsRules(false, Nil, Nil, None))
    // consecutive agents share a group
    assert(Robots.parseBody("User-agent: a\nUser-agent: *\nDisallow: /") ==
      RobotsRules(true, Nil, Nil, None))
    // comments + junk tolerated; later * group overrides the earlier one
    assert(Robots.parseBody(
      "# hi\nUser-agent: *\nDisallow: /\n\nUser-agent: *\nDisallow: /x\nCrawl-delay: 1") ==
      RobotsRules(false, Seq("/x"), Nil, Some(1.0)))
    assert(Robots.parseBody("") == RobotsRules(false, Nil, Nil, None))
    assert(Robots.parseBody("garbage without colon\nDisallow: /") ==
      RobotsRules(false, Nil, Nil, None))
  }

  test("parseBody: prefix lists in order, blank line terminates a group") {
    // multiple prefixes, document order preserved
    assert(Robots.parseBody(
      "User-agent: *\nDisallow: /private/\nDisallow: /tmp\nCrawl-delay: 0.5") ==
      RobotsRules(false, Seq("/private/", "/tmp"), Nil, Some(0.5)))
    // a blank line ends the * record: the stray Disallow after it belongs
    // to no group (1994 de-facto standard) and must not apply
    assert(Robots.parseBody("User-agent: *\nDisallow: /a\n\nDisallow: /") ==
      RobotsRules(false, Seq("/a"), Nil, None))
    // root disallow beats prefixes within one group
    assert(Robots.parseBody("User-agent: *\nDisallow: /x\nDisallow: /") ==
      RobotsRules(true, Seq("/x"), Nil, None))
    // blank line between a specific group and the * group isolates them
    assert(Robots.parseBody(
      "User-agent: bot\nDisallow: /\n\nUser-agent: *\nDisallow: /only") ==
      RobotsRules(false, Seq("/only"), Nil, None))
  }

  test("parseBody: blank line between User-agent and its rules keeps the group open") {
    // very common real-world formatting — the rule must NOT be orphaned
    assert(Robots.parseBody("User-agent: *\n\nDisallow: /private") ==
      RobotsRules(false, Seq("/private"), Nil, None))
    assert(Robots.parseBody("User-agent: *\n\nDisallow: /") ==
      RobotsRules(true, Nil, Nil, None))
    // consecutive User-agent lines separated by a blank still share a group
    assert(Robots.parseBody("User-agent: a\n\nUser-agent: *\nDisallow: /x") ==
      RobotsRules(false, Seq("/x"), Nil, None))
  }

  test("canonicalized paths still match rules: bare host and stripped trailing slash") {
    import graft.model.PageRow
    def page(url: String, links: Seq[String] = Nil) =
      PageRow(url, 200, None, links, None, Some("text/html"), None, None)
    // normalize_url turns http://site0.com/private/ into .../private and a
    // bare-host URL's path into "" — both must still match their rules
    val pages = Seq(
      page("http://site0.com/a", Seq("/private/", "http://site1.com", "/b")),
      page("http://site0.com/private"),
      page("http://site0.com/b"),
      page("http://site1.com"))
    val robots = Robots.parse(Seq(
      ("site0.com", "User-agent: *\nDisallow: /private/"),
      ("site1.com", "User-agent: *\nDisallow: /\nAllow: /public/")).toDS())
    val cfg = CrawlConfig(fifoParity = false, sameDomainOnly = false,
      perHostBudget = 4, bloomEnabled = false)
    val out = new FrontierCrawler(spark, pages.toDS(), cfg, robots = Some(robots))
      .crawlSeeds(Seq("http://site0.com/a").toDF("url"))
    val visited = out.sortedFound
    assert(visited.contains("http://site0.com/a"))
    assert(visited.contains("http://site0.com/b"))
    // /private/ rule matches the normalized /private
    assert(!visited.exists(_.contains("/private")), s"stripped-slash URL escaped: $visited")
    // site1's bare-host URL (empty path ≡ "/") is covered by Disallow: /
    // even though Allow rules keep the host alive
    assert(!visited.contains("http://site1.com"), s"bare-host URL escaped: $visited")
  }

  test("parseBody: Allow rules collected alongside Disallow") {
    assert(Robots.parseBody(
      "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\nCrawl-delay: 1") ==
      RobotsRules(false, Seq("/private/"), Seq("/private/pub/"), Some(1.0)))
    // Allow with disallow-all: the standard "deny everything except" form
    assert(Robots.parseBody("User-agent: *\nDisallow: /\nAllow: /public/") ==
      RobotsRules(true, Nil, Seq("/public/"), None))
    assert(Robots.parseBody("User-agent: *\nAllow:") == RobotsRules(false, Nil, Nil, None))
  }

  test("RFC 9309 longest-match: Allow overrides shorter Disallow end-to-end") {
    import graft.model.PageRow
    def page(url: String, links: Seq[String] = Nil) =
      PageRow(url, 200, None, links, None, Some("text/html"), None, None)
    val pages = Seq(
      page("http://site0.com/", Seq("/private/x", "/private/pub/y", "/a")),
      page("http://site0.com/a"),
      page("http://site0.com/private/x"),
      page("http://site0.com/private/pub/y"))
    val robots = Robots.parse(Seq(
      ("site0.com", "User-agent: *\nDisallow: /private/\nAllow: /private/pub/")).toDS())
    val cfg = CrawlConfig(fifoParity = false, sameDomainOnly = false,
      perHostBudget = 4, bloomEnabled = false)
    val out = new FrontierCrawler(spark, pages.toDS(), cfg, robots = Some(robots))
      .crawlSeeds(Seq("http://site0.com/").toDF("url"))
    val visited = out.sortedFound
    assert(visited.contains("http://site0.com/private/pub/y"), // longer Allow wins
      s"Allow override ignored: $visited")
    assert(!visited.contains("http://site0.com/private/x"))    // Disallow holds elsewhere
    assert(visited.contains("http://site0.com/a"))
  }

  test("deny-everything-except: Disallow / with Allow carve-out") {
    import graft.model.PageRow
    def page(url: String, links: Seq[String] = Nil) =
      PageRow(url, 200, None, links, None, Some("text/html"), None, None)
    val pages = Seq(
      page("http://site0.com/public/home", Seq("/public/a", "/secret")),
      page("http://site0.com/public/a"),
      page("http://site0.com/secret"))
    val robots = Robots.parse(Seq(
      ("site0.com", "User-agent: *\nDisallow: /\nAllow: /public/")).toDS())
    val cfg = CrawlConfig(fifoParity = false, sameDomainOnly = false,
      perHostBudget = 4, bloomEnabled = false)
    val out = new FrontierCrawler(spark, pages.toDS(), cfg, robots = Some(robots))
      .crawlSeeds(Seq("http://site0.com/public/home").toDF("url"))
    val visited = out.sortedFound
    assert(visited.contains("http://site0.com/public/home"))
    assert(visited.contains("http://site0.com/public/a"))
    assert(!visited.contains("http://site0.com/secret"))
  }

  test("shuffle-side robots join (10^7-host cache path) ≡ broadcast join") {
    val p = SiteGraph.GraphParams(nHosts = 3, pagesPerHost = 20, linksPerPage = 3,
      redirectFrac = 0.0, errorFrac = 0.0, deadLinkFrac = 0.0, crossHostFrac = 0.3, seed = 21L)
    val pages = SiteGraph.localPages(p)
    val seeds = (0 until 3).flatMap(h =>
      pages.find(r => r.status == 200 && r.url.startsWith(s"http://site$h.com")).map(_.url))
    val robots = Robots.parse(Seq(
      ("site1.com", "User-agent: *\nDisallow: /"),
      ("site2.com", "User-agent: *\nCrawl-delay: 0.2")).toDS())
    def run(bcast: Boolean) = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(fifoParity = false, sameDomainOnly = false, delay = 0.1,
        perHostBudget = 4, bloomEnabled = false, robotsBroadcast = bcast),
      robots = Some(robots)).crawlSeeds(seeds.toDF("url"))
    val b = run(true)
    val s = run(false)
    assert(s.sortedFound == b.sortedFound)
    assert(s.stats == b.stats)
  }

  test("Disallow prefixes exclude matching paths end-to-end; host stays crawlable") {
    import graft.model.PageRow
    def page(url: String, links: Seq[String] = Nil) =
      PageRow(url, 200, None, links, None, Some("text/html"), None, None)
    val pages = Seq(
      page("http://site0.com/", Seq("/a", "/private/x", "/b")),
      page("http://site0.com/a", Seq("/private/y", "/b")),
      page("http://site0.com/b"),
      page("http://site0.com/private/x", Seq("/c")),
      page("http://site0.com/private/y"),
      page("http://site0.com/c"))
    val robots = Robots.parse(Seq(
      ("site0.com", "User-agent: *\nDisallow: /private/")).toDS())
    val cfg = CrawlConfig(fifoParity = false, sameDomainOnly = false,
      perHostBudget = 4, bloomEnabled = false)
    val out = new FrontierCrawler(spark, pages.toDS(), cfg, robots = Some(robots))
      .crawlSeeds(Seq("http://site0.com/").toDF("url"))
    val visited = out.sortedFound
    assert(!visited.exists(_.contains("/private/")), s"disallowed path crawled: $visited")
    // the host itself stays crawlable — allowed pages all visited,
    // including /b discovered alongside the excluded /private/ links
    assert(visited.contains("http://site0.com/a"))
    assert(visited.contains("http://site0.com/b"))
    // /c is only linked FROM a disallowed page — never discovered
    assert(!visited.contains("http://site0.com/c"))
  }

  test("RFC 9309 wildcard rules steer the scheduler end-to-end: $ anchor, * extension block") {
    import graft.model.PageRow
    def page(url: String, links: Seq[String] = Nil) =
      PageRow(url, 200, None, links, None, Some("text/html"), None, None)
    val pages = Seq(
      page("http://w.com/", Seq("/doc.pdf", "/doc.pdfx", "/exact", "/exact/sub", "/keep")),
      page("http://w.com/doc.pdf"),
      page("http://w.com/doc.pdfx"),
      page("http://w.com/exact", Seq("/exact/sub")),
      page("http://w.com/exact/sub"),
      page("http://w.com/keep"))
    // /*.pdf$ blocks only true .pdf paths (not .pdfx); /exact$ blocks the
    // exact path but NOT /exact/sub (the anchor stops prefix bleed)
    val robots = Robots.parse(Seq(
      ("w.com", "User-agent: *\nDisallow: /*.pdf$\nDisallow: /exact$")).toDS())
    val cfg = CrawlConfig(fifoParity = false, sameDomainOnly = false,
      perHostBudget = 8, bloomEnabled = false)
    val out = new FrontierCrawler(spark, pages.toDS(), cfg, robots = Some(robots))
      .crawlSeeds(Seq("http://w.com/").toDF("url"))
    val visited = out.sortedFound.toSet
    assert(!visited.contains("http://w.com/doc.pdf"), visited.toString)
    assert(visited.contains("http://w.com/doc.pdfx"), visited.toString)
    assert(!visited.contains("http://w.com/exact"), visited.toString)
    assert(visited.contains("http://w.com/exact/sub"), visited.toString)
    assert(visited.contains("http://w.com/keep"), visited.toString)
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
