package graft.sources

import graft.functions.{TestSpark, UrlKernels}
import graft.model.{CrawlConfig, PageRow}
import graft.operators.{FrontierCrawler, Robots}
import org.scalatest.funsuite.AnyFunSuite

/** Sitemap ingestion: robots `Sitemap:` directives → `Sitemaps.expand`
  * (breadth-first sitemapindex walk, cycle-safe) → crawl seeds. */
class SitemapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("loc extraction: plain, CDATA, whitespace, case; document order") {
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><loc> http://a.com/1 </loc></url>
        |<url><LOC>http://a.com/2</LOC></url>
        |<url><loc><![CDATA[http://a.com/3?a=1&b=2]]></loc></url>
        |<url><loc></loc></url>
        |</urlset>""".stripMargin
    assert(UrlKernels.sitemapLocs(xml).toSeq ==
      Seq("http://a.com/1", "http://a.com/2", "http://a.com/3?a=1&b=2"))
    assert(UrlKernels.sitemapLocs("no locs here").isEmpty)
  }

  test("robots Sitemap directive: group-independent, order kept, rules unaffected") {
    val r = Robots.parseBody(
      """User-agent: *
        |Disallow: /x
        |Sitemap: http://a.com/s1.xml
        |
        |User-agent: other
        |Sitemap: http://a.com/s2.xml""".stripMargin)
    assert(r.sitemaps == Seq("http://a.com/s1.xml", "http://a.com/s2.xml"))
    assert(r.disallowPrefixes == Seq("/x") && !r.disallowAll)
  }

  private def sm(url: String, xml: String) =
    PageRow(url, 200, None, Nil, Some(xml), Some("application/xml"), None, None)
  private def pg(url: String, links: Seq[String]) =
    PageRow(url, 200, None, links, None, Some("text/html"), None, None)

  private val urlset1 =
    "<urlset><url><loc>http://a.com/p1</loc></url><url><loc>http://a.com/p2</loc></url></urlset>"
  private val index2 = "<sitemapindex><sitemap><loc>http://a.com/sm3.xml</loc></sitemap></sitemapindex>"
  private val urlset3 =
    "<urlset><url><loc>http://a.com/p3</loc></url><url><loc>http://a.com/p1</loc></url></urlset>"
  private val rootIndex =
    """<sitemapindex>
      |<sitemap><loc>http://a.com/sm1.xml</loc></sitemap>
      |<sitemap><loc>http://a.com/sm2.xml</loc></sitemap>
      |<sitemap><loc>http://a.com/sitemap.xml</loc></sitemap>
      |<sitemap><loc>http://a.com/missing.xml</loc></sitemap>
      |</sitemapindex>""".stripMargin
  private val sitemapPages = Seq(
    sm("http://a.com/sitemap.xml", rootIndex), // lists itself: cycle
    sm("http://a.com/sm1.xml", urlset1),
    sm("http://a.com/sm2.xml", index2),
    sm("http://a.com/sm3.xml", urlset3))

  test("expand walks index nesting; cycles terminate; dead children tolerated; dup locs collapse") {
    val seeds = Sitemaps.expand(sitemapPages.toDS().toDF(),
      Seq("http://a.com/sitemap.xml").toDF("url"))
    assert(seeds.select("url").as[String].collect().sorted.toSeq ==
      Seq("http://a.com/p1", "http://a.com/p2", "http://a.com/p3"))
  }

  test("end-to-end: robots sitemaps seed a polite crawl of the listed pages") {
    val web = sitemapPages ++ Seq(
      pg("http://a.com/p1", Seq("/linked")), pg("http://a.com/p2", Nil),
      pg("http://a.com/p3", Nil), pg("http://a.com/linked", Nil))
    val robots = Robots.parse(
      Seq(("a.com", "User-agent: *\nDisallow:\nSitemap: http://a.com/sitemap.xml")).toDS())
    val roots = robots.select(
      org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("sitemaps")).as("url"))
    val seeds = Sitemaps.expand(web.toDS().toDF(), roots)
    val out = new FrontierCrawler(spark, web.toDS(),
      CrawlConfig(fifoParity = false, sameDomainOnly = false,
        perHostBudget = 8, bloomEnabled = false, maxRounds = 50))
      .crawlSeeds(seeds)
    // sitemap-listed pages fetched, and crawling continued through links
    assert(Seq("http://a.com/p1", "http://a.com/p2", "http://a.com/p3",
      "http://a.com/linked").forall(out.sortedFound.contains))
  }
}
