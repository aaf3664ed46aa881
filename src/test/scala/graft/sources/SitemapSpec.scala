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

  test("entry extraction: lastmod missing/plain/CDATA/empty; sitemap blocks too; loc-less dropped") {
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><loc>http://a.com/1</loc><lastmod>2026-08-01</lastmod></url>
        |<url><loc>http://a.com/2</loc></url>
        |<url><loc>http://a.com/3</loc><lastmod><![CDATA[ 2026-08-02T10:30:00+02:00 ]]></lastmod></url>
        |<url><loc>http://a.com/4</loc><lastmod>  </lastmod></url>
        |<url><lastmod>2026-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val got = Seq(xml).toDF("x")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.UrlFunctions.extract_sitemap_entries(
          org.apache.spark.sql.functions.col("x"))).as("e"))
      .select("e.loc", "e.lastmod").as[(String, Option[String])].collect().toSeq
    assert(got == Seq(
      ("http://a.com/1", Some("2026-08-01")),
      ("http://a.com/2", None),
      ("http://a.com/3", Some("2026-08-02T10:30:00+02:00")),
      ("http://a.com/4", None)))
    // index documents pair child-sitemap locs with THEIR lastmods the same way
    val idx = "<sitemapindex><sitemap><loc>http://a.com/s1.xml</loc>" +
      "<lastmod>2026-07-15</lastmod></sitemap></sitemapindex>"
    assert(UrlKernels.sitemapEntriesArray(
      org.apache.spark.unsafe.types.UTF8String.fromString(idx)).numElements() == 1)
  }

  test("expandEntries walks indexes; freshest non-null lastmod wins per URL; recencyRelation parses") {
    val us1 = "<urlset><url><loc>http://a.com/p1</loc><lastmod>2026-02-01</lastmod></url>" +
      "<url><loc>http://a.com/p2</loc></url></urlset>"
    val us3 = "<urlset><url><loc>http://a.com/p3</loc><lastmod>garbage-date</lastmod></url>" +
      "<url><loc>http://a.com/p1</loc><lastmod>2026-03-05T06:00:00Z</lastmod></url></urlset>"
    val pages = Seq(
      sm("http://a.com/sitemap.xml", rootIndex),
      sm("http://a.com/sm1.xml", us1),
      sm("http://a.com/sm2.xml", index2),
      sm("http://a.com/sm3.xml", us3)).toDS().toDF()
    val entries = Sitemaps.expandEntries(pages,
      Seq("http://a.com/sitemap.xml").toDF("url"))
    val got = entries.as[(String, Option[String])].collect().toMap
    assert(got == Map(
      "http://a.com/p1" -> Some("2026-03-05T06:00:00Z"), // freshest of two claims
      "http://a.com/p2" -> None,
      "http://a.com/p3" -> Some("garbage-date")))
    // timestamp conversion: ISO instant and date-only parse; garbage → NULL
    // (recency unknown), never an ANSI parse error
    val rec = Sitemaps.recencyRelation(entries)
      .selectExpr("url", "cast(lastmod as long)")
      .as[(String, Option[Long])].collect().toMap
    assert(rec("http://a.com/p1").contains(
      java.time.Instant.parse("2026-03-05T06:00:00Z").getEpochSecond))
    assert(rec("http://a.com/p2").isEmpty && rec("http://a.com/p3").isEmpty)
    assert(Sitemaps.recencyRelation(
        Seq(("u", "2026-08-19")).toDF("url", "lastmod"))
      .selectExpr("cast(lastmod as long)").as[Option[Long]].head()
      .contains(java.time.Instant.parse("2026-08-19T00:00:00Z").getEpochSecond))
  }

  test("image-pair extraction: block pairing, CDATA, optional caption, loc-less dropped") {
    val xml =
      """<urlset><url><loc>http://a.com/page</loc>
        |<image:image><image:loc> http://a.com/i1.jpg </image:loc>
        |<image:caption><![CDATA[a cat & dog]]></image:caption></image:image>
        |<image:image><image:loc>http://a.com/i2.png</image:loc></image:image>
        |<image:image><image:caption>orphan</image:caption></image:image>
        |<image:image><image:loc>  </image:loc><image:caption>blank</image:caption></image:image>
        |</url></urlset>""".stripMargin
    val pairs = Seq(xml).toDF("x")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.UrlFunctions.extract_sitemap_images(
          org.apache.spark.sql.functions.col("x"))).as("i"))
      .select("i.loc", "i.caption").as[(String, Option[String])].collect().toSeq
    assert(pairs == Seq(("http://a.com/i1.jpg", Some("a cat & dog")),
      ("http://a.com/i2.png", None)))
    // page-level loc extraction is unaffected by the image namespace
    assert(UrlKernels.sitemapLocs(xml).toSeq == Seq("http://a.com/page"))
  }

  test("expandImages walks indexes; min non-null caption wins per image URL") {
    val us1 = "<urlset><url><loc>http://a.com/p1</loc>" +
      "<image:image><image:loc>http://a.com/i.jpg</image:loc>" +
      "<image:caption>zebra</image:caption></image:image></url></urlset>"
    val us3 = "<urlset><url><loc>http://a.com/p3</loc>" +
      "<image:image><image:loc>http://a.com/i.jpg</image:loc>" +
      "<image:caption>ant</image:caption></image:image>" +
      "<image:image><image:loc>http://a.com/only.png</image:loc></image:image>" +
      "</url></urlset>"
    val pages = Seq(
      sm("http://a.com/sitemap.xml", rootIndex),
      sm("http://a.com/sm1.xml", us1),
      sm("http://a.com/sm2.xml", index2),
      sm("http://a.com/sm3.xml", us3)).toDS().toDF()
    val pairs = Sitemaps.expandImages(pages,
      Seq("http://a.com/sitemap.xml").toDF("url"))
      .as[(String, Option[String])].collect().toMap
    assert(pairs == Map("http://a.com/i.jpg" -> Some("ant"),
      "http://a.com/only.png" -> None))
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
