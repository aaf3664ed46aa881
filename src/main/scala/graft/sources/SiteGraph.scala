package graft.sources

import graft.model.PageRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic synthetic site-graph generation (FIXTURES.md §1).
  *
  * Stands in for the live web: the crawl engine joins its frontier against
  * this `pages` relation instead of issuing HTTP GETs
  * (`/root/reference/src/utils/redirect_handler.py:101-103`). Everything is
  * a pure function of (seed, ids) — no entropy, no network — so the Spark
  * engine and the driver-side reference oracle see the identical web.
  *
  * Two shapes:
  *  - hand-written literal graphs for parity tests (redirect loops, external
  *    links, error pages — mirroring the reference fixture HTML at
  *    `/root/reference/test/test_web_crawler.py:81-95`)
  *  - a scalable seeded generator (`generate`) that builds an n-host graph
  *    distributed via `spark.range` — used by Bench at millions of pages.
  */
object SiteGraph {

  /** splitmix64 — deterministic 64-bit mixer for seeded generation. */
  def mix(seed: Long, xs: Long*): Long = {
    var z = seed
    xs.foreach { x =>
      z += x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e91bL
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
    }
    z
  }

  /** Uniform double in [0,1) from a mixed hash. */
  def unit(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  final case class GraphParams(
      nHosts: Int = 4,
      pagesPerHost: Int = 50,
      linksPerPage: Int = 4,
      seed: Long = 42L,
      // fraction of pages that 301-redirect to another page on the host
      redirectFrac: Double = 0.05,
      // fraction of pages answering 404/500
      errorFrac: Double = 0.05,
      // fraction of links pointing at URLs absent from the table (network err)
      deadLinkFrac: Double = 0.02,
      // fraction of links that cross hosts (dropped in same-domain mode)
      crossHostFrac: Double = 0.1,
      // skew: this fraction of all pages lives on host 0 (rest uniform)
      heavyHostFrac: Double = 0.0) {
    def totalPages: Long = nHosts.toLong * pagesPerHost
  }

  def hostName(h: Int): String = s"site$h.com"
  def pageUrl(h: Int, i: Long): String = s"http://${hostName(h)}/p/$i"

  /** Page index space per host under skew: host 0 owns `heavyHostFrac` of all
    * pages; remaining pages spread uniformly over hosts 1..n-1. */
  def hostOf(id: Long, p: GraphParams): (Int, Long) = {
    if (p.heavyHostFrac <= 0 || p.nHosts == 1) {
      val h = (id / p.pagesPerHost).toInt
      (h, id % p.pagesPerHost)
    } else {
      val heavy = (p.totalPages * p.heavyHostFrac).toLong
      if (id < heavy) (0, id)
      else {
        val rest = id - heavy
        val others = math.max(1, p.nHosts - 1)
        ((rest % others).toInt + 1, rest / others)
      }
    }
  }

  def pagesOnHost(h: Int, p: GraphParams): Long = {
    if (p.heavyHostFrac <= 0 || p.nHosts == 1) p.pagesPerHost
    else {
      val heavy = (p.totalPages * p.heavyHostFrac).toLong
      if (h == 0) heavy
      else {
        val rest = p.totalPages - heavy
        val others = math.max(1, p.nHosts - 1)
        rest / others + (if (h - 1 < (rest % others)) 1 else 0)
      }
    }
  }

  /** Pure page function — identical on executors and in the oracle. */
  def pageFor(id: Long, p: GraphParams): PageRow = {
    val (h, i) = hostOf(id, p)
    val n = pagesOnHost(h, p)
    val url = pageUrl(h, i)
    val r = mix(p.seed, 1L, h.toLong, i)
    val roll = unit(r)
    if (roll < p.errorFrac) {
      PageRow(url, if (unit(mix(r, 2L)) < 0.5) 404 else 500, None, Nil, None,
        Some("text/html"), None, None)
    } else if (roll < p.errorFrac + p.redirectFrac && n > 1) {
      // redirect to another page on the same host; relative Location half the time
      val tgt = (i + 1 + (mix(r, 3L) >>> 33) % math.max(1L, n - 1)) % n
      val loc = if (unit(mix(r, 4L)) < 0.5) s"/p/$tgt" else pageUrl(h, tgt)
      PageRow(url, 301, Some(loc), Nil, None, Some("text/html"), None, None)
    } else {
      val nl = 1 + (mix(r, 5L) >>> 33) % p.linksPerPage
      // ring link first: keeps the host graph connected through the random
      // error/redirect interruptions so crawls exercise the full site
      val ring = s"/p/${(i + 1) % n}"
      val links = ring +: (0L until nl).map { j =>
        val lr = mix(r, 6L, j)
        val cross = unit(lr) < p.crossHostFrac && p.nHosts > 1
        val dead = unit(mix(lr, 7L)) < p.deadLinkFrac
        if (dead) s"/dead/${mix(lr, 8L) >>> 40}"
        else if (cross) {
          val oh = (1 + (mix(lr, 9L) >>> 33) % math.max(1L, p.nHosts - 1)).toInt match {
            case x if x == h => (x + 1) % p.nHosts
            case x           => x % p.nHosts
          }
          pageUrl(oh, (mix(lr, 10L) >>> 33) % math.max(1L, pagesOnHost(oh, p)))
        } else {
          val tgt = (mix(lr, 11L) >>> 33) % n
          // exercise the resolver: rooted/absolute/bare-relative/fragment
          // forms all canonicalize onto a live page; the rare query-string
          // alias canonicalizes to a URL outside the table (a dead alias —
          // it exercises keep-last+sorted query re-encoding and the
          // network-error path without starving connectivity)
          (mix(lr, 12L) >>> 33) % 8 match {
            case 0 | 1 => s"/p/$tgt"
            case 2 | 3 => pageUrl(h, tgt)
            case 4 | 5 => s"$tgt" // resolves against the /p/<i> base dir
            case 6     => s"/p/$tgt#frag"
            case _     => s"/p/$tgt?b=2&a=1"
          }
        }
      }
      PageRow(url, 200, None, links, None, Some("text/html"), None,
        Some(f"img_${h}%d_${i}%06d"))
    }
  }

  /** Local materialization — for tests and the oracle. */
  def localPages(p: GraphParams): Seq[PageRow] =
    (0L until p.totalPages).map(pageFor(_, p))

  /** Distributed materialization — scales to hundreds of millions of rows
    * (one narrow map over `spark.range`, no shuffle, no driver data). */
  def generate(spark: SparkSession, p: GraphParams): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(0, p.totalPages, 1, spark.sparkContext.defaultParallelism)
      .map(id => pageFor(id, p))
  }

  def toDF(spark: SparkSession, rows: Seq[PageRow]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  // ---- literal graphs for parity tests -------------------------------

  private def page(url: String, links: Seq[String] = Nil, status: Int = 200,
      location: Option[String] = None): PageRow =
    PageRow(url, status, location, links, None, Some("text/html"), None, None)

  /** The reference's fixture page (`test/test_web_crawler.py:81-95`):
    * relative, absolute same-domain, external, subdomain, mailto, tel,
    * fragment-only hrefs. */
  def referenceFixture: Seq[PageRow] = Seq(
    page("http://example.com", Seq(
      "/page1", "http://example.com/page2", "page3",
      "http://other-domain.com/page", "http://subdomain.example.com/page",
      "mailto:test@example.com", "tel:+1234567890", "#fragment")),
    page("http://example.com/page1"),
    page("http://example.com/page2"),
    page("http://example.com/page3"))

  /** Diamond + dup links: duplicate discovery across parents. */
  def diamond: Seq[PageRow] = Seq(
    page("http://d.com", Seq("/a", "/b", "/a")),
    page("http://d.com/a", Seq("/c")),
    page("http://d.com/b", Seq("/c", "/a")),
    page("http://d.com/c", Seq("/")))

  /** Redirect chain + loops + external redirect + 404 + dead link. */
  def redirects: Seq[PageRow] = Seq(
    page("http://r.com", Seq("/chain", "/rev", "/circ", "/ext", "/missing", "/err", "/self")),
    page("http://r.com/chain", status = 301, location = Some("/chain2")),
    page("http://r.com/chain2", status = 302, location = Some("/final")),
    page("http://r.com/final", Seq("/")),
    page("http://r.com/rev", status = 301, location = Some("/rev2")),
    page("http://r.com/rev2", status = 301, location = Some("/rev")),
    page("http://r.com/circ", status = 301, location = Some("/circ2")),
    page("http://r.com/circ2", status = 301, location = Some("/circ3")),
    page("http://r.com/circ3", status = 301, location = Some("/circ")),
    page("http://r.com/ext", status = 301, location = Some("http://other.com/x")),
    page("http://r.com/err", status = 404),
    page("http://r.com/self", status = 301, location = Some("/self")))
}
