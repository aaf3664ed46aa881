package graft.operators

import graft.functions.TestSpark
import graft.model.{CrawlConfig, PageRow}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Mirror-page suppression (CrawlConfig.contentDedup): pages whose resolved,
  * normalized link set was already extracted skip the explode/normalize/
  * anti-join path. The invariant under test is the design contract — the
  * found set is IDENTICAL with the flag on or off (the digest covers exactly
  * what admission would consume), while the digest state shows the repeats
  * were actually suppressed.
  */
class ContentDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def page(url: String, links: Seq[String]) =
    PageRow(url, 200, None, links, None, None, None, None)

  /** A hub tree where `mirrors` copies of the same directory listing exist
    * under different URLs (round-robin discovered across rounds), plus
    * RELATIVE-link pages that only LOOK alike: /d1/p and /d2/p both link
    * "sub" — same raw array, different resolved targets, so they must NOT
    * be treated as mirrors. */
  private def mirrorPages(mirrors: Int): Seq[PageRow] = {
    val root = page("http://m.com/",
      (1 to mirrors).map(i => s"/copy$i") ++ Seq("/d1/p", "/d2/p"))
    val copies = (1 to mirrors).map(i =>
      page(s"http://m.com/copy$i", Seq("/x", "/y")))
    val lookalikes = Seq(
      page("http://m.com/d1/p", Seq("sub")),
      page("http://m.com/d2/p", Seq("sub")),
      page("http://m.com/d1/sub", Nil),
      page("http://m.com/d2/sub", Nil))
    val leaves = Seq(page("http://m.com/x", Nil), page("http://m.com/y", Nil))
    root +: (copies ++ lookalikes ++ leaves)
  }

  private def cfg(dir: String, on: Boolean) = CrawlConfig(
    fifoParity = false, sameDomainOnly = false, perHostBudget = 3,
    saltBuckets = 4, bloomEnabled = true, bloomMinFrontierRows = 0L,
    bloomExpectedItems = 100000L, contentDedup = on,
    checkpointDir = Some(dir), maxRounds = 1000)

  test("found set identical with suppression on/off; repeats actually suppressed") {
    val pages = mirrorPages(mirrors = 6)
    val dOn = Files.createTempDirectory("graft-cdp-").toString
    val dOff = Files.createTempDirectory("graft-cdp-").toString
    val outOn = new FrontierCrawler(spark, pages.toDS(), cfg(dOn, on = true))
      .crawlSeeds(Seq("http://m.com/").toDF("url"))
    val outOff = new FrontierCrawler(spark, pages.toDS(), cfg(dOff, on = false))
      .crawlSeeds(Seq("http://m.com/").toDF("url"))
    assert(outOn.sortedFound == outOff.sortedFound)
    // relative-link lookalikes were NOT suppressed: both sub targets found
    assert(outOn.sortedFound.contains("http://m.com/d1/sub"))
    assert(outOn.sortedFound.contains("http://m.com/d2/sub"))

    // digest state: the 6 mirror copies share ONE digest — total fresh
    // digests = distinct resolved link sets, strictly fewer than OK pages
    val store = new CheckpointStore(spark, dOn, visitedFromLog = true)
    val m = store.latestManifest().get
    assert(m.contentRounds.nonEmpty)
    val digests = store.readContentDigests(m.contentRounds).get
    val nDigests = digests.count()
    val okPages = pages.count(_.links.nonEmpty) // root, 6 copies, d1/p, d2/p
    assert(nDigests < okPages, s"$nDigests digests vs $okPages link-bearing pages")
    // exactly one digest per distinct resolved set: root, copy listing,
    // d1/p->d1/sub, d2/p->d2/sub
    assert(digests.distinct().count() == 4)
  }

  test("resume carries digest state: a mirror met after resume is still suppressed") {
    val pages = mirrorPages(mirrors = 6)
    val dir = Files.createTempDirectory("graft-cdp-").toString
    // stop early (root + first copies), then resume to completion
    new FrontierCrawler(spark, pages.toDS(), cfg(dir, on = true).copy(maxRounds = 2))
      .crawlSeeds(Seq("http://m.com/").toDF("url"))
    val out = new FrontierCrawler(spark, pages.toDS(), cfg(dir, on = true))
      .crawlSeeds(Seq("http://m.com/").toDF("url"))
    val store = new CheckpointStore(spark, dir, visitedFromLog = true)
    val m = store.latestManifest().get
    // across both runs, the copy-listing digest appears exactly once
    assert(store.readContentDigests(m.contentRounds).get.distinct().count() == 4)
    assert(out.sortedFound.contains("http://m.com/x"))
  }
}
