package graft.operators

import graft.functions.{TestSpark, UrlKernels}
import graft.model.{CrawlConfig, PageRow}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Crawl-trap guard (CrawlConfig.trapPatternCap): a per-URL-pattern
  * admission budget that stops infinite URL spaces — calendar chains,
  * session-id echoes, faceted-search explosions — from flooding the
  * frontier. The reference crawler walks such traps forever
  * (`/root/reference/src/web_crawler.py:245` has no defense); at
  * 10^10-frontier scale this guard is what keeps one adversarial host from
  * owning the crawl.
  */
class TrapGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // ---- pattern-key kernel -------------------------------------------------

  test("url_pattern_key: digit runs, hex ids, query values collapse; words survive") {
    def k(u: String) = UrlKernels.urlPatternKeyJ(u)
    // digit runs in the path collapse; query keeps keys in document order
    assert(k("http://a.com/cal/2026/08/18?page=3&ref=x") == "a.com/cal/#/#/#?page&ref")
    // case folds; trailing digits collapse independently of the word
    assert(k("http://a.com/Item42") == "a.com/item#")
    // ≥16-char mixed hex run with a digit = generated id, collapses
    assert(k("http://a.com/s/a1b2c3d4e5f60718") == "a.com/s/#")
    // pure-letter hex words (no digit) survive at any length
    assert(k("http://a.com/s/deadbeef") == "a.com/s/deadbeef")
    // short mixed runs survive (cat5e is a word, not an id)
    assert(k("http://a.com/cat5e") == "a.com/cat5e")
    // port rides the netloc; scheme is dropped (http/https share patterns)
    assert(k("https://a.com:8080/x") == "a.com:8080/x")
    // valueless query keys kept; no query → no '?'
    assert(k("http://a.com/p?flag") == "a.com/p?flag")
    assert(k("http://a.com/p") == "a.com/p")
  }

  test("url_pattern_key: fuses into WholeStageCodegen; null-intolerant") {
    import graft.functions.UrlFunctions
    // parquet-backed source so ConvertToLocalRelation can't pre-evaluate
    // the projection — the assertion must see the real codegen'd plan
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(when($"doc_id" % 2 === 0,
        concat(lit("http://a.com/p/"), $"doc_id")).as("url"))
    val keyed = docs.select(UrlFunctions.url_pattern_key($"url").as("k"))
    assert(keyed.queryExecution.executedPlan.toString.contains("*(1) Project"))
    val got = keyed.collect().map(r => Option(r.getString(0))).toSet
    assert(got == Set(Some("a.com/p/#"), None)) // odd doc_ids → null in, null out
  }

  // ---- end-to-end crawl ---------------------------------------------------

  /** One healthy host tree + a calendar trap: /cal/N links to /cal/N+1
    * forever (every page shares the pattern site.com/cal/#), and the root
    * fans out to `width` same-pattern item pages. */
  private def trapPages(chain: Int, width: Int): Seq[PageRow] = {
    def page(url: String, links: Seq[String]) =
      PageRow(url, 200, None, links, None, None, None, None)
    val root = page("http://trap.com/",
      Seq("/a", "/b", "/cal/1") ++ (1 to width).map(i => s"/item?id=$i"))
    val healthy = Seq(
      page("http://trap.com/a", Seq("/b", "/c")),
      page("http://trap.com/b", Seq("/c")),
      page("http://trap.com/c", Nil))
    val cal = (1 to chain).map(i =>
      page(s"http://trap.com/cal/$i", Seq(s"/cal/${i + 1}")))
    val items = (1 to width).map(i => page(s"http://trap.com/item?id=$i", Nil))
    root +: (healthy ++ cal ++ items)
  }

  private def cfg(dir: String, cap: Int) = CrawlConfig(
    fifoParity = false, sameDomainOnly = false, perHostBudget = 64,
    saltBuckets = 4, bloomEnabled = true, bloomMinFrontierRows = 0L,
    bloomExpectedItems = 100000L, trapPatternCap = cap,
    checkpointDir = Some(dir), maxRounds = 1000)

  test("calendar chain and fan-out stop at the cap; healthy pages unaffected") {
    val dir = Files.createTempDirectory("graft-trap-").toString
    val pages = trapPages(chain = 60, width = 40)
    val out = new FrontierCrawler(spark, pages.toDS(), cfg(dir, cap = 5))
      .crawlSeeds(Seq("http://trap.com/").toDF("url"))
    val found = out.sortedFound
    // all healthy pages crawled
    assert(Seq("http://trap.com/", "http://trap.com/a", "http://trap.com/b",
      "http://trap.com/c").forall(found.contains))
    // the chain trap admitted exactly cap pages (reachable sequentially)
    assert(found.count(_.startsWith("http://trap.com/cal/")) == 5)
    // the fan-out trap admitted exactly cap of the 40 same-pattern items
    assert(found.count(_.startsWith("http://trap.com/item")) == 5)
    // and WHICH ones is deterministic: re-crawl fresh → identical set
    val dir2 = Files.createTempDirectory("graft-trap-").toString
    val out2 = new FrontierCrawler(spark, pages.toDS(), cfg(dir2, cap = 5))
      .crawlSeeds(Seq("http://trap.com/").toDF("url"))
    assert(out2.sortedFound == found)
  }

  test("cap off: the same fixture genuinely explodes (guard is the difference)") {
    val dir = Files.createTempDirectory("graft-trap-").toString
    val pages = trapPages(chain = 30, width = 20)
    val out = new FrontierCrawler(spark, pages.toDS(), cfg(dir, cap = 0))
      .crawlSeeds(Seq("http://trap.com/").toDF("url"))
    // 30 existing chain pages + /cal/31 (scheduled off the last page, fetch
    // misses → network error, but polite mode logs every scheduled URL)
    assert(out.sortedFound.count(_.startsWith("http://trap.com/cal/")) == 31)
    assert(out.sortedFound.count(_.startsWith("http://trap.com/item")) == 20)
  }

  test("lifetime counts survive resume: interrupted crawl + resume honors one budget") {
    val dir = Files.createTempDirectory("graft-trap-").toString
    val pages = trapPages(chain = 60, width = 0)
    // stop after 3 rounds (~3 cal pages admitted), then resume to completion
    val c = cfg(dir, cap = 5)
    new FrontierCrawler(spark, pages.toDS(), c.copy(maxRounds = 3))
      .crawlSeeds(Seq("http://trap.com/").toDF("url"))
    val m = new CheckpointStore(spark, dir, visitedFromLog = true).latestManifest().get
    assert(m.patternStateRound >= 0, "pattern state not persisted")
    val out = new FrontierCrawler(spark, pages.toDS(), c)
      .crawlSeeds(Seq("http://trap.com/").toDF("url"))
    // the resumed crawl counts PRIOR admissions: still exactly cap in total
    assert(out.sortedFound.count(_.startsWith("http://trap.com/cal/")) == 5)
  }
}
