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

  test("skewed pattern: salted two-phase admits the exact unsalted set, no single-pattern window") {
    import org.apache.spark.sql.expressions.Window
    // one hot trap pattern carrying ≥10× every other pattern's rows — the
    // case a per-pattern window funnels through one task. Distributed
    // input (spark.range), NOT a local Seq: the plan assertion below must
    // see real exchanges.
    val rows = spark.range(0, 4400, 1, 8)
      .select(
        when($"id" < 4000, lit(7L)).otherwise(pmod($"id", lit(4)) + 100L).as("__pat"),
        concat(lit("http://t.com/p/"), $"id").as("url"))
      .withColumn("urlHash", xxhash64($"url"))
      .withColumn("__cnt", when($"__pat" === 7L, 2L).otherwise(0L))
    val cap = 25
    val admitted = FrontierCrawler.trapGuardAdmit(rows, cap, saltBuckets = 8)

    // (a) plan: the FIRST (inner) window partitions by (pattern, salt) —
    // no window in the plan partitions by the pattern alone before the
    // salted prefilter has capped each bucket
    val wins = admitted.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.size
    }
    assert(wins.size == 2, s"expected 2 windows, got $wins")
    assert(wins.toSet == Set(1, 2),
      s"expected one salted (2-expr) and one per-pattern window, got $wins")
    // collect is top-down: the OUTER (last-executed) window is the 1-expr
    // per-pattern rank over the ≤ saltBuckets × cap salted survivors
    assert(wins.head == 1 && wins(1) == 2,
      s"salted window must run FIRST (inner), got top-down sizes $wins")

    // (b) admitted set is bit-identical to the unsalted single window's
    val unsaltedW = Window.partitionBy($"__pat").orderBy($"urlHash", $"url")
    val expected = rows
      .withColumn("__rk", row_number().over(unsaltedW).cast("long"))
      .filter($"__cnt" + $"__rk" <= cap)
      .select("url").as[String].collect().sorted.toSeq
    val got = admitted.select("url").as[String].collect().sorted.toSeq
    assert(got == expected)
    // hot pattern admitted cap − cnt, cold patterns capped at their size
    val byPat = admitted.withColumn("__p",
        when($"url".substr(16, 99).cast("long") < 4000, 7L).otherwise(-1L))
      .groupBy("__p").count().as[(Long, Long)].collect().toMap
    assert(byPat(7L) == cap - 2)
    assert(byPat(-1L) == 4 * cap) // 4 cold patterns × 100 rows ≥ cap each
  }
}
