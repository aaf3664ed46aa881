package graft.operators

import graft.functions.TestSpark
import graft.model.{CrawlConfig, PageRow}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Retry-After backoff as a RELATION: the blocked-host set must never be
  * driver-resident or plan-inlined above `hostBlockInlineMax` — an
  * adversarial workload with millions of backing-off hosts has to produce a
  * bounded plan (anti-join against the persisted hoststate parquet), while
  * the sparse common case keeps the cheaper inlined filter. */
class HostBackoffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def pg(url: String, links: Seq[String]): PageRow =
    PageRow(url, 200, None, links, None, Some("text/html"), None, None)

  test("10^4 backing-off hosts: bounded plan via anti-join, no inlined literals") {
    val dir = Files.createTempDirectory("graft-backoff-").toString
    val store = new CheckpointStore(spark, dir)
    val nHosts = 10000
    store.saveHostState(0,
      spark.range(0, nHosts).select(
        concat(lit("blocked"), $"id", lit(".com")).as("host"),
        lit(1000).as("notBefore")))

    val crawler = new FrontierCrawler(spark, spark.emptyDataset[PageRow],
      CrawlConfig(fifoParity = false, hostBlockInlineMax = 100L,
        checkpointDir = Some(dir)))
    crawler.loadHostBackoff(0)

    val frontier = Seq(
      ("http://ok.com/a", "ok.com"),
      ("http://blocked17.com/a", "blocked17.com"),
      ("http://blocked9999.com/a", "blocked9999.com")).toDF("url", "host")
    val filtered = crawler.applyHostBackoff(frontier, round = 1)
    assert(filtered.select("host").as[String].collect().toSeq == Seq("ok.com"))

    // bounded plan: the 10^4 hosts appear as a parquet-backed anti-join,
    // never as an IN-list literal — plan text stays small and host-free
    val plan = filtered.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected anti-join plan, got:\n$plan")
    assert(!plan.contains("blocked17.com"), "blocked hosts inlined into the plan")
    assert(plan.length < 20000, s"plan grows with host count: ${plan.length} chars")
  }

  test("small backoff state stays inlined (no join below the threshold)") {
    val dir = Files.createTempDirectory("graft-backoff-small-").toString
    val store = new CheckpointStore(spark, dir)
    store.saveHostState(0, Seq(("slow.com", 1000)).toDF("host", "notBefore"))
    val crawler = new FrontierCrawler(spark, spark.emptyDataset[PageRow],
      CrawlConfig(fifoParity = false, checkpointDir = Some(dir))) // default threshold
    crawler.loadHostBackoff(0)
    val frontier = Seq(("http://ok.com/a", "ok.com"), ("http://slow.com/a", "slow.com"))
      .toDF("url", "host")
    val filtered = crawler.applyHostBackoff(frontier, round = 1)
    assert(filtered.select("host").as[String].collect().toSeq == Seq("ok.com"))
    val plan = filtered.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LeftAnti"), "sparse state should not pay an anti-join")
    // expired backoff lifts the filter entirely
    assert(crawler.applyHostBackoff(frontier, round = 2000).count() == 2)
  }

  test("Retry-After crawl semantics identical on the anti-join path") {
    val pages = Seq(
      pg("http://a.com/root", Seq("/throttle", "/x1")),
      PageRow("http://a.com/throttle", 503, None, Nil, None, Some("text/html"), Some(1), None),
      pg("http://a.com/x1", Seq("/x2")),
      pg("http://a.com/x2", Seq("/x3")),
      pg("http://a.com/x3", Nil))
    def run(inlineMax: Long) = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(fifoParity = false, sameDomainOnly = false, delay = 0.1,
        perHostBudget = 2, bloomEnabled = false, maxRounds = 40,
        hostBlockInlineMax = inlineMax))
      .crawlSeeds(Seq("http://a.com/root").toDF("url"))
    val inlined = run(1024L)
    val joined = run(0L) // force the relation/anti-join path
    assert(joined.sortedFound == inlined.sortedFound)
    assert(joined.stats == inlined.stats)
    assert(joined.visitLog.orderBy("round", "batchIdx").collect().toSeq ==
      inlined.visitLog.orderBy("round", "batchIdx").collect().toSeq)
  }

  test("error-driven demotion: a melting host pauses, healthy host unaffected, found set unchanged") {
    // good.com resolves; every bad.com URL is absent from the pages relation
    // (network error on fetch). Root discovers 4 good + 20 bad URLs.
    val pages = Seq(
      pg("http://good.com/",
        (1 to 4).map(i => s"http://good.com/g$i") ++
          (1 to 20).map(i => s"http://bad.com/b$i"))) ++
      (1 to 4).map(i => pg(s"http://good.com/g$i", Nil))
    def run(threshold: Double) = {
      val dir = Files.createTempDirectory("graft-errbackoff-").toString
      (dir, new FrontierCrawler(spark, pages.toDS(),
        CrawlConfig(fifoParity = false, sameDomainOnly = false,
          perHostBudget = 4, bloomEnabled = false, maxRounds = 60,
          errorBackoffThreshold = threshold, errorBackoffMin = 4,
          errorBackoffRounds = 3, checkpointDir = Some(dir)))
        .crawlSeeds(Seq("http://good.com/").toDF("url")))
    }
    val (dirOn, on) = run(0.9)
    val (_, off) = run(0.0)

    // pure scheduling change: same found set, same error count
    assert(on.sortedFound == off.sortedFound)
    assert(on.stats.errorCount == off.stats.errorCount && on.stats.errorCount == 20L)

    // round 1 schedules 4 bad.com rows (all error) → demoted: notBefore =
    // 1+1+3 = 5, so rounds 2-4 must schedule NOTHING on bad.com while its
    // 16 remaining frontier rows wait; good.com finished unimpeded
    val log = on.visitLog
      .withColumn("host", graft.functions.UrlFunctions.url_host($"url"))
      .select("round", "host").collect().map(r => (r.getInt(0), r.getString(1)))
    val badRounds = log.collect { case (r, "bad.com") => r }.toSeq.sorted
    assert(badRounds.head == 1, s"first bad.com round: $badRounds")
    assert(!badRounds.exists(r => r >= 2 && r <= 4),
      s"bad.com scheduled inside its penalty window: $badRounds")
    assert(badRounds.size == 20)

    // only the melting host entered the backoff relation
    val m = new CheckpointStore(spark, dirOn, visitedFromLog = true).latestManifest().get
    val hosts = new CheckpointStore(spark, dirOn, visitedFromLog = true)
      .readHostState(m.hostStateRound).select("host").as[String].collect().toSet
    assert(hosts == Set("bad.com"))
  }
}
