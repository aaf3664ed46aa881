package graft.operators

import graft.functions.{CuckooBucketHandle, TestSpark}
import graft.model.CrawlConfig
import graft.sources.SiteGraph
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The cuckoo variant of the partitioned seen-filter store wired through the
  * crawl engine (`seenFilterKind = "cuckoo"`): same answers as the Bloom
  * store and as no filter at all, exact resume, and safe resume across a
  * representation switch (the old snapshot pointer must be distrusted — a
  * missing bucket file reads as "never visited").
  */
class CuckooSeenFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cuckoo bucket store: build, cross-round merge, no false negatives") {
    val dir = Files.createTempDirectory("graft-cuckoobucket-").toString
    val store = new CheckpointStore(spark, dir)
    val n = 8
    val r0 = (0L until 500L).map(i => i * 2654435761L).toDF("urlHash")
    store.saveCuckooBuckets(0, -1, r0, n, 1024L)
    val r2 = (500L until 900L).map(i => i * 2654435761L).toDF("urlHash")
    store.saveCuckooBuckets(2, 0, r2, n, 1024L)

    val h2 = new CuckooBucketHandle(dir, 2, n)
    (0L until 900L).map(_ * 2654435761L).foreach(h => assert(h2.probe(h), s"false negative $h"))
    val h0 = new CuckooBucketHandle(dir, 0, n)
    (0L until 500L).map(_ * 2654435761L).foreach(h => assert(h0.probe(h)))
    // a round with no snapshot: every bucket file missing → all false
    val hNone = new CuckooBucketHandle(dir, 7, n)
    assert((1L until 100L).forall(h => !hNone.probe(h * 2654435761L)))
  }

  test("polite crawl with cuckoo store ≡ bloom store ≡ no filter") {
    val p = SiteGraph.GraphParams(nHosts = 4, pagesPerHost = 30, linksPerPage = 4,
      redirectFrac = 0.05, errorFrac = 0.1, deadLinkFrac = 0.05, crossHostFrac = 0.3,
      heavyHostFrac = 0.5, seed = 97L)
    val pages = SiteGraph.localPages(p)
    val seeds = (0 until 4).flatMap(h =>
      pages.find(r => r.status == 200 && r.url.startsWith(s"http://site$h.com")).map(_.url))
    def run(kind: String, buckets: Int, enabled: Boolean) =
      new FrontierCrawler(spark, pages.toDS(),
        CrawlConfig(fifoParity = false, sameDomainOnly = false, perHostBudget = 3,
          saltBuckets = 4, bloomEnabled = enabled, bloomBuckets = buckets,
          seenFilterKind = kind, bloomMinFrontierRows = 0L,
          bloomExpectedItems = 100000L, bloomUpdateEvery = 1))
        .crawlSeeds(seeds.toDF("url"))
    val cuckoo = run("cuckoo", 8, enabled = true)
    val bloomed = run("bloom", 8, enabled = true)
    val plain = run("bloom", 0, enabled = false)
    assert(cuckoo.sortedFound == bloomed.sortedFound)
    assert(cuckoo.sortedFound == plain.sortedFound)
    assert(cuckoo.stats == bloomed.stats)
    assert(cuckoo.stats == plain.stats)
    // the cuckoo run actually wrote a partitioned cuckoo snapshot
    assert(Files.list(java.nio.file.Paths.get(cuckoo.checkpointDir, "cuckoobuckets"))
      .count() > 0, "no cuckoo bucket snapshot written")
  }

  test("cuckoo-mode crawl resumes exactly from checkpoint") {
    val p = SiteGraph.GraphParams(nHosts = 3, pagesPerHost = 25, linksPerPage = 4,
      redirectFrac = 0.05, errorFrac = 0.05, crossHostFrac = 0.25, seed = 53L)
    val pages = SiteGraph.localPages(p)
    val seeds = (0 until 3).flatMap(h =>
      pages.find(r => r.status == 200 && r.url.startsWith(s"http://site$h.com")).map(_.url))
    def cfg(dir: Option[String], rounds: Int) = CrawlConfig(fifoParity = false,
      sameDomainOnly = false, perHostBudget = 3, bloomEnabled = true, bloomBuckets = 4,
      seenFilterKind = "cuckoo", bloomMinFrontierRows = 0L,
      bloomExpectedItems = 100000L, bloomUpdateEvery = 1, maxRounds = rounds,
      checkpointDir = dir)
    val full = new FrontierCrawler(spark, pages.toDS(), cfg(None, Int.MaxValue))
      .crawlSeeds(seeds.toDF("url"))
    val dir = Files.createTempDirectory("graft-cuckooresume-").toString
    new FrontierCrawler(spark, pages.toDS(), cfg(Some(dir), 2)).crawlSeeds(seeds.toDF("url"))
    val resumed = new FrontierCrawler(spark, pages.toDS(), cfg(Some(dir), Int.MaxValue))
      .crawlSeeds(seeds.toDF("url"))
    assert(resumed.sortedFound == full.sortedFound)
    assert(resumed.stats == full.stats)
  }

  test("resume across a seen-filter representation switch stays exact") {
    val p = SiteGraph.GraphParams(nHosts = 3, pagesPerHost = 25, linksPerPage = 4,
      redirectFrac = 0.05, errorFrac = 0.05, crossHostFrac = 0.25, seed = 31L)
    val pages = SiteGraph.localPages(p)
    val seeds = (0 until 3).flatMap(h =>
      pages.find(r => r.status == 200 && r.url.startsWith(s"http://site$h.com")).map(_.url))
    def cfg(kind: String, dir: Option[String], rounds: Int) = CrawlConfig(
      fifoParity = false, sameDomainOnly = false, perHostBudget = 3,
      bloomEnabled = true, bloomBuckets = 4, seenFilterKind = kind,
      bloomMinFrontierRows = 0L, bloomExpectedItems = 100000L, bloomUpdateEvery = 1,
      maxRounds = rounds, checkpointDir = dir)
    val full = new FrontierCrawler(spark, pages.toDS(), cfg("bloom", None, Int.MaxValue))
      .crawlSeeds(seeds.toDF("url"))
    // rounds 0-1 under bloom buckets, the rest under cuckoo buckets: the
    // bloom snapshot pointer must be ignored (not read as all-missing
    // cuckoo buckets) or visited URLs would be re-scheduled
    val dir = Files.createTempDirectory("graft-kindswitch-").toString
    new FrontierCrawler(spark, pages.toDS(), cfg("bloom", Some(dir), 2))
      .crawlSeeds(seeds.toDF("url"))
    val resumed = new FrontierCrawler(spark, pages.toDS(), cfg("cuckoo", Some(dir), Int.MaxValue))
      .crawlSeeds(seeds.toDF("url"))
    assert(resumed.sortedFound == full.sortedFound)
    assert(resumed.stats == full.stats)
  }

  test("resume across a bucket-count change stays exact") {
    val p = SiteGraph.GraphParams(nHosts = 3, pagesPerHost = 25, linksPerPage = 4,
      redirectFrac = 0.05, errorFrac = 0.05, crossHostFrac = 0.25, seed = 67L)
    val pages = SiteGraph.localPages(p)
    val seeds = (0 until 3).flatMap(h =>
      pages.find(r => r.status == 200 && r.url.startsWith(s"http://site$h.com")).map(_.url))
    def cfg(kind: String, buckets: Int, dir: Option[String], rounds: Int) = CrawlConfig(
      fifoParity = false, sameDomainOnly = false, perHostBudget = 3,
      bloomEnabled = true, bloomBuckets = buckets, seenFilterKind = kind,
      bloomMinFrontierRows = 0L, bloomExpectedItems = 100000L, bloomUpdateEvery = 1,
      maxRounds = rounds, checkpointDir = dir)
    for (kind <- Seq("cuckoo", "bloom")) {
      val full = new FrontierCrawler(spark, pages.toDS(),
        cfg(kind, 4, None, Int.MaxValue)).crawlSeeds(seeds.toDF("url"))
      // rounds 0-1 under 4 buckets, the rest under 16: key→bucket routing
      // differs (floorMod by n), so the old snapshot must be distrusted —
      // probing the 16-bucket layout against 4-bucket files reads mostly
      // missing buckets, i.e. false negatives, and visited URLs would be
      // re-scheduled
      val dir = Files.createTempDirectory(s"graft-bucketswitch-$kind-").toString
      new FrontierCrawler(spark, pages.toDS(), cfg(kind, 4, Some(dir), 2))
        .crawlSeeds(seeds.toDF("url"))
      val m = new CheckpointStore(spark, dir, visitedFromLog = true).latestManifest().get
      assert(m.seenBuckets == 4)
      val resumed = new FrontierCrawler(spark, pages.toDS(),
        cfg(kind, 16, Some(dir), Int.MaxValue)).crawlSeeds(seeds.toDF("url"))
      assert(resumed.sortedFound == full.sortedFound, s"kind=$kind")
      assert(resumed.stats == full.stats, s"kind=$kind")
    }
  }
}
