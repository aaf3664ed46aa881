package graft.operators

import graft.functions.{BloomBucketHandle, BloomBucketStore, TestSpark}
import graft.model.CrawlConfig
import graft.sources.SiteGraph
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The partitioned seen-filter store (SCALE.md §2.1): per-urlHash-bucket
  * Bloom snapshots built distributively and probed lazily per task — the
  * 10^10-scale replacement for one merged broadcast filter.
  */
class BloomBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucket store: build, cross-round merge, no false negatives, missing bucket = false") {
    val dir = Files.createTempDirectory("graft-bloombucket-").toString
    val store = new CheckpointStore(spark, dir)
    val n = 8

    // round 0: hashes 0..499; round 2 merges the round-1..2 delta on top
    val r0 = (0L until 500L).map(i => i * 2654435761L).toDF("urlHash")
    store.saveBloomBuckets(0, -1, r0, n, 1024L, 0.01)
    val r2 = (500L until 900L).map(i => i * 2654435761L).toDF("urlHash")
    store.saveBloomBuckets(2, 0, r2, n, 1024L, 0.01)

    val h2 = new BloomBucketHandle(dir, 2, n)
    // no false negatives across both deltas after the merge
    (0L until 900L).map(_ * 2654435761L).foreach(h => assert(h2.probe(h), s"false negative $h"))
    // the old snapshot answers only its own delta
    val h0 = new BloomBucketHandle(dir, 0, n)
    (0L until 500L).map(_ * 2654435761L).foreach(h => assert(h0.probe(h)))

    // a round with no snapshot: every bucket file is missing → all false
    val hNone = new BloomBucketHandle(dir, 7, n)
    assert((0L until 100L).forall(h => !hNone.probe(h)))
  }

  test("polite crawl with bucketed filter ≡ merged filter ≡ no filter") {
    val p = SiteGraph.GraphParams(nHosts = 4, pagesPerHost = 30, linksPerPage = 4,
      redirectFrac = 0.05, errorFrac = 0.1, deadLinkFrac = 0.05, crossHostFrac = 0.3,
      heavyHostFrac = 0.5, seed = 97L)
    val pages = SiteGraph.localPages(p)
    val seeds = (0 until 4).flatMap(h =>
      pages.find(r => r.status == 200 && r.url.startsWith(s"http://site$h.com")).map(_.url))
    def run(buckets: Int, enabled: Boolean) = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(fifoParity = false, sameDomainOnly = false, perHostBudget = 3,
        saltBuckets = 4, bloomEnabled = enabled, bloomBuckets = buckets,
        bloomMinFrontierRows = 0L,
        bloomExpectedItems = 100000L, bloomUpdateEvery = 1))
      .crawlSeeds(seeds.toDF("url"))
    val bucketed = run(8, enabled = true)
    val merged = run(0, enabled = true)
    val plain = run(0, enabled = false)
    assert(bucketed.sortedFound == merged.sortedFound)
    assert(bucketed.sortedFound == plain.sortedFound)
    assert(bucketed.stats == merged.stats)
    assert(bucketed.stats == plain.stats)
    // the bucketed run actually wrote a partitioned snapshot
    assert(Files.list(java.nio.file.Paths.get(bucketed.checkpointDir, "bloombuckets"))
      .count() > 0, "no bucket snapshot written")
  }

  test("bucket-mode crawl resumes exactly from checkpoint") {
    val p = SiteGraph.GraphParams(nHosts = 3, pagesPerHost = 25, linksPerPage = 4,
      redirectFrac = 0.05, errorFrac = 0.05, crossHostFrac = 0.25, seed = 53L)
    val pages = SiteGraph.localPages(p)
    val seeds = (0 until 3).flatMap(h =>
      pages.find(r => r.status == 200 && r.url.startsWith(s"http://site$h.com")).map(_.url))
    def cfg(dir: Option[String], rounds: Int) = CrawlConfig(fifoParity = false,
      sameDomainOnly = false, perHostBudget = 3, bloomEnabled = true, bloomBuckets = 4,
      bloomMinFrontierRows = 0L,
      bloomExpectedItems = 100000L, bloomUpdateEvery = 1, maxRounds = rounds,
      checkpointDir = dir)
    val full = new FrontierCrawler(spark, pages.toDS(), cfg(None, Int.MaxValue))
      .crawlSeeds(seeds.toDF("url"))
    val dir = Files.createTempDirectory("graft-bucketresume-").toString
    new FrontierCrawler(spark, pages.toDS(), cfg(Some(dir), 2)).crawlSeeds(seeds.toDF("url"))
    val resumed = new FrontierCrawler(spark, pages.toDS(), cfg(Some(dir), Int.MaxValue))
      .crawlSeeds(seeds.toDF("url"))
    assert(resumed.sortedFound == full.sortedFound)
    assert(resumed.stats == full.stats)
  }
}
