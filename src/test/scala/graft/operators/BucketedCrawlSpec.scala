package graft.operators

import graft.functions.TestSpark
import graft.model.CrawlConfig
import graft.sources.SiteGraph
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed fetch closure: results identical to the unbucketed path, and
  * the closure scan is a bucketed file scan (so only the small batch side
  * of the per-round fetch join shuffles at scale — SCALE.md §2.3). */
class BucketedCrawlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed closure crawl equals unbucketed; scan is bucket-pruned") {
    val p = SiteGraph.GraphParams(nHosts = 2, pagesPerHost = 30, linksPerPage = 3,
      redirectFrac = 0.1, errorFrac = 0.05, crossHostFrac = 0.2, seed = 31L)
    val pages = SiteGraph.localPages(p)
    val seeds = Seq(SiteGraph.pageUrl(0, 0), SiteGraph.pageUrl(1, 0)).toDF("url")
    def run(buckets: Int) = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(fifoParity = false, sameDomainOnly = false, perHostBudget = 8,
        bloomEnabled = false, closureBuckets = buckets)).crawlSeeds(seeds)

    val plain = run(0)
    val bucketed = run(4)
    assert(bucketed.sortedFound == plain.sortedFound)
    assert(bucketed.stats == plain.stats)

    // the registered closure table resolves to a bucketed scan
    val tables = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_closure_"))
    assert(tables.nonEmpty, "closure table not registered")
    val scanPlan = spark.table(tables.last).queryExecution.sparkPlan.toString
    assert(scanPlan.contains("Bucketed: true"), s"not a bucketed scan:\n$scanPlan")
  }
}
