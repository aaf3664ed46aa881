package graft.operators

import graft.functions.TestSpark
import graft.model.{CrawlConfig, PageRow}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Latency-adaptive politeness (`CrawlConfig.latencyTargetMs`): a host whose
  * smoothed fetch latency exceeds the target is crawled more gently — its
  * per-round slot budget scales by target/ewma (floor 1) — without any
  * explicit Retry-After, while fast hosts keep their full budget. The
  * throttle only paces: the found set must be identical with the feature on
  * or off, and the EWMA relation lives in the checkpoint so a resume keeps
  * the learned pacing.
  */
class AdaptiveDelaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val Kids = 12

  private def site(host: String, latMs: Int): Seq[PageRow] = {
    val root = PageRow(s"http://$host/", 200, None,
      (1 to Kids).map(i => s"/p$i"), None, Some("text/html"), None, None,
      latencyMs = Some(latMs))
    val kids = (1 to Kids).map(i => PageRow(s"http://$host/p$i", 200, None,
      Nil, None, Some("text/html"), None, None, latencyMs = Some(latMs)))
    root +: kids
  }

  private def run(targetMs: Double, dir: String): graft.operators.CrawlOutcome = {
    val pages = site("fast.com", 50) ++ site("slow.com", 2000)
    new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(fifoParity = false, sameDomainOnly = false,
        perHostBudget = 4, bloomEnabled = false, maxRounds = 100,
        latencyTargetMs = targetMs, checkpointDir = Some(dir)))
      .crawlSeeds(Seq("http://fast.com/", "http://slow.com/").toDF("url"))
  }

  test("slow host is paced to fewer slots per round; found set unchanged") {
    val offDir = Files.createTempDirectory("graft-adapt-off-").toString
    val onDir = Files.createTempDirectory("graft-adapt-on-").toString
    val off = run(targetMs = 0.0, offDir)
    val on = run(targetMs = 500.0, onDir)

    // pacing only — the crawl still finds everything
    assert(on.sortedFound == off.sortedFound)
    assert(on.sortedFound.size == 2 * (Kids + 1))
    // budget 4 drains each host's 12 children in 3 rounds when off; with
    // the slow host clamped to max(1, 4 * 500/2000) = 1 slot it needs 12
    assert(off.stats.rounds <= 5, s"off took ${off.stats.rounds} rounds")
    assert(on.stats.rounds >= Kids,
      s"adaptive run finished in ${on.stats.rounds} rounds — no pacing happened")

    // the learned signal is relation-resident in the checkpoint: slow host's
    // EWMA sits at its observed latency, fast host under the target
    val store = new CheckpointStore(spark, onDir)
    val m = store.latestManifest().get
    assert(m.latencyStateRound >= 0, "latency state pointer never written")
    val lat = store.readLatencyState(m.latencyStateRound)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(lat("slow.com") > 500.0 && lat("slow.com") <= 2000.0, lat.toString)
    assert(lat("fast.com") < 500.0, lat.toString)
    // and the off-run wrote no latency state at all
    assert(new CheckpointStore(spark, offDir).latestManifest()
      .get.latencyStateRound == -1)
  }

  test("resume keeps the learned pacing: first post-resume round is already clamped") {
    val dir = Files.createTempDirectory("graft-adapt-resume-").toString
    val pages = site("fast.com", 50) ++ site("slow.com", 2000)
    def crawler(maxRounds: Int) = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(fifoParity = false, sameDomainOnly = false,
        perHostBudget = 4, bloomEnabled = false, maxRounds = maxRounds,
        latencyTargetMs = 500.0, checkpointDir = Some(dir)))
    crawler(2).crawlSeeds(Seq("http://fast.com/", "http://slow.com/").toDF("url"))
    val store = new CheckpointStore(spark, dir)
    val mid = store.latestManifest().get
    assert(mid.latencyStateRound >= 0, "no latency state before the interrupt")

    // resume: the continuation must keep pacing from the persisted EWMA —
    // with budget 4 vs clamped 1, the slow host needs many more rounds
    val resumed = crawler(100).crawlSeeds(
      Seq("http://fast.com/", "http://slow.com/").toDF("url"))
    assert(resumed.sortedFound.size == 2 * (Kids + 1))
    assert(resumed.stats.rounds >= Kids,
      s"resume lost the pacing state (${resumed.stats.rounds} rounds)")
  }
}
