package graft.operators

import graft.functions.TestSpark
import graft.model.CrawlConfig
import graft.sources.SiteGraph
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** TTL / re-crawl expiry (`CheckpointStore.expireAndRequeue`): retiring
  * visited rounds re-queues their URLs and the resumed crawl re-fetches
  * EXACTLY those URLs — with the cuckoo seen-filter updated by in-place
  * key deletion (the capability Bloom lacks; there the snapshot pointer is
  * dropped and rebuilt instead). The reference has no re-crawl; this is the
  * operational story a production crawl needs (pages go stale) and the
  * reason `seenFilterKind = "cuckoo"` exists.
  */
class RecrawlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = SiteGraph.GraphParams(nHosts = 4, pagesPerHost = 40,
    linksPerPage = 4, redirectFrac = 0.05, errorFrac = 0.1, deadLinkFrac = 0.05,
    crossHostFrac = 0.3, heavyHostFrac = 0.5, seed = 31L)

  private def seedsOf(pages: Seq[graft.model.PageRow]) =
    (0 until params.nHosts).flatMap(h =>
      pages.find(r => r.status == 200 && r.url.startsWith(s"http://site$h.com")).map(_.url))

  private def politeCfg(dir: String, kind: String, buckets: Int) =
    CrawlConfig(fifoParity = false, sameDomainOnly = false, perHostBudget = 4,
      saltBuckets = 4, bloomEnabled = true, bloomBuckets = buckets,
      seenFilterKind = kind, bloomMinFrontierRows = 0L,
      bloomExpectedItems = 100000L, bloomUpdateEvery = 1,
      checkpointDir = Some(dir), maxRounds = 1000)

  private def crawlPolite(dir: String, kind: String, buckets: Int = 8) = {
    val pages = SiteGraph.localPages(params)
    new FrontierCrawler(spark, pages.toDS(), politeCfg(dir, kind, buckets))
      .crawlSeeds(seedsOf(pages).toDF("url"))
  }

  test("cuckoo expiry: in-place key deletion, resume re-fetches exactly the expired URLs") {
    val dir = Files.createTempDirectory("graft-recrawl-").toString
    val out1 = crawlPolite(dir, "cuckoo")
    val store = new CheckpointStore(spark, dir, visitedFromLog = true)
    val m1 = store.latestManifest().get
    assert(m1.seenKind == "cuckoo-buckets" && m1.seenBuckets == 8)
    val expireRounds = m1.visitedRounds.takeRight(2)
    val expired = store.readVisited(expireRounds).get
      .select("url", "urlHash").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val kept = store.readVisited(m1.visitedRounds.filterNot(expireRounds.contains)).get
      .select("urlHash").collect().map(_.getLong(0)).toSet
    assert(expired.nonEmpty && kept.nonEmpty)

    val m2 = store.expireAndRequeue(expireRounds)
    // snapshot kept: delete-in-place, no rebuild needed
    assert(m2.hasBloom && m2.bloomRound == m1.bloomRound)
    assert(m2.visitedRounds == m1.visitedRounds.filterNot(expireRounds.contains))
    // fresh probes: every kept key still present (no false negatives, the
    // invariant the eligibility split depends on); expired keys gone except
    // residual 16-bit fingerprint collisions with kept keys (false
    // positives — safe; bound them instead of demanding zero)
    val h = new graft.functions.CuckooBucketHandle(dir, m2.bloomRound, 8)
    kept.foreach(k => assert(h.probe(k), s"false negative on kept key $k"))
    val ghosts = expired.count(e => h.probe(e._2))
    assert(ghosts <= math.max(1, expired.size / 10),
      s"$ghosts of ${expired.size} expired keys still probe true")

    val out2 = crawlPolite(dir, "cuckoo")
    assert(out2.sortedFound == out1.sortedFound) // converges back to the same set
    val m3 = store.latestManifest().get
    val newRounds = (m3.visitedRounds.toSet -- m2.visitedRounds.toSet).toSeq
    assert(newRounds.nonEmpty, "resume visited nothing")
    val revisited = store.readVisited(newRounds).get
      .select("url").collect().map(_.getString(0)).toSet
    assert(revisited == expired.map(_._1), "resume did not re-fetch exactly the expired URLs")
  }

  test("interrupted expiry rerun restarts from the .pre originals; copies swept on commit") {
    val dir = Files.createTempDirectory("graft-recrawl-pre-").toString
    crawlPolite(dir, "cuckoo")
    val store = new CheckpointStore(spark, dir, visitedFromLog = true)
    val m1 = store.latestManifest().get
    val expireRounds = m1.visitedRounds.takeRight(1)
    val kept = store.readVisited(m1.visitedRounds.filterNot(expireRounds.contains)).get
      .select("urlHash").collect().map(_.getLong(0)).toSet
    val expired = store.readVisited(expireRounds).get
      .select("urlHash").collect().map(_.getLong(0)).toSet
    // simulate a crashed previous expiry on a bucket holding BOTH kept and
    // expired keys (so the rerun's delete pass touches it): the .pre copy
    // holds the ORIGINAL, the live file is wrecked (here: emptied — the
    // worst possible partial state). A rerun that read the live file would
    // lose every kept key in this bucket.
    def bucketOf(k: Long) = java.lang.Math.floorMod(k, 8L).toInt
    val b = (0 until 8).find(i =>
      kept.exists(bucketOf(_) == i) && expired.exists(bucketOf(_) == i)).get
    val bucketKept = kept.filter(bucketOf(_) == b)
    val pp = graft.functions.CuckooBucketStore.path(dir, m1.bloomRound, b)
    val sfs = store.sfs
    sfs.writeAtomic(pp + ".pre") { out =>
      val in = new java.io.BufferedInputStream(sfs.open(pp))
      try in.transferTo(out) finally in.close()
    }
    sfs.writeAtomic(pp) { out =>
      val bo = new java.io.BufferedOutputStream(out)
      new graft.functions.CuckooFilter(2).writeTo(bo); bo.flush()
    }
    graft.functions.CuckooBucketStore.invalidate(dir)

    val m2 = store.expireAndRequeue(expireRounds)
    val h = new graft.functions.CuckooBucketHandle(dir, m2.bloomRound, 8)
    bucketKept.foreach(k => assert(h.probe(k),
      s"kept key $k lost — rerun read the wrecked live bucket, not the .pre original"))
    // commit swept the copies
    val roundDir = s"$dir/cuckoobuckets/round=${m2.bloomRound}"
    assert(!sfs.listNames(roundDir).exists(_.endsWith(".pre")),
      "pre-delete copies not swept after the manifest committed")
  }

  test("crawl resume after an interrupted expiry rolls the buckets back first") {
    val dir = Files.createTempDirectory("graft-recrawl-resume-").toString
    val out1 = crawlPolite(dir, "cuckoo")
    val store = new CheckpointStore(spark, dir, visitedFromLog = true)
    val m1 = store.latestManifest().get
    val kept = store.readVisited(m1.visitedRounds).get
      .select("urlHash").collect().map(_.getLong(0)).toSet
    // wreck a populated bucket, leave its .pre original — the state an
    // expiry crash leaves; the manifest was never updated, so ALL rounds
    // are still visited and a resume must see every key
    val b = kept.map(k => java.lang.Math.floorMod(k, 8L).toInt).head
    val pp = graft.functions.CuckooBucketStore.path(dir, m1.bloomRound, b)
    val sfs = store.sfs
    sfs.writeAtomic(pp + ".pre") { out =>
      val in = new java.io.BufferedInputStream(sfs.open(pp))
      try in.transferTo(out) finally in.close()
    }
    sfs.writeAtomic(pp) { out =>
      val bo = new java.io.BufferedOutputStream(out)
      new graft.functions.CuckooFilter(2).writeTo(bo); bo.flush()
    }
    graft.functions.CuckooBucketStore.invalidate(dir)

    // plain resume (no expiry): rollback must restore the originals, so
    // the completed crawl re-fetches NOTHING and the found set is stable
    val out2 = crawlPolite(dir, "cuckoo")
    assert(out2.sortedFound == out1.sortedFound)
    val m2 = store.latestManifest().get
    val extra = (m2.visitedRounds.toSet -- m1.visitedRounds.toSet).toSeq
    val refetched = if (extra.isEmpty) 0L
      else store.readVisited(extra).map(_.count()).getOrElse(0L)
    assert(refetched == 0L, s"resume re-fetched $refetched visited URLs")
    val h = new graft.functions.CuckooBucketHandle(dir, m2.bloomRound, 8)
    kept.foreach(k => assert(h.probe(k), s"kept key $k lost on resume"))
    assert(!sfs.listNames(s"$dir/cuckoobuckets/round=${m1.bloomRound}")
      .exists(_.endsWith(".pre")), "rollback left the .pre copy behind")
  }

  test("committed expiry's copies are swept on resume, never rolled back") {
    // the crash window AFTER saveManifest(m2) but BEFORE the copy sweep:
    // the .pre-<token> copies of a COMMITTED expiry survive on disk. A
    // rollback would resurrect the committed deletes into the seen filter
    // forever (their visited rounds are gone from the manifest), so restore
    // must recognize the manifest's committed token and sweep instead.
    val dir = Files.createTempDirectory("graft-recrawl-committed-").toString
    crawlPolite(dir, "cuckoo")
    val store = new CheckpointStore(spark, dir, visitedFromLog = true)
    val m1 = store.latestManifest().get
    val expireRounds = m1.visitedRounds.takeRight(1)
    val expired = store.readVisited(expireRounds).get
      .select("urlHash").collect().map(_.getLong(0)).toSet
    // keep the pre-delete originals of every touched bucket
    def bucketOf(k: Long) = java.lang.Math.floorMod(k, 8L).toInt
    val sfs = store.sfs
    val originals = expired.map(bucketOf).map { b =>
      val pp = graft.functions.CuckooBucketStore.path(dir, m1.bloomRound, b)
      val in = new java.io.BufferedInputStream(sfs.open(pp))
      val bytes = try in.readAllBytes() finally in.close()
      (b, bytes)
    }

    val m2 = store.expireAndRequeue(expireRounds)
    assert(m2.expiryToken.nonEmpty, "committed expiry must record its run token")
    // re-create the crash window: put the committed run's .pre copies back
    originals.foreach { case (b, bytes) =>
      val pp = graft.functions.CuckooBucketStore.path(dir, m2.bloomRound, b)
      sfs.writeAtomic(pp + s".pre-${m2.expiryToken}")(_.write(bytes))
    }
    val ghostsBefore = {
      graft.functions.CuckooBucketStore.invalidate(dir)
      val h = new graft.functions.CuckooBucketHandle(dir, m2.bloomRound, 8)
      expired.count(h.probe)
    }
    store.restoreCuckooPreCopies(m2.bloomRound, m2.expiryToken)
    graft.functions.CuckooBucketStore.invalidate(dir)
    val h = new graft.functions.CuckooBucketHandle(dir, m2.bloomRound, 8)
    val ghostsAfter = expired.count(h.probe)
    assert(ghostsAfter == ghostsBefore,
      s"committed deletes rolled back: $ghostsBefore ghosts -> $ghostsAfter")
    val roundDir = s"$dir/cuckoobuckets/round=${m2.bloomRound}"
    assert(!sfs.listNames(roundDir).exists(_.contains(".bin.pre")),
      "committed-run copies not swept")
    // an UNCOMMITTED token still rolls back (the normal crash path)
    originals.headOption.foreach { case (b, bytes) =>
      val pp = graft.functions.CuckooBucketStore.path(dir, m2.bloomRound, b)
      sfs.writeAtomic(pp + ".pre-deadbeef00000000")(_.write(bytes))
      store.restoreCuckooPreCopies(m2.bloomRound, m2.expiryToken)
      graft.functions.CuckooBucketStore.invalidate(dir)
      val h2 = new graft.functions.CuckooBucketHandle(dir, m2.bloomRound, 8)
      val restored = expired.filter(k => bucketOf(k) == b).count(h2.probe)
      assert(restored > 0, "uncommitted copy was not restored")
    }
  }

  test("authority requeue: requeued rows take host rank priority, not depth") {
    val dir = Files.createTempDirectory("graft-recrawl-auth-").toString
    crawlPolite(dir, "cuckoo")
    val store = new CheckpointStore(spark, dir, visitedFromLog = true)
    val m1 = store.latestManifest().get
    val hp = Seq(("site0.com", 5), ("site1.com", 7)).toDF("host", "priority")
    val m2 = store.expireAndRequeue(m1.visitedRounds.takeRight(2), hostPriority = Some(hp))
    val seg = store.readSegsRaw(Seq(m2.liveSegs.last.seg))
      .select("host", "priority", "depth").collect()
    assert(seg.nonEmpty)
    seg.foreach { r =>
      val expect = r.getString(0) match {
        case "site0.com" => 5
        case "site1.com" => 7
        case _ => Int.MaxValue // authority unknown = schedule last
      }
      assert(r.getInt(1) == expect,
        s"host ${r.getString(0)}: priority ${r.getInt(1)} != $expect " +
          "(depth-scale priorities must never enter a rank-scale frontier)")
    }
  }

  test("recency requeue: fresher lastmod is re-fetched first within the same priority class") {
    val dir = Files.createTempDirectory("graft-recrawl-rec-").toString
    crawlPolite(dir, "cuckoo")
    val store = new CheckpointStore(spark, dir, visitedFromLog = true)
    val m1 = store.latestManifest().get
    val expireRounds = m1.visitedRounds.takeRight(2)
    val expired = store.readVisited(expireRounds).get
      .select("url").as[String].collect().sorted.toSeq
    val s0 = expired.filter(_.startsWith("http://site0.com")).sorted
    assert(s0.length >= 2, s"fixture drift: ${s0.length} site0 urls expired")
    // freshness CONTRADICTS the url tie-break: the lexicographically
    // LARGEST url claims the freshest lastmod — only the recency idx can
    // produce fresher-first order
    val base = java.time.Instant.parse("2026-01-01T00:00:00Z").getEpochSecond
    // the relation is deliberately UN-deduped: every url also carries a
    // staler duplicate row (a url listed by two sitemaps). The requeue
    // must collapse to one row per url (freshest wins) — an un-deduped
    // left join would MULTIPLY requeued frontier entries
    val rec = s0.zipWithIndex.flatMap { case (u, i) =>
      Seq((u, new java.sql.Timestamp((base + i * 86400L) * 1000L)),
        (u, new java.sql.Timestamp((base - 86400L) * 1000L)))
    }.toDF("url", "lastmod")
    // one shared authority class per host, so discoveryIdx (not priority)
    // decides intra-host order — the contract's "same authority scale"
    val hp = (0 until params.nHosts).map(h => (s"site$h.com", 1)).toDF("host", "priority")
    val m2 = store.expireAndRequeue(expireRounds, hostPriority = Some(hp),
      recency = Some(rec))

    // segment-level: lastmod rows sit in the recency band in freshness
    // order; unknown-recency rows (every other host) land after the band
    val segRows = store.readSegsRaw(Seq(m2.liveSegs.last.seg))
      .select("url", "discoveryIdx").as[(String, Long)].collect()
    // exactly one frontier row per expired url despite the duplicate
    // recency rows (the Map below would silently hide a multiplication)
    assert(segRows.length == expired.length,
      s"${segRows.length} requeued rows for ${expired.length} expired urls")
    val seg = segRows.toMap
    val segBase = (m2.round.toLong + 1) * CheckpointStore.IdxSpan
    val bandEnd = segBase + CheckpointStore.RecencyBand
    s0.foreach(u => assert(seg(u) >= segBase && seg(u) < bandEnd,
      s"$u idx ${seg(u)} outside the recency band"))
    val idxOrder = s0.sortBy(seg) // ascending idx = scheduled order
    assert(idxOrder == s0.reverse,
      s"recency band order $idxOrder != fresher-first ${s0.reverse}")
    (seg.keySet -- s0).foreach(u => assert(seg(u) >= bandEnd,
      s"unknown-recency $u idx ${seg(u)} inside the band"))

    // end-to-end: resume with budget 1 — site0 drains one URL per round,
    // so visited-round numbers are the fetch order; the freshest must come
    // back before every staler one
    val pages = SiteGraph.localPages(params)
    new FrontierCrawler(spark, pages.toDS(),
      politeCfg(dir, "cuckoo", 8).copy(perHostBudget = 1),
      hostPriority = Some(hp)).crawlSeeds(seedsOf(pages).toDF("url"))
    val m3 = store.latestManifest().get
    val newRounds = (m3.visitedRounds.toSet -- m2.visitedRounds.toSet).toSeq.sorted
    val roundOf = newRounds.flatMap { r =>
      store.readVisited(Seq(r)).get.select("url").as[String].collect()
        .filter(s0.contains).map(_ -> r)
    }.toMap
    assert(roundOf.keySet == s0.toSet, s"resume missed ${s0.toSet -- roundOf.keySet}")
    val fetchOrder = s0.sortBy(roundOf)
    assert(fetchOrder == s0.reverse,
      s"fetch order $fetchOrder != fresher-first ${s0.reverse}")
  }

  test("bloom expiry: pointer dropped (no delete), resume rebuilds and re-fetches exactly") {
    val dir = Files.createTempDirectory("graft-recrawl-bloom-").toString
    val out1 = crawlPolite(dir, "bloom")
    val store = new CheckpointStore(spark, dir, visitedFromLog = true)
    val m1 = store.latestManifest().get
    assert(m1.seenKind == "bloom-buckets" && m1.bloomRound >= 0)
    val expireRounds = Seq(m1.visitedRounds.last)
    val expired = store.readVisited(expireRounds).get
      .select("url").collect().map(_.getString(0)).toSet

    val m2 = store.expireAndRequeue(expireRounds)
    assert(!m2.hasBloom && m2.bloomRound == -1, "a Bloom snapshot cannot delete — pointer must drop")

    val out2 = crawlPolite(dir, "bloom")
    assert(out2.sortedFound == out1.sortedFound)
    val m3 = store.latestManifest().get
    assert(m3.bloomRound >= 0, "resume did not rebuild the filter snapshot")
    val newRounds = (m3.visitedRounds.toSet -- m2.visitedRounds.toSet).toSeq
    val revisited = store.readVisited(newRounds).get
      .select("url").collect().map(_.getString(0)).toSet
    assert(revisited == expired)
  }

  test("ExpireCli: flag parsing and end-to-end expiry") {
    import graft.ExpireCli
    val dir = Files.createTempDirectory("graft-recrawl-cli-").toString
    val out1 = crawlPolite(dir, "cuckoo")
    intercept[ExpireCli.CliUsageError](ExpireCli.run(spark, Array.empty))
    intercept[ExpireCli.CliUsageError](ExpireCli.run(spark, Array(dir)))
    intercept[ExpireCli.CliUsageError](
      ExpireCli.run(spark, Array(dir, "--rounds", "1", "--last", "1")))
    intercept[ExpireCli.CliUsageError](ExpireCli.run(spark, Array(dir, "--rounds", "x")))
    intercept[ExpireCli.CliUsageError](ExpireCli.run(spark, Array(dir, "--last")))
    intercept[ExpireCli.CliUsageError](ExpireCli.run(spark, Array(dir, "--bogus")))
    intercept[ExpireCli.CliUsageError](
      ExpireCli.run(spark, Array(dir, "--last", "1", "--fifo", "--recency", "/x")))

    val store = new CheckpointStore(spark, dir, visitedFromLog = true)
    val m1 = store.latestManifest().get
    val expected = Seq(m1.visitedRounds.last)
    // --recency routes through expireAndRequeue's recency join: expired
    // URLs with a lastmod land in the recency band of the requeue segment
    val recDir = Files.createTempDirectory("graft-recrawl-clirec-").toString + "/rec"
    val someExpired = store.readVisited(expected).get.select("url")
      .as[String].head(2).toSeq
    someExpired.map((_, new java.sql.Timestamp(1767225600000L)))
      .toDF("url", "lastmod").write.parquet(recDir)
    assert(ExpireCli.run(spark,
      Array(dir, "--last", "1", "--recency", recDir)) == expected)
    val m1b = store.latestManifest().get
    val segIdx = store.readSegsRaw(Seq(m1b.liveSegs.last.seg))
      .select("url", "discoveryIdx").as[(String, Long)].collect().toMap
    val segBase = (m1b.round.toLong + 1) * CheckpointStore.IdxSpan
    someExpired.foreach(u => assert(
      segIdx(u) >= segBase && segIdx(u) < segBase + CheckpointStore.RecencyBand,
      s"$u idx ${segIdx(u)} outside the recency band"))
    // and the re-crawl still re-fetches exactly (found set invariant below)
    val out1b = crawlPolite(dir, "cuckoo")
    assert(out1b.sortedFound == out1.sortedFound)
    val expected2 = Seq(store.latestManifest().get.visitedRounds.last)
    assert(ExpireCli.run(spark, Array(dir, "--last", "1")) == expected2)
    val out2 = crawlPolite(dir, "cuckoo")
    assert(out2.sortedFound == out1.sortedFound)
  }

  test("FIFO requeue: sequential idx block, resume re-fetches exactly") {
    val dir = Files.createTempDirectory("graft-recrawl-fifo-").toString
    val pages = SiteGraph.localPages(params)
    val cfg = CrawlConfig(fifoParity = true, sameDomainOnly = false,
      bloomEnabled = false, checkpointDir = Some(dir), maxRounds = 10000)
    val out1 = new FrontierCrawler(spark, pages.toDS(), cfg)
      .crawlSeeds(seedsOf(pages).toDF("url"))
    val store = new CheckpointStore(spark, dir) // FIFO: visitedFromLog = false
    val m1 = store.latestManifest().get
    val expireRounds = Seq(m1.visitedRounds.head)
    val expired = store.readVisited(expireRounds).get
      .select("url").collect().map(_.getString(0)).toSet

    val m2 = store.expireAndRequeue(expireRounds, fifoIdx = true)
    assert(m2.nextIdx > m1.nextIdx, "requeued segment must claim a fresh sequential idx block")
    val seg = m2.liveSegs.last
    assert(seg.minIdx == m1.nextIdx && seg.rows > 0)

    val out2 = new FrontierCrawler(spark, pages.toDS(), cfg)
      .crawlSeeds(seedsOf(pages).toDF("url"))
    assert(out2.sortedFound == out1.sortedFound)
    val m3 = store.latestManifest().get
    val newRounds = (m3.visitedRounds.toSet -- m2.visitedRounds.toSet).toSeq
    val revisited = store.readVisited(newRounds).get
      .select("url").collect().map(_.getString(0)).toSet
    assert(revisited == expired)
  }
}
