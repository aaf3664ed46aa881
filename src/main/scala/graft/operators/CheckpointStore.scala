package graft.operators

import graft.io.StateFs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.sketch.BloomFilter
import java.io.{BufferedInputStream, BufferedOutputStream}
import java.util.Properties
import scala.jdk.CollectionConverters._

/** Per-round crawl state on disk — the north rule's "checkpoints
  * per-partition frontier state (seen-filter snapshots, queue offsets,
  * lineage + fetch metrics) for exact resume" (BASELINE.json `north_rule`).
  *
  * Every byte goes through [[graft.io.StateFs]] (the Hadoop FileSystem API),
  * so `dir` may be a `file:`, `hdfs:`, `s3a:` or any registered-scheme URI —
  * the layout below works unchanged on the distributed storage a
  * 1000-executor deployment requires (executors do not share the driver's
  * local disk; see StateFs for the commit protocol).
  *
  * Layout under `dir`:
  *  - `visited/round=K/`   parquet delta: the URLs first visited in round K
  *    (globally disjoint across rounds → their union IS the visited set,
  *    no distinct needed on read)
  *  - `frontier/seg=K/`    parquet frontier segment appended in round K;
  *    FIFO consumption never rewrites segments — the manifest's `watermark`
  *    (max consumed discoveryIdx, i.e. the queue offset) plus each segment's
  *    [minIdx,maxIdx] range prune fully-consumed files without reading them
  *  - `sides/round=K/`     error/redirect side-output delta (tagged `kind`)
  *  - `visitlog/round=K/`  (round, batchIdx, url) crawl-ordering lineage
  *  - `bloom/round=K.bin`  serialized URL-seen Bloom filter snapshot
  *  - `hoststate/round=K/` parquet (host, notBefore) Retry-After backoff
  *    relation — a relation, not a driver map, so millions of backing-off
  *    hosts neither blow up driver memory nor inline into the plan
  *  - `manifest/round=K.properties` atomic commit record (written last;
  *    resume reads the highest round with a manifest — partially written
  *    rounds are invisible)
  */
/** Routes a pre-computed bucket id to that partition (key IS the partition). */
private[operators] final class IdentityPartitioner(n: Int) extends org.apache.spark.Partitioner {
  override def numPartitions: Int = n
  override def getPartition(key: Any): Int = key.asInstanceOf[Int]
}

object CheckpointStore {
  /** Per-round discoveryIdx block width in polite mode: round r's new links
    * get indexes in `[(r+1)*IdxSpan, (r+2)*IdxSpan)` (hash-based within the
    * block — no global window), so later rounds always sort after earlier
    * ones and a requeued segment can claim the next block. */
  val IdxSpan: Long = 1L << 40

  /** First slots of a requeue round's idx block reserved for
    * lastmod-known rows (epoch seconds fit until ~2514); the hash-spread
    * band for unknown-recency rows starts after it. See
    * `expireAndRequeue`'s `recency` parameter. */
  val RecencyBand: Long = 1L << 34

  final case class SegInfo(seg: Int, minIdx: Long, maxIdx: Long, rows: Long)

  final case class Manifest(
      round: Int,
      nextIdx: Long,
      watermark: Long,
      errorCount: Long,
      redirectCount: Long,
      scheduledTotal: Long,
      fetchedTotal: Long,
      visitedRounds: Seq[Int],
      liveSegs: Seq[SegInfo],
      hasBloom: Boolean,
      bloomRound: Int = -1,
      // round whose hoststate/ dir holds the current backoff relation
      hostStateRound: Int = -1,
      // which seen-filter representation the bloomRound snapshot was written
      // with ("bloom" | "bloom-buckets" | "cuckoo-buckets") — resuming under
      // a different kind must not trust the pointer (the other kind's bucket
      // files don't exist, and a missing bucket reads as "never visited")
      seenKind: String = "bloom",
      // bucket count the snapshot was written with (0 = single-broadcast or
      // legacy manifest). Key→bucket routing is floorMod(urlHash, n): probing
      // or deleting under a DIFFERENT n reads the wrong files, which turns
      // into false negatives — a resume or expiry must match this count or
      // distrust the snapshot and rebuild.
      seenBuckets: Int = 0,
      // run token of the last COMMITTED cuckoo expiry. Pre-delete copies are
      // named `bucket=B.bin.pre-<token>`; a resume or a new expiry rolls
      // back only copies whose token does NOT match this (an uncommitted
      // run), and sweeps the ones that do — without it, a crash in the
      // window between the expiry's manifest commit and its copy sweep
      // would roll a COMMITTED delete back, resurrecting expired keys into
      // the seen filter forever (their visited rounds are already gone from
      // the manifest, so nothing would ever delete them again).
      expiryToken: String = "",
      // round whose patstate/ dir holds the current (patternHash, admitted
      // count) relation of the crawl-trap guard (CrawlConfig.trapPatternCap);
      // -1 = guard never ran. Counts are LIFETIME admissions per pattern, so
      // expiry/requeue leaves them untouched by design.
      patternStateRound: Int = -1,
      // rounds holding content-digest deltas (mirror-page suppression,
      // CrawlConfig.contentDedup) — the read side anti-joins only the last
      // `contentDedupWindow` of these, so the per-round cost is bounded
      // regardless of crawl age. Suppression is a pure optimization (the
      // digest covers the page's RESOLVED link set, so a suppressed mirror
      // contributes nothing the kept copy didn't), so expiry ignores this.
      contentRounds: Seq[Int] = Nil,
      // round whose latstate/ dir holds the current (host, ewmaMs) smoothed
      // fetch-latency relation (CrawlConfig.latencyTargetMs); -1 = adaptive
      // politeness never ran. Same write-on-change protocol as hoststate.
      latencyStateRound: Int = -1)
}

final class CheckpointStore(spark: SparkSession, val dir: String,
    // polite mode schedules each URL at most once per round, so the round's
    // visit-log delta IS the visited delta — the store then serves visited
    // reads straight from the visit-log files (one write per round instead
    // of two); FIFO parity keeps the separate deduplicated visited write
    // because its batches may legally contain duplicate URLs
    val visitedFromLog: Boolean = false) {
  import CheckpointStore._
  import org.apache.spark.sql.types._

  val sfs: StateFs = StateFs(spark)
  private def p(parts: String*): String = sfs.child(dir, parts: _*)
  sfs.mkdirs(p("manifest"))

  // Explicit layout schemas: every state read skips driver-side parquet
  // footer inference — at one crawl round per few seconds, the per-read
  // schema job is a measurable serial cost that does not scale with cores.
  private val frontierSchema = StructType(Seq(
    StructField("url", StringType), StructField("urlHash", LongType),
    StructField("host", StringType), StructField("depth", IntegerType),
    StructField("priority", IntegerType), StructField("discoveryIdx", LongType),
    StructField("nextFetchTime", LongType)))
  private val visitLogSchema = StructType(Seq(
    StructField("round", IntegerType), StructField("batchIdx", LongType),
    StructField("url", StringType), StructField("urlHash", LongType),
    StructField("depth", IntegerType), StructField("discoveryIdx", LongType)))
  private val visitedSchema = StructType(Seq(
    StructField("url", StringType), StructField("urlHash", LongType)))
  private val sidesSchema = StructType(Seq(
    StructField("url", StringType), StructField("kind", StringType)))
  private val hostStateSchema = StructType(Seq(
    StructField("host", StringType), StructField("notBefore", IntegerType)))
  private val patternStateSchema = StructType(Seq(
    StructField("pat", LongType), StructField("cnt", LongType)))
  private val latencyStateSchema = StructType(Seq(
    StructField("host", StringType), StructField("ewmaMs", DoubleType)))
  private val contentSchema = StructType(Seq(StructField("__chash", LongType)))

  def visitedPath(round: Int): String =
    if (visitedFromLog) visitLogPath(round) else p("visited", s"round=$round")
  def segPath(seg: Int): String = p("frontier", s"seg=$seg")
  def sidesPath(round: Int): String = p("sides", s"round=$round")
  def visitLogPath(round: Int): String = p("visitlog", s"round=$round")
  def hostStatePath(round: Int): String = p("hoststate", s"round=$round")
  def patternStatePath(round: Int): String = p("patstate", s"round=$round")
  def latencyStatePath(round: Int): String = p("latstate", s"round=$round")

  def saveManifest(m: Manifest): Unit = {
    val props = new Properties()
    props.setProperty("round", m.round.toString)
    props.setProperty("nextIdx", m.nextIdx.toString)
    props.setProperty("watermark", m.watermark.toString)
    props.setProperty("errorCount", m.errorCount.toString)
    props.setProperty("redirectCount", m.redirectCount.toString)
    props.setProperty("scheduledTotal", m.scheduledTotal.toString)
    props.setProperty("fetchedTotal", m.fetchedTotal.toString)
    props.setProperty("visitedRounds", m.visitedRounds.mkString(","))
    props.setProperty("liveSegs",
      m.liveSegs.map(s => s"${s.seg}:${s.minIdx}:${s.maxIdx}:${s.rows}").mkString(","))
    props.setProperty("hasBloom", m.hasBloom.toString)
    props.setProperty("bloomRound", m.bloomRound.toString)
    props.setProperty("hostStateRound", m.hostStateRound.toString)
    props.setProperty("seenKind", m.seenKind)
    props.setProperty("seenBuckets", m.seenBuckets.toString)
    props.setProperty("expiryToken", m.expiryToken)
    props.setProperty("patternStateRound", m.patternStateRound.toString)
    props.setProperty("contentRounds", m.contentRounds.mkString(","))
    props.setProperty("latencyStateRound", m.latencyStateRound.toString)
    sfs.writeAtomic(p("manifest", s"round=${m.round}.properties")) { out =>
      props.store(out, null)
    }
  }

  def latestManifest(): Option[Manifest] = {
    val rounds = sfs.listNames(p("manifest"))
      .collect { case s if s.startsWith("round=") && s.endsWith(".properties") =>
        s.stripPrefix("round=").stripSuffix(".properties").toInt }
    if (rounds.isEmpty) None else Some(loadManifest(rounds.max))
  }

  def loadManifest(round: Int): Manifest = {
    val props = new Properties()
    val in = sfs.open(p("manifest", s"round=$round.properties"))
    try props.load(in) finally in.close()
    def seq(key: String): Seq[String] = {
      val v = props.getProperty(key, "")
      if (v.isEmpty) Nil else v.split(",").toSeq
    }
    val bloomRound = props.getProperty("bloomRound", "-1").toInt
    // legacy manifests (pre-seenKind) recorded neither the representation
    // nor the bucket count: infer BOTH from the snapshot dir that actually
    // exists — LAZILY, so modern manifests (which always carry the
    // properties) never pay the exists+list round trips (a LIST call per
    // manifest load on an object store). The count must come from the
    // files, never from the resuming config — probes route urlHash by
    // floorMod(h, count), so trusting a changed cfg.bloomBuckets would
    // read the wrong (or missing) bucket per key and false-negative
    // visited URLs back into the frontier. Count = max bucket index + 1,
    // NOT the file count: buckets that never received a key have no file
    // ("missing bucket = empty" is the store's layout contract).
    lazy val legacyBucketDir =
      if (bloomRound >= 0) Some(p("bloombuckets", s"round=$bloomRound")) else None
    lazy val seenKindDefault =
      if (legacyBucketDir.exists(sfs.exists)) "bloom-buckets" else "bloom"
    def seenBucketsDefault: Int =
      if (seenKindDefault == "bloom-buckets")
        legacyBucketDir.map(d => sfs.listNames(d)
          .collect { case n if n.startsWith("bucket=") && n.endsWith(".bin") =>
            n.stripPrefix("bucket=").stripSuffix(".bin").toInt }
          .foldLeft(-1)(math.max) + 1).getOrElse(0)
      else 0
    Manifest(
      props.getProperty("round").toInt,
      props.getProperty("nextIdx").toLong,
      props.getProperty("watermark").toLong,
      props.getProperty("errorCount").toLong,
      props.getProperty("redirectCount").toLong,
      props.getProperty("scheduledTotal").toLong,
      props.getProperty("fetchedTotal").toLong,
      seq("visitedRounds").map(_.toInt),
      seq("liveSegs").map { s =>
        val Array(a, b, c, d) = s.split(":")
        SegInfo(a.toInt, b.toLong, c.toLong, d.toLong)
      },
      props.getProperty("hasBloom").toBoolean,
      bloomRound,
      props.getProperty("hostStateRound", "-1").toInt,
      // Option + getOrElse (by-name), NOT getProperty's eager default arg:
      // the inference must only run when the property is absent
      Option(props.getProperty("seenKind")).getOrElse(seenKindDefault),
      Option(props.getProperty("seenBuckets")).map(_.toInt)
        .getOrElse(seenBucketsDefault),
      props.getProperty("expiryToken", ""),
      props.getProperty("patternStateRound", "-1").toInt,
      seq("contentRounds").map(_.toInt),
      props.getProperty("latencyStateRound", "-1").toInt)
  }

  /** The visited set: union of disjoint per-round deltas (no distinct).
    * Projected to (url, urlHash) — the visit-log-backed layout carries
    * extra lineage columns that visited readers must not see. */
  def readVisited(visitedRounds: Seq[Int]): Option[DataFrame] =
    if (visitedRounds.isEmpty) None
    else Some(spark.read
      .schema(if (visitedFromLog) visitLogSchema else visitedSchema)
      .parquet(visitedRounds.map(visitedPath): _*)
      .select("url", "urlHash"))

  /** One round's scheduled batch (the visit-log delta), schema pinned. */
  def readBatch(round: Int): DataFrame =
    spark.read.schema(visitLogSchema).parquet(visitLogPath(round))

  /** Raw frontier segments (no watermark filter), schema pinned. */
  def readSegsRaw(segs: Seq[Int]): DataFrame =
    spark.read.schema(frontierSchema).parquet(segs.map(segPath): _*)

  /** Live frontier: segment files pruned by the queue-offset watermark
    * (a fully consumed segment is never opened), residual consumed rows in
    * the boundary segment removed by a parquet-stat-prunable predicate. */
  def readFrontier(liveSegs: Seq[SegInfo], watermark: Long): Option[DataFrame] = {
    val live = liveSegs.filter(_.maxIdx > watermark)
    if (live.isEmpty) None
    else Some(readSegsRaw(live.map(_.seg))
      .filter(org.apache.spark.sql.functions.col("discoveryIdx") > watermark))
  }

  def readSides(rounds: Seq[Int]): Option[DataFrame] = {
    val existing = rounds.map(sidesPath).filter(sfs.exists)
    if (existing.isEmpty) None else Some(spark.read.schema(sidesSchema).parquet(existing: _*))
  }

  def readVisitLog(rounds: Seq[Int]): Option[DataFrame] = {
    val existing = rounds.map(visitLogPath).filter(sfs.exists)
    if (existing.isEmpty) None
    else Some(spark.read.schema(visitLogSchema).parquet(existing: _*))
  }

  def saveBloom(round: Int, bloom: BloomFilter): Unit =
    sfs.writeAtomic(p("bloom", s"round=$round.bin")) { out =>
      val b = new BufferedOutputStream(out)
      bloom.writeTo(b); b.flush()
    }

  def loadBloom(round: Int): BloomFilter = {
    val in = new BufferedInputStream(sfs.open(p("bloom", s"round=$round.bin")))
    try BloomFilter.readFrom(in) finally in.close()
  }

  /** Distributed build of the partitioned seen-filter snapshot (SCALE.md
    * §2.1): `deltas` (urlHash column) is identity-partitioned into `nBuckets`
    * by `pmod(urlHash, nBuckets)`; each task builds its bucket's delta
    * filter, merges the previous snapshot's bucket file (same create()
    * parameters each round, so bit layouts are merge-compatible), and
    * publishes `bloombuckets/round=K/bucket=B.bin` through StateFs's
    * attempt-unique atomic write — task retries / speculative attempts of
    * one bucket never interleave on a shared tmp file, and both attempts
    * write identical content so either rename winning is correct. The driver
    * never holds a filter — per-round driver cost is O(#buckets) task
    * scheduling, not O(rows).
    */
  def saveBloomBuckets(round: Int, prevRound: Int, deltas: DataFrame,
      nBuckets: Int, expectedPerBucket: Long, fpp: Double): Unit =
    saveSeenBuckets[BloomFilter](round, prevRound, deltas, nBuckets,
      () => BloomFilter.create(expectedPerBucket, fpp),
      (f, h) => f.putLong(h),
      (f, prev) => { f.mergeInPlace(prev); () },
      in => BloomFilter.readFrom(in),
      (f, out) => f.writeTo(out),
      graft.functions.BloomBucketStore.path)

  /** Distributed build of the partitioned CUCKOO seen-filter snapshot — the
    * `seenFilterKind = "cuckoo"` twin of [[saveBloomBuckets]]. Same layout
    * contract (`cuckoobuckets/round=K/bucket=B.bin`, missing bucket = empty);
    * the previous round's bucket is folded in via entry re-insertion
    * (cuckoo entries are relocatable (bucket, fingerprint) pairs, see
    * [[graft.functions.CuckooFilter.mergeInPlace]]). Overload pressure
    * degrades a bucket to `saturated` (probe-all-true) — correct, never a
    * false negative. Attempt-unique atomic publishes as in the Bloom build;
    * two attempts of one bucket may differ in byte layout (insertion order)
    * but represent the same key set, so either rename winning is correct.
    */
  def saveCuckooBuckets(round: Int, prevRound: Int, deltas: DataFrame,
      nBuckets: Int, expectedPerBucket: Long): Unit =
    saveSeenBuckets[graft.functions.CuckooFilter](round, prevRound, deltas, nBuckets,
      () => graft.functions.CuckooFilter.create(expectedPerBucket),
      (f, h) => f.putLong(h),
      (f, prev) => { f.mergeInPlace(prev); () },
      in => graft.functions.CuckooFilter.readFrom(in),
      (f, out) => f.writeTo(out),
      graft.functions.CuckooBucketStore.path)

  /** The shared build pipeline of both partitioned snapshot stores:
    * `deltas.urlHash` identity-partitioned into `nBuckets` by
    * `floorMod(urlHash, nBuckets)`; each task builds its bucket's delta
    * filter, folds in the previous snapshot's bucket file, and publishes
    * `<layout>/round=K/bucket=B.bin` through StateFs's attempt-unique
    * atomic write — task retries / speculative attempts of one bucket never
    * interleave on a shared tmp file, and both attempts represent the same
    * key set (Bloom attempts are byte-identical; cuckoo layouts may differ
    * with insertion order), so either rename winning is correct. */
  private def saveSeenBuckets[F](round: Int, prevRound: Int, deltas: DataFrame,
      nBuckets: Int, create: () => F, put: (F, Long) => Unit,
      merge: (F, F) => Unit, readFrom: java.io.InputStream => F,
      writeTo: (F, java.io.OutputStream) => Unit,
      path: (String, Int, Int) => String): Unit = {
    val dirStr = dir
    val fsRef = sfs // serializable; do not capture `this` in the task closure
    deltas.select("urlHash").rdd
      .map(r => (Math.floorMod(r.getLong(0), nBuckets.toLong).toInt, r.getLong(0)))
      .partitionBy(new IdentityPartitioner(nBuckets))
      .mapPartitionsWithIndex { (bucket, it) =>
        val f = create()
        var n = 0L
        it.foreach { kv => put(f, kv._2); n += 1 }
        val prevPath = path(dirStr, prevRound, bucket)
        val hasPrev = prevRound >= 0 && fsRef.exists(prevPath)
        if (hasPrev) {
          val in = new BufferedInputStream(fsRef.open(prevPath))
          try merge(f, readFrom(in)) finally in.close()
        }
        if (n > 0 || hasPrev) {
          fsRef.writeAtomic(path(dirStr, round, bucket)) { out =>
            val b = new BufferedOutputStream(out)
            writeTo(f, b); b.flush()
          }
        }
        Iterator.single(n)
      }.count()
  }

  /** TTL / re-crawl expiry: retire whole visited ROUNDS from the seen set
    * and (by default) re-queue their URLs for a fresh fetch — the operation
    * the cuckoo seen-filter representation exists for. Offline op: run it
    * between crawl sessions on the same checkpoint dir, then resume with a
    * higher `maxRounds`; the resumed crawl re-fetches exactly the expired
    * URLs (they are gone from the visited relation AND from the filter, and
    * live again in the frontier).
    *
    * Seen-filter handling is where the two representations diverge:
    *   - `cuckoo-buckets`: the expired keys are DELETED from the snapshot in
    *     place (per-bucket read → delete → atomic replace; cost ∝ expired
    *     keys). Safe because every expired key in a folded round was
    *     inserted, and cuckoo tables hold duplicate fingerprints as separate
    *     copies — deleting one copy never erases another key's membership.
    *     A task/executor that cached the pre-delete bucket serves false
    *     POSITIVES only (routed through the visited anti-join, where the
    *     expired rows no longer exist) — never a false negative; the
    *     driver-side cache is invalidated eagerly, remote caches roll over
    *     at the next snapshot round.
    *   - `bloom` / `bloom-buckets`: a Bloom filter cannot delete. The
    *     snapshot pointer is dropped and the next crawl round rebuilds the
    *     filter from ALL remaining visited deltas (cost ∝ the whole
    *     remaining seen set — the asymmetry is the point of offering the
    *     cuckoo store). Until that rebuild the crawl runs the plain
    *     anti-join: exact, merely unprefiltered.
    *
    * Requeued rows land in a fresh frontier segment under a synthetic round
    * (`m.round + 1`, so the segment number and polite-mode discoveryIdx
    * block can never collide with a future crawl round's); depth is
    * preserved from the visit log, `nextFetchTime = 0`. The requeue
    * PRIORITY follows the same scale rule as the crawler's admission path
    * ([[FrontierCrawler]]'s `hostPriority` contract): pass the SAME
    * authority relation the resumed crawl will run with and each requeued
    * row takes its host's rank priority (absent host → Int.MaxValue);
    * without one, `priority = depth`. Never mix the two — depth values
    * (1..diameter) are tiny on the rank scale (1..N hosts), so
    * depth-priority requeued rows would outrank nearly every
    * authority-ranked host and capture the whole `roundBudget` ration.
    * Totals in the manifest stay cumulative across expiry epochs.
    *
    * Construct this store with `visitedFromLog` matching the crawl that
    * wrote the checkpoint (`!cfg.fifoParity`) — the visited-delta layout
    * differs between the two modes and the delete pass must read the
    * deduplicated per-round key set.
    *
    * `requeue = false` removes the rounds from the seen set without
    * queueing an explicit re-fetch segment — but it does NOT guarantee the
    * URLs are forgotten: in polite mode their original frontier rows may
    * still be live (the watermark never moves; only compaction removes
    * consumed rows), and once no longer filtered by the visited anti-join
    * they re-schedule anyway. Use the default for deterministic re-crawl
    * semantics; `requeue = false` only for measuring the filter update.
    *
    * `recency` — optional `(url, lastmod:timestamp)` relation (e.g.
    * [[graft.sources.Sitemaps]]'s `recencyRelation` over sitemap
    * `<lastmod>` claims; urls must be in the crawl's normalized space):
    * requeued rows with a known lastmod take a discoveryIdx that DECREASES
    * with freshness, ahead of the hash-spread block for unknown-recency
    * rows — so within the same priority class (the scheduler orders by
    * (priority, nextFetchTime, discoveryIdx, url)) fresher URLs re-fetch
    * first, WITHOUT touching the authority scale the contract above pins.
    * One broadcast-sized left join; no window, no extra shuffle beyond the
    * join. Polite (hash-idx) mode only — fifoIdx assigns arrival order by
    * construction. */
  def expireAndRequeue(rounds: Seq[Int], requeue: Boolean = true,
      fifoIdx: Boolean = false,
      hostPriority: Option[DataFrame] = None,
      recency: Option[DataFrame] = None): CheckpointStore.Manifest = {
    import org.apache.spark.sql.functions._
    require(recency.isEmpty || !fifoIdx,
      "recency-prioritized requeue requires the hash-idx (polite) mode")
    val m = latestManifest().getOrElse(
      throw new IllegalStateException(s"no checkpoint manifest under $dir"))
    val expireSet = rounds.toSet
    require(rounds.nonEmpty && expireSet.subsetOf(m.visitedRounds.toSet),
      s"expire rounds $rounds must be visited rounds ${m.visitedRounds}")

    // cuckoo snapshots support delete; anything else must drop the pointer.
    // The bucket count comes from the manifest, never a caller: deleting
    // under a different floorMod routing would remove kept keys' colliding
    // fingerprints from the wrong files (false negatives).
    val canDelete =
      m.seenKind == "cuckoo-buckets" && m.seenBuckets > 0 && m.bloomRound >= 0
    val folded = rounds.filter(_ <= m.bloomRound)
    // fresh run token: this run's pre-delete copies carry it, and only the
    // manifest commit below promotes it to "committed" — see Manifest.expiryToken
    val runToken = java.util.UUID.randomUUID().toString.replace("-", "").take(16)
    if (canDelete && folded.nonEmpty) {
      // roll back any UNCOMMITTED prior expiry first (and sweep leftovers of
      // the COMMITTED one, identified by m.expiryToken) — this run's copies
      // are then the only ones in the dir, so the post-commit sweep is safe
      restoreCuckooPreCopies(m.bloomRound, m.expiryToken)
      deleteCuckooKeys(m.bloomRound, readVisited(folded).get, m.seenBuckets, runToken)
      graft.functions.CuckooBucketStore.invalidate(dir)
    }
    val keepSnapshot = canDelete || m.bloomRound < 0

    val (newRound, newNextIdx, newSegs) =
      if (!requeue) (m.round, m.nextIdx, m.liveSegs)
      else {
        val src = readVisitLog(rounds)
          .map(_.select(col("url"), col("urlHash"), col("depth")))
          .orElse(readVisited(rounds).map(_.withColumn("depth", lit(0))))
          .getOrElse(throw new IllegalStateException(
            s"no visit log or visited delta for rounds $rounds under $dir"))
        val r = m.round + 1
        val seg = r + 1
        val hosted = src
          .withColumn("host", graft.functions.UrlFunctions.url_host(col("url")))
        // requeue priority on the SAME scale the resumed crawl schedules on:
        // authority rank when the caller crawls with an authority table
        // (absent host → Int.MaxValue, matching the admission path), BFS
        // depth otherwise — never depth mixed into a rank-scale frontier
        val prioed = hostPriority match {
          case None => hosted.withColumn("__prio", col("depth").cast("int"))
          case Some(hp) =>
            hosted.join(
                hp.select(hp("host"), hp("priority").as("__hostPrio")),
                Seq("host"), "left_outer")
              .withColumn("__prio",
                coalesce(col("__hostPrio"), lit(Int.MaxValue)).cast("int"))
        }
        // recency-aware idx (polite mode): the synthetic round's idx block
        // [(r+1)·IdxSpan, (r+2)·IdxSpan) splits into a LASTMOD band (first
        // RecencyBand slots — idx = band_end − clamped epoch seconds, so
        // fresher ⇒ smaller ⇒ scheduled earlier) followed by the
        // hash-spread band for unknown-recency rows. Epoch seconds fit the
        // 2^34 band until ~year 2514; clamping keeps adversarial lastmod
        // claims inside the band instead of colliding into other rounds'.
        val recencied = recency match {
          case None => prioed
          case Some(rel) =>
            // defensively collapse the caller-supplied relation to one row
            // per url (freshest lastmod wins): a left join against an
            // un-deduped relation would MULTIPLY requeued frontier rows,
            // and ExpireCli --recency accepts arbitrary parquet
            val one = rel.select(rel("url"), rel("lastmod").as("__lm"))
              .groupBy(col("url")).agg(max(col("__lm")).as("__lm"))
            prioed.join(one, Seq("url"), "left_outer")
        }
        val band = CheckpointStore.RecencyBand
        val idxCol =
          if (fifoIdx)
            lit(m.nextIdx) +
              row_number().over(org.apache.spark.sql.expressions.Window
                .orderBy(col("url"))).cast("long") - 1
          else if (recency.isEmpty)
            lit((r.toLong + 1) * CheckpointStore.IdxSpan) +
              pmod(xxhash64(col("url")), lit(CheckpointStore.IdxSpan))
          else {
            val epoch = greatest(lit(0L),
              least(col("__lm").cast("long"), lit(band - 1)))
            when(col("__lm").isNotNull,
              lit((r.toLong + 1) * CheckpointStore.IdxSpan) + (lit(band - 1) - epoch))
              .otherwise(
                lit((r.toLong + 1) * CheckpointStore.IdxSpan + band) +
                  pmod(xxhash64(col("url")),
                    lit(CheckpointStore.IdxSpan - band)))
          }
        val entries = recencied
          .withColumn("discoveryIdx", idxCol)
          .select(col("url"), col("urlHash"), col("host"), col("depth"),
            col("__prio").as("priority"), col("discoveryIdx"),
            lit(0L).as("nextFetchTime"))
        val obs = org.apache.spark.sql.Observation()
        entries.observe(obs, count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(segPath(seg))
        val n = obs.get("n").asInstanceOf[Long]
        val (mn, mx) =
          if (fifoIdx) (m.nextIdx, m.nextIdx + n - 1)
          else ((r.toLong + 1) * CheckpointStore.IdxSpan,
            (r.toLong + 2) * CheckpointStore.IdxSpan - 1)
        val nx = if (fifoIdx) m.nextIdx + n else (r.toLong + 2) * CheckpointStore.IdxSpan
        (r, nx, m.liveSegs :+ CheckpointStore.SegInfo(seg, mn, mx, n))
      }

    val m2 = m.copy(round = newRound, nextIdx = newNextIdx,
      visitedRounds = m.visitedRounds.filterNot(expireSet),
      liveSegs = newSegs,
      hasBloom = m.hasBloom && keepSnapshot,
      bloomRound = if (keepSnapshot) m.bloomRound else -1,
      // committing the manifest is what flips this run's deletes from
      // "roll back on sight" to "committed — sweep, never restore"
      expiryToken =
        if (canDelete && folded.nonEmpty) runToken else m.expiryToken)
    saveManifest(m2)
    // only now is the expiry durable — sweep the pre-delete copies that a
    // rerun would otherwise (correctly) restart from
    if (canDelete && folded.nonEmpty) cleanupCuckooPreCopies(m.bloomRound)
    m2
  }

  /** Distributed delete of `keys` from the round-`snapRound` cuckoo
    * snapshot, one task per touched bucket — in TWO passes over an
    * immutable copy so it is idempotent under task retry, speculation, AND
    * a crashed-and-rerun expiry:
    *
    *  1. copy pass: each touched bucket's CURRENT file is copied aside to
    *     `bucket=B.bin.pre-<runToken>` unless that copy already exists (an
    *     earlier attempt of the same pass — the token is fixed per expiry
    *     run, so retries share it). The caller rolls back any INTERRUPTED
    *     prior expiry via [[restoreCuckooPreCopies]] before this runs, so
    *     no stale copy can exist; within the pass the source is
    *     unmodified, so concurrent attempts copy identical bytes.
    *  2. delete pass: every attempt reads the `.pre` copy — never the
    *     possibly-already-published target — deletes the keys, and
    *     publishes via attempt-unique atomic replace. All attempts compute
    *     the same post-delete key SET from the same input, so a repeated
    *     delete can never strip a kept key's colliding (bucket,
    *     fingerprint) entry (the false-negative hazard of re-deleting from
    *     an already-updated file).
    *
    * The `.pre` copies are swept by the caller only AFTER the expiry
    * manifest commits; until then a rerun — or a plain crawl resume —
    * first ROLLS BACK to the originals via [[restoreCuckooPreCopies]].
    * Copy cost ∝ touched buckets ∝ expired keys — the economy that makes
    * cuckoo expiry cheaper than a Bloom rebuild is preserved. */
  private def deleteCuckooKeys(snapRound: Int, keys: DataFrame, nBuckets: Int,
      runToken: String): Unit = {
    val dirStr = dir
    val fsRef = sfs // serializable; do not capture `this` in the task closure
    val preSuffix = s".pre-$runToken"
    val bucketed = keys.select("urlHash").rdd
      .map(r => (Math.floorMod(r.getLong(0), nBuckets.toLong).toInt, r.getLong(0)))
      .partitionBy(new IdentityPartitioner(nBuckets))
    bucketed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1 (job barrier before pass 2): immutable copies aside
      bucketed.mapPartitionsWithIndex { (bucket, it) =>
        if (it.hasNext) {
          val pp = graft.functions.CuckooBucketStore.path(dirStr, snapRound, bucket)
          val pre = pp + preSuffix
          if (fsRef.exists(pp) && !fsRef.exists(pre))
            fsRef.writeAtomic(pre) { out =>
              val in = new BufferedInputStream(fsRef.open(pp))
              try in.transferTo(out) finally in.close()
            }
        }
        Iterator.single(0L)
      }.count()
      // pass 2: read the copy, delete, publish
      bucketed.mapPartitionsWithIndex { (bucket, it) =>
        if (!it.hasNext) Iterator.single(0L)
        else {
          val pp = graft.functions.CuckooBucketStore.path(dirStr, snapRound, bucket)
          val pre = pp + preSuffix
          if (!fsRef.exists(pre)) Iterator.single(0L)
          else {
            val in = new BufferedInputStream(fsRef.open(pre))
            val f = try graft.functions.CuckooFilter.readFrom(in) finally in.close()
            var nDel = 0L
            it.foreach { kv => if (f.delete(kv._2)) nDel += 1 }
            if (nDel > 0) fsRef.writeAtomic(pp) { out =>
              val b = new BufferedOutputStream(out)
              f.writeTo(b); b.flush()
            }
            Iterator.single(nDel)
          }
        }
      }.count()
    } finally bucketed.unpersist(blocking = false)
  }

  /** The snapshot round dir, derived from the SAME path builder the delete
    * pass writes through — copy, restore, and sweep can never diverge from
    * the bucket layout. */
  private def cuckooRoundDir(snapRound: Int): String = {
    val p0 = graft.functions.CuckooBucketStore.path(dir, snapRound, 0)
    p0.substring(0, p0.lastIndexOf('/'))
  }

  /** Roll back an INTERRUPTED expiry: a leftover `bucket=B.bin.pre-<token>`
    * whose token does NOT match the manifest's committed `expiryToken` is
    * the pre-delete original of a run whose manifest never committed, so
    * the original is restored over the (possibly partially-deleted) live
    * file and the copy removed. A copy whose token DOES match belongs to
    * the committed run (crash between its manifest commit and its sweep) —
    * restoring it would resurrect committed deletes forever, so it is
    * swept instead. Legacy bare `.pre` copies (pre-token protocol) are
    * always restored. Must run before a new expiry starts (so a committed
    * run can safely sweep ALL copies afterwards) and on crawl resume (so a
    * crawl never merges a wrecked bucket into future snapshots).
    * Idempotent; no-op when no copies exist. */
  private[operators] def restoreCuckooPreCopies(snapRound: Int,
      committedToken: String): Unit = {
    val roundDir = cuckooRoundDir(snapRound)
    if (sfs.exists(roundDir)) {
      val pres = sfs.listNames(roundDir).filter(_.contains(".bin.pre"))
      var restored = false
      pres.foreach { n =>
        val pre = sfs.child(roundDir, n)
        val committed = committedToken.nonEmpty &&
          n.endsWith(s".pre-$committedToken")
        if (committed) sfs.delete(pre) // late sweep of a committed run
        else {
          val target = n.substring(0, n.lastIndexOf(".pre"))
          sfs.writeAtomic(sfs.child(roundDir, target)) { out =>
            val in = new BufferedInputStream(sfs.open(pre))
            try in.transferTo(out) finally in.close()
          }
          sfs.delete(pre)
          restored = true
        }
      }
      if (restored) graft.functions.CuckooBucketStore.invalidate(dir)
    }
  }

  /** Sweep the `.pre` copies left by [[deleteCuckooKeys]] — called only
    * after the expiry manifest has committed, and only safe because
    * [[restoreCuckooPreCopies]] ran before this expiry started (every
    * remaining copy belongs to THIS committed run). */
  private def cleanupCuckooPreCopies(snapRound: Int): Unit = {
    val roundDir = cuckooRoundDir(snapRound)
    if (sfs.exists(roundDir))
      sfs.listNames(roundDir).filter(_.contains(".bin.pre"))
        .foreach(n => sfs.delete(sfs.child(roundDir, n)))
  }

  /** Round-local fetch metrics (lineage + fetch metrics per north rule). */
  def saveMetrics(round: Int, kv: Map[String, Long]): Unit = {
    val props = new Properties()
    kv.foreach { case (k, v) => props.setProperty(k, v.toString) }
    sfs.writeAtomic(p("metrics", s"round=$round.properties"))(out => props.store(out, null))
  }

  def loadMetrics(round: Int): Map[String, Long] = {
    val props = new Properties()
    val in = sfs.open(p("metrics", s"round=$round.properties"))
    try props.load(in) finally in.close()
    props.stringPropertyNames().asScala.map(k => k -> props.getProperty(k).toLong).toMap
  }

  /** Retry-After backoff state as a relation `(host, notBefore)` — written
    * only on rounds where it changes; the manifest's `hostStateRound` points
    * at the latest version. */
  def saveHostState(round: Int, state: DataFrame): Unit =
    state.write.mode("overwrite").parquet(hostStatePath(round))

  def readHostState(round: Int): DataFrame =
    spark.read.schema(hostStateSchema).parquet(hostStatePath(round))

  /** Crawl-trap guard state: one (pattern-key hash, lifetime admitted count)
    * row per URL pattern ever admitted. Written on rounds that admit links
    * while the guard is on; the manifest's `patternStateRound` points at the
    * current relation (same write-on-change protocol as hoststate). Bounded
    * by construction — the pattern key collapses exactly the unbounded URL
    * parts, so this relation grows with DISTINCT shapes, not URLs. */
  def savePatternState(round: Int, state: DataFrame): Unit =
    state.write.mode("overwrite").parquet(patternStatePath(round))

  def readPatternState(round: Int): DataFrame =
    spark.read.schema(patternStateSchema).parquet(patternStatePath(round))

  /** Latency-adaptive politeness state: one (host, ewmaMs) row per host with
    * observed fetch latency — the smoothed signal the polite scheduler's
    * budget clamp reads (CrawlConfig.latencyTargetMs). Written on rounds
    * that observed any latency; the manifest's `latencyStateRound` points at
    * the current relation (hoststate protocol). */
  def saveLatencyState(round: Int, state: DataFrame): Unit =
    state.write.mode("overwrite").parquet(latencyStatePath(round))

  def readLatencyState(round: Int): DataFrame =
    spark.read.schema(latencyStateSchema).parquet(latencyStatePath(round))

  /** Content-digest deltas (mirror-page suppression): one 64-bit digest per
    * page whose resolved link set was first seen that round. Per-round
    * deltas like visited/; the crawler anti-joins only a bounded recent
    * window of them (mirrors co-occur temporally, and a missed distant
    * mirror costs wasted extraction work, never correctness). */
  def contentPath(round: Int): String = p("contentseen", s"round=$round")

  def readContentDigests(rounds: Seq[Int]): Option[DataFrame] =
    if (rounds.isEmpty) None
    else Some(spark.read.schema(contentSchema)
      .parquet(rounds.map(contentPath): _*))

  /** Pre-round-3 checkpoints stored backoff as a `round=K.properties` file
    * and no manifest pointer; read it (if present) so resume migrates the
    * state instead of silently dropping every host's Retry-After window. */
  def loadLegacyHostState(round: Int): Option[Map[String, Int]] = {
    val path = p("hoststate", s"round=$round.properties")
    if (!sfs.exists(path)) None
    else {
      val props = new Properties()
      val in = sfs.open(path)
      try props.load(in) finally in.close()
      Some(props.stringPropertyNames().asScala
        .map(k => k -> props.getProperty(k).toInt).toMap)
    }
  }
}
