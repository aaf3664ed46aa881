package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.sketch.BloomFilter
import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Properties
import scala.jdk.CollectionConverters._

/** Per-round crawl state on disk — the north rule's "checkpoints
  * per-partition frontier state (seen-filter snapshots, queue offsets,
  * lineage + fetch metrics) for exact resume" (BASELINE.json `north_rule`).
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
      bloomRound: Int = -1)
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

  private def p(parts: String*): Path = Paths.get(dir, parts: _*)
  Files.createDirectories(p("manifest"))

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

  def visitedPath(round: Int): String =
    if (visitedFromLog) visitLogPath(round) else p("visited", s"round=$round").toString
  def segPath(seg: Int): String = p("frontier", s"seg=$seg").toString
  def sidesPath(round: Int): String = p("sides", s"round=$round").toString
  def visitLogPath(round: Int): String = p("visitlog", s"round=$round").toString

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
    val tmp = p("manifest", s".round=${m.round}.tmp")
    val out = Files.newOutputStream(tmp)
    try props.store(out, null) finally out.close()
    Files.move(tmp, p("manifest", s"round=${m.round}.properties"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def latestManifest(): Option[Manifest] = {
    val mdir = p("manifest").toFile
    val rounds = Option(mdir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).collect { case s if s.startsWith("round=") && s.endsWith(".properties") =>
        s.stripPrefix("round=").stripSuffix(".properties").toInt }
    if (rounds.isEmpty) None else Some(loadManifest(rounds.max))
  }

  def loadManifest(round: Int): Manifest = {
    val props = new Properties()
    val in = Files.newInputStream(p("manifest", s"round=$round.properties"))
    try props.load(in) finally in.close()
    def seq(key: String): Seq[String] = {
      val v = props.getProperty(key, "")
      if (v.isEmpty) Nil else v.split(",").toSeq
    }
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
      props.getProperty("bloomRound", "-1").toInt)
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
    val existing = rounds.map(sidesPath).filter(pp => Files.exists(Paths.get(pp)))
    if (existing.isEmpty) None else Some(spark.read.schema(sidesSchema).parquet(existing: _*))
  }

  def readVisitLog(rounds: Seq[Int]): Option[DataFrame] = {
    val existing = rounds.map(visitLogPath).filter(pp => Files.exists(Paths.get(pp)))
    if (existing.isEmpty) None
    else Some(spark.read.schema(visitLogSchema).parquet(existing: _*))
  }

  def saveBloom(round: Int, bloom: BloomFilter): Unit = {
    Files.createDirectories(p("bloom"))
    val tmp = p("bloom", s".round=$round.tmp")
    val out = new BufferedOutputStream(new FileOutputStream(tmp.toFile))
    try bloom.writeTo(out) finally out.close()
    Files.move(tmp, p("bloom", s"round=$round.bin"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def loadBloom(round: Int): BloomFilter = {
    val in = new BufferedInputStream(new FileInputStream(p("bloom", s"round=$round.bin").toFile))
    try BloomFilter.readFrom(in) finally in.close()
  }

  /** Distributed build of the partitioned seen-filter snapshot (SCALE.md
    * §2.1): `deltas` (urlHash column) is identity-partitioned into `nBuckets`
    * by `pmod(urlHash, nBuckets)`; each task builds its bucket's delta
    * filter, merges the previous snapshot's bucket file (same create()
    * parameters each round, so bit layouts are merge-compatible), and writes
    * `bloombuckets/round=K/bucket=B.bin` with an atomic rename. The driver
    * never holds a filter — per-round driver cost is O(#buckets) task
    * scheduling, not O(rows).
    */
  def saveBloomBuckets(round: Int, prevRound: Int, deltas: DataFrame,
      nBuckets: Int, expectedPerBucket: Long, fpp: Double): Unit = {
    Files.createDirectories(p("bloombuckets", s"round=$round"))
    val dirStr = dir
    deltas.select("urlHash").rdd
      .map(r => (Math.floorMod(r.getLong(0), nBuckets.toLong).toInt, r.getLong(0)))
      .partitionBy(new IdentityPartitioner(nBuckets))
      .mapPartitionsWithIndex { (bucket, it) =>
        val f = BloomFilter.create(expectedPerBucket, fpp)
        var n = 0L
        it.foreach { kv => f.putLong(kv._2); n += 1 }
        val prevPath = graft.functions.BloomBucketStore.path(dirStr, prevRound, bucket)
        val hasPrev = prevRound >= 0 && Files.exists(prevPath)
        if (hasPrev) {
          val in = new BufferedInputStream(new FileInputStream(prevPath.toFile))
          try f.mergeInPlace(BloomFilter.readFrom(in)) finally in.close()
        }
        if (n > 0 || hasPrev) {
          val outP = graft.functions.BloomBucketStore.path(dirStr, round, bucket)
          val tmp = outP.resolveSibling(s".bucket=$bucket.tmp")
          val out = new BufferedOutputStream(new FileOutputStream(tmp.toFile))
          try f.writeTo(out) finally out.close()
          Files.move(tmp, outP,
            StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        }
        Iterator.single(n)
      }.count()
  }

  /** Round-local fetch metrics (lineage + fetch metrics per north rule). */
  def saveMetrics(round: Int, kv: Map[String, Long]): Unit = {
    Files.createDirectories(p("metrics"))
    val props = new Properties()
    kv.foreach { case (k, v) => props.setProperty(k, v.toString) }
    val out = Files.newOutputStream(p("metrics", s"round=$round.properties"))
    try props.store(out, null) finally out.close()
  }

  /** Retry-After host backoff state (host → first eligible round). */
  def saveHostState(round: Int, state: Map[String, Int]): Unit = {
    Files.createDirectories(p("hoststate"))
    val props = new Properties()
    state.foreach { case (h, nb) => props.setProperty(h, nb.toString) }
    val out = Files.newOutputStream(p("hoststate", s"round=$round.properties"))
    try props.store(out, null) finally out.close()
  }

  def loadHostState(round: Int): Map[String, Int] = {
    val path = p("hoststate", s"round=$round.properties")
    if (!Files.exists(path)) return Map.empty
    val props = new Properties()
    val in = Files.newInputStream(path)
    try props.load(in) finally in.close()
    props.stringPropertyNames().asScala.map(k => k -> props.getProperty(k).toInt).toMap
  }

  def loadMetrics(round: Int): Map[String, Long] = {
    val props = new Properties()
    val in = Files.newInputStream(p("metrics", s"round=$round.properties"))
    try props.load(in) finally in.close()
    props.stringPropertyNames().asScala.map(k => k -> props.getProperty(k).toLong).toMap
  }
}
