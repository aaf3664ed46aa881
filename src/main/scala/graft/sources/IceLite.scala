package graft.sources

import graft.io.StateFs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.Properties

/** Table partition spec: `expr` yields the partition value written as
  * `<name>=<value>/` inside each batch dir. Must be chosen at table creation
  * and kept for the table's lifetime.
  *
  * For MERGE pruning to be sound, `expr` MUST be a pure function of the
  * merge key column ([[IceLite.mergeInsert]]'s / `mergeUpsertBest`'s
  * `keyCol`) — that is what guarantees an existing key lives in a
  * partition the staged batch also touches. [[IceLite.phashPartition]]
  * satisfies this; an expr over OTHER columns would let existing keys in
  * untouched partitions be re-inserted as duplicates (`mergeInsert`) or
  * misclassified as inserts instead of upgrades (`mergeUpsertBest` —
  * duplicate keys AND rowCount drift). Both merges enforce it by
  * construction of the specs this module exports; custom specs carry the
  * same obligation. */
final case class PartitionSpec(name: String, expr: Column)

object IceLite {
  /** The north rule's image-table layout (SCALE.md §1): 256 partitions by
    * the top byte of the 64-bit perceptual hash, so MERGE-on-phash
    * anti-joins only the partitions the staged batch touches. */
  def phashPartition(keyCol: String = "phash"): PartitionSpec =
    PartitionSpec("__p", shiftrightunsigned(col(keyCol), 56))

  /** The directory name Spark writes null partition values to. */
  val NullPartition = "__HIVE_DEFAULT_PARTITION__"

  /** `exclusions`: per-batch partition values SUPERSEDED by a later batch
    * in the same snapshot (copy-on-write MERGE UPDATE, see
    * [[IceLite.mergeUpsertBest]]) — readers skip those subdirectories.
    * `statsCol`/`stats`: the manifest-level data-skipping metadata — the
    * column the per-batch (min, max) ranges in `stats` were computed over
    * (batches with no entry predate the stats column or were all-null;
    * they are always read). */
  final case class Snapshot(version: Int, batches: Seq[String], rowCount: Long,
      exclusions: Map[String, Set[String]] = Map.empty,
      statsCol: Option[String] = None,
      stats: Map[String, (Long, Long)] = Map.empty,
      bloomCol: Option[String] = None,
      blooms: Set[String] = Set.empty)
}

/** `icelite` — a minimal Iceberg-style snapshot table (SURVEY.md §7.4).
  *
  * No Iceberg jar ships in `/opt/spark/jars`, so the observable semantics
  * the north rule needs are implemented directly — with all metadata I/O
  * through [[graft.io.StateFs]] (the Hadoop FileSystem API), so `dir` may
  * name `file:`, `hdfs:`, `s3a:` or any registered scheme and the table
  * works on the distributed storage a real cluster requires:
  *  - data as immutable parquet batch directories under `table/data/`
  *  - snapshot manifests `table/meta/v<N>.properties` listing the member
  *    batch dirs + row count (immutable once written)
  *  - commits are atomic: write data first, write the new manifest, then
  *    atomically swap the `current.properties` pointer — readers see either
  *    the old or the new snapshot, never a mix; crashed writers leave only
  *    orphan batch dirs that no manifest references
  *  - `MERGE INTO t USING s ON t.<key> = s.<key> WHEN NOT MATCHED THEN
  *    INSERT` = anti-join staged rows against the current snapshot, append
  *    survivors as a new batch + snapshot (J3 in SURVEY.md §2.4)
  *  - time travel: `readAt(version)` reads any retained snapshot — the
  *    basis for exact resume of downstream consumers
  *  - with a [[PartitionSpec]], batches are written as partition subdirs
  *    and MERGE prunes manifest-style: it lists the staged batch's distinct
  *    partition values (bounded by the partition-space size, e.g. 256 for
  *    the phash layout) and anti-joins only those subdirectories — at 100 TB
  *    the merge reads the touched partitions, not the table
  *  - maintenance: [[compact]] rewrites the accumulated small batch dirs
  *    into one (plans stop growing with commit count), [[expireSnapshots]]
  *    retires old versions and deletes batch dirs nothing retained
  *    references — without either, a long-lived table's per-read file list
  *    and storage grow linearly with commits
  */
final class IceLite(spark: SparkSession, val dir: String,
    partition: Option[PartitionSpec] = None,
    // auto-compact bound on copy-on-write bookkeeping: every
    // mergeUpsertBest adds the touched partition set to EVERY prior
    // batch's exclusion list, so a long-lived upsert table's manifest
    // grows O(batches × partitions) — entries, not rows. Once the TOTAL
    // exclusion-entry count crosses this bound, the upsert triggers
    // compact() (one consolidated batch, all exclusions cleared; the read
    // set is unchanged by construction). The default keeps manifests
    // KB-scale at the 256-partition phash layout; Int.MaxValue disables.
    maxExclusionEntries: Int = 4096,
    // manifest-level data skipping (Iceberg file-stats analog): when set to
    // an integral column (e.g. a crawl round, an ingest epoch, a time
    // bucket), every commit records the batch's (min, max) of that column
    // in the manifest and readWhere() skips batches whose range is
    // disjoint from the queried one — a range read over a long-lived
    // table touches the matching commits, not the table. Batches written
    // before the column was configured (or whose values are all null)
    // carry no stats and are always read: skipping is sound, never
    // load-bearing for correctness.
    statsCol: Option[String] = None,
    // manifest-level KEY-MEMBERSHIP skipping (the Iceberg puffin-blob /
    // parquet-bloom analog, lifted to batch granularity): when set to an
    // int64 key column (the table's merge key — phash for the image
    // table), every commit writes a per-batch Bloom filter of the batch's
    // keys under meta/bloom/ and readWhereKeyIn() opens only the batches
    // whose Bloom admits at least one probed key — a point lookup over a
    // long-lived table touches the few commits that can hold the key, not
    // the table. False positives cost one extra batch read; false
    // negatives cannot happen, and batches without a recorded Bloom
    // (pre-configuration, or recorded over a different column) are always
    // read — skipping is sound, never load-bearing. Filter size is
    // ~1.2 MB per million keys at the default 1% fpp; raise keyBloomFpp
    // for very large batches.
    keyBloomCol: Option[String] = None,
    keyBloomFpp: Double = 0.01) {

  private val sfs = StateFs(spark)
  private def p(parts: String*): String = sfs.child(dir, parts: _*)
  sfs.mkdirs(p("meta"))
  sfs.mkdirs(p("data"))

  import IceLite.Snapshot

  /** Current version = max(pointer file, newest listed manifest). Manifests
    * are immutable and written before the pointer swap, so the listing is
    * an equally valid source of truth: a reader that catches the pointer
    * mid-replace (or a crash that lost it on a filesystem without atomic
    * replace) still resolves the latest fully-committed snapshot instead
    * of seeing the table vanish. */
  def currentVersion(): Int = {
    val cur = p("meta", "current.properties")
    val pointer =
      if (!sfs.exists(cur)) 0
      else {
        val props = new Properties()
        val in = sfs.open(cur)
        try props.load(in) finally in.close()
        props.getProperty("version").toInt
      }
    val listed = sfs.listNames(p("meta"))
      .collect { case n if n.startsWith("v") && n.endsWith(".properties") =>
        n.stripPrefix("v").stripSuffix(".properties").toInt }
    (pointer +: listed).max
  }

  def snapshot(version: Int): Option[Snapshot] = {
    val f = p("meta", s"v$version.properties")
    if (!sfs.exists(f)) None
    else {
      val props = new Properties()
      val in = sfs.open(f)
      try props.load(in) finally in.close()
      val batches = props.getProperty("batches", "")
      val excl = props.getProperty("exclusions", "")
      val stats = props.getProperty("stats", "")
      Some(Snapshot(version,
        if (batches.isEmpty) Nil else batches.split(",").toSeq,
        props.getProperty("rowCount").toLong,
        if (excl.isEmpty) Map.empty
        else excl.split(";").map { e =>
          val Array(b, vs) = e.split(":", 2)
          b -> vs.split("\\|").toSet
        }.toMap,
        Option(props.getProperty("statsCol")),
        if (stats.isEmpty) Map.empty
        else stats.split(";").map { e =>
          val Array(b, mn, mx) = e.split(":", 3)
          b -> ((mn.toLong, mx.toLong))
        }.toMap,
        Option(props.getProperty("bloomCol")),
        props.getProperty("blooms", "") match {
          case "" => Set.empty
          case bs => bs.split(",").toSet
        }))
    }
  }

  def currentSnapshot(): Option[Snapshot] = {
    val v = currentVersion()
    if (v == 0) None else snapshot(v)
  }

  /** Read the current snapshot (empty-schema error if the table is empty —
    * callers create tables by appending). */
  def read(): DataFrame = readAt(currentVersion())

  /** Read snapshot `version`. An expired (or never-committed) version fails
    * cleanly here — its manifest file is gone, so there is nothing to read. */
  def readAt(version: Int): DataFrame = {
    val s = snapshot(version)
      .getOrElse(throw new IllegalStateException(
        s"icelite: no snapshot v$version at $dir (never committed, or expired " +
          "by expireSnapshots)"))
    readBatchesOf(s, s.batches)
  }

  /** Read only the newest `lastBatches` commits of the current snapshot —
    * the bounded-recency scan for per-increment consumers that cannot
    * afford the whole table per call (e.g. the streaming MERGE sink's
    * near-dup corpus, SCALE.md §7d: the per-trigger check covers what it
    * can afford to scan; the periodic batch sweep owns full history).
    * Batches are manifest-ordered by commit, so the window is exact, and
    * copy-on-write exclusions still apply — superseded rows never
    * resurrect through a window read.
    *
    * The window is COMMIT-denominated: [[compact]] rewrites all history
    * into ONE consolidated batch, after which any window spans the whole
    * table until new commits accumulate again. A deployment that relies
    * on `readRecent` to bound per-call cost (the streaming sink's
    * `corpusWindow`) should therefore compact the table on a coarser
    * cadence than it reads it — or sweep-and-archive instead of
    * compacting in place. */
  def readRecent(lastBatches: Int): DataFrame = {
    require(lastBatches >= 1, s"icelite: readRecent($lastBatches)")
    val s = currentSnapshot()
      .getOrElse(throw new IllegalStateException(s"icelite: empty table at $dir"))
    readBatchesOf(s, s.batches.takeRight(lastBatches))
  }

  private def readBatchesOf(s: IceLite.Snapshot, batches: Seq[String]): DataFrame =
    tryReadBatchesOf(s, batches).getOrElse(
      throw new IllegalStateException(s"icelite: snapshot v${s.version} is empty"))

  /** [[readBatchesOf]] that reports "nothing live in this selection" as
    * None instead of throwing — a SUBSET of batches can be legitimately
    * empty (every selected batch fully excluded by copy-on-write upserts)
    * even when the snapshot as a whole is not. */
  private def tryReadBatchesOf(s: IceLite.Snapshot, batches: Seq[String])
      : Option[DataFrame] = {
    if (batches.isEmpty) return None
    partition match {
      case None => Some(spark.read.parquet(batches.map(b => p("data", b)): _*))
      case Some(ps) =>
        // each batch root is its own partitioned layout — discover per batch
        // and union (multi-root discovery rejects sibling partition trees);
        // a batch with excluded partitions reads its leaf dirs explicitly,
        // skipping the superseded values (copy-on-write MERGE UPDATE)
        val parts = batches.flatMap { b =>
          val ex = s.exclusions.getOrElse(b, Set.empty)
          if (ex.isEmpty) Some(spark.read.parquet(p("data", b)).drop(ps.name))
          else {
            val dirs = sfs.listNames(p("data", b))
              .filter(_.startsWith(s"${ps.name}="))
              .filterNot(d => ex.contains(d.stripPrefix(s"${ps.name}=")))
              .map(d => p("data", b, d))
            if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
          }
        }
        if (parts.isEmpty) None else Some(parts.reduce(_ unionByName _))
    }
  }

  /** Schema-preserving empty frame over snapshot `s`: plan the cheapest
    * live batch (newest first — an upsert's own batch is never excluded,
    * so in practice the first probe hits) under an always-false predicate.
    * `filter(lit(false))` collapses to an empty LocalRelation in the
    * optimizer, so no data is scanned; only one batch root is listed. */
  private def emptyRead(s: IceLite.Snapshot): DataFrame =
    s.batches.reverseIterator
      .flatMap(b => tryReadBatchesOf(s, Seq(b)))
      .nextOption()
      .getOrElse(throw new IllegalStateException(
        s"icelite: snapshot v${s.version} is empty"))
      .filter(lit(false))

  def isEmpty: Boolean = currentSnapshot().forall(_.batches.isEmpty)

  /** The partition subdirectories of the current snapshot holding any of
    * `values` — manifest-style pruning: only existing dirs are returned, so
    * a read over them touches exactly the requested partitions. */
  def partitionDirs(values: Seq[String]): Seq[String] = {
    val ps = partition.getOrElse(
      throw new IllegalStateException("icelite: partitionDirs on an unpartitioned table"))
    for {
      s <- currentSnapshot().toSeq
      b <- s.batches
      ex = s.exclusions.getOrElse(b, Set.empty[String])
      v <- values if !ex.contains(v) // superseded by a later batch
      d = p("data", b, s"${ps.name}=$v") if sfs.exists(d)
    } yield d
  }

  /** Append `df` as a new snapshot (no dedup). Returns rows appended. */
  def append(df: DataFrame): Long = commit(df)

  /** MERGE-INTO … WHEN NOT MATCHED THEN INSERT on `keyCol`: stage rows whose
    * key is absent from the current snapshot (staged side deduped on the key
    * first), append them. Returns rows inserted. The anti-join uses
    * null-safe equality (`<=>`), so a null-keyed row dedups against an
    * existing null-keyed row instead of being re-inserted on every merge.
    * On a partitioned table the anti-join reads only the partitions the
    * staged rows hash into; a null partition value maps to the Hive default
    * partition dir (where the writer puts null-valued rows). */
  def mergeInsert(df: DataFrame, keyCol: String): Long = {
    // null-safe anti-join: plain Seq(keyCol) equi-join would keep null keys
    // forever (SQL null never equals null)
    def antiByKey(staged: DataFrame, existing: DataFrame): DataFrame =
      staged.join(existing.select(col(keyCol).as("__mk")),
        staged(keyCol) <=> col("__mk"), "left_anti")
    val staged = df.dropDuplicates(keyCol)
    val hasData = currentSnapshot().exists(_.batches.nonEmpty)
    (partition, hasData) match {
      case (Some(ps), true) =>
        val stagedP = staged.withColumn(ps.name, ps.expr).persist()
        try {
          // distinct partition values: bounded by the partition-space size
          // (256 for the phash layout) — a deliberate, bounded collect
          val touched = stagedP.select(ps.name).distinct().collect()
            .map(r => if (r.isNullAt(0)) IceLite.NullPartition else r.get(0).toString)
            .toSeq
          val dirs = partitionDirs(touched)
          val novel =
            if (dirs.isEmpty) stagedP.drop(ps.name)
            else antiByKey(stagedP, spark.read.parquet(dirs: _*)).drop(ps.name)
          commit(novel)
        } finally stagedP.unpersist()
      case (_, true) =>
        commit(antiByKey(staged, read()))
      case (_, false) => commit(staged)
    }
  }

  /** Rewrite the current snapshot's `batches` into ONE consolidated batch
    * dir and commit it as a new version. The read set is unchanged; the
    * per-read file list shrinks from O(#commits) dirs to one — run this
    * periodically on any table that takes many small commits (each
    * `mergeInsert` appends a batch dir forever otherwise). Returns the new
    * version, or the current one if there is nothing to consolidate. */
  def compact(): Int = {
    val s = currentSnapshot().getOrElse(return currentVersion())
    if (s.batches.size <= 1) return s.version
    val v = s.version + 1
    val batch = f"batch-$v%05d"
    val data = read()
    partition match {
      case Some(ps) =>
        data.withColumn(ps.name, ps.expr)
          .write.mode("overwrite").partitionBy(ps.name).parquet(p("data", batch))
      case None =>
        data.write.mode("overwrite").parquet(p("data", batch))
    }
    // artifact scans read the compacted bytes back (narrow columnar scans)
    // instead of re-evaluating the multi-batch exclusion-aware union twice
    val written = spark.read.parquet(p("data", batch))
    publish(v, Seq(batch), s.rowCount,
      stats = statsEntryOf(written).map(batch -> _).toMap,
      blooms = writeKeyBloom(written, batch, s.rowCount).toSet)
    v
  }

  /** Retire all but the newest `retain` snapshots: their manifests are
    * deleted (time travel to them now fails cleanly in [[readAt]]), then
    * every batch dir no retained snapshot references is deleted. Storage
    * stops growing with history length; time travel keeps working within
    * the retention window. */
  def expireSnapshots(retain: Int): Unit = {
    require(retain >= 1, "icelite: must retain at least the current snapshot")
    val cur = currentVersion()
    if (cur == 0) return
    val keepVersions = ((cur - retain + 1) max 1) to cur
    val keepBatches = keepVersions.flatMap(v => snapshot(v).toSeq.flatMap(_.batches)).toSet
    sfs.listNames(p("meta"))
      .collect { case n if n.startsWith("v") && n.endsWith(".properties") =>
        n.stripPrefix("v").stripSuffix(".properties").toInt }
      .filter(v => v < keepVersions.head)
      .foreach(v => sfs.delete(p("meta", s"v$v.properties")))
    sfs.listNames(p("data"))
      .filter(b => b.startsWith("batch-") && !keepBatches.contains(b))
      .foreach(b => sfs.delete(p("data", b)))
    // key Blooms of expired batches go with them (same unreferenced rule)
    if (sfs.exists(p("meta", "bloom")))
      sfs.listNames(p("meta", "bloom"))
        .filter(n => n.endsWith(".bloom") &&
          !keepBatches.contains(n.stripSuffix(".bloom")))
        .foreach(n => sfs.delete(p("meta", "bloom", n)))
  }

  private def commit(df: DataFrame): Long = {
    val v = currentVersion() + 1
    val batch = f"batch-$v%05d"
    // one evaluation: count from the cached plan, write from the same cache
    // (no write-then-re-read scan, no empty batch dirs to clean up)
    val cached = df.persist()
    try {
      val rows = cached.count()
      if (rows == 0) return 0L
      writeBatch(cached, batch)
      val prev = currentSnapshot()
      publish(v, prev.map(_.batches).getOrElse(Nil) :+ batch,
        prev.map(_.rowCount).getOrElse(0L) + rows,
        // an append must carry the prior copy-on-write exclusions forward —
        // dropping them would resurrect superseded rows
        prev.map(_.exclusions).getOrElse(Map.empty),
        carriedStats(prev) ++ statsEntryOf(cached).map(batch -> _),
        carriedBlooms(prev) ++ writeKeyBloom(cached, batch, rows))
      rows
    } finally cached.unpersist()
  }

  private def writeBatch(df: DataFrame, batch: String): Unit = partition match {
    case Some(ps) =>
      val out =
        if (df.columns.contains(ps.name)) df
        else df.withColumn(ps.name, ps.expr)
      out.write.mode("overwrite").partitionBy(ps.name).parquet(p("data", batch))
    case None =>
      df.write.mode("overwrite").parquet(p("data", batch))
  }

  /** `MERGE INTO t USING s ON t.<keyCol> <=> s.<keyCol>
    *    WHEN MATCHED AND s.<qualityCol> > t.<qualityCol> THEN UPDATE SET *
    *    WHEN NOT MATCHED THEN INSERT *`
    * — keep-BEST-quality upsert, the re-crawl writeback: a fetched copy of
    * a known phash with better quality (higher resolution, longer caption)
    * REPLACES the stored row; new keys insert; a worse or equal copy is a
    * no-op. Copy-on-write at PARTITION granularity: the touched partitions
    * are rewritten into the new batch (kept rows + upgrades + inserts) and
    * the manifest marks those partition values EXCLUDED in every prior
    * batch — readers skip the superseded subdirectories, untouched
    * partitions are never rewritten, and time travel still sees the old
    * rows through the old manifests. Storage for superseded partitions is
    * reclaimed by [[compact]] (which rewrites the live read set and clears
    * all exclusions). The staged side is deduped per key keeping the
    * max-(quality, remaining columns) row; NULL staged quality never
    * upgrades. On an unpartitioned table this is a full-table rewrite (the
    * new manifest lists only the new batch). Assumes table keys are unique
    * (the invariant `mergeInsert`/`mergeUpsertBest` maintain; raw
    * [[append]] can break it). Returns (inserted, upgraded). */
  def mergeUpsertBest(df: DataFrame, keyCol: String, qualityCol: String): (Long, Long) =
    mergeUpsertBest(df, keyCol, col(qualityCol))

  /** [[mergeUpsertBest]] with the quality as an EXPRESSION over the row
    * (e.g. `col("w") * col("h")` for an image table whose schema carries
    * no explicit quality column) — evaluated identically on the staged and
    * stored sides; nothing extra is written. */
  def mergeUpsertBest(df: DataFrame, keyCol: String, quality: Column): (Long, Long) = {
    val cols = df.columns.toSeq
    require(cols.contains(keyCol), s"icelite: mergeUpsertBest needs $keyCol column")
    val rest = cols.filterNot(_ == keyCol)
    val staged = df.groupBy(col(keyCol))
      .agg(max(struct(quality.as("__q") +: rest.map(col): _*)).as("__w"))
      .select(cols.map(c => if (c == keyCol) col(c) else col(s"__w.$c").as(c)): _*)
    val prev = currentSnapshot()
    if (!prev.exists(_.batches.nonEmpty)) return (commit(staged), 0L)

    def classify(existing: DataFrame, stagedRel: DataFrame)
        : (DataFrame, DataFrame, DataFrame) = {
      val eKeyQ = existing.select(col(keyCol).as("__ek"), quality.as("__eq"))
      val cls = stagedRel.withColumn("__sq", quality)
        .join(eKeyQ, col(keyCol) <=> col("__ek"), "left")
      val inserts = cls.filter(col("__ek").isNull).drop("__ek", "__eq", "__sq")
      val upgrades = cls.filter(col("__ek").isNotNull && col("__sq") > col("__eq"))
        .drop("__ek", "__eq", "__sq")
      val keep = existing.join(upgrades.select(col(keyCol).as("__uk")),
        col(keyCol) <=> col("__uk"), "left_anti")
      (inserts, upgrades, keep)
    }

    val v = prev.get.version + 1
    val batch = f"batch-$v%05d"
    partition match {
      case Some(ps) =>
        val stagedP = staged.withColumn(ps.name, ps.expr).persist()
        try {
          val touched = stagedP.select(ps.name).distinct().collect()
            .map(r => if (r.isNullAt(0)) IceLite.NullPartition else r.get(0).toString)
            .toSeq
          val dirs = partitionDirs(touched) // exclusion-aware: live rows only
          if (dirs.isEmpty) return (commit(stagedP.drop(ps.name)), 0L)
          val existing = spark.read.parquet(dirs: _*)
          val (inserts0, upgrades0, keep) = classify(existing, stagedP)
          val inserts = inserts0.persist(); val upgrades = upgrades0.persist()
          try {
            val (nI, nU) = (inserts.count(), upgrades.count())
            if (nI + nU == 0) return (0L, 0L)
            val newBatch = keep.withColumn(ps.name, ps.expr)
              .unionByName(upgrades).unionByName(inserts)
            writeBatch(newBatch, batch)
            val excl = prev.get.batches.map { b =>
              b -> (prev.get.exclusions.getOrElse(b, Set.empty) ++ touched)
            }.toMap
            // prior ranges/Blooms stay valid: exclusions only REMOVE rows
            // from a batch, so its recorded (min, max) and key membership
            // remain supersets — a skip decision over either is still
            // sound, merely conservative.
            // stats + Bloom read the bytes writeBatch just materialized:
            // re-evaluating `newBatch` (keep ∪ upgrades ∪ inserts — a join
            // over every touched partition) would re-run that merge once
            // per artifact; the read-back is a narrow columnar scan of
            // exactly the stats/key columns
            val written = spark.read.parquet(p("data", batch))
            publish(v, prev.get.batches :+ batch, prev.get.rowCount + nI, excl,
              carriedStats(prev) ++ statsEntryOf(written).map(batch -> _),
              carriedBlooms(prev) ++
                writeKeyBloom(written, batch, prev.get.rowCount + nI))
            // exclusion growth is unbounded without maintenance — fold the
            // accumulated copy-on-write history once it crosses the bound
            if (excl.valuesIterator.map(_.size.toLong).sum > maxExclusionEntries)
              compact()
            (nI, nU)
          } finally { inserts.unpersist(); upgrades.unpersist() }
        } finally stagedP.unpersist()
      case None =>
        val (inserts0, upgrades0, keep) = classify(read(), staged)
        val inserts = inserts0.persist(); val upgrades = upgrades0.persist()
        try {
          val (nI, nU) = (inserts.count(), upgrades.count())
          if (nI + nU == 0) return (0L, 0L)
          val newBatch = keep.unionByName(upgrades).unionByName(inserts)
          writeBatch(newBatch, batch)
          // same read-back discipline as the partitioned path: one full
          // rewrite, then narrow scans of the written bytes for artifacts
          val written = spark.read.parquet(p("data", batch))
          publish(v, Seq(batch), prev.get.rowCount + nI,
            stats = statsEntryOf(written).map(batch -> _).toMap,
            blooms = writeKeyBloom(written, batch, prev.get.rowCount + nI).toSet)
          (nI, nU)
        } finally { inserts.unpersist(); upgrades.unpersist() }
    }
  }

  /** (min, max) of the configured stats column over `df`, for the manifest
    * of the batch `df` is being written as. One tiny extra aggregation per
    * commit, only when `statsCol` is set and present in the schema; all-null
    * batches record nothing (they are always read — sound). */
  private def statsEntryOf(df: DataFrame): Option[(Long, Long)] =
    statsCol.filter(df.columns.contains).flatMap { sc =>
      val r = df.agg(min(col(sc).cast("long")), max(col(sc).cast("long"))).head()
      if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
    }

  /** Prior stats usable only if recorded over the SAME column this handle
    * is configured with — a column switch silently invalidates old ranges,
    * so they are dropped rather than trusted. */
  private def carriedStats(prev: Option[Snapshot]): Map[String, (Long, Long)] =
    prev.filter(_.statsCol == statsCol).map(_.stats).getOrElse(Map.empty)

  private def bloomPath(batch: String): String =
    p("meta", "bloom", s"$batch.bloom")

  /** Build + persist the per-batch key Bloom (one distributed aggregate
    * over the batch being written — the keys ride the commit anyway), and
    * return the batch name iff a Bloom was recorded. Written BEFORE the
    * manifest that references it, so a listed Bloom always exists (a crash
    * in between leaves an orphan .bloom file, the batch-dir convention).
    * Null keys are not representable in the filter — and not probeable via
    * [[readWhereKeyIn]]'s int64 keys — so they simply never prune. */
  private def writeKeyBloom(df: DataFrame, batch: String, expectedRows: Long)
      : Option[String] =
    keyBloomCol.filter(df.columns.contains).map { kc =>
      val bf = df.stat.bloomFilter(col(kc).cast("long"),
        math.max(expectedRows, 1L), keyBloomFpp)
      sfs.mkdirs(p("meta", "bloom"))
      sfs.writeAtomic(bloomPath(batch))(out => bf.writeTo(out))
      batch
    }

  /** Prior Blooms usable only if recorded over the SAME key column (the
    * [[carriedStats]] rule — a column switch drops old filters rather than
    * trusting them). */
  private def carriedBlooms(prev: Option[Snapshot]): Set[String] =
    prev.filter(_.bloomCol == keyBloomCol).map(_.blooms).getOrElse(Set.empty)

  /** Point lookup: read only the batches whose recorded key Bloom admits
    * at least one of `keys`, with the equivalent row filter applied —
    * semantically identical to `read().filter(keyBloomCol isin keys)`, but
    * a long-lived table is opened only where a key CAN live (batches with
    * no recorded Bloom are always read; Bloom false positives cost one
    * extra batch scan, false negatives cannot happen). The probe itself is
    * driver-side and tiny: one .bloom file per candidate batch against a
    * bounded key list — the "is this phash already stored, and where"
    * primitive for interactive lookups and per-trigger sinks. If no batch
    * can match, the scan is bounded to the newest batch under an
    * always-false predicate (schema preserved, no full-table plan). */
  def readWhereKeyIn(keys: Seq[Long]): DataFrame = {
    val kc = keyBloomCol.getOrElse(throw new IllegalStateException(
      "icelite: readWhereKeyIn on a table with no keyBloomCol configured"))
    require(keys.nonEmpty, "icelite: readWhereKeyIn needs at least one key")
    val s = currentSnapshot()
      .getOrElse(throw new IllegalStateException(s"icelite: empty table at $dir"))
    val usable = if (s.bloomCol == keyBloomCol) s.blooms else Set.empty[String]
    val live = s.batches.filter { b =>
      if (!usable.contains(b)) true // no recorded Bloom — must read
      else {
        val in = sfs.open(bloomPath(b))
        val bf = try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
                 finally in.close()
        keys.exists(bf.mightContainLong)
      }
    }
    // a non-empty `live` can still hold zero live leaf dirs when every
    // selected batch is fully excluded by later upserts — fall back to the
    // schema-preserving empty plan, same as the no-candidate case
    val base = tryReadBatchesOf(s, live).getOrElse(emptyRead(s))
    base.filter(col(kc).cast("long").isin(keys: _*))
  }

  /** Read only the batches whose recorded stats range intersects
    * `[lo, hi]`, with the equivalent row filter applied — semantically
    * identical to `read().filter(statsCol between lo and hi)`, but a
    * long-lived table is touched only where the manifest says matching
    * rows can live (batches without recorded stats are always read).
    * If no batch can match, the scan is bounded to the newest batch under
    * an always-false predicate (schema preserved, no full-table plan). */
  def readWhere(lo: Long, hi: Long): DataFrame = {
    val sc = statsCol.getOrElse(throw new IllegalStateException(
      "icelite: readWhere on a table with no statsCol configured"))
    val s = currentSnapshot()
      .getOrElse(throw new IllegalStateException(s"icelite: empty table at $dir"))
    val usable = if (s.statsCol == statsCol) s.stats else Map.empty[String, (Long, Long)]
    val live = s.batches.filter(b => usable.get(b) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None => true // no recorded range — must read
    })
    // same fully-excluded-selection fallback as readWhereKeyIn
    val base = tryReadBatchesOf(s, live).getOrElse(emptyRead(s))
    base.filter(col(sc).cast("long") >= lo && col(sc).cast("long") <= hi)
  }

  /** Write manifest v, then swap the current pointer (both atomic). */
  private def publish(v: Int, batches: Seq[String], rowCount: Long,
      exclusions: Map[String, Set[String]] = Map.empty,
      stats: Map[String, (Long, Long)] = Map.empty,
      blooms: Set[String] = Set.empty): Unit = {
    val props = new Properties()
    props.setProperty("version", v.toString)
    props.setProperty("batches", batches.mkString(","))
    props.setProperty("rowCount", rowCount.toString)
    val nonEmpty = exclusions.filter(_._2.nonEmpty)
    if (nonEmpty.nonEmpty)
      props.setProperty("exclusions", nonEmpty.toSeq.sortBy(_._1)
        .map { case (b, vs) => b + ":" + vs.toSeq.sorted.mkString("|") }
        .mkString(";"))
    statsCol.foreach { sc =>
      props.setProperty("statsCol", sc)
      if (stats.nonEmpty)
        props.setProperty("stats", stats.toSeq.sortBy(_._1)
          .map { case (b, (mn, mx)) => s"$b:$mn:$mx" }.mkString(";"))
    }
    keyBloomCol.foreach { kc =>
      props.setProperty("bloomCol", kc)
      if (blooms.nonEmpty)
        props.setProperty("blooms", blooms.toSeq.sorted.mkString(","))
    }
    sfs.writeAtomic(p("meta", s"v$v.properties"))(out => props.store(out, null))
    val cur = new Properties()
    cur.setProperty("version", v.toString)
    sfs.writeAtomic(p("meta", "current.properties"))(out => cur.store(out, null))
  }
}
