package graft.sources

import graft.functions.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Table maintenance: compaction (per-read file list stops growing with
  * commit count) and snapshot retention (storage stops growing with
  * history), with time travel preserved inside the retention window. */
class IceLiteMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(partitioned: Boolean): IceLite = {
    val dir = Files.createTempDirectory("graft-icelite-maint-").toString
    new IceLite(spark, dir,
      if (partitioned) Some(IceLite.phashPartition("k")) else None)
  }

  test("compact: read set preserved, file list shrinks to one batch") {
    val t = freshTable(partitioned = false)
    (1 to 5).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    val before = t.read().orderBy("k").collect().toSeq
    val filesBefore = t.read().inputFiles.length
    assert(t.currentSnapshot().get.batches.size == 5)

    val v = t.compact()
    assert(t.currentVersion() == v)
    assert(t.currentSnapshot().get.batches.size == 1)
    val after = t.read().orderBy("k").collect().toSeq
    assert(after == before, "compaction changed the read set")
    assert(t.read().inputFiles.length < filesBefore)
    assert(t.currentSnapshot().get.rowCount == 5L)
    // appends keep working after compaction
    t.append(Seq((99L, "z")).toDF("k", "v"))
    assert(t.read().count() == 6L)
  }

  test("compact preserves a partitioned layout and its pruning") {
    val t = freshTable(partitioned = true)
    // keys spread over two phash partitions (top byte 0 and 1)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.append(Seq((1L << 56 | 3L, "c")).toDF("k", "v"))
    val before = t.read().orderBy("k").collect().toSeq
    t.compact()
    assert(t.read().orderBy("k").collect().toSeq == before)
    // pruning still works: only the partition dir of the touched value
    val dirs = t.partitionDirs(Seq("1"))
    assert(dirs.nonEmpty && dirs.forall(_.contains("__p=1")))
    // and merge-on-key still dedups across the compacted batch
    assert(t.mergeInsert(Seq((2L, "dup")).toDF("k", "v"), "k") == 0L)
  }

  test("mergeInsert: null keys dedup null-safely; lost pointer file recovers from listing") {
    val t = freshTable(partitioned = false)
    t.append(Seq((Some(1L), "a"), (None, "n1")).toDF("k", "v"))
    // a second null-keyed row must MATCH the existing null key (<=>), not
    // re-insert forever
    assert(t.mergeInsert(Seq((Option.empty[Long], "n2")).toDF("k", "v"), "k") == 0L)
    assert(t.mergeInsert(Seq((Some(2L), "b"), (Option.empty[Long], "n3")).toDF("k", "v"), "k") == 1L)
    assert(t.read().filter("k IS NULL").count() == 1L)

    // partitioned table: null partition value routes to the Hive default
    // dir and dedups the same way
    val tp = freshTable(partitioned = true)
    tp.append(Seq((Option.empty[Long], "n1"), (Some(1L), "a")).toDF("k", "v"))
    assert(tp.mergeInsert(Seq((Option.empty[Long], "n2")).toDF("k", "v"), "k") == 0L)
    assert(tp.read().count() == 2L)

    // snapshot pointer lost (e.g. crash on a store without atomic replace):
    // the immutable manifest listing still resolves the current version
    // (the 0-row merge above published no snapshot, so the table sits at
    // v2: the initial append plus the 1-row merge)
    java.nio.file.Files.delete(java.nio.file.Paths.get(t.dir, "meta", "current.properties"))
    assert(t.currentVersion() == 2)
    assert(t.read().count() == 3L)
  }

  test("expireSnapshots: old versions fail cleanly, retained ones read, orphans deleted") {
    val t = freshTable(partitioned = false)
    (1 to 4).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    val curRows = t.read().count()
    t.expireSnapshots(retain = 2)

    // versions 1..2 are gone — clean failure, not a partial read
    val ex = intercept[IllegalStateException](t.readAt(1))
    assert(ex.getMessage.contains("expired") || ex.getMessage.contains("no snapshot"))
    intercept[IllegalStateException](t.readAt(2))
    // versions 3..4 still read; current unchanged
    assert(t.readAt(3).count() == 3L)
    assert(t.readAt(4).count() == curRows)

    // all 4 batch dirs survive (v3 references batches 1..3) — but after a
    // compact + expire, the pre-compaction batch dirs become orphans and go
    t.compact() // v5 = one batch
    t.expireSnapshots(retain = 1)
    val dataDirs = Files.list(java.nio.file.Paths.get(t.dir, "data")).count()
    assert(dataDirs == 1L, s"orphan batch dirs not deleted: $dataDirs left")
    assert(t.read().count() == curRows)
    intercept[IllegalStateException](t.readAt(4))
  }

  test("mergeUpsertBest: better quality replaces, worse/equal no-op, new inserts; COW is partition-granular") {
    val t = freshTable(partitioned = true)
    // partitions by top byte of k: P0 holds k=1,2; P1 holds k=(1<<56)|3
    t.append(Seq((1L, 10, "old1"), (2L, 10, "old2"), (1L << 56 | 3L, 10, "old3"))
      .toDF("k", "q", "v"))
    val vBefore = t.currentVersion()
    val (nI, nU) = t.mergeUpsertBest(Seq(
      (1L, 20, "new1"),   // better → replaces
      (2L, 10, "same2"),  // equal → no-op
      (4L, 5, "new4"),    // new key in P0 → insert
      (4L, 7, "best4")    // staged dup of 4: max quality wins
    ).toDF("k", "q", "v"), "k", "q")
    assert((nI, nU) == (1L, 1L))
    val rows = t.read().collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(rows == Map(
      1L -> (20, "new1"), 2L -> (10, "old2"),
      (1L << 56 | 3L) -> (10, "old3"), 4L -> (7, "best4")))
    assert(t.currentSnapshot().get.rowCount == 4L)
    // COW granularity: P1 untouched — its rows still come from batch 1,
    // and the old batch's P0 dir is excluded (superseded, not deleted)
    val s = t.currentSnapshot().get
    assert(s.exclusions.values.flatten.toSet == Set("0"), s.exclusions.toString)
    // pruning stays sound: a P0 lookup reads only live dirs
    val p0dirs = t.partitionDirs(Seq("0"))
    assert(p0dirs.size == 1 && p0dirs.head.contains(s.batches.last))
    // time travel still sees the pre-upsert rows through the old manifest
    assert(t.readAt(vBefore).filter($"k" === 1L).head().getString(2) == "old1")
    // a later mergeInsert of a superseded key must NOT resurrect it
    assert(t.mergeInsert(Seq((1L, 99, "dup")).toDF("k", "q", "v"), "k") == 0L)
    assert(t.read().filter($"k" === 1L).head().getInt(1) == 20)
    // a second upsert stacks exclusions; compact clears them, read set kept
    assert(t.mergeUpsertBest(Seq((2L, 30, "newer2")).toDF("k", "q", "v"), "k", "q") == ((0L, 1L)))
    val before = t.read().orderBy("k").collect().toSeq
    t.compact()
    assert(t.currentSnapshot().get.exclusions.isEmpty)
    assert(t.read().orderBy("k").collect().toSeq == before)
    // upsert with NO effective change commits nothing
    val vNow = t.currentVersion()
    assert(t.mergeUpsertBest(Seq((2L, 1, "worse")).toDF("k", "q", "v"), "k", "q") == ((0L, 0L)))
    assert(t.currentVersion() == vNow)
  }

  test("upsert + compact + expireSnapshots: superseded storage reclaimed, reads intact") {
    val t = freshTable(partitioned = true)
    t.append(Seq((1L, 1, "a"), (2L, 1, "b")).toDF("k", "q", "v"))        // v1
    val vOld = t.currentVersion()
    assert(t.mergeUpsertBest(Seq((1L, 9, "a9")).toDF("k", "q", "v"), "k", "q") == ((0L, 1L)))
    val expected = t.read().orderBy("k").collect().toSeq
    t.compact()                                                           // v3: exclusions cleared
    t.expireSnapshots(1)
    // the time-travel snapshot and the superseded batch dirs are gone
    intercept[IllegalStateException](t.readAt(vOld))
    val dataDirs = new java.io.File(t.dir, "data").list().count(_.startsWith("batch-"))
    assert(dataDirs == 1, s"superseded batches not reclaimed: $dataDirs left")
    assert(t.read().orderBy("k").collect().toSeq == expected)
    // the table keeps working after the full maintenance cycle
    assert(t.mergeUpsertBest(Seq((1L, 20, "a20"), (3L, 1, "c")).toDF("k", "q", "v"),
      "k", "q") == ((1L, 1L)))
    assert(t.read().filter($"k" === 1L).head().getString(2) == "a20")
    assert(t.read().count() == 3L)
  }

  test("auto-compact: N repeated upserts keep exclusion entries bounded, read set exact throughout") {
    val dir = Files.createTempDirectory("graft-icelite-maint-").toString
    val bound = 4
    val t = new IceLite(spark, dir, Some(IceLite.phashPartition("k")),
      maxExclusionEntries = bound)
    // two partitions (top byte 0 and 1); every upsert upgrades both, so
    // each adds 2 exclusion entries PER PRIOR BATCH — unmanaged, the
    // manifest grows O(batches × partitions)
    def entries(): Long = t.currentSnapshot().get
      .exclusions.valuesIterator.map(_.size.toLong).sum
    t.append(Seq((1L, 0, "a0"), (1L << 56 | 2L, 0, "b0")).toDF("k", "q", "v"))
    (1 to 8).foreach { i =>
      val (nI, nU) = t.mergeUpsertBest(
        Seq((1L, i, s"a$i"), (1L << 56 | 2L, i, s"b$i")).toDF("k", "q", "v"),
        "k", "q")
      assert((nI, nU) == (0L, 2L))
      // the bound holds after EVERY upsert (auto-compact fired whenever
      // the accumulated history crossed it)...
      assert(entries() <= bound, s"upsert $i: ${entries()} exclusion entries")
      // ...and the read set is exactly the latest-quality rows
      val rows = t.read().collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
      assert(rows == Map(1L -> (i, s"a$i"), (1L << 56 | 2L) -> (i, s"b$i")))
      assert(t.currentSnapshot().get.rowCount == 2L)
    }
    // compaction genuinely fired (batches folded at least once)
    assert(t.currentSnapshot().get.batches.size < 9)
  }

  test("mergeUpsertBest on an unpartitioned table: full rewrite, counts exact") {
    val t = freshTable(partitioned = false)
    t.append(Seq((1L, 1, "a"), (2L, 5, "b")).toDF("k", "q", "v"))
    val (nI, nU) = t.mergeUpsertBest(
      Seq((1L, 3, "a2"), (2L, 4, "bworse"), (3L, 1, "c")).toDF("k", "q", "v"), "k", "q")
    assert((nI, nU) == (1L, 1L))
    assert(t.currentSnapshot().get.batches.size == 1) // full rewrite
    val rows = t.read().collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    assert(t.currentSnapshot().get.rowCount == 3L)
  }

  // --- manifest-level data skipping (statsCol / readWhere) ---------------

  private def statsTable(statsCol: Option[String], dir0: String = ""): (IceLite, String) = {
    val dir = if (dir0.nonEmpty) dir0
      else Files.createTempDirectory("graft-icelite-stats-").toString
    (new IceLite(spark, dir, None, statsCol = statsCol), dir)
  }

  test("readWhere: range reads touch only the batches whose stats intersect") {
    val (t, _) = statsTable(Some("r"))
    t.append((0L to 9L).map(i => (i, i, s"v$i")).toDF("k", "r", "v"))
    t.append((10L to 19L).map(i => (i, i, s"v$i")).toDF("k", "r", "v"))
    t.append((20L to 29L).map(i => (i, i, s"v$i")).toDF("k", "r", "v"))
    assert(t.currentSnapshot().get.stats.size == 3)

    // semantics: identical to the full read + filter
    val want = t.read().filter($"r" >= 12 && $"r" <= 17)
      .orderBy("k").collect().toSeq
    val got = t.readWhere(12, 17)
    assert(got.orderBy("k").collect().toSeq == want && want.size == 6)
    // pruning: only the middle batch's files are in the scan
    assert(got.inputFiles.nonEmpty &&
      got.inputFiles.forall(_.contains("batch-00002")), got.inputFiles.mkString(","))
    // a range spanning two batches reads exactly those two
    val two = t.readWhere(5, 15)
    assert(two.count() == 11L)
    assert(!two.inputFiles.exists(_.contains("batch-00003")))
    // no batch can match: empty result, scan bounded to ONE batch
    val none = t.readWhere(100, 200)
    assert(none.count() == 0L)
    assert(none.inputFiles.map(f => f.slice(f.indexOf("batch-"), f.indexOf("batch-") + 11))
      .distinct.length <= 1)
  }

  test("readWhere: batches predating the stats column are always read (sound)") {
    val (t0, dir) = statsTable(None)
    t0.append((0L to 9L).map(i => (i, i, s"v$i")).toDF("k", "r", "v"))
    // reopen the same table WITH the stats column configured
    val (t, _) = statsTable(Some("r"), dir)
    t.append((10L to 19L).map(i => (i, i, s"v$i")).toDF("k", "r", "v"))
    val s = t.currentSnapshot().get
    assert(s.stats.keySet == Set("batch-00002"), s.stats.toString)
    // rows in the stats-less batch are still found
    assert(t.readWhere(3, 12).orderBy("k").collect().toSeq ==
      t.read().filter($"r" >= 3 && $"r" <= 12).orderBy("k").collect().toSeq)
    assert(t.readWhere(3, 12).count() == 10L)
    // and out-of-range queries still read (cannot skip) the stats-less batch
    assert(t.readWhere(15, 99).inputFiles.exists(_.contains("batch-00001")))
  }

  test("readWhere stays exact through upsert and compact; recorded ranges update") {
    val dir = Files.createTempDirectory("graft-icelite-stats-up-").toString
    val t = new IceLite(spark, dir, Some(IceLite.phashPartition("k")),
      statsCol = Some("r"))
    t.append(Seq((1L, 1L, 1, "a"), (1L << 56 | 2L, 2L, 1, "b")).toDF("k", "r", "q", "v"))
    // upgrade k=1 with a NEW stats value far outside the base range
    val (nI, nU) = t.mergeUpsertBest(
      Seq((1L, 100L, 9, "a2")).toDF("k", "r", "q", "v"), "k", "q")
    assert((nI, nU) == (0L, 1L))
    def rowsWhere(lo: Long, hi: Long) =
      t.readWhere(lo, hi).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the upgraded row is found at its new range, not its old one
    assert(rowsWhere(90, 110) == Set((1L, 100L)))
    assert(rowsWhere(1, 1) == Set.empty, "superseded row resurrected by a range read")
    assert(rowsWhere(2, 2) == Set(((1L << 56 | 2L), 2L)))
    // compaction recomputes the consolidated batch's range; reads stay exact
    t.compact()
    assert(t.currentSnapshot().get.stats.size == 1)
    assert(rowsWhere(90, 110) == Set((1L, 100L)))
    assert(rowsWhere(2, 2) == Set(((1L << 56 | 2L), 2L)))
  }

  test("readWhere: a stats-column switch drops (never trusts) old ranges") {
    val dir = Files.createTempDirectory("graft-icelite-stats-sw-").toString
    val t0 = new IceLite(spark, dir, None, statsCol = Some("r"))
    t0.append((0L to 9L).map(i => (i, i, i * 100)).toDF("k", "r", "other"))
    // reopened over a DIFFERENT column: recorded r-ranges must not skip
    val t = new IceLite(spark, dir, None, statsCol = Some("other"))
    assert(t.readWhere(200, 400).collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
    t.append((10L to 12L).map(i => (i, i, i * 100)).toDF("k", "r", "other"))
    // after the first commit under the new column, old batches carry no
    // usable stats (always read), the new one skips correctly
    assert(t.readWhere(200, 400).collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
    assert(t.readWhere(1000, 1100).collect().map(_.getLong(0)).toSet == Set(10L, 11L))
  }

  private def bloomTable(col: Option[String], dir: String = ""): (IceLite, String) = {
    val d = if (dir.nonEmpty) dir
      else Files.createTempDirectory("graft-icelite-bloom-").toString
    (new IceLite(spark, d, None, keyBloomCol = col, keyBloomFpp = 0.001), d)
  }

  test("readWhereKeyIn: point lookups open only Bloom-admitting batches; exact") {
    val (t, _) = bloomTable(Some("k"))
    t.append((0L to 99L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.append((100L to 199L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.append((200L to 299L).map(i => (i, s"v$i")).toDF("k", "v"))
    assert(t.currentSnapshot().get.blooms.size == 3)
    // semantics: identical to the full read + isin filter
    val got = t.readWhereKeyIn(Seq(105L, 150L))
    assert(got.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((105L, "v105"), (150L, "v150")))
    // pruning: only the middle batch's files are opened (deterministic for
    // this fixed corpus — Bloom hashing carries no runtime randomness)
    assert(got.inputFiles.nonEmpty &&
      got.inputFiles.forall(_.contains("batch-00002")), got.inputFiles.mkString(","))
    // keys spanning two batches read exactly those two
    val two = t.readWhereKeyIn(Seq(5L, 205L))
    assert(two.count() == 2L)
    assert(!two.inputFiles.exists(_.contains("batch-00002")))
    // absent key: empty result, scan bounded (never a full-table plan)
    val none = t.readWhereKeyIn(Seq(100000L))
    assert(none.count() == 0L)
    assert(none.inputFiles.map(f => f.slice(f.indexOf("batch-"), f.indexOf("batch-") + 11))
      .distinct.length <= 1)
  }

  test("readWhereKeyIn: batches predating the Bloom are always read (sound)") {
    val (t0, dir) = bloomTable(None)
    t0.append((0L to 9L).map(i => (i, s"v$i")).toDF("k", "v"))
    val (t, _) = bloomTable(Some("k"), dir)
    t.append((10L to 19L).map(i => (i, s"v$i")).toDF("k", "v"))
    val s = t.currentSnapshot().get
    assert(s.blooms == Set("batch-00002"), s.blooms.toString)
    // a key in the Bloom-less batch is still found; that batch always reads
    val got = t.readWhereKeyIn(Seq(3L))
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(t.readWhereKeyIn(Seq(15L)).inputFiles.exists(_.contains("batch-00001")))
    // a key-column switch drops (never trusts) the recorded filters
    val (tSw, _) = bloomTable(Some("other"), dir)
    intercept[org.apache.spark.sql.AnalysisException] {
      tSw.readWhereKeyIn(Seq(3L)).collect() // no `other` column — surfaced, not skipped
    }
  }

  test("readWhere/readWhereKeyIn: a selection of fully-excluded batches returns empty, not an error") {
    // an upsert that touches EVERY partition value fully excludes the
    // prior batch; a range/key probe whose only candidates are such
    // batches must behave like read().filter(...) — zero rows — instead
    // of throwing "snapshot is empty"
    val dir = Files.createTempDirectory("graft-icelite-excl-").toString
    // batch-1 predates the Bloom column (no recorded filter → always a
    // candidate); reopening with it configured records Blooms from then on
    val t0 = new IceLite(spark, dir, Some(IceLite.phashPartition("k")),
      statsCol = Some("r"))
    t0.append(Seq((1L, 1L, 1, "a"), (1L << 56 | 2L, 2L, 1, "b"))
      .toDF("k", "r", "q", "v"))
    val t = new IceLite(spark, dir, Some(IceLite.phashPartition("k")),
      statsCol = Some("r"), keyBloomCol = Some("k"))
    // upgrade BOTH keys with far-away stats values → touched = {0, 1} =
    // every partition; batch-1 is now fully excluded but still listed
    assert(t.mergeUpsertBest(Seq((1L, 100L, 9, "a2"), (1L << 56 | 2L, 200L, 9, "b2"))
      .toDF("k", "r", "q", "v"), "k", "q") == ((0L, 2L)))
    val s = t.currentSnapshot().get
    assert(s.exclusions.getOrElse("batch-00001", Set.empty) == Set("0", "1"))

    // stats route: [1, 2] intersects ONLY batch-1's recorded range
    val none = t.readWhere(1, 2)
    assert(none.count() == 0L)
    assert(t.read().filter($"r" >= 1 && $"r" <= 2).count() == 0L) // equivalence
    assert(none.schema.fieldNames.toSet == Set("k", "r", "q", "v"))
    // Bloom route: an absent key is rejected by batch-2's Bloom, but
    // batch-1 (no recorded Bloom — must read) stays a candidate
    val noKey = t.readWhereKeyIn(Seq(424242L))
    assert(noKey.count() == 0L)
    assert(noKey.schema.fieldNames.toSet == Set("k", "r", "q", "v"))
    // live rows still read exactly
    assert(t.readWhere(90, 210).count() == 2L)
    assert(t.readWhereKeyIn(Seq(1L)).collect().map(_.getString(3)).toSeq == Seq("a2"))
  }

  test("keyBloom stays exact through upsert, compact and expire; orphan filters deleted") {
    val dir = Files.createTempDirectory("graft-icelite-bloom-up-").toString
    val t = new IceLite(spark, dir, None, keyBloomCol = Some("k"), keyBloomFpp = 0.001)
    t.append(Seq((1L, 1, "a"), (2L, 1, "b")).toDF("k", "q", "v"))
    val (nI, nU) = t.mergeUpsertBest(Seq((1L, 9, "a2"), (3L, 1, "c")).toDF("k", "q", "v"), "k", "q")
    assert((nI, nU) == (1L, 1L))
    def lookup(k: Long) = t.readWhereKeyIn(Seq(k)).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(lookup(1L) == Set((1L, "a2")), "upsert winner not found via Bloom lookup")
    assert(lookup(2L) == Set((2L, "b")) && lookup(3L) == Set((3L, "c")))
    t.compact()
    assert(t.currentSnapshot().get.blooms.size == 1)
    assert(lookup(1L) == Set((1L, "a2")) && lookup(3L) == Set((3L, "c")))
    t.expireSnapshots(retain = 1)
    // the expired batches' .bloom files are reclaimed with their data
    val fs = graft.io.StateFs(spark)
    val left = fs.listNames(fs.child(dir, "meta", "bloom"))
    assert(left.size == 1, left.mkString(","))
    assert(lookup(1L) == Set((1L, "a2")))
  }
}
