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
}
