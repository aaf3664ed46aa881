package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Properties

/** Table partition spec: `expr` (over the table's columns) yields the
  * partition value written as `<name>=<value>/` inside each batch dir.
  * Must be chosen at table creation and kept for the table's lifetime. */
final case class PartitionSpec(name: String, expr: Column)

object IceLite {
  /** The north rule's image-table layout (SCALE.md §1): 256 partitions by
    * the top byte of the 64-bit perceptual hash, so MERGE-on-phash
    * anti-joins only the partitions the staged batch touches. */
  def phashPartition(keyCol: String = "phash"): PartitionSpec =
    PartitionSpec("__p", shiftrightunsigned(col(keyCol), 56))
}

/** `icelite` — a minimal Iceberg-style snapshot table (SURVEY.md §7.4).
  *
  * No Iceberg jar ships in `/opt/spark/jars`, so the observable semantics
  * the north rule needs are implemented directly:
  *  - data as immutable parquet batch directories under `table/data/`
  *  - JSON-free snapshot manifests `table/meta/v<N>.properties` listing the
  *    member batch dirs + row count (immutable once written)
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
  */
final class IceLite(spark: SparkSession, val dir: String,
    partition: Option[PartitionSpec] = None) {

  private def p(parts: String*): Path = Paths.get(dir, parts: _*)
  Files.createDirectories(p("meta"))
  Files.createDirectories(p("data"))

  final case class Snapshot(version: Int, batches: Seq[String], rowCount: Long)

  def currentVersion(): Int = {
    val cur = p("meta", "current.properties")
    if (!Files.exists(cur)) 0
    else {
      val props = new Properties()
      val in = Files.newInputStream(cur)
      try props.load(in) finally in.close()
      props.getProperty("version").toInt
    }
  }

  def snapshot(version: Int): Option[Snapshot] = {
    val f = p("meta", s"v$version.properties")
    if (!Files.exists(f)) None
    else {
      val props = new Properties()
      val in = Files.newInputStream(f)
      try props.load(in) finally in.close()
      val batches = props.getProperty("batches", "")
      Some(Snapshot(version,
        if (batches.isEmpty) Nil else batches.split(",").toSeq,
        props.getProperty("rowCount").toLong))
    }
  }

  def currentSnapshot(): Option[Snapshot] = {
    val v = currentVersion()
    if (v == 0) None else snapshot(v)
  }

  /** Read the current snapshot (empty-schema error if the table is empty —
    * callers create tables by appending). */
  def read(): DataFrame = readAt(currentVersion())

  def readAt(version: Int): DataFrame = {
    val s = snapshot(version)
      .getOrElse(throw new IllegalStateException(s"icelite: no snapshot v$version at $dir"))
    if (s.batches.isEmpty)
      throw new IllegalStateException(s"icelite: snapshot v$version is empty")
    partition match {
      case None => spark.read.parquet(s.batches.map(b => p("data", b).toString): _*)
      case Some(ps) =>
        // each batch root is its own partitioned layout — discover per batch
        // and union (multi-root discovery rejects sibling partition trees)
        s.batches.map(b => spark.read.parquet(p("data", b).toString).drop(ps.name))
          .reduce(_ unionByName _)
    }
  }

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
      v <- values
      d = p("data", b, s"${ps.name}=$v") if Files.exists(d)
    } yield d.toString
  }

  /** Append `df` as a new snapshot (no dedup). Returns rows appended. */
  def append(df: DataFrame): Long = commit(df)

  /** MERGE-INTO … WHEN NOT MATCHED THEN INSERT on `keyCol`: stage rows whose
    * key is absent from the current snapshot (staged side deduped on the key
    * first), append them. Returns rows inserted. On a partitioned table the
    * anti-join reads only the partitions the staged rows hash into. */
  def mergeInsert(df: DataFrame, keyCol: String): Long = {
    val staged = df.dropDuplicates(keyCol)
    val hasData = currentSnapshot().exists(_.batches.nonEmpty)
    (partition, hasData) match {
      case (Some(ps), true) =>
        val stagedP = staged.withColumn(ps.name, ps.expr).persist()
        try {
          // distinct partition values: bounded by the partition-space size
          // (256 for the phash layout) — a deliberate, bounded collect
          val touched = stagedP.select(ps.name).distinct().collect()
            .map(_.get(0).toString).toSeq
          val dirs = partitionDirs(touched)
          val novel =
            if (dirs.isEmpty) stagedP.drop(ps.name)
            else stagedP.join(spark.read.parquet(dirs: _*).select(keyCol),
              Seq(keyCol), "left_anti").drop(ps.name)
          commit(novel)
        } finally stagedP.unpersist()
      case (_, true) =>
        commit(staged.join(read().select(keyCol), Seq(keyCol), "left_anti"))
      case (_, false) => commit(staged)
    }
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
      partition match {
        case Some(ps) =>
          cached.withColumn(ps.name, ps.expr)
            .write.mode("overwrite").partitionBy(ps.name)
            .parquet(p("data", batch).toString)
        case None =>
          cached.write.mode("overwrite").parquet(p("data", batch).toString)
      }
      val prev = currentSnapshot().map(_.batches).getOrElse(Nil)
      val prevCount = currentSnapshot().map(_.rowCount).getOrElse(0L)
      val props = new Properties()
      props.setProperty("version", v.toString)
      props.setProperty("batches", (prev :+ batch).mkString(","))
      props.setProperty("rowCount", (prevCount + rows).toString)
      writeProps(props, p("meta", s"v$v.properties"))
      val cur = new Properties()
      cur.setProperty("version", v.toString)
      writeProps(cur, p("meta", "current.properties"))
      rows
    } finally cached.unpersist()
  }

  private def writeProps(props: Properties, target: Path): Unit = {
    val tmp = target.resolveSibling("." + target.getFileName.toString + ".tmp")
    val out = Files.newOutputStream(tmp)
    try props.store(out, null) finally out.close()
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
