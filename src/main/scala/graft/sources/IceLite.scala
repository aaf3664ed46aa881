package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Properties

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
  */
final class IceLite(spark: SparkSession, val dir: String) {

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
    spark.read.parquet(s.batches.map(b => p("data", b).toString): _*)
  }

  def isEmpty: Boolean = currentSnapshot().forall(_.batches.isEmpty)

  /** Append `df` as a new snapshot (no dedup). Returns rows appended. */
  def append(df: DataFrame): Long = commit(df)

  /** MERGE-INTO … WHEN NOT MATCHED THEN INSERT on `keyCol`: stage rows whose
    * key is absent from the current snapshot (staged side deduped on the key
    * first), append them. Returns rows inserted. */
  def mergeInsert(df: DataFrame, keyCol: String): Long = {
    val staged = df.dropDuplicates(keyCol)
    val novel = currentSnapshot() match {
      case Some(s) if s.batches.nonEmpty =>
        staged.join(read().select(keyCol), Seq(keyCol), "left_anti")
      case _ => staged
    }
    commit(novel)
  }

  private def commit(df: DataFrame): Long = {
    val v = currentVersion() + 1
    val batch = f"batch-$v%05d"
    df.write.mode("overwrite").parquet(p("data", batch).toString)
    val rows = spark.read.parquet(p("data", batch).toString).count()
    if (rows == 0) { // empty commit: advance nothing, drop the empty batch dir
      deleteRecursive(p("data", batch))
      return 0L
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
  }

  private def writeProps(props: Properties, target: Path): Unit = {
    val tmp = target.resolveSibling("." + target.getFileName.toString + ".tmp")
    val out = Files.newOutputStream(tmp)
    try props.store(out, null) finally out.close()
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursive(path: Path): Unit =
    if (Files.exists(path))
      Files.walk(path).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
}
