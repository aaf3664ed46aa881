package graft

import graft.ops.IvfIndex
import org.apache.spark.sql.SparkSession

/** spark-submit entry for IVF index maintenance: the operational consumer
  * of [[graft.ops.IvfIndex#needsRebuild]]. A serving pipeline appends
  * freshly embedded vectors between sessions ([[graft.ops.IvfIndex#append]]
  * — frozen quantizer, map-only); this CLI is the scheduled counterpart
  * that checks the drift ratio and, past threshold, refits the quantizer
  * from the index's own posting lists and atomically flips the generation
  * pointer ([[graft.ops.IvfIndex.maintain]]). Engine surface (no reference
  * counterpart — the reference has no ANN index).
  *
  * Exit codes follow the CrawlCli convention: 0 success (whether or not a
  * rebuild was due), 2 bad usage, 1 runtime failure.
  */
object IvfMaintainCli {

  private val Usage =
    """usage: IvfMaintainCli <index-dir> [--threshold F] [--nlists N] [--force]
      |
      |  <index-dir>    Persisted IVF index (any Hadoop FS scheme)
      |  --threshold F  Rebuild when appends exceed F × built corpus
      |                 (default 0.5 — IvfIndex.needsRebuild's cue)
      |  --nlists N     Re-partition into N posting lists (default: keep)
      |  --force        Rebuild regardless of the drift ratio""".stripMargin

  private[graft] final case class CliUsageError(msg: String) extends Exception(msg)

  /** Parse + execute; returns whether a rebuild ran. Separated from main
    * for spec-level driving without a JVM exit. */
  private[graft] def run(spark: SparkSession, args: Array[String]): Boolean = {
    var dir: Option[String] = None
    var threshold = 0.5
    var nLists: Option[Int] = None
    var force = false
    var i = 0
    def value(flag: String): String = {
      i += 1
      if (i >= args.length) throw CliUsageError(s"$flag requires a value")
      args(i)
    }
    while (i < args.length) {
      args(i) match {
        case "--threshold" => threshold =
          try value("--threshold").toDouble
          catch { case _: NumberFormatException =>
            throw CliUsageError("--threshold: not a number") }
        case "--nlists" => nLists =
          try Some(value("--nlists").toInt)
          catch { case _: NumberFormatException =>
            throw CliUsageError("--nlists: not an integer") }
        case "--force" => force = true
        case flag if flag.startsWith("-") => throw CliUsageError(s"unknown flag: $flag")
        case pos if dir.isEmpty => dir = Some(pos)
        case pos => throw CliUsageError(s"unexpected argument: $pos")
      }
      i += 1
    }
    val d = dir.getOrElse(throw CliUsageError("index-dir is required"))
    val before = IvfIndex.load(spark, d)
    val frac = before.appendedFraction
    // --force = threshold below any possible ratio (appendedFraction ≥ 0)
    val rebuilt = IvfIndex.maintain(spark, d,
      threshold = if (force) -1.0 else threshold, nLists = nLists)
    val after = if (rebuilt) IvfIndex.load(spark, d) else before
    println(f"""{"index":"$d","appended_fraction":$frac%.4f,""" +
      s""""threshold":$threshold,"rebuilt":$rebuilt,""" +
      s""""rows":${after.rows},"built_rows":${after.builtRows},""" +
      s""""n_lists":${after.nLists},"gen":${after.gen.getOrElse(-1)}}""")
    rebuilt
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-ivf-maintain")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .getOrCreate()
    try run(spark, args)
    catch {
      case e: CliUsageError =>
        System.err.println(s"${e.getMessage}\n$Usage"); sys.exit(2)
      case e: Exception =>
        System.err.println(s"Error: ${e.getMessage}"); sys.exit(1)
    } finally spark.stop()
  }
}
