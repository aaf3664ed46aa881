package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-card generator: one command over a curation run's output
  * directory (`CurateCli` / `ImageCurateCli` shape: `curated/` plus
  * `audit/<stage>/`) producing the governance receipt a dataset release
  * ships with — row counts, per-stage drop counts, split sizes, caption
  * and text statistics, resolution histogram — as one JSON document
  * (`card.json` in the output dir, also printed).
  *
  * Everything is a bounded aggregate: per-stage drops are audit-relation
  * counts, the caption/text stats are single hash-aggs over slim columns,
  * and the only `collect`s are over ≤ `topK` rows (top captions/languages)
  * or the split names — nothing scales with the corpus. Payload bytes are
  * never read: the card describes the table from its slim columns.
  */
object CardCli {

  private val Usage =
    """usage: CardCli <run-output-dir> [--top-k 5]
      |
      |  <run-output-dir>  A CurateCli/ImageCurateCli output directory
      |                    (curated/ + audit/*); writes card.json there
      |  --top-k K         How many top captions/languages/sources to
      |                    list (default 5)""".stripMargin

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** `{"name":count,...}` sorted by descending count then name. */
  private def countsJson(m: Seq[(String, Long)]): String =
    m.sortBy { case (k, v) => (-v, k) }
      .map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")

  private[graft] def run(spark: SparkSession, args: Array[String]): String = {
    var pos = Vector.empty[String]
    var topK = 5
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--top-k" =>
          i += 1
          if (i >= args.length) throw CurateCli.CliUsageError("--top-k requires a value")
          topK = try args(i).toInt catch {
            case _: NumberFormatException =>
              throw CurateCli.CliUsageError(s"--top-k: not a number: '${args(i)}'")
          }
        case flag if flag.startsWith("--") =>
          throw CurateCli.CliUsageError(s"unknown flag: $flag")
        case p => pos :+= p
      }
      i += 1
    }
    if (pos.length != 1) throw CurateCli.CliUsageError("run-output-dir is required")
    val dir = pos.head
    val fs = graft.io.StateFs(spark)

    def tableIfExists(path: String): Option[DataFrame] =
      if (!fs.exists(path)) None
      else try {
        val df = spark.read.parquet(path)
        if (df.columns.isEmpty) None else Some(df)
      } catch { case _: Exception => None } // empty partitioned dir etc.

    val curated = tableIfExists(s"$dir/curated").getOrElse(
      throw CurateCli.CliUsageError(s"no readable curated/ table under $dir"))
    val cols = curated.columns.toSet
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]

    // one aggregate pass over the slim columns of the curated table
    val rows = curated.count()
    parts += s""""rows":$rows"""

    if (cols("split") && rows > 0) {
      val sp = curated.groupBy(col("split").cast("string").as("split"))
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      parts += s""""splits":${countsJson(sp)}"""
    }
    for (c <- Seq("lang", "source", "fmt") if cols(c) && rows > 0) {
      val top = curated.filter(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("k")).count()
        .orderBy(desc("count"), col("k")).limit(topK)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      parts += s""""top_$c":${countsJson(top)}"""
    }
    if (cols("caption") && rows > 0) {
      val st = curated.agg(
        countDistinct("caption"), avg(length(col("caption")))).head()
      parts += s""""distinct_captions":${st.getLong(0)}"""
      parts += f""""avg_caption_chars":${st.getDouble(1)}%.1f"""
      val top = curated.groupBy("caption").count()
        .orderBy(desc("count"), col("caption")).limit(topK)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      parts += s""""top_captions":${countsJson(top)}"""
    }
    if (cols("text") && rows > 0) {
      val st = curated.agg(
        sum(size(split(col("text"), " "))), avg(length(col("text")))).head()
      parts += s""""total_tokens":${st.getLong(0)}"""
      parts += f""""avg_text_chars":${st.getDouble(1)}%.1f"""
    }
    if (cols("w") && cols("h") && rows > 0) {
      // resolution histogram by megapixel-ish bands over the RECORDED
      // dims (the card describes the table as shipped)
      val band = when(col("w") * col("h") < 256 * 256, "lt_0.07MP")
        .when(col("w") * col("h") < 1024 * 1024, "0.07-1MP")
        .otherwise("gte_1MP")
      val hist = curated.groupBy(band.as("k")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      parts += s""""resolution_bands":${countsJson(hist)}"""
    }

    // per-stage drop receipts from the audit relations
    val auditNames = Seq("dropped_quality", "dropped_gates", "dropped_decontam",
      "dropped_byte_exact", "dropped_alignment", "dropped_exact",
      "dropped_near_dup", "dropped_semantic", "dropped_caption_cap",
      "pii_hits", "span_removed")
    val audits = auditNames.flatMap { name =>
      tableIfExists(s"$dir/audit/$name").map(df => name -> df.count())
    }
    if (audits.nonEmpty)
      parts += s""""audits":${countsJson(audits)}"""

    val json = parts.mkString("{", ",", "}")
    fs.writeAtomic(s"$dir/card.json") { os =>
      os.write(json.getBytes("UTF-8"))
    }
    println(json)
    json
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-card")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .getOrCreate()
    try {
      run(spark, args)
      ()
    } catch {
      case e: CurateCli.CliUsageError =>
        System.err.println(e.getMessage); System.err.println(Usage); sys.exit(2)
      case e: Exception =>
        System.err.println(s"card failed: $e"); sys.exit(1)
    } finally spark.stop()
  }
}
