package graft

import graft.model.{CrawlConfig, PageRow}
import graft.operators.{CrawlReport, FrontierCrawler}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit
import java.time.LocalDateTime

/** CLI crawl entry (S1 in SURVEY.md §2.1) — the `bin/web-crawler` contract
  * (`/root/reference/bin/web-crawler:18-43`) as a spark-submit main, with
  * argparse-parity UX: `--help` prints usage + option help + examples and
  * exits 0; unknown or malformed flags print usage to stderr and exit 2;
  * runtime crawl errors print `Error: …` and exit 1.
  *
  * `--pages` points at a parquet relation with the [[graft.model.PageRow]]
  * schema (the synthetic web; a live HTTP fetcher would replace that scan).
  * Prints all found URLs sorted ascending (`src/web_crawler.py:308-309`)
  * and writes the 4-file report folder.
  */
object CrawlCli {

  private val Usage =
    """usage: CrawlCli <base-url> --pages <parquet>
      |                [--delay D] [--max-redirects N] [--max-concurrent N]
      |                [--timeout SECONDS] [--runs-dir DIR]
      |                [--checkpoint-dir DIR] [--polite]
      |                [--trap-cap N] [--content-dedup]
      |                [--latency-target MS] [-h | --help]""".stripMargin

  private val Help = Usage +
    """
      |
      |Recursively crawl a website and extract all URLs within the same domain.
      |
      |positional arguments:
      |  base-url              The base URL to start crawling from
      |
      |options:
      |  --pages PARQUET       Pages relation (PageRow schema) — required
      |  --delay D             Delay between requests in seconds (default: 0.1)
      |  --max-redirects N     Maximum redirects to follow per URL (default: 10)
      |  --max-concurrent N    Maximum concurrent requests (default: 10)
      |  --timeout SECONDS     Total per-fetch timeout (default: 10)
      |  --runs-dir DIR        Report folder root (default: crawling_runs)
      |  --checkpoint-dir DIR  Resume-state directory (default: temp)
      |  --polite              Scale scheduler: per-host politeness, multi-domain
      |  --trap-cap N          Crawl-trap guard: admit at most N URLs per
      |                        URL pattern (polite mode; default: off)
      |  --content-dedup       Skip link extraction on mirror pages whose
      |                        resolved link set repeats (polite mode)
      |  --latency-target MS   Latency-adaptive politeness: hosts whose
      |                        smoothed fetch latency exceeds MS get their
      |                        per-round slots scaled by MS/ewma, floor 1
      |                        (polite mode; default: off)
      |  -h, --help            Show this help message and exit
      |
      |Examples:
      |  CrawlCli https://example.com --pages web.parquet
      |  CrawlCli https://example.com --pages web.parquet --delay 0.5
      |  CrawlCli https://example.com --pages web.parquet --max-redirects 5
      |  CrawlCli https://example.com --pages web.parquet --max-concurrent 20""".stripMargin

  /** Bad usage (argparse exit code 2). */
  private[graft] final case class CliUsageError(msg: String) extends Exception(msg)
  /** `-h`/`--help` (argparse exit code 0). */
  private[graft] final class HelpRequested extends Exception

  private def die(msg: String): Nothing = throw CliUsageError(msg)

  /** argparse-style parse: (positional base-url, value options, flags).
    * Throws [[CliUsageError]] / [[HelpRequested]] — `main` maps them to the
    * reference CLI's exit codes. */
  private[graft] def parseArgs(args: Array[String]): (String, Map[String, String], Set[String]) = {
    val valueFlags = Set("--pages", "--delay", "--max-redirects", "--max-concurrent",
      "--timeout", "--runs-dir", "--checkpoint-dir", "--trap-cap", "--latency-target")
    var positional = List.empty[String]
    var opts = Map.empty[String, String]
    var flags = Set.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-h" | "--help" => throw new HelpRequested
        case "--polite" => flags += "--polite"; i += 1
        case "--content-dedup" => flags += "--content-dedup"; i += 1
        case f if valueFlags(f) =>
          if (i + 1 >= args.length) die(s"option $f requires a value")
          opts += f -> args(i + 1); i += 2
        case f if f.startsWith("-") => die(s"unrecognized argument: $f")
        case pos => positional ::= pos; i += 1
      }
    }
    positional match {
      case Nil => die("the following arguments are required: base-url")
      case one :: Nil =>
        if (!opts.contains("--pages")) die("--pages <parquet> is required")
        (one, opts, flags)
      case more => die(s"unexpected extra arguments: ${more.reverse.tail.mkString(" ")}")
    }
  }

  def main(args: Array[String]): Unit = {
    val (baseUrl, opts, flags) =
      try parseArgs(args)
      catch {
        case _: HelpRequested => println(Help); sys.exit(0)
        case CliUsageError(msg) =>
          System.err.println(msg); System.err.println(Usage); sys.exit(2)
      }
    val pagesPath = opts("--pages")

    val spark = SparkSession.builder()
      .appName("graft-crawl")
      .config("spark.sql.session.timeZone", "UTC")
      // pages/image tables carry KB-scale payload columns (html, image
      // bytes): the parquet vectorized reader's default 4096-row column
      // batch grows ~MBs of on-heap vectors per scan task via repeated
      // doubling copies, which inverts multi-core scan scaling (BENCH.md
      // round 4: 4.1× at 32 cores once capped). Env-overridable.
      .config("spark.sql.parquet.columnarReaderBatchSize",
        sys.env.getOrElse("SPARK_GRAFT_PARQUET_BATCH", "1024"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    try {
      val cfg = CrawlConfig(
        delay = opts.get("--delay").map(_.toDouble).getOrElse(0.1),
        maxRedirects = opts.get("--max-redirects").map(_.toInt).getOrElse(10),
        maxConcurrent = opts.get("--max-concurrent").map(_.toInt).getOrElse(10),
        timeout = opts.get("--timeout").map(_.toInt).getOrElse(10),
        fifoParity = !flags.contains("--polite"),
        sameDomainOnly = !flags.contains("--polite"),
        trapPatternCap = opts.get("--trap-cap").map(_.toInt).getOrElse(0),
        contentDedup = flags.contains("--content-dedup"),
        latencyTargetMs = opts.get("--latency-target").map(_.toDouble).getOrElse(0.0),
        checkpointDir = opts.get("--checkpoint-dir"))
      val raw = spark.read.parquet(pagesPath)
      val pages = (if (raw.columns.contains("latencyMs")) raw
        else raw.withColumn("latencyMs", lit(null).cast("int"))).as[PageRow]

      val start = LocalDateTime.now()
      val crawler = new FrontierCrawler(spark, pages, cfg)
      val out =
        if (cfg.fifoParity) crawler.crawl(baseUrl)
        else crawler.crawlSeeds(Seq(baseUrl).toDF("url"))
      val end = LocalDateTime.now()

      out.sortedFound.foreach(println) // stdout contract (S4)
      val reportDir = CrawlReport.write(out, baseUrl, start, end,
        opts.getOrElse("--runs-dir", "crawling_runs"))
      System.err.println(s"report: $reportDir  stats: ${out.stats}")
      spark.stop()
    } catch {
      case e: Exception => // `bin/web-crawler:40-42`
        System.err.println(s"Error: ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
  }
}
