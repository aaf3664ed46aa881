package graft

import graft.model.{CrawlConfig, PageRow}
import graft.operators.FrontierCrawler
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.concurrent.{ExecutionContext, Future}

/** Reference-compatible convenience facades
  * (`/root/reference/src/web_crawler.py:339-381`): one call, reference
  * defaults, no engine objects to hold. The full API (multi-seed frontier,
  * polite scheduling, checkpoint/resume, robots, reports) stays on
  * [[graft.operators.FrontierCrawler]].
  */
object WebCrawler {

  /** `crawl_async` equivalent — crawl and return the found URL set. */
  def crawlUrls(spark: SparkSession, pages: Dataset[PageRow], baseUrl: String,
      delay: Double = 0.1, maxRedirects: Int = 10, maxConcurrent: Int = 10,
      timeout: Int = 10): Set[String] = {
    val cfg = CrawlConfig(delay = delay, maxRedirects = maxRedirects,
      maxConcurrent = maxConcurrent, timeout = timeout)
    new FrontierCrawler(spark, pages, cfg).crawl(baseUrl).sortedFound.toSet
  }

  /** `crawl()` equivalent — crawl and print all found URLs sorted ascending
    * (`src/web_crawler.py:308-309,374-381`). */
  def crawl(spark: SparkSession, pages: Dataset[PageRow], baseUrl: String,
      delay: Double = 0.1, maxRedirects: Int = 10, maxConcurrent: Int = 10,
      timeout: Int = 10): Unit =
    crawlUrls(spark, pages, baseUrl, delay, maxRedirects, maxConcurrent, timeout)
      .toSeq.sorted.foreach(println)

  /** Non-blocking variant of [[crawlUrls]] (the `async` in `crawl_async`). */
  def crawlAsync(spark: SparkSession, pages: Dataset[PageRow], baseUrl: String,
      delay: Double = 0.1, maxRedirects: Int = 10, maxConcurrent: Int = 10,
      timeout: Int = 10)(implicit ec: ExecutionContext): Future[Set[String]] =
    Future(crawlUrls(spark, pages, baseUrl, delay, maxRedirects, maxConcurrent, timeout))
}
