package graft.oracle

import graft.model.{CrawlConfig, PageRow}
import graft.url.{PyUrl, RedirectLoop, UrlNormalizer}
import scala.collection.mutable

/** Driver-side replay of the reference crawler's exact algorithm
  * (`/root/reference/src/web_crawler.py:190-332`) over an in-memory page map
  * — the parity oracle for the Spark engine (SURVEY.md §5.2 item 3).
  *
  * Determinism model: the reference's asyncio gather runs `_crawl_single_url`
  * concurrently, but all shared-state *reads* of `visited_urls` inside the
  * batch see the pre-batch snapshot (marking happens only in the merge loop
  * at `:275-291`), and counter increments are commutative, so the outcome is
  * a deterministic function of (pages, seed, config). This oracle evaluates
  * each batch row against the pre-batch visited set, then merges in batch
  * order — exactly the semantics the Spark engine must reproduce.
  */
object ReferenceCrawler {

  final case class Outcome(
      found: Set[String],
      visitOrder: Vector[(Int, Int, String)], // (round, batchIdx, url)
      errorUrls: Set[String],
      redirectUrls: Set[String],
      errorCount: Long,
      redirectCount: Long,
      rounds: Int)

  private sealed trait Fetch
  private final case class Ok(finalUrl: String, chain: List[String], status: Int,
      links: Seq[String]) extends Fetch
  private final case class NetworkErr(finalUrl: String, chain: List[String]) extends Fetch
  private final case class LoopErr(chain: List[String]) extends Fetch

  /** follow_redirects (`redirect_handler.py:76-156`) against the page map. */
  private def follow(pages: Map[String, PageRow], url: String, cfg: CrawlConfig): Fetch = {
    var chain = List(url)
    var current = url
    var i = 0
    while (i < cfg.maxRedirects) {
      pages.get(current) match {
        case None => return NetworkErr(current, chain) // GET failed (`:151-153`)
        case Some(p) =>
          if (Set(301, 302, 303, 307, 308).contains(p.status)) {
            p.location match {
              case None | Some("") =>
                return Ok(current, chain, p.status, p.links) // no Location (`:109-117`)
              case Some(loc) =>
                val target = PyUrl.urljoin(current, loc)
                val v = RedirectLoop.detect(chain, target, cfg.maxRedirects)
                if (v.isLoop) return LoopErr(chain)
                chain = chain :+ target
                current = target
            }
          } else return Ok(current, chain, p.status, p.links)
      }
      i += 1
    }
    LoopErr(chain) // max redirects exhausted (`:156`)
  }

  def crawl(pages: Map[String, PageRow], baseUrl: String, cfg: CrawlConfig): Outcome = {
    val seed = UrlNormalizer.normalize(baseUrl)
    val baseDomain = PyUrl.urlparse(seed).netloc
    val visited = mutable.LinkedHashSet[String]()
    val found = mutable.LinkedHashSet[String]()
    val errorUrls = mutable.Set[String]()
    val redirectUrls = mutable.Set[String]()
    var errorCount = 0L
    var redirectCount = 0L
    val queue = mutable.Queue[String](seed)
    val visitOrder = Vector.newBuilder[(Int, Int, String)]
    var round = 0

    def finish(): Outcome = Outcome(found.toSet, visitOrder.result(), errorUrls.toSet,
      redirectUrls.toSet, errorCount, redirectCount, round)

    while (queue.nonEmpty) {
      // batch build (`src/web_crawler.py:247-265`)
      val batch = mutable.ArrayBuffer[String]()
      while (queue.nonEmpty && batch.length < cfg.maxConcurrent) {
        val cur = queue.dequeue()
        if (!visited.contains(cur)) {
          val norm = UrlNormalizer.normalize(cur)
          if (PyUrl.urlparse(norm).netloc == baseDomain) batch += norm
        }
      }
      if (batch.isEmpty) return finish()

      val visitedPre = visited.toSet
      // concurrent stage (`:270-272`): each row sees visitedPre only
      val results: Seq[Seq[String]] = batch.map { url =>
        follow(pages, url, cfg) match {
          case LoopErr(_) =>
            errorCount += 1; errorUrls += url; Nil // caught at `:142-146`
          case NetworkErr(fin, chain) =>
            if (chain.length > 1) { redirectCount += 1; redirectUrls += url }
            if (fin != url && PyUrl.urlparse(fin).netloc != baseDomain) Nil // `:111-114`
            else if (fin != url && visitedPre.contains(fin)) Nil            // `:117-119`
            else {
              val u = if (fin != url) fin else url
              errorCount += 1; errorUrls += u; Nil // `:126-130`
            }
          case Ok(fin, chain, status, links) =>
            if (chain.length > 1) { redirectCount += 1; redirectUrls += url }
            if (fin != url && PyUrl.urlparse(fin).netloc != baseDomain) Nil
            else if (fin != url && visitedPre.contains(fin)) Nil
            else {
              val u = if (fin != url) fin else url
              if (status >= 400) { errorCount += 1; errorUrls += u; Nil } // `:136-140`
              else links.flatMap { href =>                                // `:163-181`
                val abs = PyUrl.urljoin(u, href)
                val norm = UrlNormalizer.normalize(abs)
                if (PyUrl.urlparse(norm).netloc == baseDomain && !visitedPre.contains(norm))
                  Some(norm)
                else None
              }
            }
        }
      }.toSeq

      // merge loop (`:275-291`): sequential, in batch order
      batch.zipWithIndex.foreach { case (url, i) =>
        visited += url
        found += url
        visitOrder += ((round, i, url))
        results(i).foreach { d => if (!visited.contains(d)) queue += d }
      }
      round += 1
    }
    finish()
  }
}
