package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** robots.txt parsing into the polite scheduler's cache schema
  * `(host, disallow, crawlDelay)` (S3/J4 in SURVEY.md §2.1/§2.4).
  *
  * The reference never parses robots bodies (its operational probe only
  * checks reachability, `url_verifier.py:200-211`); a production crawler
  * must, so this rounds out the drop-in story: fetch `<host>/robots.txt`
  * bodies however you like, parse them here, and hand the relation to
  * [[FrontierCrawler]]'s `robots` parameter.
  *
  * Minimal, standard interpretation for the `User-agent: *` group:
  *  - `Disallow: /` (exactly root, in the active group) ⇒ host disallowed
  *  - `Crawl-delay: N` in the active group ⇒ per-host delay (seconds)
  *  - groups end at the next `User-agent:` line that starts a new block;
  *    later `*` groups override earlier ones (last-group-wins, the common
  *    crawler behavior); comments (`#…`) and blank lines are ignored
  */
object Robots {

  /** Pure single-body parse → (disallowAll, crawlDelaySeconds). */
  def parseBody(body: String): (Boolean, Option[Double]) = {
    var inStar = false          // currently inside a User-agent: * group
    var sawAgentSinceBlank = false
    var disallow = false
    var delay: Option[Double] = None
    var groupDisallow = false
    var groupDelay: Option[Double] = None
    def closeGroup(): Unit = if (inStar) {
      disallow = groupDisallow
      delay = groupDelay
    }
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) {
          val key = line.substring(0, i).trim.toLowerCase
          val value = line.substring(i + 1).trim
          key match {
            case "user-agent" =>
              if (sawAgentSinceBlank) {
                // consecutive User-agent lines share one group; a User-agent
                // after directives starts a new group
              } else {
                closeGroup()
                inStar = false; groupDisallow = false; groupDelay = None
              }
              if (value == "*") inStar = true
              sawAgentSinceBlank = true
            case "disallow" =>
              sawAgentSinceBlank = false
              if (value == "/") groupDisallow = true
            case "crawl-delay" =>
              sawAgentSinceBlank = false
              groupDelay = value.toDoubleOption.orElse(groupDelay)
            case _ =>
              sawAgentSinceBlank = false
          }
        }
      }
    }
    closeGroup()
    (disallow, delay)
  }

  /** (host, body) relation → the scheduler cache `(host, disallow,
    * crawlDelay)`. A narrow map — no shuffle; at 10^7 hosts this is one
    * pass over ~500 MB of robots bodies. */
  def parse(bodies: Dataset[(String, String)]): DataFrame = {
    import bodies.sparkSession.implicits._
    bodies.map { case (host, body) =>
      val (dis, delay) = parseBody(body)
      (host, dis, delay)
    }.toDF("host", "disallow", "crawlDelay")
  }
}
