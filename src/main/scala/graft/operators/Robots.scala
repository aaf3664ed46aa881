package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** robots.txt parsing into the polite scheduler's cache schema
  * `(host, disallow, disallowPrefixes, allowPrefixes, crawlDelay)`
  * (S3/J4 in SURVEY.md §2.1/§2.4).
  *
  * The reference never parses robots bodies (its operational probe only
  * checks reachability, `url_verifier.py:200-211`); a production crawler
  * must, so this rounds out the drop-in story: fetch `<host>/robots.txt`
  * bodies however you like, parse them here, and hand the relation to
  * [[FrontierCrawler]]'s `robots` parameter.
  *
  * Interpretation for the `User-agent: *` group (original robots.txt
  * convention + RFC 9309 rule precedence):
  *  - `Disallow: /` (exactly root) ⇒ `disallowAll`; the whole host is
  *    excluded unless an `Allow:` rule overrides for specific paths
  *  - `Disallow: <rule>` / `Allow: <rule>` ⇒ path rules; the LONGEST
  *    matching rule wins and Allow wins length ties (RFC 9309 §2.2.2); an
  *    empty `Disallow:` allows everything. Rules pass through verbatim —
  *    the RFC 9309 §2.2.3 `*`/`$` wildcards are evaluated at match time by
  *    [[graft.functions.RobotsKernels.bestMatchLen]] (plain rules are
  *    prefix matches)
  *  - `Crawl-delay: N` ⇒ per-host delay (seconds)
  *  - `Sitemap: <url>` ⇒ collected from ANYWHERE in the body (the
  *    sitemaps.org directive is group-independent), feeding
  *    [[graft.sources.Sitemaps.expand]] as discovery roots
  *  - records are separated by blank lines (the 1994 de-facto standard:
  *    a blank line terminates the current group) and also end at a
  *    `User-agent:` line that follows directives; consecutive `User-agent`
  *    lines share one group; later `*` groups override earlier ones
  *    (last-group-wins, the common crawler behavior); comments (`#…`) are
  *    stripped anywhere
  */
object Robots {

  /** Parsed `User-agent: *` rules of one robots body. */
  final case class RobotsRules(
      disallowAll: Boolean,
      disallowPrefixes: Seq[String],
      allowPrefixes: Seq[String],
      crawlDelay: Option[Double],
      sitemaps: Seq[String] = Nil)

  /** Pure single-body parse of the star group. */
  def parseBody(body: String): RobotsRules = {
    var inStar = false          // currently inside a User-agent: * group
    var inAgentRun = false      // last non-blank line was a User-agent line
    var result = RobotsRules(disallowAll = false, Nil, Nil, None)
    var sitemaps = List.empty[String]
    var gDisallowAll = false
    var gPrefixes = List.empty[String]
    var gAllows = List.empty[String]
    var gDelay: Option[Double] = None
    def closeGroup(): Unit = {
      if (inStar) result = RobotsRules(gDisallowAll, gPrefixes.reverse, gAllows.reverse, gDelay)
      inStar = false; gDisallowAll = false; gPrefixes = Nil; gAllows = Nil; gDelay = None
    }
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.isEmpty) {
        // blank line = end of record (1994 de-facto standard) — but only
        // once the record has rules: a blank between the User-agent line(s)
        // and the first rule stays inside the group (RFC 9309's ABNF allows
        // emptyline there, and 'User-agent: *\n\nDisallow: /x' is common
        // real-world formatting whose rule must not be dropped)
        if (!inAgentRun) closeGroup()
      } else {
        val i = line.indexOf(':')
        if (i > 0) {
          val key = line.substring(0, i).trim.toLowerCase
          val value = line.substring(i + 1).trim
          key match {
            case "user-agent" =>
              // a User-agent after directives starts a new group;
              // consecutive User-agent lines share one
              if (!inAgentRun) closeGroup()
              if (value == "*") inStar = true
              inAgentRun = true
            case "disallow" =>
              inAgentRun = false
              if (value == "/") gDisallowAll = true
              else if (value.nonEmpty) gPrefixes ::= value
            case "allow" =>
              inAgentRun = false
              if (value.nonEmpty) gAllows ::= value
            case "crawl-delay" =>
              inAgentRun = false
              gDelay = value.toDoubleOption.orElse(gDelay)
            case "sitemap" =>
              // group-independent: does NOT end a User-agent run and is
              // collected whether or not the star group is active
              if (value.nonEmpty) sitemaps ::= value
            case _ =>
              inAgentRun = false
          }
        }
      }
    }
    closeGroup()
    result.copy(sitemaps = sitemaps.reverse)
  }

  /** (host, body) relation → the scheduler cache `(host, disallow,
    * disallowPrefixes, allowPrefixes, crawlDelay)`. A narrow map — no
    * shuffle; at 10^7 hosts this is one pass over ~500 MB of robots
    * bodies. */
  def parse(bodies: Dataset[(String, String)]): DataFrame = {
    import bodies.sparkSession.implicits._
    bodies.map { case (host, body) =>
      val r = parseBody(body)
      (host, r.disallowAll, r.disallowPrefixes, r.allowPrefixes, r.crawlDelay,
        r.sitemaps)
    }.toDF("host", "disallow", "disallowPrefixes", "allowPrefixes", "crawlDelay",
      "sitemaps")
  }
}
