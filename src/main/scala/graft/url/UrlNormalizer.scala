package graft.url

import scala.util.control.NonFatal

/** URL canonicalization with the exact observable semantics of the
  * reference's normalizer (`/root/reference/src/utils/url_normalizer.py:10-82`):
  *
  *  - lowercase scheme and netloc
  *  - strip default port (`:80` for http, `:443` for https)
  *  - strip trailing slashes from the path except root (`rstrip('/')`)
  *  - drop the fragment
  *  - re-encode the query: parse with keep_blank_values, keep the LAST value
  *    per duplicate key, sort keys lexicographically, `urlencode` the result
  *  - keep `;params` untouched (reference passes `parsed.params` through)
  *  - any failure → return the input unchanged
  *
  * This is the canonical-key function for the URL-seen set: every URL is
  * normalized before hashing/dedup (SURVEY.md §2.3 C1).
  */
object UrlNormalizer {

  def normalize(url: String): String = {
    try {
      val p = PyUrl.urlparse(url)
      val scheme = p.scheme.toLowerCase
      var netloc = p.netloc.toLowerCase
      if (netloc.endsWith(":80") && scheme == "http") netloc = netloc.dropRight(3)
      else if (netloc.endsWith(":443") && scheme == "https") netloc = netloc.dropRight(4)
      var path = p.path
      if (path != "/" && path.endsWith("/")) path = path.reverse.dropWhile(_ == '/').reverse
      val query =
        if (p.query.nonEmpty) {
          // parse_qs keeps insertion order of first occurrence; keep-last value
          val pairs = PyUrl.parseQsl(p.query, keepBlank = true)
          val lastByKey = scala.collection.mutable.LinkedHashMap[String, String]()
          pairs.foreach { case (k, v) => lastByKey(k) = v }
          PyUrl.urlencode(lastByKey.toSeq.sortBy(_._1))
        } else ""
      PyUrl.urlunparse(UrlParts(scheme, netloc, path, p.params, query, ""))
    } catch {
      case NonFatal(_) => url
    }
  }
}
