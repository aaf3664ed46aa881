package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import graft.url.{PyUrl, UrlNormalizer, UrlValidator}

/** Static, allocation-lean kernels invoked from generated code.
  *
  * These are the codegen targets of the URL expressions in
  * [[graft.functions.UrlExpressions]]: whole-stage codegen emits a direct
  * static call (`graft.functions.UrlKernels.normalizeUrl(x)`), keeping the
  * URL operators inside the WholeStageCodegen span instead of falling back
  * to interpreted eval. All operate on UTF8String to avoid extra copies at
  * the Tungsten row boundary (one UTF-8 decode/encode per call is the
  * unavoidable cost — the parsing itself is Java-String based).
  */
object UrlKernels {

  def normalizeUrl(url: UTF8String): UTF8String =
    UTF8String.fromString(UrlNormalizer.normalize(url.toString))

  def urlJoin(base: UTF8String, ref: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.urljoin(base.toString, ref.toString))

  /** netloc (host[:port]) — reference semantics `urlparse(url).netloc`
    * (`/root/reference/src/web_crawler.py:177,223`): includes the port, so
    * same-domain comparison distinguishes host:8080 from host. */
  def urlHost(url: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.urlparse(url.toString).netloc)

  def urlScheme(url: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.urlparse(url.toString).scheme)

  def urlPath(url: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.urlparse(url.toString).path)

  def urlQuery(url: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.urlparse(url.toString).query)

  def urlSyntacticOk(url: UTF8String): Boolean =
    UrlValidator.syntacticOk(url.toString)

  def urlSecurityOk(url: UTF8String): Boolean =
    UrlValidator.securityOk(url.toString)

  def urlSemanticOk(url: UTF8String): Boolean =
    UrlValidator.semanticOkPure(url.toString)

  private val HrefRe = java.util.regex.Pattern.compile(
    "(?is)<a\\b[^>]*?\\bhref\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>]+))")

  /** Codegen entry: href extraction returning Catalyst array data directly
    * (keeps [[graft.functions.ExtractHrefs]] inside WholeStageCodegen). */
  def extractHrefsArray(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val hrefs = extractHrefs(html.toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      hrefs.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  /** Document-order href extraction from an HTML payload — the regex subset
    * of the reference's BeautifulSoup `find_all("a", href=True)` projection
    * (`/root/reference/src/web_crawler.py:163-167`). Used when pages carry
    * raw HTML; the primary crawl path stores pre-extracted link arrays. */
  def extractHrefs(html: String): Array[String] = {
    val m = HrefRe.matcher(html)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (m.find()) {
      val href =
        if (m.group(1) != null) m.group(1)
        else if (m.group(2) != null) m.group(2)
        else m.group(3)
      out += href
    }
    out.toArray
  }
}
