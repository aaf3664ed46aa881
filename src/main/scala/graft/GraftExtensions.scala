package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions entry point for spark-submit deployments:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * registers the engine's codegen'd expression family (URL canonicalization
  * and predicates, href extraction, rolling-hash fingerprint, image phash /
  * PSNR) into every session's FunctionRegistry at session-build time — the
  * SQL surface (`SELECT normalize_url(url) ...`) works on a cluster without
  * any driver code calling the `registerAll` helpers. The in-code Column
  * DSL (`UrlFunctions.normalize_url($"url")`) is unaffected either way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private type Builder = Seq[Expression] => Expression

  private def fn(name: String, arity: Int)(b: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (es: Seq[Expression]) => {
        require(es.length == arity, s"$name expects $arity argument(s), got ${es.length}")
        b(es)
      })

  override def apply(e: SparkSessionExtensions): Unit = Seq(
    fn("normalize_url", 1)(es => NormalizeUrl(es.head)),
    fn("url_resolve", 2)(es => UrlResolve(es(0), es(1))),
    fn("url_host", 1)(es => UrlHost(es.head)),
    fn("url_path", 1)(es => UrlPath(es.head)),
    fn("url_syntactic_valid", 1)(es => UrlSyntacticValid(es.head)),
    fn("url_security_valid", 1)(es => UrlSecurityValid(es.head)),
    fn("extract_hrefs", 1)(es => ExtractHrefs(es.head)),
    fn("text_fingerprint", 1)(es => TextFingerprint(es.head)),
    fn("phash64", 1)(es => PHash64(es.head)),
    fn("image_psnr", 2)(es => ImagePsnr(es(0), es(1)))
  ).foreach(e.injectFunction)
}
