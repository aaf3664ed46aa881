package graft

import graft.functions.FunctionTable
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions entry point for spark-submit deployments:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects the engine's codegen'd expression family (URL canonicalization
  * and predicates, href extraction, rolling-hash fingerprint, image phash /
  * PSNR) into every session's FunctionRegistry at session-build time — the
  * SQL surface (`SELECT normalize_url(url) ...`) works on a cluster without
  * any driver code calling the `registerAll` helpers. Both paths consume
  * [[graft.functions.FunctionTable]], the single function list, so they
  * cannot diverge. The in-code Column DSL is unaffected either way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    FunctionTable.all.foreach { f =>
      e.injectFunction((FunctionIdentifier(f.name),
        new ExpressionInfo(classOf[GraftExtensions].getName, f.name),
        FunctionTable.builder(f)))
    }
}
