package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object RobotsKernels {

  private val Star = UTF8String.fromString("*")
  private val Dollar = UTF8String.fromString("$")

  /** RFC 9309 §2.2.3 wildcard rule match over raw UTF-8 bytes: `*` matches
    * any (possibly empty) byte sequence, a trailing `$` anchors the match
    * to the end of the path; without `$` the rule matches any PREFIX of
    * the path (the classic robots semantics). Byte-level comparison is
    * correct because `*`/`$` are ASCII and UTF-8 never embeds an ASCII
    * byte inside a multi-byte sequence. Iterative single-star backtracking
    * — no regex, no allocation beyond the two byte views. */
  private def wildcardMatch(path: Array[Byte], pathLen: Int, pat: Array[Byte],
      patLen: Int, anchored: Boolean): Boolean = {
    var s = 0; var p = 0
    var star = -1; var ss = 0
    while (s < pathLen) {
      if (!anchored && p == patLen) return true // pattern consumed: prefix hit
      if (p < patLen && pat(p) == '*') { star = p; p += 1; ss = s }
      else if (p < patLen && pat(p) == path(s)) { p += 1; s += 1 }
      else if (star >= 0) { p = star + 1; ss += 1; s = ss }
      else return false
    }
    // path consumed — trailing stars match empty
    while (p < patLen && pat(p) == '*') p += 1
    p == patLen
  }

  /** Best (longest) matching rule length over a rule list, in CHARACTERS
    * — the HOF the plain-prefix path replaces compares `length(p)`, a
    * character count, so ties between multi-byte and ASCII rules must
    * break the same way; wildcard rules count as written (`*`/`$`
    * included), the RFC's most-octets specificity on the rule text (the
    * common crawler implementation choice). Rules containing no `*`/`$`
    * take the zero-allocation `startsWith` fast path with behavior
    * identical to the pre-wildcard kernel. Null rule elements are skipped
    * (the HOF's `filter` drops them: a null predicate result excludes the
    * element). */
  def bestMatchLen(path: UTF8String, rules: ArrayData): Int = {
    var best = 0
    var pathBytes: Array[Byte] = null
    val n = rules.numElements()
    var i = 0
    while (i < n) {
      if (!rules.isNullAt(i)) {
        val p = rules.getUTF8String(i)
        val wild = p.contains(Star) || p.contains(Dollar)
        val hit =
          if (!wild) path.startsWith(p)
          else {
            if (pathBytes == null) pathBytes = path.getBytes
            val pb = p.getBytes
            val anchored = pb.length > 0 && pb(pb.length - 1) == '$'
            val patLen = if (anchored) pb.length - 1 else pb.length
            // anchored rules anchor at the CANONICAL resource boundary:
            // the scheduler matches against `url_path(url) + "/"` (the
            // canonicalizer strips trailing slashes, and the appended
            // slash lets a rule `/a/` match the URL whose `/a/` normalized
            // to `/a`), so `$` must also accept the subject with that one
            // trailing slash removed — otherwise no `$` rule could ever
            // fire through politeBatch
            wildcardMatch(pathBytes, pathBytes.length, pb, patLen, anchored) ||
              (anchored && pathBytes.length > 0 &&
                pathBytes(pathBytes.length - 1) == '/' &&
                wildcardMatch(pathBytes, pathBytes.length - 1, pb, patLen,
                  anchored = true))
          }
        if (hit) {
          val l = p.numChars()
          if (l > best) best = l
        }
      }
      i += 1
    }
    best
  }

  /** RFC 9309 §2.2.2 longest-match verdict: among the rules whose prefix
    * matches `path`, the longest wins; Allow wins length ties; no match on
    * either side (0 ≤ 0) allows. */
  def longestMatchAllowed(path: UTF8String, dis: ArrayData, allow: ArrayData): Boolean =
    bestMatchLen(path, dis) <= bestMatchLen(path, allow)
}

/** Codegen'd RFC 9309 longest-match rule evaluation — the per-row verdict
  * the polite scheduler runs for every eligible frontier row whose host
  * carries prefix rules (reference grammar: `/root/reference/src/
  * web_crawler.py` honors robots.txt via its fetch path; the prefix
  * semantics follow RFC 9309 §2.2.2). The HOF formulation it replaces —
  * `aggregate(filter(rules, p -> startswith(path, p)), 0, (a,p) ->
  * greatest(a, length(p)))` on each side — evaluates two interpreted
  * lambdas per rule element OUTSIDE whole-stage codegen; at 10^7 hosts ×
  * millions of eligible rows per round that interpreter overhead sits on
  * the scheduling hot path. This expression is one JIT-compiled loop per
  * side, fused into the surrounding filter's codegen stage.
  *
  * `TRUE` iff the best matching Allow rule is at least as specific
  * (character length) as the best matching Disallow rule. Rules carrying
  * the RFC 9309 §2.2.3 metacharacters (`*` any-sequence, trailing `$`
  * end-anchor — "crawlers MUST support" both) evaluate through the
  * byte-level wildcard matcher; plain rules stay on the zero-allocation
  * prefix fast path. Null on any null input — identical to the HOF (a
  * null rule array poisons the fold, and the filter then drops the row).
  */
case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "robots_allowed"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val pathOk = first.dataType.isInstanceOf[StringType]
    def rulesOk(e: Expression) = e.dataType match {
      case ArrayType(_: StringType, _) => true
      case _ => false
    }
    if (pathOk && rulesOk(second) && rulesOk(third)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, ARRAY<STRING>, ARRAY<STRING>), got " +
        children.map(_.dataType.catalogString).mkString(", "))
  }
  override protected def nullSafeEval(path: Any, dis: Any, allow: Any): Any =
    RobotsKernels.longestMatchAllowed(path.asInstanceOf[UTF8String],
      dis.asInstanceOf[ArrayData], allow.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, d, a) =>
      s"${ev.value} = graft.functions.RobotsKernels.longestMatchAllowed($p, $d, $a);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RobotsAllowed =
    copy(first = f, second = s, third = t)
}

object RobotsFunctions {
  /** TRUE iff RFC 9309 longest-match over (disallow, allow) prefix rules
    * admits `path`. */
  def robots_allowed(path: Column, disallow: Column, allow: Column): Column =
    CB.column(RobotsAllowed(CB.expression(path), CB.expression(disallow),
      CB.expression(allow)))

  def registerAll(spark: SparkSession): Unit =
    FunctionTable.register(spark, FunctionTable.byName("robots_allowed"))
}
