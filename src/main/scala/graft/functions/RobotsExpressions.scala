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

  /** Best (longest) matching prefix length over a rule list, in CHARACTERS
    * — the HOF it replaces compares `length(p)`, which is a character
    * count, so ties between multi-byte and ASCII rules must break the same
    * way. Null rule elements are skipped (the HOF's `filter` drops them:
    * a null predicate result excludes the element). */
  def bestMatchLen(path: UTF8String, rules: ArrayData): Int = {
    var best = 0
    val n = rules.numElements()
    var i = 0
    while (i < n) {
      if (!rules.isNullAt(i)) {
        val p = rules.getUTF8String(i)
        if (path.startsWith(p)) {
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
  * `TRUE` iff the best matching Allow prefix is at least as specific
  * (character length) as the best matching Disallow prefix. Null on any
  * null input — identical to the HOF (a null rule array poisons the fold,
  * and the filter then drops the row).
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
