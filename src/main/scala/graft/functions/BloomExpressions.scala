package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a broadcast Bloom filter (SURVEY.md
  * §2.4 J1 — the URL-seen prefilter on the crawl eligibility path).
  *
  * A Scala UDF here would box every urlHash and break WholeStageCodegen
  * fusion on the hottest filter in the engine; this expression instead
  * resolves the broadcast once per codegen instance into a mutable-state
  * field and probes it with a direct `mightContainLong` call, so the
  * eligibility filter stays fused with the surrounding stage.
  *
  * The broadcast handle (not the filter bytes) is what the plan captures:
  * executors resolve `bloomBc.value` locally, so a multi-GB seen-filter
  * ships once per executor, never per task or per plan.
  */
case class BloomMightContain(child: Expression, bloomBc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT key, got ${child.dataType.catalogString}")

  @transient private lazy val filter: BloomFilter = bloomBc.value

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcClass = classOf[Broadcast[_]].getName
    val bfClass = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc, bcClass)
    val f = ctx.addMutableState(bfClass, "graftBloom",
      v => s"$v = ($bfClass) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$f.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFunctions {
  /** True iff `key` (BIGINT) might be in the broadcast filter. */
  def bloom_might_contain(key: Column, bloomBc: Broadcast[BloomFilter]): Column =
    CB.column(BloomMightContain(CB.expression(key), bloomBc))
}
