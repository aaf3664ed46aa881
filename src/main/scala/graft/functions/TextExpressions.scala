package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object TextKernels {

  /** Winnowing-style document fingerprint: minimum polynomial hash over
    * character 8-grams — semantically identical to the SQL formulation
    *   array_min(transform(sequence(1, greatest(len-7, 1)),
    *     i -> aggregate(sequence(0,7), 0L, (acc,k) -> acc*31 + ascii(substr(s,i+k,1)))))
    * (characters past the end contribute 0, matching `ascii('') = 0`), but
    * runs as one JIT-compiled pass instead of per-position interpreted
    * higher-order-function lambdas — ~100× faster on long documents.
    */
  def rollingFingerprint(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    val positions = math.max(n - 7, 1)
    var minH = Long.MaxValue
    var i = 0
    while (i < positions) {
      var h = 0L
      var k = 0
      while (k < 8) {
        val c = if (i + k < n) str.charAt(i + k).toLong else 0L
        h = h * 31L + c
        k += 1
      }
      if (h < minH) minH = h
      i += 1
    }
    minH
  }
}

/** Codegen'd native expression for the document fingerprint (SURVEY.md
  * §2.10 pattern: custom Expression > interpreted HOFs > UDF). */
case class TextFingerprint(child: Expression)
    extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.rollingFingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.rollingFingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): TextFingerprint =
    copy(child = newChild)
}

object TextFunctions {
  def text_fingerprint(c: Column): Column = CB.column(TextFingerprint(CB.expression(c)))

  def registerAll(spark: SparkSession): Unit =
    FunctionTable.register(spark, FunctionTable.byName("text_fingerprint"))
}
