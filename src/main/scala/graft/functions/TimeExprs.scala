package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType}

/** TIMEZONE-INDEPENDENT micros extraction for `TIMESTAMP_NTZ` — the
  * zone-map encoding fix (ADVICE r12): an NTZ value is ALREADY stored
  * as micros-since-epoch-of-the-wall-clock internally, so its stats
  * encoding must be that long VERBATIM. The previous spelling
  * (`cast(TimestampType)` + `unix_micros`) shifted by
  * `spark.sql.session.timeZone`, while the catalyst NTZ literals the
  * pruning side compares against are unshifted — under any non-UTC
  * session the committed bounds were offset and boundary files could
  * be wrongly pruned (silent row loss). This expression is the
  * identity on the internal representation: no conversion, no session
  * state, codegen'd. */
final case class NtzMicros(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == TimestampNTZType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ntz_micros expects TIMESTAMP_NTZ, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): NtzMicros =
    copy(child = newChild)
  override def prettyName: String = "ntz_micros"
}

object TimeExprs {
  /** `Column` wrapper for [[NtzMicros]]. */
  def ntzMicros(c: Column): Column =
    GraftBridge.column(NtzMicros(GraftBridge.expression(c)))
}
