package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints of a string column, packed (pos << 32) | hash —
  * see [[graft.text.Winnowing]]. Codegen emits a direct static call so the
  * per-document rolling-hash + window-min loop runs inside whole-stage
  * codegen; unpack with `pos = fp >> 32`, `hash = fp & 0xFFFFFFFF`.
  */
case class WinnowPack(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_winnow expects a string column, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    graft.text.Winnowing.packedArrayData(
      input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.text.Winnowing$$.MODULE$$.packedArrayData(
        $c.toString(), $k, $w);""")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
