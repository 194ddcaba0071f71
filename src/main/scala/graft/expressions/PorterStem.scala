package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter-stem a single token (SURVEY M3 — the reference's optional Snowball
  * stage, reference feature/Utils.scala:200-204). Codegen emits a direct
  * static call into [[graft.text.PorterStemmer]], so stemming stays inside
  * whole-stage codegen instead of a boxed Scala UDF.
  */
case class PorterStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_porter_stem"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.text.PorterStemmer.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        graft.text.PorterStemmer$$.MODULE$$.stem($c.toString()));""")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
