package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Snowball (Porter2 English) stem of a single token — the algorithm the
  * reference's stemming stage actually ran (reference feature/Utils.scala:
  * 200-204, spark-stemming jar). Codegen emits a direct static call into
  * [[graft.text.SnowballStemmer]], staying inside whole-stage codegen like
  * its classic-Porter sibling [[PorterStem]].
  */
case class SnowballStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_snowball_stem"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.text.SnowballStemmer.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        graft.text.SnowballStemmer$$.MODULE$$.stem($c.toString()));""")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
