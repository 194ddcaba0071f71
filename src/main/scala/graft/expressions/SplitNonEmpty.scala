package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenizer: `split(s, " ")` with empty tokens removed, in ONE
  * byte-level pass.
  *
  * Replaces `filter(split(c, " "), t => length(t) > 0)` — the engine's
  * universal tokenizer — because Spark's higher-order `filter` is
  * CodegenFallback: the lambda runs interpreted per ELEMENT, which
  * `graft.ScaleProbe` measured at ~30× the cost of the split itself (it was
  * the dominant term of every token-counting query). Token values are
  * zero-copy `UTF8String.fromBytes` views over the parent's byte array
  * (space = 0x20 never occurs inside a UTF-8 multibyte sequence, so byte
  * scanning is code-point safe). Bit-identical output order/content to the
  * filter(split) form — `SplitNonEmptySpec` pins it on random strings and
  * the DuckDB oracles (string_split + list_filter) are unchanged.
  */
case class SplitNonEmpty(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_split_nonempty"

  override def nullSafeEval(input: Any): Any =
    SplitNonEmpty.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static-helper call (PorterStem pattern): keeps the stage in whole-stage
    // codegen and out of Janino's parser quirks
    nullSafeCodeGen(ctx, ev, in => s"""
      ${ev.value} = graft.expressions.SplitNonEmpty$$.MODULE$$.split($in);""")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SplitNonEmpty {
  def split(u: UTF8String): ArrayData = {
    val bytes = u.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    var start = -1
    while (i < n) {
      if (bytes(i) == ' '.toByte) {
        if (start >= 0) {
          out.add(UTF8String.fromBytes(bytes, start, i - start))
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromBytes(bytes, start, n - start))
    new GenericArrayData(out.toArray)
  }
}
