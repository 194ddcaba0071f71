package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined word n-grams of a token array — ml.feature.NGram's per-row
  * logic as a single codegen'd expression (same output: size−n+1 grams, empty
  * array when the input is shorter than n).
  *
  * Replaces the interpreted transform(sequence)+slice+array_join pipeline in
  * TextOps.ngrams: shingle construction is the dominant map-side cost of
  * MinHash dedup and n-gram counting at scale, and the HOF form allocates a
  * lambda evaluation per gram plus an array slice per position.
  */
case class NGramJoin(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_ngrams"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val num = toks.numElements()
    val count = math.max(0, num - n + 1)
    val out = new Array[AnyRef](count)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spaceRef = ctx.addReferenceObj("space", space,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c => {
      val num = ctx.freshName("num"); val count = ctx.freshName("count")
      val out = ctx.freshName("out"); val parts = ctx.freshName("parts")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
      int $num = $c.numElements();
      int $count = Math.max(0, $num - $n + 1);
      Object[] $out = new Object[$count];
      org.apache.spark.unsafe.types.UTF8String[] $parts =
        new org.apache.spark.unsafe.types.UTF8String[$n];
      for (int $i = 0; $i < $count; $i++) {
        for (int $j = 0; $j < $n; $j++) { $parts[$j] = $c.getUTF8String($i + $j); }
        $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($spaceRef, $parts);
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);"""
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
