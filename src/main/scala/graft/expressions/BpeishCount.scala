package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE-ish token estimate: count of matches of
  * `[A-Za-z0-9]+|[^A-Za-z0-9\s]` — alphanumeric runs plus isolated
  * non-alphanumeric non-whitespace characters.
  *
  * Native single-scan replacement for `regexp_count` with that pattern: the
  * alternation is regular enough that one pass with a "was the previous char
  * alphanumeric" flag reproduces the match count exactly (greedy runs never
  * overlap; every other non-\s char is its own match). `\s` here is the Java
  * regex default class [ \t\n\x0B\f\r], matched literally. ~30 µs/doc with
  * the regex engine (`graft.ScaleProbe`: 15 s at 100×) becomes a branchy
  * char loop; `BpeishCountSpec` pins equality with regexp_count on random
  * strings in both eval paths. Operates on UTF-16 code units like the regex
  * engine does, so non-ASCII input agrees too (any non-alnum non-ws unit
  * counts once — surrogate pairs count per unit on BOTH sides, since the
  * pattern classes are ASCII-only).
  */
case class BpeishCount(child: Expression, spaceOnlyWs: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpeish_count"

  override def nullSafeEval(input: Any): Any =
    BpeishCount.countString(input.asInstanceOf[UTF8String].toString, spaceOnlyWs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static call into the Scala loop (the PorterStem pattern): stays inside
    // whole-stage codegen, JIT inlines it, and sidesteps a Janino parser bug
    // that rejects the inlined comparison chains ("expression is not a type")
    // and silently demoted the WHOLE stage to interpreted eval
    nullSafeCodeGen(ctx, ev, in => s"""
      ${ev.value} = graft.expressions.BpeishCount$$.MODULE$$.countString(
        $in.toString(), $spaceOnlyWs);""")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeishCount {
  /** Single-scan match count of [A-Za-z0-9]+|[^A-Za-z0-9\\s] — or, with
    * spaceOnly, of [A-Za-z0-9]+|[^A-Za-z0-9 ] (only ' ' treated as
    * whitespace; the gate oracle's variant, since DuckDB regex classes and
    * Java's \\s need not agree). */
  def countString(s: String, spaceOnly: Boolean = false): Int = {
    var c = 0
    var prevAlnum = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      val alnum = (ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z') ||
        (ch >= '0' && ch <= '9')
      if (alnum) { if (!prevAlnum) c += 1 }
      else if (!(ch == ' ' || (!spaceOnly && ch >= '\t' && ch <= '\r'))) c += 1
      prevAlnum = alnum
      i += 1
    }
    c
  }
}
