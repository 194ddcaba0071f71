package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's pinned text→TF-bucket-set pipeline as ONE codegen scan:
  * exactly `TextOps.clean` (strip `[\d,:;?!]` — deletions MERGE adjacent
  * word runs) → `TextOps.dropSmallWords` (`\b\w{1,2}\b` — deleting a 1-2
  * char word run never merges its neighbours, both are non-word) →
  * RegexTokenizer `\W` split (empty tokens dropped) → english
  * StopWordsRemover → HashingTF murmur3 bucket (`Murmur3.bucket`, the
  * spec-pinned HashingTF replay) → DISTINCT SORTED bucket ids as
  * array<long> — i.e. the nonzero-index set of the binary-TF vector, the
  * only thing set-similarity operators (MinHash LSH) consume.
  *
  * CONTRACT: the child must already be lowercased (`lower(text)`) — the
  * pipeline this replaces lowercases inside `clean`, and RegexTokenizer's
  * own lowercasing is then a no-op; stop-word lookup here is exact-match
  * on the produced (lowercase) token, which equals StopWordsRemover's
  * case-insensitive behaviour on lowercased input.
  *
  * Why (r13, guide §1.2 step 2 / §4.1): the replaced chain cost two full
  * Java-regex passes over every document plus three per-row boxed ML UDFs
  * (tokenizer, stop words, HashingTF) and a Vector allocation per row —
  * measured ~35 s CPU per bench pass at sf0.1 on q_minhash_lsh's map
  * stage alone. One linear character scan with no allocation beyond the
  * token buffer and the output array computes the identical set
  * (CleanTokenBucketsSpec fuzzes parity against the stock
  * FeaturePipeline on adversarial inputs; the q_minhash_lsh DuckDB hash
  * gate replays the same pipeline end-to-end).
  */
case class CleanTokenBuckets(child: Expression, numFeatures: Int,
                             stopWords: Seq[String])
    extends UnaryExpression {
  require(numFeatures > 0)
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_clean_token_buckets"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopWords.length * 2)
    stopWords.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(
      CleanTokenBuckets.eval(s, numFeatures, stopSet))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        graft.expressions.CleanTokenBuckets.eval(
          $c.toString(), $numFeatures, $stopRef));"""
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CleanTokenBuckets {

  /** One linear scan; see the class doc for the exact pipeline replayed.
    * Static so whole-stage-generated Java calls it directly — the body is a
    * tight char loop, not expression-tree work, so a method call costs
    * nothing and keeps the generated method small. */
  def eval(s: String, numFeatures: Int,
           stopSet: java.util.HashSet[String]): Array[Long] = {
    val seen = new Array[Boolean](numFeatures)
    var nSeen = 0
    val sb = new java.lang.StringBuilder(24)
    var i = 0
    val n = s.length
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' ' // virtual terminator flushes
      val deleted = (c >= '0' && c <= '9') || c == ',' || c == ':' ||
        c == ';' || c == '?' || c == '!'
      if (!deleted) {
        // Java regex \w (ASCII): [a-zA-Z0-9_] — digits unreachable here
        val word = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'
        if (word) sb.append(c)
        else {
          if (sb.length >= 3) { // \b\w{1,2}\b deleted 1-2 char runs
            val tok = sb.toString
            if (!stopSet.contains(tok)) {
              val b = graft.text.Murmur3.bucket(tok, numFeatures, 42)
              if (!seen(b)) { seen(b) = true; nSeen += 1 }
            }
          }
          if (sb.length > 0) sb.setLength(0)
        }
      }
      i += 1
    }
    val out = new Array[Long](nSeen)
    var b = 0
    var o = 0
    while (o < nSeen) {
      if (seen(b)) { out(o) = b.toLong; o += 1 }
      b += 1
    }
    out
  }
}
