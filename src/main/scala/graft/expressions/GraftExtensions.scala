package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point registering graft's native expressions
  * as SQL functions, so `spark.sql("SELECT graft_dot(a, b) ...")` works next
  * to the Column API (graft.similarity.ArrayOps / graft.text.TextOps).
  *
  * Activate with:
  * {{{
  *   spark.sql.extensions=graft.expressions.GraftExtensions
  * }}}
  * (GraftSession.builder sets it by default.)
  *
  * Parameterized sketch expressions whose coefficients are Scala-side arrays
  * (MinHashSignature, SignLshBucket) stay Column-API-only — their parameters
  * are derived deterministically from configs, not expressible as SQL
  * literals a user should retype.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def litInt(e: Expression, what: String): Int = e match {
    case l: Literal => l.value match {
      case i: Int => i
      case i: Long => i.toInt
      case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
    }
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  private def litDouble(e: Expression, what: String): Double = e match {
    case l: Literal => l.value match {
      case d: Double => d
      case d: Float => d.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case i: Int => i.toDouble
      case i: Long => i.toDouble
      case other => throw new IllegalArgumentException(s"$what must be a numeric literal, got $other")
    }
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - left-fold dot product of two array<double>"),
      (es: Seq[Expression]) => ArrayDot(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("graft_l1"),
      info("graft_l1", "graft_l1(a, b) - left-fold L1 distance of two array<double>"),
      (es: Seq[Expression]) => ArrayL1(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("graft_l2sq"),
      info("graft_l2sq", "graft_l2sq(a, b) - left-fold squared Euclidean distance of two array<double>"),
      (es: Seq[Expression]) => ArrayL2Sq(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("graft_cosine_parts"),
      info("graft_cosine_parts", "graft_cosine_parts(a, b) - one-pass [dot, ||a||^2, ||b||^2]"),
      (es: Seq[Expression]) => ArrayCosineParts(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("graft_support_stats"),
      info("graft_support_stats",
        "graft_support_stats(a, b, thr) - one-pass [|supp a|, |supp b|, |intersect|, mismatches] at threshold thr"),
      (es: Seq[Expression]) => ArraySupportStats(es(0), es(1), litDouble(es(2), "thr"))))

    ext.injectFunction((FunctionIdentifier("graft_ngrams"),
      info("graft_ngrams", "graft_ngrams(tokens, n) - space-joined word n-grams of a token array"),
      (es: Seq[Expression]) => NGramJoin(es(0), litInt(es(1), "n"))))

    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(hashes) - 64-bit simhash from pre-hashed tokens"),
      (es: Seq[Expression]) => SimHash64(es(0))))

    ext.injectFunction((FunctionIdentifier("graft_porter_stem"),
      info("graft_porter_stem", "graft_porter_stem(token) - classic Porter (1980) stem of a token"),
      (es: Seq[Expression]) => PorterStem(es(0))))

    ext.injectFunction((FunctionIdentifier("graft_snowball_stem"),
      info("graft_snowball_stem",
        "graft_snowball_stem(token) - Snowball (Porter2 English) stem of a token"),
      (es: Seq[Expression]) => SnowballStem(es(0))))

    ext.injectFunction((FunctionIdentifier("graft_winnow"),
      info("graft_winnow",
        "graft_winnow(text, k, w) - winnowing fingerprints packed (pos << 32) | hash"),
      (es: Seq[Expression]) => WinnowPack(es(0), litInt(es(1), "k"), litInt(es(2), "w"))))

    ext.injectFunction((FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard",
        "graft_jaccard(a, b) - set Jaccard (0-100) of two array<long>, one hash-set pass"),
      (es: Seq[Expression]) => ArraySetJaccard(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("graft_jaccard_sets"),
      info("graft_jaccard_sets",
        "graft_jaccard_sets(a, b) - same as graft_jaccard, but the caller PROMISES both " +
          "arrays are duplicate-free; threshold filters on it gain a header-only " +
          "size-ratio prune (unsound if the promise is broken)"),
      (es: Seq[Expression]) => ArraySetJaccard(es(0), es(1), assumeDistinct = true)))

    ext.injectFunction((FunctionIdentifier("graft_tokens"),
      info("graft_tokens",
        "graft_tokens(text) - whitespace-split non-empty tokens, one codegen pass"),
      (es: Seq[Expression]) => SplitNonEmpty(es(0))))

    ext.injectFunction((FunctionIdentifier("graft_bpeish_count"),
      info("graft_bpeish_count",
        "graft_bpeish_count(text) - BPE-ish subword token count without materializing tokens"),
      (es: Seq[Expression]) => BpeishCount(es(0))))

    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(hashes, k) - k-hash MinHash signature over 31-bit-reduced " +
          "shingle hashes (deterministic md5-derived coefficients)"),
      (es: Seq[Expression]) => {
        val k = litInt(es(1), "k")
        val (as, bs) = graft.dedup.MinHashDedup.coefficients(k)
        MinHashSignature(es(0), as.toSeq, bs.toSeq, (1L << 31) - 1)
      }))

    // threshold filters on the distinct-marked Jaccard kernel gain a
    // header-only size-ratio prune (graft.plans.JaccardPrefilter)
    ext.injectOptimizerRule(_ => graft.plans.JaccardPrefilter)
  }
}
