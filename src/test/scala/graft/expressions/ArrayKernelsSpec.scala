package graft.expressions

import graft.SparkSpec
import graft.similarity.ArrayOps
import org.apache.spark.sql.functions._

/** Native codegen kernels must be BIT-IDENTICAL to the interpreted
  * higher-order-function formulations (same left-fold order) — that identity
  * is what keeps the DuckDB oracles valid after the fast path swap. */
class ArrayKernelsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random vectors incl. negatives, zeros, denormal-ish
  private lazy val vecs = (0 until 50).map { i =>
    (i.toLong, (0 until 64).map { j =>
      val x = math.sin(i * 64 + j) * math.pow(10, (j % 7) - 3)
      if (j % 11 == 0) 0.0 else x
    })
  }.toDF("id", "v")

  private lazy val pairs = vecs.alias("a")
    .join(vecs.alias("b"), col("a.id") < col("b.id"))
    .select(col("a.v").as("x"), col("b.v").as("y"))

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (p, q) => p * q), lit(0.0), (acc, t) => acc + t)

  private def hofL1(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (p, q) => abs(p - q)), lit(0.0), (acc, t) => acc + t)

  test("ArrayDot bit-identical to HOF left fold") {
    val bad = pairs.select(
        ArrayOps.dot(col("x"), col("y")).as("fast"),
        hofDot(col("x"), col("y")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }

  test("ArrayL1 bit-identical to HOF left fold") {
    val bad = pairs.select(
        ArrayOps.l1(col("x"), col("y")).as("fast"),
        hofL1(col("x"), col("y")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }

  test("ArrayL2Sq bit-identical to HOF left fold") {
    val hofL2Sq = aggregate(
      zip_with(col("x"), col("y"), (p, q) => (p - q) * (p - q)),
      lit(0.0), (acc, t) => acc + t)
    val bad = pairs.select(
        ArrayOps.l2sq(col("x"), col("y")).as("fast"), hofL2Sq.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }

  test("cosineParts components bit-identical to separate folds") {
    val bad = pairs.select(
        ArrayOps.cosineParts(col("x"), col("y")).as("p"),
        hofDot(col("x"), col("y")).as("dot"),
        hofDot(col("x"), col("x")).as("naa"),
        hofDot(col("y"), col("y")).as("nbb"))
      .filter(element_at(col("p"), 1) =!= col("dot") ||
        element_at(col("p"), 2) =!= col("naa") ||
        element_at(col("p"), 3) =!= col("nbb")).count()
    assert(bad == 0)
  }

  test("supportStats matches filter/zip_with formulations") {
    val thr = 0.1
    val bad = pairs.select(
        ArrayOps.supportStats(col("x"), col("y"), thr).as("s"),
        size(filter(col("x"), v => v > thr)).as("sa"),
        size(filter(col("y"), v => v > thr)).as("sb"),
        size(filter(zip_with(col("x"), col("y"), (p, q) => p > thr && q > thr),
          b => b)).as("inter"),
        size(filter(zip_with(col("x"), col("y"), (p, q) => (p > thr) =!= (q > thr)),
          b => b)).as("mism"))
      .filter(element_at(col("s"), 1) =!= col("sa").cast("long") ||
        element_at(col("s"), 2) =!= col("sb").cast("long") ||
        element_at(col("s"), 3) =!= col("inter").cast("long") ||
        element_at(col("s"), 4) =!= col("mism").cast("long")).count()
    assert(bad == 0)
  }

  test("MinHashSignature matches per-k array_min formulation") {
    import graft.dedup.MinHashDedup
    val texts = Seq((1L, "aa bb cc dd ee ff gg hh"), (2L, "xx yy zz aa bb cc"),
      (3L, "")).toDF("id", "t")
    val shingles = MinHashDedup.shingleHashes(col("t"), 2)
    val (as, bs) = MinHashDedup.coefficients(8)
    val P = (1L << 31) - 1
    val slow = when(size(shingles) > 0,
      transform(sequence(lit(0), lit(7)), k =>
        array_min(transform(shingles, h =>
          pmod(element_at(typedLit(as.toSeq), k + 1) * h
            + element_at(typedLit(bs.toSeq), k + 1), lit(P)))))
    ).otherwise(typedLit(Seq.fill(8)(P)))
    val bad = texts.select(
        MinHashDedup.signature(shingles, 8).as("fast"), slow.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }

  test("SimHash64 matches per-bit aggregate formulation") {
    import graft.text.TextOps
    val texts = Seq((1L, "the quick brown fox"), (2L, "a b c d e f"), (3L, "solo"))
      .toDF("id", "t")
    val toks = TextOps.tokens(col("t"))
    val slow = (0 until 64).map { j =>
      val vote = aggregate(toks, lit(0L), (acc, t) =>
        acc + when(shiftright(xxhash64(t), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bad = texts.select(
        graft.dedup.SimHash.simhash(toks).as("fast"), slow.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }

  test("null inputs yield null, empty arrays yield empty-fold identities") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double]))
    ).toDF("x", "y")
    val r = df.select(
      ArrayOps.dot(col("x"), col("y")).as("d"),
      ArrayOps.l1(col("x"), col("y")).as("l")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(1).getDouble(0) == 0.0 && r(1).getDouble(1) == 0.0)
  }
}
