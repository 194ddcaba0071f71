package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training/encoding semantics ([[Bpe]]).
  *
  * The load-bearing claim is the merge-application one: a SINGLE literal
  * `replace(" a  b ", " ab ")` on the double-space segmentation string is
  * exactly the canonical greedy left-to-right BPE merge, and the invariant
  * (symbols separated by exactly two spaces, double-space padded) survives
  * every merge so merges compose. The fuzz below checks both against an
  * independent array-walk reference — including the same-symbol-run cases
  * (`aaaaa` + merge (a,a)) where the single-space representation provably
  * diverges.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: canonical greedy left-to-right merge. */
  private def greedy(seq: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < seq.length) {
      if (i + 1 < seq.length && seq(i) == a && seq(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += seq(i); i += 1 }
    }
    out.toList
  }

  /** Independent reference trainer: vocab-weighted pair counts, argmax with
    * (count desc, "left right" asc) tiebreak, greedy application. */
  private def refLearn(words: Map[String, Long], n: Int): List[(String, String, Long)] = {
    var segs: Map[List[String], Long] =
      words.groupMapReduce { case (w, _) => w.toList.map(_.toString) }(_._2)(_ + _)
    val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- segs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x + " " + y) }
        out += ((a, b, c))
        segs = segs.groupMapReduce { case (s, _) => greedy(s, a, b) }(_._2)(_ + _)
      }
    }
    out.toList
  }

  test("single-pass replace on the double-space form is exact greedy merge (fuzz)") {
    val rnd = new scala.util.Random(42)
    // include long same-symbol runs — the class where one-space forms diverge
    // words are non-empty by construction everywhere (TextOps.tokens filters
    // empty tokens) — the symbols() split is only defined for nonempty words
    val words = (1 to 120).map { _ =>
      val n = rnd.nextInt(11) + 1
      (1 to n).map(_ => "abc" (rnd.nextInt(3))).mkString
    } :+ "aaaaa" :+ "aaaaaa" :+ "ababababab"
    var expected = words.map(w => w -> w.toList.map(_.toString)).toMap
    var seg = words.toDF("word")
      .select(col("word"), Bpe.initialSeg(col("word")).as("seg"))
    for (_ <- 1 to 8) {
      val syms = expected.values.flatten.toSeq.distinct.sorted
      val a = syms(rnd.nextInt(syms.size))
      val b = syms(rnd.nextInt(syms.size))
      expected = expected.map { case (w, s) => w -> greedy(s, a, b) }
      seg = seg.withColumn("seg", Bpe.applyMerge(col("seg"), a, b))
      val got = seg.select(col("word"), Bpe.symbols(col("seg")))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      assert(got === expected, s"after merge ($a,$b)")
    }
  }

  test("learn matches an independent trainer on a classic corpus") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = corpus.mkString(" ")
    val df = Seq((0L, docs)).toDF("doc_id", "text")
    val merges = Bpe.learn(Bpe.wordCounts(df), 6)
    val exp = refLearn(corpus.groupBy(identity).map { case (w, g) => w -> g.size.toLong }, 6)
    assert(merges.map(m => (m.sym_left, m.sym_right, m.pair_cnt)) === exp)
    assert(merges.map(_.merge_rank) === (1 to 6))
  }

  test("line terminators inside a token segment like any other character") {
    // Java '.' without (?s) skips \r (and U+2028 etc.) while RE2's '.'
    // skips only \n — the (?s)/'s' pair keeps engine and oracle identical
    val df = Seq(("a\rb", "x y")).toDF("w1", "w2")
    val r = df.select(Bpe.symbols(Bpe.initialSeg(col("w1"))).as("s1"),
        Bpe.symbols(Bpe.initialSeg(col("w2"))).as("s2"))
      .collect().head
    assert(r.getSeq[String](0) === Seq("a", "\r", "b"))
    assert(r.getSeq[String](1) === Seq("x", " ", "y"))
  }

  test("learnScalable is merge-for-merge identical to learn (fuzz)") {
    val rnd = new scala.util.Random(7)
    // random corpora over a 3-letter alphabet (heavy pair ties — the argmax
    // tie-break is the part a divergent trainer gets wrong first), plus the
    // classic corpus; materializeEvery below nMerges so generation cutovers
    // happen mid-training
    for (trial <- 1 to 3) {
      val words = (1 to 80).map { _ =>
        val n = rnd.nextInt(9) + 1
        (1 to n).map(_ => "abc" (rnd.nextInt(3))).mkString
      }
      val df = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
      val wc = Bpe.wordCounts(df)
      val a = Bpe.learn(wc, 10)
      val b = Bpe.learnScalable(wc, 10, materializeEvery = 3)
      assert(b === a, s"trial $trial")
    }
    val classic = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = Seq((0L, classic.mkString(" "))).toDF("doc_id", "text")
    assert(Bpe.learnScalable(Bpe.wordCounts(df), 6, materializeEvery = 2) ===
      Bpe.learn(Bpe.wordCounts(df), 6))
  }

  test("learn steers to learnScalable above the threshold (identical merges)") {
    // past scalableLearnThreshold merges, learn IS learnScalable — the
    // steering default (VERDICT r11 #4). A vocab rich enough to supply
    // threshold+2 merges: distinct long words over a 4-letter alphabet.
    val rnd = new scala.util.Random(11)
    val words = (1 to 200).map { _ =>
      (1 to rnd.nextInt(12) + 4).map(_ => "abcd" (rnd.nextInt(4))).mkString
    }
    val df = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(df).persist()
    try {
      val n = Bpe.scalableLearnThreshold + 2
      val viaLearn = Bpe.learn(wc, n)
      val direct = Bpe.learnScalable(wc, n)
      assert(viaLearn === direct)
      assert(viaLearn.size > Bpe.scalableLearnThreshold,
        "corpus too poor to cross the steering threshold")
    } finally { wc.unpersist(); () }
  }

  test("learnScalable stops early when the vocabulary runs out of pairs") {
    val df = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.learnScalable(Bpe.wordCounts(df), 8, materializeEvery = 2)
    assert(merges.map(m => (m.sym_left, m.sym_right)) === Seq(("a", "b")))
  }

  test("learn stops early when the vocabulary runs out of pairs") {
    val df = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    // "ab": merge 1 = (a,b); then every word is a single symbol — no pairs
    val merges = Bpe.learn(Bpe.wordCounts(df), 8)
    assert(merges.map(m => (m.sym_left, m.sym_right)) === Seq(("a", "b")))
  }

  test("whole-document encode equals per-word encode (merges never cross word boundaries)") {
    val rnd = new scala.util.Random(7)
    // a/b-heavy corpus so same-symbol merges and repeated adjacent words
    // (the boundary-crossing hazard cases) actually occur
    val docs = (1 to 60).map { i =>
      val words = (1 to rnd.nextInt(6) + 1).map(_ =>
        (1 to rnd.nextInt(8) + 1).map(_ => "ab" (rnd.nextInt(2))).mkString)
      (i.toLong, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val merges = Bpe.learn(Bpe.wordCounts(df), 6)
    assert(merges.nonEmpty)
    val got = df.select(col("doc_id"),
        Bpe.docTokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def encWord(w: String): Long = {
      var s = w.toList.map(_.toString)
      for (m <- merges) s = greedy(s, m.sym_left, m.sym_right)
      s.length.toLong
    }
    val exp = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).map(encWord).sum
    }.toMap
    assert(got === exp)
  }

  test("encodeWords: chars are exact, tokens shrink monotonically, never below 1") {
    val docs = graft.io.Tables.documents(spark, sfDir)
    val words = Bpe.wordCounts(docs)
    val merges = Bpe.learn(words, 8)
    assert(merges.size === 8)
    val enc = Bpe.encodeWords(words, merges)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(enc.nonEmpty)
    for ((w, chars, toks) <- enc) {
      assert(chars === w.length.toLong)
      assert(toks >= 1L && toks <= chars)
    }
    // the 8 merges must compress SOMETHING on the real fixture
    assert(enc.exists { case (_, chars, toks) => toks < chars })
  }
}
