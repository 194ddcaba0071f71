package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting: 64-bit signature where bit j is the
  * sign of Σ_tokens (±1 depending on bit j of xxhash64(token)).
  *
  * Detection uses the pigeonhole band trick: two signatures within Hamming
  * distance d share at least one of d+1 equal-width chunks, so candidate
  * generation is a chunk-equality join (shuffle on a small key) and the
  * verify step is a popcount of the XOR — no cross join anywhere.
  */
object SimHash {

  final case class Config(
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHammingDistance: Int = 3,
      tokenHash: Column => Column = xxhash64(_))

  /** 60-bit token hash from md5 — slower than xxhash64 but computable in any
    * engine with md5 (the DuckDB oracle reproduces it bit-for-bit): first 15
    * hex chars parsed as an unsigned 60-bit integer (fits Long, ANSI-safe). */
  def md5Hash60(t: Column): Column =
    conv(substring(md5(t.cast("binary")), 1, 15), 16, 10).cast("long")

  /** 64-bit simhash of a token array: tokens hashed ONCE (default Spark
    * xxhash64 — the scale path), then a native single-pass expression
    * ([[graft.expressions.SimHash64]]) tallies all 64 bit votes — identical
    * votes to a per-bit aggregate() but without 64 interpreted array passes
    * (and without re-hashing every token per bit). */
  def simhash(toks: Column, tokenHash: Column => Column = xxhash64(_)): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.SimHash64(
        org.apache.spark.sql.graft.bridge.expression(
          transform(toks, t => tokenHash(t)))))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs (d1 < d2) with signature Hamming distance <= max. */
  def nearDupPairs(df: DataFrame, cfg: Config = Config()): DataFrame = {
    val chunks = cfg.maxHammingDistance + 1
    val width = 64 / chunks // 16 bits per chunk for d=3
    val sigs = df.select(
      col(cfg.idCol).as("__id"),
      simhash(TextOps.tokens(col(cfg.textCol)), cfg.tokenHash).as("__sig"))

    val chunked = sigs.select(col("__id"), col("__sig"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("__sig"), c * width)
            .bitwiseAND((1L << width) - 1).as("ck"))
      }: _*)).as("__c"))
      .select(col("__id"), col("__sig"),
        col("__c.chunk").as("__chunk"), col("__c.ck").as("__ck"))

    val a = chunked.alias("a")
    val b = chunked.alias("b")
    // r14 (guide §2.4): a pair within Hamming distance d can share up to
    // d+1 chunks and used to emerge once per shared chunk, paying a
    // dropDuplicates exchange over the candidate multiset. The signatures
    // already ride the join, so the FIRST matching chunk is a scalar of
    // (s1 XOR s2): keep the pair only where that equals the joined chunk —
    // identical pair set, zero pair-stream exchanges.
    val x = col("a.__sig").bitwiseXOR(col("b.__sig"))
    val firstMatch = (0 until chunks).foldRight(lit(chunks)) { (c, acc) =>
      when(shiftright(x, c * width).bitwiseAND((1L << width) - 1) === 0,
        lit(c)).otherwise(acc)
    }
    a.join(b,
        col("a.__chunk") === col("b.__chunk") &&
        col("a.__ck") === col("b.__ck") &&
        col("a.__id") < col("b.__id"))
      .filter(firstMatch === col("a.__chunk"))
      .select(col("a.__id").as("d1"), col("b.__id").as("d2"),
        hamming64(col("a.__sig"), col("b.__sig")).as("hdist"))
      .filter(col("hdist") <= cfg.maxHammingDistance)
  }
}
