package graft.text

/** Clean-room murmur3_x86_32 in the VARIANT Spark ML's HashingTF applies to
  * string terms (reference pipeline: feature/Utils.scala:232-233 uses
  * HashingTF, whose murmur3Hash seeds with 42): the UTF-8 bytes are consumed
  * as little-endian 4-byte words through the standard k1/h1 mixing; the 0-3
  * remaining TAIL bytes accumulate (unsigned, little-endian) into one final
  * k1 that is mixK1'd and xor'd into h1 WITHOUT the h1 rotation round —
  * murmur3's standard tail, which HashingTF's bucketing follows (verified
  * bit-for-bit against `HashingTF.indexOf` in Murmur3Spec). Finalization is
  * the standard avalanche xor'd with the byte length.
  *
  * [[oracleSqlCtes]] emits the SAME arithmetic as a DuckDB CTE chain
  * (unsigned 32-bit ops emulated in BIGINT with HUGEINT multiplies — the
  * q_stream_bills_source splitmix64 replay pattern), which is what converts
  * q_tfidf_features from a pinned gate to a full-hash [sql] gate. */
object Murmur3 {

  private val C1 = 0xcc9e2d51
  private val C2 = 0x1b873593

  private def mixK1(k: Int): Int =
    Integer.rotateLeft(k * C1, 15) * C2

  private def mixH1(h: Int, k1: Int): Int =
    Integer.rotateLeft(h ^ k1, 13) * 5 + 0xe6546b64

  /** Spark-compatible hash of a string's UTF-8 bytes, default seed 42. */
  def hash(s: String, seed: Int = 42): Int = {
    val b = s.getBytes("UTF-8")
    var h = seed
    val aligned = b.length - b.length % 4
    var i = 0
    while (i < aligned) {
      val k = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
      h = mixH1(h, mixK1(k))
      i += 4
    }
    var k1 = 0
    var shift = 0
    while (i < b.length) {
      k1 ^= (b(i) & 0xff) << shift
      i += 1; shift += 8
    }
    h ^= mixK1(k1) // no-op when aligned: mixK1(0) == 0
    var f = h ^ b.length
    f ^= f >>> 16; f *= 0x85ebca6b; f ^= f >>> 13; f *= 0xc2b2ae35; f ^= f >>> 16
    f
  }

  /** HashingTF.indexOf: nonNegativeMod(hash(term), numFeatures). */
  def bucket(s: String, numFeatures: Int, seed: Int = 42): Int = {
    val r = hash(s, seed) % numFeatures
    if (r < 0) r + numFeatures else r
  }

  // ------------------------------------------------------------ SQL replay

  /** DuckDB CTE chain computing `bucket(term, numFeatures)` for every row of
    * an input CTE `inRel` that has a column `term` (ASCII-only — the token
    * pipeline guarantees it — and at most 4*words+3 bytes; a longer term
    * raises a loud `error()` in the oracle rather than hashing wrong, so a
    * corpus regen that introduces one long token surfaces as an explicit
    * oracle-domain failure, not a confusing hash mismatch — size `words` to
    * the corpus). The chain ends in a
    * CTE named `mm_hash(term, bucket)`. All 32-bit unsigned arithmetic is
    * emulated: values live in BIGINT mod 2^32, multiplies go through HUGEINT,
    * rotl splits into disjoint low/high bit ranges so no extra mod is
    * needed, xor operates on the non-negative BIGINT domain directly. */
  def oracleSqlCtes(inRel: String, numFeatures: Int, words: Int = 6,
                    seed: Int = 42): String = {
    require(seed >= 0, "SQL replay assumes a non-negative seed")
    def mul(x: String, c: Long) =
      s"CAST((CAST(($x) AS HUGEINT) * $c) % 4294967296 AS BIGINT)"
    def rotl(x: String, r: Int) =
      s"((($x) * ${1L << r}) % 4294967296 + (($x) // ${1L << (32 - r)}))"
    def mixK1Sql(k: String) = mul(rotl(mul(k, 3432918353L), 15), 461845907L)
    def mixH1Sql(h: String, k1: String) =
      s"((${rotl(s"xor($h, $k1)", 13)}) * 5 + 3864292196) % 4294967296"
    // byte b_i (0-based) of the ASCII term, as its code point
    def byteAt(i: Int) = s"unicode(substr(term, ${i + 1}, 1))"
    val byteCols = (0 until words * 4 + 3).map { i =>
      s"CASE WHEN nb > $i THEN ${byteAt(i)} ELSE 0 END AS b$i"
    }
    val wordStages = (0 until words).map { w =>
      val word = (0 until 4).map(j => s"b${4 * w + j} * ${1L << (8 * j)}")
        .mkString(" + ")
      s"""mm_s$w AS (SELECT term, nb, ${
        (4 * w + 4 until words * 4 + 3).map(i => s"b$i").mkString(", ")
      }${if (4 * w + 4 < words * 4 + 3) "," else ""}
         CASE WHEN nb >= ${4 * (w + 1)}
              THEN ${mixH1Sql("h", mixK1Sql(s"($word)"))}
              ELSE h END AS h
       FROM mm_s${if (w == 0) "b" else (w - 1).toString})"""
    }
    // tail: the 0-3 remaining bytes accumulate little-endian into one k1
    // that is mixK1'd and xor'd in (standard murmur3 tail; mixK1(0) = 0
    // keeps aligned lengths untouched). ASCII bytes are unsigned-safe.
    val tailK1 = (0 until 3).map { j =>
      s"CASE WHEN nb % 4 > $j THEN unicode(substr(term, (nb // 4) * 4 + $j + 1, 1)) * ${1L << (8 * j)} ELSE 0 END"
    }.mkString("(", " + ", ")")
    val tailStages = Seq(
      s"""mm_t0 AS (SELECT term, nb, h, $tailK1 AS k1t FROM mm_s${words - 1})""",
      s"""mm_t1 AS (SELECT term, nb, xor(h, ${mixK1Sql("k1t")}) AS h FROM mm_t0)""")
    val fmix =
      s"""mm_f0 AS (SELECT term, xor(h, nb) AS h FROM mm_t1),
       mm_f1 AS (SELECT term, xor(h, h // 65536) AS h FROM mm_f0),
       mm_f2 AS (SELECT term, ${mul("h", 2246822507L)} AS h FROM mm_f1),
       mm_f3 AS (SELECT term, xor(h, h // 8192) AS h FROM mm_f2),
       mm_f4 AS (SELECT term, ${mul("h", 3266489909L)} AS h FROM mm_f3),
       mm_f5 AS (SELECT term, xor(h, h // 65536) AS h FROM mm_f4),
       mm_hash AS (SELECT term,
         CAST((((CASE WHEN h >= 2147483648 THEN h - 4294967296 ELSE h END)
                % $numFeatures) + $numFeatures) % $numFeatures AS BIGINT) AS bucket
       FROM mm_f5)"""
    // the byte cap fails LOUDLY: DuckDB forbids lateral references to a
    // side-effecting alias, so the guarded nb lives in its own CTE stage
    val cap = words * 4 + 3
    s"""mm_cap AS (SELECT term,
         CASE WHEN strlen(term) > $cap
              THEN error('murmur3 oracle byte cap exceeded (words=$words, cap=$cap): ' || term)
              ELSE strlen(term) END AS nb
       FROM $inRel),
       mm_sb AS (SELECT term, nb, ${byteCols.mkString(", ")},
         CAST($seed AS BIGINT) AS h
       FROM mm_cap),
       ${wordStages.mkString(",\n")},
       ${tailStages.mkString(",\n")},
       $fmix"""
  }
}
