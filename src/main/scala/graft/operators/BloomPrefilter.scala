package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered equi-join: build a Bloom filter over the small side's
  * join keys, drop big-side rows that cannot match BEFORE the shuffle, then
  * run the exact join on the survivors.
  *
  * At 100 TB the dominant cost of a selective join is shuffling big-side rows
  * that match nothing (classic fact⋈filtered-dim). The Bloom filter is a few
  * MB broadcast regardless of big-side size; false positives only mean a few
  * extra rows reach the exact join, so the RESULT is exactly the plain join —
  * this is a pure physical optimization, which is why it can be
  * oracle-checked. Spark's own runtime row-level filtering (AQE bloom
  * pushdown) plans the same shape adaptively; this operator makes it explicit
  * and deterministic.
  */
object BloomPrefilter {

  /** @param big      probe side, filtered by the sketch before the join
    * @param small    build side; its DISTINCT `key` values feed the filter
    * @param key      equi-join key column name, present on both sides
    * @param expected expected distinct key count on the small side (sizes
    *                 the filter)
    * @param fpp      false-positive probability — tune sketch size vs the
    *                 shuffle volume saved
    */
  def join(big: DataFrame, small: DataFrame, key: String,
           expected: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    // stat.bloomFilter NPEs on an empty input (null aggregation buffer);
    // an empty build side means an empty join anyway
    if (small.isEmpty) return big.limit(0).join(small, key)
    val bf: BloomFilter = small.stat.bloomFilter(key, expected, fpp)
    // stat.bloomFilter hashes integral keys as longs and strings as bytes —
    // the probe must use the matching insertion type
    import org.apache.spark.sql.types._
    val probe = small.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        udf((k: java.lang.Long) => k != null && bf.mightContainLong(k))
      case StringType =>
        udf((k: String) => k != null && bf.mightContainString(k))
      case t => throw new IllegalArgumentException(
        s"unsupported bloom key type $t for column $key")
    }
    big.filter(probe(col(key))).join(small, key)
  }
}
