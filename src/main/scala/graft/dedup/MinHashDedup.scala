package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded-LSH near-duplicate detection over a text column — the
  * training-data-pipeline generalization of the reference's MinHash LSH
  * workflow (reference ExtractMinHashLSH.scala:104-115: 100 tables, 5-gram
  * shingles; CustomizedMinHashLSH.scala:33-43 permutation hashes).
  *
  * Everything is a Column expression over arrays — signature computation is
  * a per-row map (no fit job, no model broadcast), and the only shuffles are
  * the band-bucket self-join and the final dedup. At 100 TB this is:
  * scan → narrow map (signatures) → explode bands (×nBands) → shuffle on
  * (band, hash) → join within buckets → verify. Candidate verification uses
  * exact token-set Jaccard, so false positives cost only the verify compute.
  *
  * Hash family: h_k(x) = (a_k·x + b_k) mod p over 31-bit-reduced xxhash64
  * shingle hashes, a/b derived from md5 (deterministic, no JVM RNG),
  * p = 2^31-1. The 31-bit domain keeps a·h + b < 2^62 so the expression can
  * never overflow Long under ANSI mode (same reason the reference's
  * permutation hash uses the 31-bit prime 2038074743,
  * CustomizedMinHashLSH.scala:33-43).
  */
object MinHashDedup {

  /** Signature hash modulus (Mersenne prime 2^31-1) — public so the
    * q_minhash_sig oracle replays the affine family with the same constant. */
  val P: Long = (1L << 31) - 1

  final case class Config(
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleSize: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      jaccardThreshold: Double = 0.8)

  /** Deterministic (a, b) coefficient pairs in [1, P-1] / [0, P-1]. */
  def coefficients(numHashes: Int): (Array[Long], Array[Long]) = {
    val a = Array.tabulate(numHashes)(k => 1 + graft.ann.SignLsh.md5Long(s"mh-a:$k") % (P - 1))
    val b = Array.tabulate(numHashes)(k => graft.ann.SignLsh.md5Long(s"mh-b:$k") % P)
    (a, b)
  }

  /** Distinct shingle hash values for a text column: xxhash64 of each w-token
    * shingle, reduced to [0, P) so downstream affine hashes cannot overflow. */
  def shingleHashes(text: Column, w: Int): Column =
    array_distinct(transform(
      TextOps.ngrams(TextOps.tokens(text), w),
      s => pmod(xxhash64(s), lit(P))))

  /** Distinct FULL-64-bit shingle ids — used for the exact-Jaccard verify
    * step, where the 31-bit signature domain would admit ~2^-31 per-pair
    * cross-collisions that perturb |∩|/|∪| (the signature path tolerates
    * those; the reported exact jac should not). */
  def shingleIds(text: Column, w: Int): Column =
    array_distinct(transform(TextOps.ngrams(TextOps.tokens(text), w), xxhash64(_)))

  /** MinHash signature (array<long> of length numHashes) from shingle hashes:
    * min over shingles of (a_k·h + b_k) mod p. Native single-pass codegen
    * expression ([[graft.expressions.MinHashSignature]]) — one loop updates
    * all k accumulators instead of k interpreted array passes. Empty shingle
    * sets get the natural sentinel of all P (no real hash reaches P because
    * the affine value is reduced mod P). */
  def signature(shingles: Column, numHashes: Int): Column = {
    val (as, bs) = coefficients(numHashes)
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.MinHashSignature(
        org.apache.spark.sql.graft.bridge.expression(shingles),
        as.toSeq, bs.toSeq, P))
  }

  /** (band index, band hash) rows for banded LSH: signature split into
    * `bands` equal slices, each hashed to one bucket key. */
  def bandHashes(sig: Column, bands: Int, numHashes: Int): Column = {
    val r = numHashes / bands
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"), xxhash64(slice(sig, b * r + 1, lit(r))).as("bh")))
  }

  /** The reusable per-document dedup sketch: `(__id, __sids, __bands)` —
    * verify shingle-id sets plus banded signature bucket keys, no raw text.
    * This is the frame an incremental ingest pipeline computes ONCE per
    * corpus and keeps (persisted here; written as a parquet table at real
    * scale) so each arriving batch sketches only itself and joins against
    * the stored corpus sketch ([[dedupAgainst]]). Only the band keys and
    * the verify sets survive — __shingles/__sig are dead once __bands is
    * computed, and caching them would double the sketch footprint. */
  def sketch(df: DataFrame, cfg: Config = Config()): DataFrame =
    df.select(
      col(cfg.idCol).as("__id"),
      shingleHashes(col(cfg.textCol), cfg.shingleSize).as("__shingles"),
      shingleIds(col(cfg.textCol), cfg.shingleSize).as("__sids"))
      .withColumn("__sig", signature(col("__shingles"), cfg.numHashes))
      .withColumn("__bands", bandHashes(col("__sig"), cfg.bands, cfg.numHashes))
      .select(col("__id"), col("__sids"), col("__bands"))

  /** (__id, __band, __bh) bucket rows from a [[sketch]] frame — the equi-join
    * key table for batch ([[dedupAgainst]]) and streaming (stream-static
    * band join) incremental dedup. */
  def bandBuckets(sk: DataFrame): DataFrame =
    sk.select(col("__id"), explode(col("__bands")).as("__b"))
      .select(col("__id"), col("__b.band").as("__band"), col("__b.bh").as("__bh"))

  /** Near-duplicate candidate pairs with exact-Jaccard verification over the
    * SAME shingle sets the signatures sketch — the quantity MinHash actually
    * estimates, so banding recall is measurable against an exact all-pairs
    * oracle (and a candidate that survives is a true shingle-level near-dup).
    * Returns (d1, d2, jac) with d1 < d2 and jac >= cfg.jaccardThreshold·100.
    *
    * Shuffle discipline (the 100 TB shape): the band-bucket self-join and the
    * (d1,d2) dedup run over ID-ONLY rows — the shingle arrays never enter the
    * bucket shuffle. Shingle sets are re-attached afterwards by two equi-joins
    * against the prepared table, so the wide payload crosses the wire only
    * |verified candidates| times, not |bucket pairs|·|bands| times. */
  def nearDupPairs(df: DataFrame, cfg: Config = Config()): DataFrame = {
    val prepared = sketch(df, cfg)
      // persisted (spill-safe): four plan branches reuse this frame — the two
      // bucket-join sides and the two set re-joins — and Catalyst cannot
      // share an uncached subplan across them (measured 27x slower uncached).
      // Sketch rows are bounded (ids + hashes + shingle-id sets, no raw text).
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // r14 (guide §2.4): dedup of multi-band candidate pairs is a SCALAR
    // predicate — keep a pair only in its FIRST matching band
    // (graft_first_eq_slot over the position-aligned band-hash arrays both
    // sides already computed) — instead of a dropDuplicates exchange over
    // the candidate multiset. Identical pair set; the band-hash array adds
    // `bands` longs per bucket row on the corpus side, while the pair
    // stream (≫ corpus on dup-heavy input, the whole point of dedup)
    // stops crossing any exchange.
    val bk = prepared.select(col("__id"), col("__bands")("bh").as("__bhs"),
        explode(col("__bands")).as("__b"))
      .select(col("__id"), col("__bhs"),
        col("__b.band").as("__band"), col("__b.bh").as("__bh"))
    val a = bk.alias("a")
    val b = bk.alias("b")
    val firstEq = org.apache.spark.sql.graft.bridge.column(
      graft.expressions.FirstEqSlot(
        org.apache.spark.sql.graft.bridge.expression(col("a.__bhs")),
        org.apache.spark.sql.graft.bridge.expression(col("b.__bhs"))))
    val cand = a.join(b,
        col("a.__band") === col("b.__band") &&
        col("a.__bh") === col("b.__bh") &&
        col("a.__id") < col("b.__id"))
      .filter(firstEq === col("a.__band"))
      .select(col("a.__id").as("d1"), col("b.__id").as("d2"))

    val sets = prepared.select(col("__id"), col("__sids"))
    val withSets = cand
      .join(sets.select(col("__id").as("d1"), col("__sids").as("t1")), "d1")
      .join(sets.select(col("__id").as("d2"), col("__sids").as("t2")), "d2")

    // Threshold on the RAW ratio, round only for output — oracle-identical
    // boundary semantics (the kernel computes ((double)|∩|·100)/|∪| with
    // set semantics and 0.0 for empty∪empty, exactly the previous
    // size(array_intersect)/size(array_union) formulation, in ONE hash-set
    // pass inside codegen). The shingle-id arrays are array_distinct-ed at
    // construction, so the kernel is marked assumeDistinct and the
    // >= threshold filter triggers plans.JaccardPrefilter's header-only
    // size prune.
    val jacRaw = org.apache.spark.sql.graft.bridge.column(
      graft.expressions.ArraySetJaccard(
        org.apache.spark.sql.graft.bridge.expression(col("t1")),
        org.apache.spark.sql.graft.bridge.expression(col("t2")),
        assumeDistinct = true))
    withSets
      .withColumn("__jac_raw", jacRaw)
      .filter(col("__jac_raw") >= cfg.jaccardThreshold * 100.0)
      .select(col("d1"), col("d2"), round(col("__jac_raw"), 4).as("jac"))
  }

  /** Exact-duplicate removal by content hash: keeps the smallest id per
    * distinct text (deterministic, unlike a bare dropDuplicates).
    *
    * min_by partial aggregation, not a window (r9): the window form
    * shuffled EVERY row to its content-hash partition and sorted each
    * group; min_by keeps one survivor row per hash per map partition, so
    * the exchange carries ~distinct-text rows — on dup-heavy input (the
    * whole point of dedup) that is the dup factor in shuffle savings.
    * Ties impossible (ids unique), so the pick is deterministic. */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cols = df.columns
    df.groupBy(md5(col(textCol).cast("binary")).as("__h"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__r"))
      .select(col("__r.*"))
  }

  /** INCREMENTAL dedup: the rows of `batch` that duplicate nothing in
    * `corpus` — exactly (same text) or nearly (shingle Jaccard ≥ threshold).
    *
    * This is the shape a 100 TB ingest actually runs: the standing corpus is
    * never re-deduped against itself; each arriving batch is checked against
    * it. Two gates, cheap one first:
    *   1. exact-content: anti-join on md5(text) — only 16-byte hashes cross
    *      the wire, and it also catches sub-shingle-length exact dups whose
    *      empty shingle sets the Jaccard gate defines as jac = 0.
    *   2. near-dup: batch [[sketch]] bucket-joined against the corpus
    *      [[sketch]] on (band, bandhash) — a batch×corpus equi-join, NOT a
    *      corpus self-join — candidates verified by exact shingle-set
    *      Jaccard, matched batch ids anti-joined away.
    * The corpus side is accepted pre-sketched (pass `corpusSketch` built by
    * [[sketch]] and persisted/written once) so successive batches reuse it;
    * the convenience overload sketches a raw corpus frame per call.
    *
    * Returns surviving `batch` rows with their original columns. Batch and
    * corpus id spaces may overlap — candidate pairs are keyed (batch id,
    * corpus id), never compared for order. */
  def dedupAgainst(batch: DataFrame, corpusSketch: DataFrame,
                   corpusTextHashes: DataFrame, cfg: Config): DataFrame = {
    val exactSurvivors = batch.join(
        corpusTextHashes.select(col("__h")).distinct(),
        md5(col(cfg.textCol).cast("binary")) === col("__h"), "left_anti")

    val bs = sketch(exactSurvivors, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // first-matching-band dedup of (batch, corpus) candidates — the same
    // scalar-predicate replacement for dropDuplicates as nearDupPairs (r14)
    def bucketsWithBhs(sk: DataFrame): DataFrame =
      sk.select(col("__id"), col("__bands")("bh").as("__bhs"),
          explode(col("__bands")).as("__b"))
        .select(col("__id"), col("__bhs"),
          col("__b.band").as("__band"), col("__b.bh").as("__bh"))
    val a = bucketsWithBhs(bs).alias("a")
    val c = bucketsWithBhs(corpusSketch).alias("c")
    val firstEq = org.apache.spark.sql.graft.bridge.column(
      graft.expressions.FirstEqSlot(
        org.apache.spark.sql.graft.bridge.expression(col("a.__bhs")),
        org.apache.spark.sql.graft.bridge.expression(col("c.__bhs"))))
    val cand = a.join(c,
        col("a.__band") === col("c.__band") && col("a.__bh") === col("c.__bh"))
      .filter(firstEq === col("a.__band"))
      .select(col("a.__id").as("bid"), col("c.__id").as("cid"))

    val jacRaw = org.apache.spark.sql.graft.bridge.column(
      graft.expressions.ArraySetJaccard(
        org.apache.spark.sql.graft.bridge.expression(col("t1")),
        org.apache.spark.sql.graft.bridge.expression(col("t2")),
        assumeDistinct = true))
    val dupIds = cand
      .join(bs.select(col("__id").as("bid"), col("__sids").as("t1")), "bid")
      .join(corpusSketch.select(col("__id").as("cid"), col("__sids").as("t2")), "cid")
      .filter(jacRaw >= cfg.jaccardThreshold * 100.0)
      .select(col("bid")).distinct()

    exactSurvivors.join(dupIds,
      exactSurvivors(cfg.idCol) === dupIds("bid"), "left_anti")
  }

  /** [[dedupAgainst]] with the corpus sketched in-call (single-batch use;
    * an ingest loop should build the corpus [[sketch]] + text-hash table
    * once and pass them in). */
  def dedupAgainst(batch: DataFrame, corpus: DataFrame,
                   cfg: Config = Config()): DataFrame = {
    val cs = sketch(corpus, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dedupAgainst(batch, cs,
      corpus.select(md5(col(cfg.textCol).cast("binary")).as("__h")), cfg)
  }
}
