package graft.candidates

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked candidate-pair generation — the engine's rewrite of the reference's
  * `pairup` (reference feature/Utils.scala:46-105 + driver collect/broadcast
  * ExtractCandidates.scala:150-169, SURVEY J2).
  *
  * The reference collects the whole metadata table to the driver, broadcasts
  * it, and flatMaps a quadratic loop — which caps the corpus at driver memory.
  * Here pair generation is ONE declarative self-join:
  *   - blocking label equality (k-means/LDA `prediction`) is the EQUI key, so
  *     Catalyst plans a shuffled hash/sort-merge join partitioned by cluster —
  *     each executor sees only its clusters' rows (the ~27× pair cut,
  *     docs/tuning_kmeans.md:200-207, without a driver round-trip);
  *   - pk1 < pk2 dedups symmetric pairs (Utils.scala:75,88);
  *   - group1 != group2 is the cross-state constraint;
  *   - the optional length-ratio band |l1−l2|/√(l1·l2) < maxRatio is
  *     optimization level 2 (Utils.scala:79,96).
  * AQE's skew-join handling replaces hand salting for hot clusters (the
  * 27 800-doc cluster of docs/tuning_kmeans.md:130).
  */
final case class CandidateConfig(
    keyCol: String = "primary_key",
    groupCol: String = "state",       // pairs must differ on this
    blockCol: Option[String] = Some("prediction"), // pairs must match on this
    lengthCol: Option[String] = None,
    maxLengthRatio: Double = 0.26,
    includeKeys: Option[Seq[String]] = None, // P4 include list
    excludeKeys: Option[Seq[String]] = None) // P4 exclude list

object Candidates {

  /** Self-join producing (pk1, pk2) candidate pairs under `cfg`. */
  def pairs(df: DataFrame, cfg: CandidateConfig): DataFrame = {
    val base = (cfg.includeKeys, cfg.excludeKeys) match {
      case (Some(keys), _) => df.filter(col(cfg.keyCol).isin(keys: _*))
      case (_, Some(keys)) => df.filter(!col(cfg.keyCol).isin(keys: _*))
      case _ => df
    }
    val cols = Seq(cfg.keyCol, cfg.groupCol) ++ cfg.blockCol ++ cfg.lengthCol
    val t = base.select(cols.distinct.map(col): _*)
    val a = t.alias("a")
    val b = t.alias("b")
    def ac(c: String) = col(s"a.$c")
    def bc(c: String) = col(s"b.$c")

    val blockCond: Column = cfg.blockCol
      .map(c => ac(c) === bc(c))
      .getOrElse(lit(true))
    val lengthCond: Column = cfg.lengthCol.map { c =>
      abs(ac(c) - bc(c)) / sqrt(ac(c).cast("double") * bc(c)) < cfg.maxLengthRatio
    }.getOrElse(lit(true))

    a.join(b,
        blockCond &&
        (ac(cfg.keyCol) < bc(cfg.keyCol)) &&
        (ac(cfg.groupCol) =!= bc(cfg.groupCol)) &&
        lengthCond)
      .select(ac(cfg.keyCol).as("pk1"), bc(cfg.keyCol).as("pk2"))
  }

  /** Level-0 UNBLOCKED pair generation with the reference's `onlyInOut`
    * switch (reference feature/Utils.scala:68-105, optimize=0): no blocking
    * label — every cross-group pair of the corpus. `onlyInOut = true`
    * emits ORDERED pairs (`pk1 != pk2`, both orientations, the reference's
    * in→out direction semantics); `false` canonicalizes `pk1 < pk2` (each
    * unordered pair once).
    *
    * This is deliberately the reference's tiny-corpus escape hatch and an
    * ANTI-SCALE mode: with no equi-key the plan is a filtered cartesian
    * join, O(n²) pairs. Kept for reference parity and small ad-hoc corpora
    * ONLY — at any real scale use [[pairs]], whose blocking label is the
    * join's equi-key. */
  def pairsLevel0(df: DataFrame, cfg: CandidateConfig,
                  onlyInOut: Boolean = false): DataFrame = {
    val base = (cfg.includeKeys, cfg.excludeKeys) match {
      case (Some(keys), _) => df.filter(col(cfg.keyCol).isin(keys: _*))
      case (_, Some(keys)) => df.filter(!col(cfg.keyCol).isin(keys: _*))
      case _ => df
    }
    val t = base.select(Seq(cfg.keyCol, cfg.groupCol).distinct.map(col): _*)
    val a = t.alias("a")
    val b = t.alias("b")
    def ac(c: String) = col(s"a.$c")
    def bc(c: String) = col(s"b.$c")
    val keyCond =
      if (onlyInOut) ac(cfg.keyCol) =!= bc(cfg.keyCol)
      else ac(cfg.keyCol) < bc(cfg.keyCol)
    a.join(b, keyCond && (ac(cfg.groupCol) =!= bc(cfg.groupCol)))
      .select(ac(cfg.keyCol).as("pk1"), bc(cfg.keyCol).as("pk2"))
  }

  /** [[pairs]] with a QUADRATIC-BLOWUP GUARD for oversized blocks — the
    * reference's documented scale cliff (one 27 800-doc k-means cluster ⇒
    * 3.9e8 pairs, docs/tuning_kmeans.md:130,182; AQE splits the hot tasks
    * but cannot reduce the pair COUNT, which is inherent to all-pairs).
    *
    * Blocks with ≤ `maxBlockSize` rows run the exact all-pairs join
    * unchanged. Oversized blocks switch to banded MinHash LSH over each
    * row's feature SUPPORT (nonzero indices): signatures are a narrow
    * per-row map, the bucket key (block, band, bandhash) is the join's
    * equi-key, and the pair count collapses from n² to bucket-local —
    * retaining pairs with high support overlap, which is exactly the set a
    * downstream cosine/jaccard top-K can score highly (disjoint supports ⇒
    * similarity 0). Recall for support-Jaccard s is 1-(1-s^r)^bands,
    * r = numHashes/bands — ≥ 0.998 at s ≥ 0.8 with the defaults.
    *
    * The cap is a per-block PAIR budget in disguise (n² vs n·bucket): at
    * 100 TB this bounds the worst block's work without giving up the exact
    * path where it is affordable. Note the two branches each re-evaluate the
    * `base ⋈ sizes` lineage (Spark only shares the shuffle exchange, not the
    * scan): callers running over an expensive upstream should persist `df` —
    * the engine's own callers feed the already-cached feature frame. */
  def pairsWithBudget(df: DataFrame, cfg: CandidateConfig, featuresCol: String,
                      maxBlockSize: Long, numHashes: Int = 32,
                      bands: Int = 16): DataFrame = {
    val blockC = cfg.blockCol.getOrElse(
      throw new IllegalArgumentException("pairsWithBudget requires blockCol"))
    val base = (cfg.includeKeys, cfg.excludeKeys) match {
      case (Some(keys), _) => df.filter(col(cfg.keyCol).isin(keys: _*))
      case (_, Some(keys)) => df.filter(!col(cfg.keyCol).isin(keys: _*))
      case _ => df
    }
    val sizes = base.groupBy(col(blockC)).agg(count(lit(1)).as("__bn"))
    val tagged = base.join(sizes, blockC) // small agg side: AQE broadcasts it

    val exact = pairs(tagged.filter(col("__bn") <= maxBlockSize).drop("__bn"), cfg)

    val big = tagged.filter(col("__bn") > maxBlockSize).drop("__bn")
    val support = udf((v: org.apache.spark.ml.linalg.Vector) =>
      v.toSparse.indices.map(_.toLong))
    val cols = Seq(cfg.keyCol, cfg.groupCol, blockC) ++ cfg.lengthCol
    val sketched = big
      .select((cols.distinct.map(col) :+ support(col(featuresCol)).as("__sup")): _*)
      // EMPTY supports (all-zero feature rows) get the identical all-sentinel
      // MinHash signature, so inside an oversized block they would collide in
      // every band — re-creating exactly the n² the guard exists to kill —
      // while a disjoint support can never score above similarity 0
      // downstream: drop them, no candidate is lost
      .filter(size(col("__sup")) > 0)
      .select((cols.distinct.map(col) :+
        graft.dedup.MinHashDedup.signature(
          col("__sup"), numHashes).as("__sig")): _*)
      .select((cols.distinct.map(col) :+
        explode(graft.dedup.MinHashDedup.bandHashes(
          col("__sig"), bands, numHashes)).as("__b")): _*)
      .select((cols.distinct.map(col) :+
        col("__b.band").as("__band")) :+ col("__b.bh").as("__bh"): _*)
    val a = sketched.alias("a")
    val b = sketched.alias("b")
    def ac(c: String) = col(s"a.$c")
    def bc(c: String) = col(s"b.$c")
    val lengthCond: Column = cfg.lengthCol.map { c =>
      abs(ac(c) - bc(c)) / sqrt(ac(c).cast("double") * bc(c)) < cfg.maxLengthRatio
    }.getOrElse(lit(true))
    val lshPairs = a.join(b,
        (ac(blockC) === bc(blockC)) &&
        (ac("__band") === bc("__band")) && (ac("__bh") === bc("__bh")) &&
        (ac(cfg.keyCol) < bc(cfg.keyCol)) &&
        (ac(cfg.groupCol) =!= bc(cfg.groupCol)) &&
        lengthCond)
      .select(ac(cfg.keyCol).as("pk1"), bc(cfg.keyCol).as("pk2"))
      .dropDuplicates("pk1", "pk2")

    exact.unionByName(lshPairs)
  }

  /** J1: attach a payload column (e.g. features) to both sides of each pair —
    * the reference's twoSidedJoin (Utils.scala:251-260) as two equi-joins;
    * Catalyst broadcasts `payload` when it is small enough. */
  def attachBothSides(pairs: DataFrame, payload: DataFrame,
                      keyCol: String, valueCol: String): DataFrame = {
    val p1 = payload.select(col(keyCol).as("__k1"), col(valueCol).as(s"${valueCol}_1"))
    val p2 = payload.select(col(keyCol).as("__k2"), col(valueCol).as(s"${valueCol}_2"))
    pairs
      .join(p1, col("pk1") === col("__k1")).drop("__k1")
      .join(p2, col("pk2") === col("__k2")).drop("__k2")
  }
}
