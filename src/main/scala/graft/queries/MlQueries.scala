package graft.queries

import graft.QueryDef
import graft.candidates.{CandidateConfig, Candidates}
import graft.cluster.Clustering
import graft.dedup.{MinHashDedup, PrefixJoin, SimHash}
import graft.io.Tables
import graft.linalg.Dimsum
import graft.lsh.LshJoins
import graft.similarity.Kernels
import graft.text.{FeatureConfig, FeaturePipeline, TextOps}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML-surface operators (SURVEY §2.9, M1-M13) on the `documents` corpus (the
  * bills-table stand-in) — feature extraction, clustering/topics/LSA blocking,
  * LSH joins, DIMSUM, MinHash/SimHash dedup, and the flagship end-to-end
  * bill-match pipeline. Seeds fixed. ML fits are rows-only + gate-pinned
  * (DuckDB has no ML analogue; semantic checks live in the ScalaTest
  * suites), but every sketch family also carries an externally-replayable
  * gate: exact-Jaccard oracles for the dedup joins, md5 signature replay
  * for SimHash (q_simhash_dedup) and MinHash (q_minhash_sig), and DIMSUM's
  * exact threshold-0 limit (q_dimsum_exact).
  */
object MlQueries {

  /** Spark's english StopWordsRemover list as a SQL IN-list literal, so the
    * CountVectorizer oracle applies the identical stopword filter. */
  private[queries] lazy val stopwordSqlList: String =
    org.apache.spark.ml.feature.StopWordsRemover.loadDefaultStopWords("english")
      .map(w => "'" + w.replace("'", "''") + "'").mkString(",")

  private val tfidfCfg = FeatureConfig(numTextFeatures = 1024)

  /** The affine MinHash coefficient table as SQL VALUES rows, generated from
    * the SAME [[MinHashDedup.coefficients]] the engine kernel uses — the
    * oracle then recomputes every signature slot independently (shingle →
    * md5 hash → min over (a·h+b) mod P), so a drifted kernel, shingle
    * construction, or sentinel rule turns q_minhash_sig red. */
  private[queries] lazy val minhashCoefSqlValues: String = {
    val (as, bs) = MinHashDedup.coefficients(16)
    as.indices.map(k => s"(${k}, ${as(k)}, ${bs(k)})").mkString(", ")
  }

  /** Same family at numHashes = 32 — `Candidates.pairsWithBudget`'s default
    * support-MinHash width, for the q_candidates_budget_exact oracle. */
  private[queries] lazy val budgetCoefSqlValues: String = {
    val (as, bs) = MinHashDedup.coefficients(32)
    as.indices.map(k => s"(${k}, ${as(k)}, ${bs(k)})").mkString(", ")
  }

  /** The Spark ML MinHashLSH model's own (a, b) hash coefficients for
    * seed 12345 / 16 tables, reproduced by the estimator's documented
    * derivation (Spark MinHashLSH.fit: `new Random($(seed))`, then per table
    * `(1 + nextInt(HASH_PRIME - 1), nextInt(HASH_PRIME - 1))`,
    * HASH_PRIME = 2038074743). LshJoinsSpec pins this reproduction against
    * the fitted model's private coefficients by reflection, so a Spark
    * upgrade that changes the derivation fails `sbt test` LOUDLY instead of
    * silently reddening the q_minhash_lsh oracle. */
  private[queries] lazy val mlMinhashCoefSqlValues: String = {
    val r = new scala.util.Random(12345L)
    (0 until 16).map { k =>
      val a = 1 + r.nextInt(2038074743 - 1)
      val b = r.nextInt(2038074743 - 1)
      s"($k, $a, $b)"
    }.mkString(", ")
  }

  /** The fitted BucketedRandomProjectionLSH model's 3 random unit vectors
    * for seed 12345 at dim 64 — GOLDEN CONSTANTS extracted from the model
    * itself (Double.toString is shortest-round-trip, so both this literal
    * and the DuckDB-parsed copy are bit-identical to the model's doubles).
    * An RNG-replay derivation was tried first but Spark's normalization
    * rounds differently in the last ulp at dim 64, so the extraction is
    * golden-pinned instead: LshJoinsSpec compares the fitted model's vectors
    * to THESE literals by reflection — estimator drift fails `sbt test`
    * loudly, exactly the stemmer golden-VALUES contract. */
  private[graft] lazy val brpUnitVectors: Array[Array[Double]] = Array(
      Array(-0.021545244263604903, 0.06750477679642078, 0.10884585871093154, -0.056703349930264865, -0.14034849486931816, -0.08006932891410677, -0.08916239979224563, 0.23723972239817856, -0.06737978306861402, 0.05301681415738194, 0.15769053833849175, -0.011225614862279335, -0.12348761729563112, 0.1420149632581532, 0.07574484329825806, -0.02713991657280294, -0.09910453738653528, 0.013399215257832275, -0.0877604805475323, -0.07073371431236779, 0.010588591555839905, -0.024446027039342746, -0.04269764100068935, 0.04995481271385698, -0.06072010878701209, -0.15976630138602593, -0.10098923885327385, 0.02326390209851016, -0.27208789625301605, -0.009664077404908662, 0.021537747806250927, 0.09145922182313124, 0.003686376483318534, 0.06372947257396515, -0.32201447542717276, 0.23274147901008363, 0.160928947415411, -0.008808375365685614, 0.08576181582623803, 0.1951514150141344, 0.03751977867767384, -0.10035162267716051, -0.034724033999350985, -0.14542792629466328, -0.08483693492588618, -0.18361799024104786, 0.1399852778820853, 0.13441446118476508, -0.2052877259776924, 0.055624373790485716, 0.12296581748013152, 0.15952021968563562, 0.28929580939722277, 0.08822883207041601, 0.02810825435238399, 0.12144150072636625, 0.15150328206871366, 0.03319790470302765, -0.03259632380550266, 0.11226442571484915, 0.017063816744783095, 0.07705485971712443, 0.13549285323462595, 0.25260930919024066),
      Array(-0.16487890255290671, -0.21081198421191188, -0.07531080668173987, -0.1633724856157685, -0.001518496928981591, -0.06415750362680686, 0.12087615490149012, 0.05264909845987418, -0.13466708141389583, 0.16442311184030933, -0.127963167480195, 0.014411729410658457, -6.220063801664852E-4, -0.07810294563808055, -0.0038547665584941723, 0.07772690429341428, -0.3111878827047169, -0.028757716991026076, -0.03316290012775147, 0.08051706317047012, 0.008381110597978894, -0.03719502430018198, 0.24733013684229807, 0.1016875121916912, -0.0761318964376968, 0.034002845752106506, 0.0535648214182276, 0.043147743562655674, 0.01760949708939141, -0.2380064102791983, -0.08415837430001033, -0.273614939361309, -0.005792408889912242, 0.12069580409689266, 0.0825558386260343, -0.1278446197373569, 0.003678170053573539, -0.14165948431395012, 6.854847105878124E-4, 0.1274808144170331, -0.15596267945040262, 0.029291858091003237, -0.26589601979856786, -0.11562256846416738, 0.03291366191392344, -0.12639248714921272, -0.01996145247508682, -0.0411732084445934, -0.20891361479045067, 0.07984601718600667, -0.09999497034935272, -0.05331747519399888, 0.0022520139255995616, -0.1490803923846238, 0.07881192811119604, -0.2217831279023804, -0.20345852042600643, -0.19390793547039645, 0.13886677841942335, 0.0896821018163475, 0.06403193554520936, 0.023454664261872052, 0.05559036239474915, 0.12143665576385879),
      Array(-0.058427518044317416, 0.04801462468881679, -0.09847973190893124, 0.05104264779889858, 0.14037981399114424, 0.012841695334902982, -0.24993193043744233, -0.17408557386479803, 0.06589562247922001, -0.0702868428710073, -0.09287712557322007, -0.07667595230733708, -0.018611955910368596, 0.04236799387495172, -0.03115797431674651, -0.17369641188798987, 0.06224428508019241, 0.12023089192039738, -0.14128810545629925, 0.06106590387558081, -0.09164421467282761, -0.20363414125857282, 0.017954161227653243, 0.1570823250952804, 0.21643431945777003, 0.09265870465617668, 0.17728027374643376, 0.22002172887786475, 0.014425111082667029, -0.2804990458714965, 0.2099930258892217, -0.025769370737064298, -0.023343228772693573, -0.10189451822618002, 0.18590525459156007, -0.14478669155338544, -0.09940570940630425, -0.02695100762677115, -0.16730726516449032, -0.11934751675602286, -0.16135137197966581, 0.0905606624420629, 0.007702738279629521, 0.11354779069719129, -0.12077401936735062, 0.09329942396630313, 0.16803430381593887, -0.06937472353511245, 0.09279601766383784, -0.1405999650003041, 0.056900020782951345, 0.24102481792684516, 0.11890607960108979, 0.10402477486585171, -0.06591346620106692, -0.15801447142898514, 0.09820021210460761, 0.06533771896928116, -0.18727611771458302, -0.05871199769101712, -0.021663771486229114, 0.12764643208249152, 0.02145293311317744, 0.0017989093479777154))

  private[queries] lazy val brpUnitVectorSqlValues: String =
    brpUnitVectors.zipWithIndex.map { case (u, j) =>
      s"($j, [${u.mkString(", ")}])"
    }.mkString(", ")

  private val featCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private val featCountCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private val kmeansCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Shared k-means blocking (k=8) over [[featurized]] — the reference
    * likewise wrote the clustered features parquet once and fed it to every
    * downstream stage (ExtractCandidates.scala:145). Since r11 the only
    * registry consumer is q_kmeans_blocks (q_billmatch and
    * q_candidates_budget moved to pinned block labels so their full
    * pipelines gate in DuckDB); the memo still shares the fit with any
    * ad-hoc composition. The frame itself is deliberately NOT cached —
    * model.transform over the cached features is a trivial map, and an
    * InMemoryRelation here would inflate Catalyst's size estimate and flip
    * downstream pair⋈features joins from broadcast to a shuffle of the wide
    * vectors (measured 6× slower). */
  private def clustered8(s: SparkSession, d: String): DataFrame =
    kmeansCache.getOrElseUpdate((s, d),
      Clustering.kmeans(featurized(s, d), k = 8, maxIter = 10,
        fitOrderCol = Some("doc_id"))._2)

  /** The testdata ships one small parquet file per table = ONE input split,
    * which would serialize every per-row featurization map on a single core.
    * Spread it across a fixed fan-out (fixed, not defaultParallelism, so the
    * k-means init sampling sees identical partitioning on any machine). On a
    * real 100 TB table the scan is already thousands of splits and this
    * repartition would be dropped — the reference's count-based repartition
    * (ExtractCandidates.scala:102) is the same testdata-scale fix. */
  private def spread(df: DataFrame): DataFrame = df.repartition(32)

  /** documents → (doc_id, lang, n_chars, features) with TF-IDF features.
    * Cached per (session, dir): the k-means fit, the candidate self-join, and
    * the pair→vector joins all reuse this frame — without the cache the whole
    * clean→tokenize→TF→IDF lineage recomputes on every reuse (the reference
    * cached its features parquet for the same reason,
    * ExtractCandidates.scala:106). */
  private def featurized(s: SparkSession, d: String): DataFrame =
    featCache.getOrElseUpdate((s, d),
      FeaturePipeline.features(spread(Tables.documents(s, d)), tfidfCfg)
        .select("doc_id", "lang", "n_chars", "features")
        .cache())

  /** No-IDF murmur3-hashed COUNT features (1024 buckets) — the fully
    * DuckDB-replayable featurization (mm_hash CTE + per-bucket COUNT) used
    * by the pinned-block-label [sql] gates (q_billmatch,
    * q_candidates_budget, q_candidates_budget_exact). Cached per
    * (session, dir) like [[featurized]]: three gates share one
    * clean→tokenize→hash pass. */
  private def featurizedCounts(s: SparkSession, d: String): DataFrame =
    featCountCache.getOrElseUpdate((s, d),
      FeaturePipeline.features(spread(Tables.documents(s, d)),
        FeatureConfig(numTextFeatures = 1024, useIdf = false))
        .select("doc_id", "lang", "n_chars", "features")
        .cache())

  /** Drop the memoized feature frames + k-means fit (and unpersist the
    * cached features so Spark's CacheManager cannot plan-match a rebuilt
    * lineage onto the old InMemoryRelation). Benchmark hook: lets Bench
    * re-measure the FIT cost on every repetition instead of the cache hit;
    * also Verify's repeat-gate hook for fit-memoizing pins.
    * Entries are removed one-by-one with the atomic (key, value) remove —
    * a sweep-then-clear() would silently drop (never unpersist) a frame a
    * concurrent getOrElseUpdate inserted between the two steps (r11
    * self-review); with per-entry removal a racing insert simply survives
    * with its cache intact. */
  def clearFitCaches(): Unit = {
    for ((k, df) <- featCache.toSeq if featCache.remove(k, df))
      { scala.util.Try(df.unpersist(blocking = true)); () }
    for ((k, df) <- featCountCache.toSeq if featCountCache.remove(k, df))
      { scala.util.Try(df.unpersist(blocking = true)); () }
    kmeansCache.toSeq.foreach { case (k, v) => kmeansCache.remove(k, v); () }
  }

  /** Drop ONLY the memoized seeded FIT for this (session, dir) — Verify's
    * repeat-gate hook (QueryDef.refitGate). The repeat gate must re-TRAIN
    * the seeded model, not re-count a memo, but it must NOT evict the
    * shared feature caches: Verify runs pinned queries inside a concurrent
    * batch pool, and a full [[clearFitCaches]] there unpersisted
    * featCache/featCountCache out from under concurrently running pool
    * queries (repeated evictions per gate run — exactly the cost the
    * pool-scoping comment says the design avoids) while a racing
    * getOrElseUpdate could double-evaluate and orphan an InMemoryRelation
    * (ADVICE r11). The fit memo's value is an UNcached frame
    * (model.transform over the cached features — see [[clustered8]]), so
    * removal needs no unpersist and a racing re-insert leaks nothing. */
  def clearFitMemo(s: SparkSession, d: String): Unit = {
    kmeansCache.remove((s, d)); ()
  }

  val defs: Map[String, QueryDef] = Map(

    // ----- M1/M2/M5/M7: clean→tokenize→stopwords→HashingTF→IDF.
    // FULL [sql] gate: the oracle replays the whole path — the q_count_
    // vectorized token pipeline, then HashingTF's murmur3_x86_32 bucketing
    // re-derived in DuckDB integer arithmetic (graft.text.Murmur3
    // .oracleSqlCtes — the splitmix64-replay pattern; Murmur3Spec proves the
    // arithmetic ≡ HashingTF.indexOf bit-for-bit), then IDF's one observable
    // effect on nnz: a bucket present in EVERY doc gets idf = ln(1) = 0 and
    // drops out of numNonzeros. Bucket collisions at 1024 features are real
    // on this corpus, so nnz ≠ distinct-term count — the hash itself is
    // what's gated.
    "q_tfidf_features" -> QueryDef.sql(s"""
      WITH toks AS (
        SELECT doc_id, UNNEST(list_distinct(list_filter(
          regexp_split_to_array(
            regexp_replace(regexp_replace(lower(text), '(\\d|,|:|;|\\?|!)', '', 'g'),
                           '\\b\\w{1,2}\\b', '', 'g'), '\\W'),
          x -> x <> '' AND x NOT IN (${MlQueries.stopwordSqlList})))) AS term
        FROM documents),
      terms AS (SELECT DISTINCT term FROM toks),
      ${graft.text.Murmur3.oracleSqlCtes("terms", 1024, words = 8)},
      db AS (SELECT DISTINCT t.doc_id, h.bucket FROM toks t JOIN mm_hash h USING (term)),
      dfreq AS (SELECT bucket, COUNT(*) AS df FROM db GROUP BY bucket),
      m AS (SELECT COUNT(*) AS m FROM documents),
      nz AS (SELECT db.doc_id, COUNT(*) AS nnz
             FROM db JOIN dfreq USING (bucket), m WHERE dfreq.df < m.m
             GROUP BY db.doc_id)
      SELECT d.doc_id, CAST(COALESCE(nz.nnz, 0) AS INTEGER) AS nnz
      FROM documents d LEFT JOIN nz USING (doc_id) ORDER BY doc_id""") { (s, d) =>
      // r14: numNonzeros as size(graft_vector_nz_indices) — the same
      // values-!=-0 count the UDF computed, with zero UDFs left on the path
      val nnz = size(org.apache.spark.sql.graft.bridge.column(
        graft.expressions.VectorNzIndices(
          org.apache.spark.sql.graft.bridge.expression(col("features")))))
      featurized(s, d)
        .select(col("doc_id"), nnz.as("nnz"))
        .orderBy("doc_id")
    },

    // ----- M6: CountVectorizer path. Gate variant uses an unbounded vocab so
    // nnz == per-doc distinct post-pipeline terms, which the oracle mirrors
    // exactly (clean -> drop-short-words -> \W tokenize -> english stopwords);
    // the bounded-vocab cut is order-dependent at ties and stays spec-covered.
    "q_count_vectorized" -> QueryDef.sql(s"""
      SELECT doc_id, CAST(len(list_filter(list_distinct(
               regexp_split_to_array(
                 regexp_replace(regexp_replace(lower(text), '(\\d|,|:|;|\\?|!)', '', 'g'),
                                '\\b\\w{1,2}\\b', '', 'g'), '\\W')),
             x -> x <> '' AND x NOT IN (${MlQueries.stopwordSqlList}))) AS INTEGER) AS nnz
      FROM documents ORDER BY doc_id""") { (s, d) =>
      val cfg = FeatureConfig(useCountVectorizer = true, vocabLimit = 1 << 18, useIdf = false)
      val nnz = size(org.apache.spark.sql.graft.bridge.column(
        graft.expressions.VectorNzIndices(
          org.apache.spark.sql.graft.bridge.expression(col("features")))))
      FeaturePipeline.features(spread(Tables.documents(s, d)), cfg)
        .select(col("doc_id"), nnz.as("nnz"))
        .orderBy("doc_id")
    },

    // ----- M8: k-means blocking labels (reference Utils.scala:129-149)
    "q_kmeans_blocks" -> QueryDef.rowsOnly { (s, d) =>
      val clustered = clustered8(s, d)
      clustered.groupBy("prediction").agg(count(lit(1)).as("n"))
        .orderBy("prediction")
    }.expectAtGate(8L, "4460179844691033791").refitGate,

    // ----- M8 alternative: bisecting k-means blocking (the reference's
    // commented alternative, feature/Utils.scala:138)
    "q_bisecting_blocks" -> QueryDef.rowsOnly { (s, d) =>
      val (_, clustered) = Clustering.bisectingKmeans(featurized(s, d), k = 8,
        fitOrderCol = Some("doc_id"))
      clustered.groupBy("prediction").agg(count(lit(1)).as("n"))
        .orderBy("prediction")
    }.expectAtGate(8L, "5459506461477739356"),

    // ----- M9: LDA topics (reference LDAAnalyzer.scala:85-116)
    // Scalar columns only: the driver's pandas compare cannot sort array
    // cells (round-1 q_lda_topics crash), so explode term indices to rows.
    "q_lda_topics" -> QueryDef.rowsOnly { (s, d) =>
      val (model, _) = Clustering.lda(featurized(s, d), k = 5, maxIter = 10,
        fitOrderCol = Some("doc_id"))
      model.describeTopics(5)
        .select(col("topic"), posexplode(col("termIndices")).as(Seq("pos", "term_index")))
        .orderBy("topic", "pos")
    }.expectAtGate(25L, "14615294557994870357"),

    // ----- workflow-3 end to end: LDA topic label as the BLOCKING key — the
    // reference's third workflow (LDAAnalyzer.scala:109-116 assigns argmax
    // topic, then the AggregatorTest2 per-cluster all-pairs pattern runs
    // inside each topic block). Same skeleton as q_billmatch with the k-means
    // blocker swapped for the topic label: candidate pairs must share a topic
    // and differ on lang, cosine kernel, global top-K. rows-only (LDA fit not
    // SQL-replayable); the block-partitioning invariant is ClusteringSpec's.
    "q_lda_candidates" -> QueryDef.rowsOnly { (s, d) =>
      val (_, topical) = Clustering.lda(featurized(s, d), k = 5, maxIter = 10,
        fitOrderCol = Some("doc_id"))
      val blocked = topical.select(
        col("doc_id"), col("lang"), col("prediction"), col("features"))
      val pairs = Candidates.pairs(blocked, CandidateConfig(
        keyCol = "doc_id", groupCol = "lang", blockCol = Some("prediction")))
      val withVecs = Candidates.attachBothSides(pairs,
        blocked.select(col("doc_id"), col("features")), "doc_id", "features")
      val cosine = Kernels.udfFor("cosine")
      withVecs
        .select(col("pk1"), col("pk2"),
          cosine(col("features_1"), col("features_2")).as("similarity"))
        .orderBy(desc("similarity"), asc("pk1"), asc("pk2"))
        .limit(50)
    }.expectAtGate(50L, "32199987269354545395"),

    // ----- M10: key-preserving LSA projection (fixes SURVEY J6), ORACLE-
    // CHECKED (r9, the q_brp_exact pattern — pin converted to [sql]): the
    // SAME broadcast column-major x → Vᵗx kernel lsaProject runs after its
    // SVD fit (Clustering.projectRows — lsaProject IS computeSVD +
    // projectRows), but with a PINNED basis — the embeddings of vec_id 1..8
    // as V's columns — so every dot product, square and norm is exact
    // arithmetic a DuckDB CTE replays term-for-term (fold order matches the
    // UDF's ascending-index accumulation; ROUND(6) normalizes presentation
    // only). Gates the projection arithmetic minus the SVD fit; the fitted
    // path (separation in concept space, key preservation, output dim) is
    // ClusteringSpec's. 100 TB shape unchanged: basis broadcast, one narrow
    // map, zero joins.
    "q_lsa_project" -> QueryDef.sql("""
      WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      r AS (SELECT vec_id AS bid, v AS rv FROM t WHERE vec_id BETWEEN 1 AND 8),
      d AS (SELECT t.vec_id, r.bid,
              list_reduce(list_transform(range(1, 65), i -> t.v[i]*r.rv[i]),
                          (a,b) -> a+b) AS dj
            FROM t CROSS JOIN r),
      n AS (SELECT vec_id,
              SQRT(list_reduce(list_transform(list(dj ORDER BY bid), x -> x*x),
                               (a,b) -> a+b)) AS raw
            FROM d GROUP BY vec_id)
      SELECT vec_id, ROUND(raw, 6) AS lsa_norm FROM n ORDER BY vec_id""") { (s, d) =>
      import org.apache.spark.ml.functions.array_to_vector
      val t = spread(Tables.embeddings(s, d))
        .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
      val dim = 64
      // pinned basis: embeddings 1..8, column-major — a bounded driver
      // scalar (8 x 64 doubles), the q_brp_exact direction-table pattern
      val basis = t.filter(col("vec_id").between(1L, 8L))
        .select(col("vec_id"), org.apache.spark.ml.functions.vector_to_array(col("features")).as("v"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      val vArr = new Array[Double](dim * basis.length)
      for (((_, vec), j) <- basis.zipWithIndex; i <- 0 until dim)
        vArr(j * dim + i) = vec(i)
      val norm2 = udf((v: Vector) => math.sqrt(v.toArray.map(x => x * x).sum))
      Clustering.projectRows(t, vArr, dim, basis.length)
        .select(col("vec_id"), round(norm2(col("lsa_features")), 6).as("lsa_norm"))
        .orderBy("vec_id")
    },

    // ----- M11/J3: MinHash LSH self-join + asymmetric keyDistance recompute —
    // ORACLE-CHECKED (r9, pin converted to [sql]): every stage of the fitted
    // pipeline is deterministic arithmetic DuckDB replays end-to-end. The
    // binary-TF feature indices are the murmur3 bucket replay proven for
    // q_tfidf_features; the model's 16 per-table hash functions are
    // min((1+i)·a + b mod 2038074743) with seed-derived (a, b) reproduced by
    // the estimator's documented derivation (mlMinhashCoefSqlValues —
    // reflection-pinned against the fitted model in LshJoinsSpec); candidates
    // = pairs sharing a (table, minhash) bucket (equal minhash PROVES a
    // shared argmin element: a·(e1−e2) ≡ 0 mod prime ⇒ e1 = e2, so the
    // verify join never drops a candidate); the exact verify and both
    // asymmetric kernels are functions of (|∩|, |x|, |y|) — jaccard in
    // double, left/right kernels in FLOAT exactly as Kernels computes them.
    // ROUND(6) on both sides normalizes presentation only (the 0.6 threshold
    // is applied to the UNrounded distance on both sides).
    "q_minhash_lsh" -> QueryDef.sql(s"""
      WITH toks AS (
        SELECT doc_id, UNNEST(list_distinct(list_filter(
          regexp_split_to_array(
            regexp_replace(regexp_replace(lower(text), '(\\d|,|:|;|\\?|!)', '', 'g'),
                           '\\b\\w{1,2}\\b', '', 'g'), '\\W'),
          x -> x <> '' AND x NOT IN (${MlQueries.stopwordSqlList})))) AS term
        FROM documents),
      terms AS (SELECT DISTINCT term FROM toks),
      ${graft.text.Murmur3.oracleSqlCtes("terms", 1024, words = 8)},
      db AS (SELECT DISTINCT t.doc_id, h.bucket FROM toks t JOIN mm_hash h USING (term)),
      nz AS (SELECT doc_id, COUNT(*) AS n, list_sort(list(bucket)) AS lb
             FROM db GROUP BY doc_id),
      coef(k, a, b) AS (VALUES ${MlQueries.mlMinhashCoefSqlValues}),
      mh AS (SELECT db.doc_id, c.k,
               MIN(((1 + db.bucket) * CAST(c.a AS BIGINT) + c.b) % 2038074743) AS h
             FROM db CROSS JOIN coef c GROUP BY db.doc_id, c.k),
      cand AS (SELECT DISTINCT x.doc_id AS pk1, y.doc_id AS pk2
               FROM mh x JOIN mh y ON x.k = y.k AND x.h = y.h
                                   AND y.doc_id > x.doc_id),
      scored AS (SELECT c.pk1, c.pk2,
                   1.0 - CAST(len(list_intersect(a.lb, b.lb)) AS DOUBLE)
                         / (a.n + b.n - len(list_intersect(a.lb, b.lb))) AS jd,
                   GREATEST(
                     CAST(len(list_intersect(a.lb, b.lb)) AS FLOAT)
                       / CAST(a.n AS FLOAT) * CAST(100.0 AS FLOAT),
                     CAST(len(list_intersect(a.lb, b.lb)) AS FLOAT)
                       / CAST(b.n AS FLOAT) * CAST(100.0 AS FLOAT)) AS mx
                 FROM cand c JOIN nz a ON a.doc_id = c.pk1
                             JOIN nz b ON b.doc_id = c.pk2)
      SELECT pk1, pk2, ROUND(jd, 6) AS jaccard_dist,
             ROUND(1.0 - CAST(mx AS DOUBLE) / 100.0, 6) AS asym_jaccard_dist
      FROM scored WHERE jd < 0.6 ORDER BY pk1, pk2""") { (s, d) =>
      // spread BEFORE the join: the single-file corpus otherwise leaves the
      // bucket join's probe side one partition (observed 19 min at sf0.1;
      // 32-way spread makes it minutes of parallel work)
      //
      // r13: the featurization is the CleanTokenBuckets kernel — one codegen
      // scan computing the binary-TF nonzero-index SET directly (identical
      // set to FeaturePipeline(numTextFeatures=1024, useIdf=false) nonzeros,
      // fuzz-proven in CleanTokenBucketsSpec) — and the join runs on the
      // set path with the same seed-derived hash family. The former shape
      // paid two full regex passes plus three boxed ML UDFs per document
      // (~35 s CPU per bench pass at sf0.1); output hash-unchanged.
      // PARITY SCOPE (ADVICE r13): "identical set" holds for ASCII text —
      // on non-ASCII input the kernel follows the oracle's ASCII/RE2 \b
      // semantics where the stock Java pipeline keeps 1-2 char runs
      // adjacent to accented letters (divergence pinned in
      // CleanTokenBucketsSpec); a corpus regen with non-ASCII text must
      // not be certified against the stale hash-unchanged claim.
      val buckets = org.apache.spark.sql.graft.bridge.column(
        graft.expressions.CleanTokenBuckets(
          org.apache.spark.sql.graft.bridge.expression(lower(col("text"))),
          1024,
          org.apache.spark.ml.feature.StopWordsRemover
            .loadDefaultStopWords("english").toSeq))
      val sets = spread(Tables.documents(s, d))
        .select(col("doc_id"), buckets.as("__set"))
      LshJoins.minHashSelfJoinSets(sets, "doc_id", "__set", threshold = 0.6)
        .select(col("pk1"), col("pk2"),
          round(col("jaccard_dist"), 6).as("jaccard_dist"),
          round(col("asym_jaccard_dist"), 6).as("asym_jaccard_dist"))
        .orderBy("pk1", "pk2")
    },

    // ----- M12: bucketed random-projection LSH on embeddings — ORACLE-
    // CHECKED (r9, pin converted to [sql]): the estimator's "random" unit
    // vectors are deterministic functions of the seed, so the oracle replays
    // the FULL fitted pipeline — project onto the model's unit vectors
    // (golden-extracted brpUnitVectorSqlValues, reflection-pinned in
    // LshJoinsSpec), floor
    // into bucketLength-0.5 buckets, candidates from shared (table, bucket),
    // exact Euclidean verify under the raw threshold — with the same
    // ascending-index fold order as the BLAS dot/sqdist. ROUND(6)
    // presentation only; threshold 1.15 applies to the UNrounded distance on
    // both sides. (1.15 because the synthetic embeddings' nearest-pair
    // distance is ~0.99: 1.0 returned a single pair, near-vacuous.)
    "q_brp_lsh" -> QueryDef.sql {
      def dotS(x: String, y: String) =
        s"list_reduce(list_transform(range(1, 65), i -> $x[i]*$y[i]), (a,b)->a+b)"
      def sqS(x: String, y: String) =
        s"list_reduce(list_transform(range(1, 65), i -> ($x[i]-$y[i])*($x[i]-$y[i])), (a,b)->a+b)"
      s"""
      WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      rv(j, r) AS (VALUES ${MlQueries.brpUnitVectorSqlValues}),
      bk AS (SELECT t.vec_id, rv.j,
               CAST(FLOOR(${dotS("t.v", "rv.r")} / 0.5) AS BIGINT) AS h
             FROM t CROSS JOIN rv),
      cand AS (SELECT DISTINCT a.vec_id AS pk1, b.vec_id AS pk2
               FROM bk a JOIN bk b ON a.j = b.j AND a.h = b.h
                                   AND b.vec_id > a.vec_id),
      s AS (SELECT pk1, pk2, SQRT(${sqS("x.v", "y.v")}) AS d
            FROM cand JOIN t x ON x.vec_id = cand.pk1
                      JOIN t y ON y.vec_id = cand.pk2)
      SELECT pk1, pk2, ROUND(d, 6) AS dist FROM s
      WHERE d < 1.15 ORDER BY pk1, pk2"""
    } { (s, d) =>
      val vecs = spread(Tables.embeddings(s, d))
        .select(col("vec_id"),
          org.apache.spark.ml.functions.array_to_vector(col("embedding")).as("features"))
      LshJoins.brpSelfJoin(vecs, "vec_id", "features",
        threshold = 1.15, bucketLength = 0.5)
        .select(col("pk1"), col("pk2"), round(col("dist"), 6).as("dist"))
        .orderBy("pk1", "pk2")
    },

    // ----- M12 exact twin, ORACLE-CHECKED (the q_semdedup_exact pattern):
    // the SAME bucketed-random-projection pipeline shape — project onto a few
    // directions, floor into buckets, candidate pairs from shared (table,
    // bucket) via equi-join, exact Euclidean verify under the q_brp_lsh
    // threshold — but with PINNED projection directions (the unit-norm
    // embeddings of vec_id 1..3) instead of Spark ML's seeded random vectors,
    // so every stage is exact arithmetic a DuckDB CTE replays end-to-end.
    // Gates the BRP kernel (bucket → candidate → verify) minus only the RNG;
    // bucketLength 0.05 fits unit-direction dots (∈[-1,1], σ≈1/8 at dim 64):
    // at sf0.01 the bucket join prunes to ~29% of all-pairs and the verify
    // keeps O(100) pairs. Same 100 TB shape as production LSH: the (tid, h)
    // bucket id is the shuffle key, never a corpus-wide cross join — the
    // 3-row direction table is the only broadcast.
    "q_brp_exact" -> QueryDef.sql {
      def dotS(x: String, y: String) =
        s"list_reduce(list_transform(range(1, 65), i -> $x[i]*$y[i]), (a,b)->a+b)"
      def sqS(x: String, y: String) =
        s"list_reduce(list_transform(range(1, 65), i -> ($x[i]-$y[i])*($x[i]-$y[i])), (a,b)->a+b)"
      s"""
      WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      r AS (SELECT vec_id AS tid, v AS rv FROM t WHERE vec_id IN (1, 2, 3)),
      bk AS (SELECT t.vec_id, r.tid,
               CAST(FLOOR(ROUND(${dotS("t.v", "r.rv")} / 0.05, 6)) AS BIGINT) AS h
             FROM t CROSS JOIN r),
      cand AS (SELECT DISTINCT a.vec_id AS pk1, b.vec_id AS pk2
               FROM bk a JOIN bk b ON a.tid = b.tid AND a.h = b.h
                                   AND b.vec_id > a.vec_id)
      SELECT pk1, pk2, dist FROM (
        SELECT pk1, pk2, ROUND(SQRT(${sqS("x.v", "y.v")}), 6) AS dist
        FROM cand JOIN t x ON x.vec_id = cand.pk1
                  JOIN t y ON y.vec_id = cand.pk2)
      WHERE dist < 1.15
      ORDER BY pk1, pk2"""
    } { (s, d) =>
      import graft.similarity.ArrayOps
      val t = spread(Tables.embeddings(s, d))
        .select(col("vec_id"), ArrayOps.asDouble(col("embedding")).as("v"))
      val dirs = t.filter(col("vec_id").isin(1L, 2L, 3L))
        .select(col("vec_id").as("tid"), col("v").as("rv"))
      val bk = t.crossJoin(broadcast(dirs))
        .select(col("vec_id"), col("tid"),
          floor(round(ArrayOps.dot(col("v"), col("rv")) / 0.05, 6)).as("h"))
      val cand = bk.alias("a").join(bk.alias("b"),
          col("a.tid") === col("b.tid") && col("a.h") === col("b.h") &&
          col("b.vec_id") > col("a.vec_id"))
        .select(col("a.vec_id").as("pk1"), col("b.vec_id").as("pk2"))
        .distinct()
      cand
        .join(t.select(col("vec_id").as("pk1"), col("v").as("v1")), "pk1")
        .join(t.select(col("vec_id").as("pk2"), col("v").as("v2")), "pk2")
        .select(col("pk1"), col("pk2"),
          round(ArrayOps.euclidean(col("v1"), col("v2")), 6).as("dist"))
        .filter(col("dist") < 1.15)
        .orderBy("pk1", "pk2")
    },

    // ----- J4: two-phase approx k-NN (reference CustomizedLSH.scala:92-137).
    // The probe is an out-of-corpus token set, so its hash buckets are (nearly
    // always) empty and the query exercises the phase-2 hash-distance
    // widening: sort by min differing-slot count, k-th value as threshold,
    // true-Jaccard top-k over the widened set. ORACLE-CHECKED (r9, pin
    // converted to [sql]): "MinHash bucket internals" stopped being a blocker
    // once the model's hash family became replayable (mlMinhashCoefSqlValues)
    // — the oracle routes the PROBE's tokens through the same murmur3 chain
    // as the corpus, replays both signatures, and reproduces the exact
    // two-phase CONDITIONAL: per-table hash vectors hold one slot, so a
    // doc's min differing-slot count is 0 iff any table matches and the k-th
    // smallest is 0 when ≥ k docs share a bucket, else 1 (the full-scan
    // widening) — then the true-Jaccard top-k with the id tiebreak.
    "q_knn_probe" -> QueryDef.sql(s"""
      WITH toks AS (
        SELECT doc_id, UNNEST(list_distinct(list_filter(
          regexp_split_to_array(
            regexp_replace(regexp_replace(lower(text), '(\\d|,|:|;|\\?|!)', '', 'g'),
                           '\\b\\w{1,2}\\b', '', 'g'), '\\W'),
          x -> x <> '' AND x NOT IN (${MlQueries.stopwordSqlList})))) AS term
        FROM documents),
      probe_toks(term) AS (VALUES ('zyzzyva'), ('quokka'), ('oblast'),
                                  ('plasmid'), ('xylem'), ('fjord')),
      terms AS (SELECT DISTINCT term FROM toks
                UNION SELECT term FROM probe_toks),
      ${graft.text.Murmur3.oracleSqlCtes("terms", 1024, words = 8)},
      db AS (SELECT DISTINCT t.doc_id, h.bucket FROM toks t JOIN mm_hash h USING (term)),
      pb AS (SELECT DISTINCT h.bucket FROM probe_toks p JOIN mm_hash h USING (term)),
      nz AS (SELECT doc_id, COUNT(*) AS n, list_sort(list(bucket)) AS lb
             FROM db GROUP BY doc_id),
      pn AS (SELECT COUNT(*) AS np, list_sort(list(bucket)) AS pl FROM pb),
      coef(k, a, b) AS (VALUES ${MlQueries.mlMinhashCoefSqlValues}),
      mh AS (SELECT db.doc_id, c.k,
               MIN(((1 + db.bucket) * CAST(c.a AS BIGINT) + c.b) % 2038074743) AS h
             FROM db CROSS JOIN coef c GROUP BY db.doc_id, c.k),
      ph AS (SELECT c.k,
               MIN(((1 + pb.bucket) * CAST(c.a AS BIGINT) + c.b) % 2038074743) AS h
             FROM pb CROSS JOIN coef c GROUP BY c.k),
      hd AS (SELECT mh.doc_id, MIN(CASE WHEN mh.h = ph.h THEN 0 ELSE 1 END) AS hd
             FROM mh JOIN ph ON mh.k = ph.k GROUP BY mh.doc_id),
      thr AS (SELECT CASE WHEN (SELECT COUNT(*) FROM hd WHERE hd = 0) >= 25
                          THEN 0 ELSE 1 END AS t),
      sub AS (SELECT doc_id FROM hd, thr WHERE hd <= thr.t),
      d AS (SELECT s.doc_id,
              1.0 - CAST(len(list_intersect(nz.lb, pn.pl)) AS DOUBLE)
                    / (nz.n + pn.np - len(list_intersect(nz.lb, pn.pl))) AS raw
            FROM sub s JOIN nz ON nz.doc_id = s.doc_id, pn
            ORDER BY raw, s.doc_id LIMIT 25)
      SELECT doc_id, ROUND(raw, 6) AS jaccard_dist FROM d
      ORDER BY jaccard_dist, doc_id""") { (s, d) =>
      val cfg = FeatureConfig(numTextFeatures = 1024, useIdf = false)
      val tf = FeaturePipeline.features(spread(Tables.documents(s, d)), cfg)
        .select("doc_id", "features")
      import s.implicits._
      val probe: Vector = FeaturePipeline.features(
          Seq((-1L, "zyzzyva quokka oblast plasmid xylem fjord")).toDF("doc_id", "text"), cfg)
        .select("features").head.getAs[Vector](0)
      LshJoins.minHashKnn(tf, "doc_id", "features", probe, k = 25)
        .select(col("doc_id"), round(col("jaccard_dist"), 6).as("jaccard_dist"))
        .orderBy("jaccard_dist", "doc_id")
    },

    // ----- J4 exact limit, ORACLE-CHECKED (the q_dimsum_exact pattern):
    // minHashKnn's `exhaustive` mode — its full-scan degrade made
    // unconditional — is brute-force Jaccard kNN through the SAME distance
    // kernel, sort and tie-break as the two-phase search. CountVectorizer
    // features map distinct (cleaned, stopword-filtered) tokens injectively
    // to vector indices, so index-set Jaccard == token-set Jaccard and DuckDB
    // replays it with list_intersect over the identical tokenization
    // (q_count_vectorized's contract). Probe = doc 0's own feature vector
    // (appears at distance 0 — in-corpus probe, deterministic). Divisions are
    // exact-int ratios, so raw distances match bit-for-bit; ROUND(6) only
    // normalizes presentation.
    "q_knn_exact" -> QueryDef.sql(s"""
      WITH tok AS (SELECT doc_id, list_filter(list_distinct(
                     regexp_split_to_array(
                       regexp_replace(regexp_replace(lower(text), '(\\d|,|:|;|\\?|!)', '', 'g'),
                                      '\\b\\w{1,2}\\b', '', 'g'), '\\W')),
                   x -> x <> '' AND x NOT IN (${MlQueries.stopwordSqlList})) AS ts
                   FROM documents),
      q AS (SELECT ts AS qs FROM tok WHERE doc_id = 0),
      s AS (SELECT doc_id,
                   CAST(len(list_intersect(ts, qs)) AS DOUBLE) AS inter,
                   CAST(len(ts) + len(qs) - len(list_intersect(ts, qs)) AS DOUBLE) AS uni
            FROM tok CROSS JOIN q WHERE len(ts) > 0),
      d AS (SELECT doc_id, 1.0 - inter/uni AS raw FROM s
            ORDER BY raw, doc_id LIMIT 25)
      SELECT doc_id, ROUND(raw, 6) AS jaccard_dist FROM d
      ORDER BY jaccard_dist, doc_id""") { (s, d) =>
      val cfg = FeatureConfig(useCountVectorizer = true, vocabLimit = 1 << 18,
        useIdf = false)
      val feats = FeaturePipeline.features(spread(Tables.documents(s, d)), cfg)
        .select("doc_id", "features")
      val probe: Vector =
        feats.filter(col("doc_id") === 0).head.getAs[Vector]("features")
      LshJoins.minHashKnn(feats, "doc_id", "features", probe, k = 25,
          exhaustive = true)
        .select(col("doc_id"), round(col("jaccard_dist"), 6).as("jaccard_dist"))
        .orderBy("jaccard_dist", "doc_id")
    },

    // ----- M13/J10: DIMSUM sampled cosine all-pairs
    "q_dimsum" -> QueryDef.rowsOnly { (s, d) =>
      Dimsum.docSimilarities(featurized(s, d), "doc_id", "features", threshold = 0.3)
        .filter(col("cos_sim") >= 0.5)
        .orderBy("d1", "d2")
    }.expectAtGate(93956L, "54071171296996192912380"),

    // ----- M13 exact limit, ORACLE-CHECKED: threshold=0 makes DIMSUM keep
    // every term with probability 1, so the estimator degenerates to exact
    // cosine — the operator's first externally-verified row (q_dimsum's
    // sampled path stays gate-pinned). Exact integer term-count vectors
    // (deterministic vocab indices via sorted row_number) make the dot/norm
    // sums integer-exact on both engines; ROUND to 3 decimals absorbs
    // DIMSUM's ~1e-15 scaled-accumulation reordering. Corpus slice bounded
    // (doc_id < 2000, all rows at the sf0.01 gate) because the ORACLE is the
    // quadratic token equi-join — at 100 TB you run q_dimsum
    // (threshold > 0: sampling bounds the shuffle), never the exact limit.
    "q_dimsum_exact" -> QueryDef.sql("""
      WITH tf AS (SELECT doc_id, token, COUNT(*) AS c FROM (
                    SELECT doc_id,
                           unnest(list_filter(string_split(text,' '), x -> x <> '')) AS token
                    FROM documents WHERE doc_id < 2000)
                  GROUP BY doc_id, token),
      nrm AS (SELECT doc_id, SQRT(CAST(SUM(c*c) AS DOUBLE)) AS nrm FROM tf GROUP BY doc_id),
      dots AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(SUM(a.c*b.c) AS DOUBLE) AS dot
               FROM tf a JOIN tf b ON a.token = b.token AND a.doc_id < b.doc_id
               GROUP BY a.doc_id, b.doc_id)
      SELECT d1, d2, ROUND(dot/(n1.nrm*n2.nrm) + 0.000000001, 3) AS cos_sim
      FROM dots
      JOIN nrm n1 ON d1 = n1.doc_id
      JOIN nrm n2 ON d2 = n2.doc_id
      WHERE dot/(n1.nrm*n2.nrm) >= 0.34995
      ORDER BY d1, d2""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, d).filter(col("doc_id") < 2000)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      val vocab = tf.select("token").distinct()
        .withColumn("tidx", row_number().over(Window.orderBy("token")) - 1)
      val dim = vocab.count().toInt // bounded driver scalar (verification scale)
      val toVec = udf((entries: Seq[org.apache.spark.sql.Row]) => {
        val sorted = entries
          .map(r => (r.getInt(0), r.getLong(1).toDouble)).sortBy(_._1)
        org.apache.spark.ml.linalg.Vectors.sparse(dim,
          sorted.map(_._1).toArray, sorted.map(_._2).toArray)
      })
      val assembled = tf.join(broadcast(vocab), "token")
        .groupBy("doc_id")
        .agg(collect_list(struct(col("tidx"), col("c"))).as("entries"))
        .select(col("doc_id"), toVec(col("entries")).as("features"))
      Dimsum.docSimilarities(assembled, "doc_id", "features", threshold = 0.0)
        .filter(col("cos_sim") >= 0.34995)
        .select(col("d1"), col("d2"),
          round(col("cos_sim") + lit(1e-9), 3).as("cos_sim"))
        .orderBy("d1", "d2")
    },

    // ----- extension: MinHash banded-LSH near-dup detection (pure columns).
    // Oracle = EXACT all-pairs shingle-set Jaccard: valid because banding has
    // ~100% recall at the thresholds the data exercises (near-dups here are
    // jac>=90; P(miss) < 1e-7 per pair) and everything is deterministic —
    // verified to match at the gate scale before shipping. Verify sets use
    // full-64-bit shingle ids (collision odds ~2^-64) and threshold the raw
    // ratio before rounding, so boundary semantics equal the oracle's.
    "q_minhash_dedup" -> QueryDef.sql("""
      WITH t AS (SELECT doc_id,
          list_distinct(list_transform(range(1, len(toks)-1),
                        i -> array_to_string(toks[i:i+2], ' '))) AS s
        FROM (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
              FROM documents))
      SELECT a.doc_id AS d1, b.doc_id AS d2,
             ROUND(CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)*100.0
                   / len(list_distinct(list_concat(a.s,b.s))), 4) AS jac
      FROM t a JOIN t b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)*100.0
            / len(list_distinct(list_concat(a.s,b.s))) >= 70.0
      ORDER BY d1, d2""") { (s, d) =>
      MinHashDedup.nearDupPairs(spread(Tables.documents(s, d)),
        MinHashDedup.Config(shingleSize = 3, jaccardThreshold = 0.7))
        .orderBy("d1", "d2")
    },

    // ----- extension: EXACT set-similarity self-join (AllPairs/PPJoin
    // prefix filtering — Bayardo et al. WWW'07): the same answer set as the
    // exact all-pairs oracle, computed WITHOUT all-pairs — size filter +
    // rarest-first prefix-token equi-join + merge-verify, every filter
    // provably complete, so unlike q_minhash_dedup the oracle match needs
    // NO banding-recall argument. PrefixJoinSpec holds the independent
    // driver brute-force parity incl. low-τ prefix arithmetic.
    "q_allpairs_jaccard" -> QueryDef.sql("""
      WITH t AS (SELECT doc_id,
          list_distinct(list_transform(range(1, len(toks)-1),
                        i -> array_to_string(toks[i:i+2], ' '))) AS s
        FROM (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
              FROM documents))
      SELECT a.doc_id AS d1, b.doc_id AS d2,
             ROUND(CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)*100.0
                   / len(list_distinct(list_concat(a.s,b.s))), 4) AS jac
      FROM t a JOIN t b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)*100.0
            / len(list_distinct(list_concat(a.s,b.s))) >= 70.0
      ORDER BY d1, d2""") { (s, d) =>
      PrefixJoin.allPairs(spread(Tables.documents(s, d)),
        PrefixJoin.Config(shingleSize = 3, jaccardThreshold = 0.7))
        .orderBy("d1", "d2")
    },

    // ----- extension: dedup CLUSTERS — the end of the dedup pipeline: near-
    // dup pairs (same exact-Jaccard semantics as q_minhash_dedup) become
    // edges, connected components group transitive duplicates, and each
    // cluster keeps its min-id survivor. Oracle: the all-pairs jaccard CTE +
    // recursive reachability with min-root rollup.
    "q_dedup_clusters" -> QueryDef.sql("""
      WITH RECURSIVE t AS MATERIALIZED (SELECT doc_id,
          list_distinct(list_transform(range(1, len(toks)-1),
                        i -> array_to_string(toks[i:i+2], ' '))) AS s
        FROM (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
              FROM documents)),
      e AS MATERIALIZED (SELECT a.doc_id AS src, b.doc_id AS dst
            FROM t a JOIN t b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)*100.0
                  / len(list_distinct(list_concat(a.s,b.s))) >= 70.0),
      sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
      reach AS (
        SELECT src AS vertex, src AS root FROM sym
        UNION
        SELECT s.dst, r.root FROM reach r JOIN sym s ON s.src = r.vertex),
      comp AS (SELECT vertex, MIN(root) AS survivor FROM reach GROUP BY vertex)
      SELECT survivor, COUNT(*) AS n_members
      FROM comp GROUP BY survivor ORDER BY survivor""") { (s, d) =>
      val pairs = MinHashDedup.nearDupPairs(spread(Tables.documents(s, d)),
        MinHashDedup.Config(shingleSize = 3, jaccardThreshold = 0.7))
      graft.graph.GraphOps.connectedComponents(
          pairs.select(col("d1").as("src"), col("d2").as("dst")))
        .groupBy(col("component").as("survivor"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy("survivor")
    },

    // ----- extension: CERTIFIED dedup clusters — q_dedup_clusters' exact
    // twin: edges from PrefixJoin.allPairs (complete, no banding recall
    // term), so the connected components and their min-id survivors are
    // certifiably THE transitive-duplicate clusters, not almost-all of
    // them. Same recursive-reachability oracle.
    "q_dedup_clusters_exact" -> QueryDef.sql("""
      WITH RECURSIVE t AS MATERIALIZED (SELECT doc_id,
          list_distinct(list_transform(range(1, len(toks)-1),
                        i -> array_to_string(toks[i:i+2], ' '))) AS s
        FROM (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
              FROM documents)),
      e AS MATERIALIZED (SELECT a.doc_id AS src, b.doc_id AS dst
            FROM t a JOIN t b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)*100.0
                  / len(list_distinct(list_concat(a.s,b.s))) >= 70.0),
      sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
      reach AS (
        SELECT src AS vertex, src AS root FROM sym
        UNION
        SELECT s.dst, r.root FROM reach r JOIN sym s ON s.src = r.vertex),
      comp AS (SELECT vertex, MIN(root) AS survivor FROM reach GROUP BY vertex)
      SELECT survivor, COUNT(*) AS n_members
      FROM comp GROUP BY survivor ORDER BY survivor""") { (s, d) =>
      val pairs = PrefixJoin.allPairs(spread(Tables.documents(s, d)),
        PrefixJoin.Config(shingleSize = 3, jaccardThreshold = 0.7))
      graft.graph.GraphOps.connectedComponents(
          pairs.select(col("d1").as("src"), col("d2").as("dst")))
        .groupBy(col("component").as("survivor"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy("survivor")
    },

    // ----- extension: INCREMENTAL dedup — the arriving-batch-vs-standing-
    // corpus shape (docs with doc_id % 4 = 0 play the batch; the rest the
    // corpus). A real 100 TB pipeline never re-dedups the corpus against
    // itself: the corpus sketch is built once (MinHashDedup.sketch) and each
    // batch bucket-joins against it. Oracle = exact text-equality +
    // all-pairs shingle-Jaccard, valid for the same recall argument as
    // q_minhash_dedup (banding misses < 1e-7 per pair at these thresholds).
    "q_dedup_incremental" -> QueryDef.sql("""
      WITH docs AS (SELECT doc_id, text,
          list_distinct(list_transform(range(1, len(toks)-1),
                        i -> array_to_string(toks[i:i+2], ' '))) AS s
        FROM (SELECT doc_id, text, list_filter(string_split(text,' '), x -> x <> '') AS toks
              FROM documents)),
      b AS (SELECT * FROM docs WHERE doc_id % 4 = 0),
      c AS (SELECT * FROM docs WHERE doc_id % 4 <> 0),
      exact_dup AS (SELECT DISTINCT b.doc_id FROM b JOIN c ON c.text = b.text),
      near_dup AS (SELECT DISTINCT b.doc_id FROM b JOIN c
                   ON CAST(len(list_intersect(b.s, c.s)) AS DOUBLE)*100.0
                      / len(list_distinct(list_concat(b.s, c.s))) >= 70.0)
      SELECT doc_id FROM b
      WHERE doc_id NOT IN (SELECT doc_id FROM exact_dup)
        AND doc_id NOT IN (SELECT doc_id FROM near_dup)
      ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      MinHashDedup.dedupAgainst(
          spread(docs.filter(col("doc_id") % 4 === 0)),
          spread(docs.filter(col("doc_id") % 4 =!= 0)),
          MinHashDedup.Config(shingleSize = 3, jaccardThreshold = 0.7))
        .select("doc_id").orderBy("doc_id")
    },

    // ----- extension: EXACT incremental dedup — q_dedup_incremental's
    // batch-vs-corpus shape on the PrefixJoin path: same oracle, but where
    // the banded form's oracle match rides a banding-recall argument, this
    // one is exact-for-exact (prefix filtering is complete under the
    // corpus-df order; batch-only tokens rank rarest). The corpus df table
    // is the once-per-generation artifact an ingest loop reuses per batch.
    "q_dedup_incremental_exact" -> QueryDef.sql("""
      WITH docs AS (SELECT doc_id, text,
          list_distinct(list_transform(range(1, len(toks)-1),
                        i -> array_to_string(toks[i:i+2], ' '))) AS s
        FROM (SELECT doc_id, text, list_filter(string_split(text,' '), x -> x <> '') AS toks
              FROM documents)),
      b AS (SELECT * FROM docs WHERE doc_id % 4 = 0),
      c AS (SELECT * FROM docs WHERE doc_id % 4 <> 0),
      exact_dup AS (SELECT DISTINCT b.doc_id FROM b JOIN c ON c.text = b.text),
      near_dup AS (SELECT DISTINCT b.doc_id FROM b JOIN c
                   ON CAST(len(list_intersect(b.s, c.s)) AS DOUBLE)*100.0
                      / len(list_distinct(list_concat(b.s, c.s))) >= 70.0)
      SELECT doc_id FROM b
      WHERE doc_id NOT IN (SELECT doc_id FROM exact_dup)
        AND doc_id NOT IN (SELECT doc_id FROM near_dup)
      ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      PrefixJoin.dedupAgainst(
          spread(docs.filter(col("doc_id") % 4 === 0)),
          spread(docs.filter(col("doc_id") % 4 =!= 0)),
          PrefixJoin.Config(shingleSize = 3, jaccardThreshold = 0.7))
        .select("doc_id").orderBy("doc_id")
    },

    // ----- extension: SimHash near-dup detection. Gate variant hashes tokens
    // with md5 (SimHash.md5Hash60) so the oracle reproduces the signatures
    // bit-for-bit in SQL; the chunk-join candidate step has ZERO false
    // negatives (pigeonhole: hdist<=3 implies an equal 16-bit chunk), so
    // exact all-pairs over oracle signatures is the complete answer. The
    // xxhash64 default Config stays the scale path (spec-covered).
    "q_simhash_dedup" -> QueryDef.sql("""
      WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS t
                   FROM documents),
      h AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS hv FROM tok),
      v AS (SELECT doc_id, j, SUM(CASE WHEN (hv >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
            FROM h CROSS JOIN range(60) js(j) GROUP BY doc_id, j),
      sigp AS (SELECT doc_id,
                      CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS sig
               FROM v GROUP BY doc_id),
      sig AS (SELECT d.doc_id, COALESCE(s.sig, 0) AS sig
              FROM documents d LEFT JOIN sigp s ON d.doc_id = s.doc_id)
      SELECT a.doc_id AS d1, b.doc_id AS d2,
             CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hdist
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sig, b.sig)) <= 3
      ORDER BY d1, d2""") { (s, d) =>
      SimHash.nearDupPairs(spread(Tables.documents(s, d)),
        SimHash.Config(maxHammingDistance = 3, tokenHash = SimHash.md5Hash60))
        .orderBy("d1", "d2")
    },

    // ----- M11 signature-level gate: the MinHashSignature codegen kernel's
    // OUTPUT replayed slot-for-slot in SQL. Gate variant hashes shingles
    // with md5 (engine: SimHash.md5Hash60 mod P; oracle: the same 60-bit
    // md5 prefix mod P) and the oracle recomputes min((a_k·h+b_k) mod P)
    // per slot from the interpolated coefficient table — this checks the
    // signatures THEMSELVES, where the dedup gates (q_minhash_dedup et al.)
    // only check end-to-end pair recall. Shingle-less docs (< 3 tokens) pin
    // the all-P sentinel on both sides. The xxhash64 family stays the scale
    // path (DuckDB cannot replay Spark's xxhash64) — same split as
    // q_simhash_dedup's md5 gate vs xxhash64 default.
    "q_minhash_sig" -> QueryDef.sql(s"""
      WITH sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 list_transform(range(1, len(toks) - 1),
                   i -> array_to_string(toks[i:i+2], ' ')),
                 g -> CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 2147483647))) AS h
        FROM (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
              FROM documents)),
      coef(k, a, b) AS (VALUES ${MlQueries.minhashCoefSqlValues}),
      m AS (SELECT s.doc_id, c.k, MIN((c.a * s.h + c.b) % 2147483647) AS sig_v
            FROM sh s CROSS JOIN coef c GROUP BY s.doc_id, c.k)
      SELECT d.doc_id AS doc_id, CAST(c.k AS INTEGER) AS k,
             COALESCE(m.sig_v, 2147483647) AS sig_v
      FROM documents d
      CROSS JOIN coef c
      LEFT JOIN m ON m.doc_id = d.doc_id AND m.k = c.k
      ORDER BY d.doc_id, c.k""") { (s, d) =>
      val shingles = array_distinct(transform(
        TextOps.ngrams(TextOps.tokens(col("text")), 3),
        g => pmod(SimHash.md5Hash60(g), lit(MinHashDedup.P))))
      Tables.documents(s, d)
        .select(col("doc_id"), MinHashDedup.signature(shingles, 16).as("sig"))
        .select(col("doc_id"), posexplode(col("sig")).as(Seq("k", "sig_v")))
        .orderBy("doc_id", "k")
    },

    // ----- J2 full form: blocked candidate pairs — ORACLE-CHECKED (r9, pin
    // converted to [sql]): Candidates.pairs runs its COMPLETE config (block
    // equi-key, cross-group constraint, the level-2 length-ratio band
    // |l1−l2|/√(l1·l2) < 0.26, pk1<pk2 canonicalization) on PINNED block
    // labels (doc_id mod 8) instead of the k-means prediction, so the whole
    // J2/J9 composition — not just q_pairs_blocked's two-column shape — is
    // replayed as one DuckDB self-join with identical IEEE ratio arithmetic.
    // Block labels use ((x % 8) + 8) % 8 in SQL — DuckDB's % follows the
    // dividend's sign where the engine's pmod is always non-negative, and
    // the oracle must not silently diverge if ids ever go negative.
    // The seeded k-means BLOCKER itself stays gated by the q_kmeans_blocks
    // pin and the seeded-blocker composition by q_lda_candidates (r11:
    // q_billmatch and q_candidates_budget moved to pinned labels too); the
    // physical plan here is the same shuffled equi-join on the block label.
    "q_candidates" -> QueryDef.sql("""
      WITH t AS (SELECT doc_id, lang, n_chars,
                        ((doc_id % 8) + 8) % 8 AS prediction
                 FROM documents)
      SELECT a.doc_id AS pk1, b.doc_id AS pk2
      FROM t a JOIN t b
        ON a.prediction = b.prediction
       AND a.doc_id < b.doc_id
       AND a.lang <> b.lang
       AND ABS(a.n_chars - b.n_chars)
           / SQRT(CAST(a.n_chars AS DOUBLE) * b.n_chars) < 0.26
      ORDER BY pk1, pk2""") { (s, d) =>
      val blocked = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          pmod(col("doc_id"), lit(8)).as("prediction"))
      Candidates.pairs(blocked, CandidateConfig(
        keyCol = "doc_id", groupCol = "lang",
        blockCol = Some("prediction"),
        lengthCol = Some("n_chars"), maxLengthRatio = 0.26))
        .orderBy("pk1", "pk2")
    },

    // ----- J2 with the oversized-block quadratic guard in the ALL-LSH
    // regime: same pairsWithBudget config (length-ratio band, cross-lang,
    // cap 40) but on PINNED mod-8 block labels — every block holds ~n/8
    // docs, so past 320 documents EVERY block is oversized and the whole
    // corpus takes the banded-LSH branch. That is the 100 TB operating
    // point (at scale no block fits a quadratic budget), and the complement
    // of q_candidates_budget_exact's MIXED split (floor(sqrt) labels, cap
    // 25 — both branches live). FULL [sql] gate since r11 (VERDICT r10 #4):
    // the oracle replays tokens→mm_hash supports, the 32-hash affine
    // signature family, 16 band slices, and both block-size branches —
    // retiring the former seeded-k-means checksum pin (the fit stays
    // pinned by q_kmeans_blocks).
    "q_candidates_budget" -> QueryDef.sql(s"""
      WITH toks AS (
        SELECT doc_id, UNNEST(list_distinct(list_filter(
          regexp_split_to_array(
            regexp_replace(regexp_replace(lower(text), '(\\d|,|:|;|\\?|!)', '', 'g'),
                           '\\b\\w{1,2}\\b', '', 'g'), '\\W'),
          x -> x <> '' AND x NOT IN (${MlQueries.stopwordSqlList})))) AS term
        FROM documents),
      terms AS (SELECT DISTINCT term FROM toks),
      ${graft.text.Murmur3.oracleSqlCtes("terms", 1024, words = 8)},
      db AS (SELECT DISTINCT t.doc_id, h.bucket FROM toks t JOIN mm_hash h USING (term)),
      meta AS (SELECT doc_id, lang, n_chars,
               ((doc_id % 8) + 8) % 8 AS blk FROM documents),
      bn AS (SELECT blk, COUNT(*) AS n FROM meta GROUP BY blk),
      exact AS (
        SELECT a.doc_id AS pk1, b.doc_id AS pk2
        FROM meta a JOIN meta b ON a.blk = b.blk AND a.doc_id < b.doc_id
        JOIN bn ON bn.blk = a.blk AND bn.n <= 40
        WHERE a.lang <> b.lang
          AND ABS(a.n_chars - b.n_chars)
              / SQRT(CAST(a.n_chars AS DOUBLE) * b.n_chars) < 0.26),
      coefb(k, a, b) AS (VALUES ${MlQueries.budgetCoefSqlValues}),
      mh AS (SELECT db.doc_id, c.k,
               MIN((c.a * db.bucket + c.b) % 2147483647) AS h
             FROM db CROSS JOIN coefb c GROUP BY db.doc_id, c.k),
      sig AS (SELECT doc_id, list(h ORDER BY k) AS sg FROM mh GROUP BY doc_id),
      bands AS (SELECT doc_id, bd, sg[bd*2+1:bd*2+2] AS slice
                FROM sig CROSS JOIN range(16) r(bd)),
      lsh AS (
        SELECT DISTINCT a2.doc_id AS pk1, b2.doc_id AS pk2
        FROM bands sa JOIN bands sb ON sa.bd = sb.bd AND sa.slice = sb.slice
        JOIN meta a2 ON a2.doc_id = sa.doc_id
        JOIN meta b2 ON b2.doc_id = sb.doc_id
        JOIN bn ON bn.blk = a2.blk AND bn.n > 40
        WHERE a2.blk = b2.blk AND a2.doc_id < b2.doc_id AND a2.lang <> b2.lang
          AND ABS(a2.n_chars - b2.n_chars)
              / SQRT(CAST(a2.n_chars AS DOUBLE) * b2.n_chars) < 0.26)
      SELECT pk1, pk2 FROM (SELECT * FROM exact UNION ALL SELECT * FROM lsh)
      ORDER BY pk1, pk2""") { (s, d) =>
      val blocked = featurizedCounts(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          pmod(col("doc_id"), lit(8)).as("prediction"), col("features"))
      Candidates.pairsWithBudget(blocked, CandidateConfig(
        keyCol = "doc_id", groupCol = "lang",
        blockCol = Some("prediction"),
        lengthCol = Some("n_chars"), maxLengthRatio = 0.26),
        "features", maxBlockSize = 40)
        .orderBy("pk1", "pk2")
    },

    // ----- J2 budget guard, ORACLE-CHECKED twin (r9): pairsWithBudget's
    // COMPLETE two-branch semantics — exact all-pairs for small blocks,
    // banded support-MinHash LSH for oversized ones — on PINNED block labels
    // floor(sqrt(doc_id)) (sizes 2k+1, so maxBlockSize 25 splits the corpus
    // into both branches for real: blocks 0-12 and the short tail run exact,
    // 13+ run LSH) and the murmur3-bucket features DuckDB already replays for
    // q_minhash_lsh. The oracle recomputes every stage: token→bucket supports
    // (mm_hash), the 32-hash affine signature family (budgetCoefSqlValues =
    // the engine's own md5-derived coefficients), 16 band slices, bucket
    // candidates by SLICE equality (engine joins on xxhash64(slice) equality
    // — identical up to 64-bit hash collisions, odds < 1e-12 at gate scale),
    // both block-size branches, and the shared lang/length-ratio/canonical
    // constraints. Complements q_candidates_budget's ALL-LSH regime (r11):
    // this split keeps BOTH branches live at the gate.
    "q_candidates_budget_exact" -> QueryDef.sql(s"""
      WITH toks AS (
        SELECT doc_id, UNNEST(list_distinct(list_filter(
          regexp_split_to_array(
            regexp_replace(regexp_replace(lower(text), '(\\d|,|:|;|\\?|!)', '', 'g'),
                           '\\b\\w{1,2}\\b', '', 'g'), '\\W'),
          x -> x <> '' AND x NOT IN (${MlQueries.stopwordSqlList})))) AS term
        FROM documents),
      terms AS (SELECT DISTINCT term FROM toks),
      ${graft.text.Murmur3.oracleSqlCtes("terms", 1024, words = 8)},
      db AS (SELECT DISTINCT t.doc_id, h.bucket FROM toks t JOIN mm_hash h USING (term)),
      meta AS (SELECT doc_id, lang, n_chars,
                 CAST(FLOOR(SQRT(CAST(doc_id AS DOUBLE))) AS BIGINT) AS blk
               FROM documents),
      bn AS (SELECT blk, COUNT(*) AS n FROM meta GROUP BY blk),
      exact AS (
        SELECT a.doc_id AS pk1, b.doc_id AS pk2
        FROM meta a JOIN meta b ON a.blk = b.blk AND a.doc_id < b.doc_id
        JOIN bn ON bn.blk = a.blk AND bn.n <= 25
        WHERE a.lang <> b.lang
          AND ABS(a.n_chars - b.n_chars)
              / SQRT(CAST(a.n_chars AS DOUBLE) * b.n_chars) < 0.26),
      coefb(k, a, b) AS (VALUES ${MlQueries.budgetCoefSqlValues}),
      mh AS (SELECT db.doc_id, c.k,
               MIN((c.a * db.bucket + c.b) % 2147483647) AS h
             FROM db CROSS JOIN coefb c GROUP BY db.doc_id, c.k),
      sig AS (SELECT doc_id, list(h ORDER BY k) AS sg FROM mh GROUP BY doc_id),
      bands AS (SELECT doc_id, bd, sg[bd*2+1:bd*2+2] AS slice
                FROM sig CROSS JOIN range(16) r(bd)),
      lsh AS (
        SELECT DISTINCT a2.doc_id AS pk1, b2.doc_id AS pk2
        FROM bands sa JOIN bands sb ON sa.bd = sb.bd AND sa.slice = sb.slice
        JOIN meta a2 ON a2.doc_id = sa.doc_id
        JOIN meta b2 ON b2.doc_id = sb.doc_id
        JOIN bn ON bn.blk = a2.blk AND bn.n > 25
        WHERE a2.blk = b2.blk AND a2.doc_id < b2.doc_id AND a2.lang <> b2.lang
          AND ABS(a2.n_chars - b2.n_chars)
              / SQRT(CAST(a2.n_chars AS DOUBLE) * b2.n_chars) < 0.26)
      SELECT pk1, pk2 FROM (SELECT * FROM exact UNION ALL SELECT * FROM lsh)
      ORDER BY pk1, pk2""") { (s, d) =>
      val blocked = featurizedCounts(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          floor(sqrt(col("doc_id").cast("double"))).cast("long").as("prediction"),
          col("features"))
      Candidates.pairsWithBudget(blocked, CandidateConfig(
        keyCol = "doc_id", groupCol = "lang",
        blockCol = Some("prediction"),
        lengthCol = Some("n_chars"), maxLengthRatio = 0.26),
        "features", maxBlockSize = 25)
        .orderBy("pk1", "pk2")
    },

    // ----- flagship: the reference's workflow-1 end to end (features →
    // blocking → candidate join → pair→vector join → cosine → global top-K),
    // ExtractCandidates + BillAnalyzer + Postprocessor in one declarative
    // plan. FULL [sql] gate since r11 (the q_candidates r9 pattern, VERDICT
    // r10 #4): the block label is PINNED (doc_id mod 8) and the vectors are
    // no-IDF murmur3-hashed COUNTS, so DuckDB replays EVERY stage — the
    // token pipeline, the HashingTF bucketing (mm_hash CTE), the blocked
    // cross-lang candidate join, the pair→vector cosine (integer dot/norm
    // sums are exact; sqrt/mul/div IEEE-identical; one ROUND(4) both
    // sides), and the global top-50. This retires the former seeded-fit
    // checksum pin — a stochastic gate on a deterministic pipeline; the
    // k-means fit itself stays pinned by q_kmeans_blocks, and the
    // seeded-blocker composition stays exercised by q_lda_candidates.
    // dot > 0 on both sides: pairs sharing no hash bucket (similarity 0,
    // never in a meaningful top-K) are excluded so engine and oracle agree
    // on the candidate set the top-50 is cut from.
    "q_billmatch" -> QueryDef.sql(s"""
      WITH toks AS (
        SELECT doc_id, lang, ((doc_id % 8) + 8) % 8 AS blk, UNNEST(list_filter(
          regexp_split_to_array(
            regexp_replace(regexp_replace(lower(text), '(\\d|,|:|;|\\?|!)', '', 'g'),
                           '\\b\\w{1,2}\\b', '', 'g'), '\\W'),
          x -> x <> '' AND x NOT IN (${MlQueries.stopwordSqlList}))) AS term
        FROM documents),
      terms AS (SELECT DISTINCT term FROM toks),
      ${graft.text.Murmur3.oracleSqlCtes("terms", 1024, words = 8)},
      tf AS (SELECT t.doc_id, t.lang, t.blk, h.bucket, COUNT(*) AS c
             FROM toks t JOIN mm_hash h USING (term)
             GROUP BY t.doc_id, t.lang, t.blk, h.bucket),
      nrm AS (SELECT doc_id, SQRT(CAST(SUM(c*c) AS DOUBLE)) AS nrm
              FROM tf GROUP BY doc_id),
      dots AS (SELECT a.doc_id AS pk1, b.doc_id AS pk2,
                      CAST(SUM(a.c*b.c) AS DOUBLE) AS dot
               FROM tf a JOIN tf b
                 ON a.bucket = b.bucket AND a.blk = b.blk
                AND a.lang <> b.lang AND a.doc_id < b.doc_id
               GROUP BY a.doc_id, b.doc_id)
      SELECT pk1, pk2, ROUND(dot*100.0/(n1.nrm*n2.nrm), 4) AS similarity
      FROM dots JOIN nrm n1 ON dots.pk1 = n1.doc_id
                JOIN nrm n2 ON dots.pk2 = n2.doc_id
      WHERE dot > 0
      ORDER BY similarity DESC, pk1, pk2 LIMIT 50""") { (s, d) =>
      val blocked = featurizedCounts(s, d)
        .select(col("doc_id"), col("lang"),
          pmod(col("doc_id"), lit(8)).as("prediction"), col("features"))
      val pairs = Candidates.pairs(blocked, CandidateConfig(
        keyCol = "doc_id", groupCol = "lang", blockCol = Some("prediction")))
      val norm2 = udf((v: Vector) =>
        org.apache.spark.ml.linalg.Vectors.norm(v, 2))
      val payload = blocked.select(col("doc_id"),
        struct(col("features").as("f"), norm2(col("features")).as("n")).as("fv"))
      val withVecs = Candidates.attachBothSides(pairs, payload, "doc_id", "fv")
      withVecs
        .select(col("pk1"), col("pk2"),
          Kernels.dotUdf(col("fv_1.f"), col("fv_2.f")).as("dot"),
          col("fv_1.n").as("n1"), col("fv_2.n").as("n2"))
        .filter(col("dot") > 0)
        .select(col("pk1"), col("pk2"),
          round(col("dot") * 100.0 / (col("n1") * col("n2")), 4).as("similarity"))
        .orderBy(desc("similarity"), asc("pk1"), asc("pk2"))
        .limit(50)
    },

    // ----- flagship, ORACLE-CHECKED form: same workflow-1 skeleton (blocked
    // candidate pairs -> cosine -> global top-K) but on exact sparse
    // term-count vectors with lang blocking, so DuckDB can replay every step.
    // Integer dot/norm sums are exact; sqrt/mul/div are IEEE-identical.
    // Corpus slice bounded (doc_id < 2000, all rows at the sf0.01 gate): the
    // token equi-join is quadratic in per-token document frequency, so the
    // EXACT variant is for verification scale — at 100 TB you run q_billmatch
    // (feature-hashed vectors + k-means/LSH blocking), not all-pairs-exact.
    "q_billmatch_sql" -> QueryDef.sql("""
      WITH tf AS (SELECT doc_id, lang, token, COUNT(*) AS c FROM (
                    SELECT doc_id, lang,
                           unnest(list_filter(string_split(text,' '), x -> x <> '')) AS token
                    FROM documents WHERE doc_id < 2000)
                  GROUP BY doc_id, lang, token),
      nrm AS (SELECT doc_id, SQRT(CAST(SUM(c*c) AS DOUBLE)) AS nrm FROM tf GROUP BY doc_id),
      dots AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(SUM(a.c*b.c) AS DOUBLE) AS dot
               FROM tf a JOIN tf b
                 ON a.token = b.token AND a.lang = b.lang AND a.doc_id < b.doc_id
               GROUP BY a.doc_id, b.doc_id)
      SELECT d1, d2,
             ROUND(dot*100.0/(n1.nrm*n2.nrm), 4) AS similarity
      FROM dots JOIN nrm n1 ON dots.d1 = n1.doc_id
                JOIN nrm n2 ON dots.d2 = n2.doc_id
      ORDER BY similarity DESC, d1, d2 LIMIT 50""") { (s, d) =>
      val tf = spread(Tables.documents(s, d))
        .filter(col("doc_id") < 2000)
        .select(col("doc_id"), col("lang"),
          explode(graft.text.TextOps.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "lang", "token").agg(count(lit(1)).as("c"))
      val nrm = tf.groupBy("doc_id")
        .agg(sqrt(sum(col("c") * col("c")).cast("double")).as("nrm"))
      // r14 (guide §2.5, the c46d6d4/q_edit_distance class): the (token,
      // lang) key space is tiny and byte-light but the join's QUADRATIC
      // per-token expansion is CPU-dense — AQE coalesced the few-hundred-KB
      // exchange to ONE partition and the whole expansion + partial dot agg
      // ran as a single 2.7 s task (event-log profiled). A deterministic
      // S-way sub-bucket on one side (exploded on the other) re-keys the
      // join, and the EXPLICIT repartition(S, keys) — which AQE never
      // coalesces and the join reuses — pins the expansion stage at S
      // parallel tasks. Each (a-row, b-row) token pair still meets exactly
      // once, and the dot is an integer SUM (order-free), so values are
      // bit-identical (and S-independent — S follows the executor slots,
      // never a constant tuned for one host).
      val S = s.sparkContext.defaultParallelism
      val a = tf
        .withColumn("__bk", pmod(xxhash64(col("doc_id")), lit(S.toLong)))
        .repartition(S, col("token"), col("lang"), col("__bk")).alias("a")
      val b = tf
        .withColumn("__bk", explode(sequence(lit(0L), lit(S.toLong - 1))))
        .repartition(S, col("token"), col("lang"), col("__bk")).alias("b")
      val dots = a.join(b,
          col("a.token") === col("b.token") && col("a.lang") === col("b.lang") &&
          col("a.__bk") === col("b.__bk") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(sum(col("a.c") * col("b.c")).cast("double").as("dot"))
      dots
        .join(nrm.select(col("doc_id").as("d1"), col("nrm").as("n1")), "d1")
        .join(nrm.select(col("doc_id").as("d2"), col("nrm").as("n2")), "d2")
        .select(col("d1"), col("d2"),
          round(col("dot") * 100.0 / (col("n1") * col("n2")), 4).as("similarity"))
        .orderBy(desc("similarity"), asc("d1"), asc("d2"))
        .limit(50)
    },

    // ----- extension: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) —
    // semantic dedup over the embedding column: k-means partitions the
    // corpus into clusters, candidate pairs are generated ONLY within a
    // cluster (the 100 TB shape — the cluster id is the equi-join key, so
    // the pair generation is a bucketed self-join, never corpus-wide
    // all-pairs), cosine >= τ pairs feed connected components and each
    // near-dup group keeps its min-id representative. τ=0.35 matches the
    // synthetic corpus's cosine range (real embedding spaces use ~0.95+).
    // FULL [sql] gate since r12 (VERDICT r11 #1, the q_candidates r9 /
    // b1f5664 q_billmatch recipe): the cluster label is PINNED (vec_id mod
    // 16) instead of the seeded k-means prediction, so DuckDB replays the
    // COMPLETE pipeline — bucketed within-cluster pair generation, the
    // cosine-≥τ edge set (identical fold arithmetic, one ROUND(6) both
    // sides), the connected-components closure, and the min-id
    // representative anti-join — retiring the former rows+checksum pin.
    // The seeded blocking FIT stays gated by the q_kmeans_blocks pin, and
    // the fit→assign composition by q_semdedup_exact (pinned explicit
    // centroids + 0-iteration argmax assignment).
    "q_semdedup" -> QueryDef.sql {
      def cosSql(a: String, b: String): String = {
        def dotS(x: String, y: String) =
          s"list_reduce(list_transform(range(1, 65), i -> $x[i]*$y[i]), (x,y)->x+y)"
        s"(${dotS(a, b)} / (SQRT(${dotS(a, a)}) * SQRT(${dotS(b, b)})))"
      }
      s"""
      WITH RECURSIVE t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                                  ((vec_id % 16) + 16) % 16 AS prediction
                           FROM embeddings),
      e AS (SELECT a.vec_id AS src, b.vec_id AS dst
            FROM t a JOIN t b
              ON a.prediction = b.prediction AND b.vec_id > a.vec_id
            WHERE ROUND(${cosSql("a.v", "b.v")}, 6) >= 0.35),
      sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
      reach AS (
        SELECT src AS vertex, src AS root FROM sym
        UNION
        SELECT s.dst, r.root FROM reach r JOIN sym s ON s.src = r.vertex),
      comp AS (SELECT vertex, MIN(root) AS component
               FROM reach GROUP BY vertex)
      SELECT vec_id, prediction FROM t
      WHERE vec_id NOT IN (SELECT vertex FROM comp WHERE vertex <> component)
      ORDER BY vec_id"""
    } { (s, d) =>
      import graft.similarity.ArrayOps
      val t = spread(Tables.embeddings(s, d))
        .select(col("vec_id"), pmod(col("vec_id"), lit(16)).as("prediction"),
          ArrayOps.asDouble(col("embedding")).as("v"))
      val a = t.select(col("prediction"), col("vec_id").as("id1"), col("v").as("v1"))
      val b = t.select(col("prediction"), col("vec_id").as("id2"), col("v").as("v2"))
      val pairs = a.join(b, Seq("prediction"))
        .filter(col("id2") > col("id1") &&
          round(ArrayOps.cosine(col("v1"), col("v2")), 6) >= 0.35)
        .select(col("id1").as("src"), col("id2").as("dst"))
      val drop = graft.graph.GraphOps.connectedComponents(pairs)
        .filter(col("vertex") =!= col("component"))
        .select(col("vertex"))
      t.select("vec_id", "prediction")
        .join(drop, t("vec_id") === drop("vertex"), "left_anti")
        .orderBy("vec_id")
    },

    // ----- SemDeDup exact twin (VERDICT r7 #4a): the SAME pipeline shape —
    // cluster-partition → within-cluster cosine pairs → connected components
    // → min-id representative — but with PINNED explicit centroids (the
    // embeddings of vec_id % 50 == 0) and a 0-iteration assignment step
    // (argmax rounded cosine, centroid-id tie-break) instead of a seeded
    // Lloyd fit. Every stage is exact arithmetic, so the full chain replays
    // in DuckDB: assignment cross-joins 8 broadcast centroids (the IVF
    // coarse-quantizer shape — a narrow map at 100 TB), pair generation is
    // the bucketed equi-join on the assigned centroid id, and the closure
    // runs on near-dup edges only. Gates the q_semdedup kernel end-to-end
    // minus only the k-means fit itself (which q_kmeans_blocks pins).
    "q_semdedup_exact" -> QueryDef.sql {
      def cosSql(a: String, b: String): String = {
        def dotS(x: String, y: String) =
          s"list_reduce(list_transform(range(1, 65), i -> $x[i]*$y[i]), (x,y)->x+y)"
        s"(${dotS(a, b)} / (SQRT(${dotS(a, a)}) * SQRT(${dotS(b, b)})))"
      }
      s"""
      WITH RECURSIVE t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                           FROM embeddings),
      c AS (SELECT vec_id AS cid, v AS cv FROM t WHERE vec_id % 50 = 0),
      asn AS (SELECT vec_id, v, cid FROM (
                SELECT t.vec_id, t.v, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY t.vec_id
                         ORDER BY ROUND(${cosSql("t.v", "c.cv")}, 6) DESC, c.cid)
                         AS rn
                FROM t CROSS JOIN c) WHERE rn = 1),
      e AS (SELECT a.vec_id AS src, b.vec_id AS dst
            FROM asn a JOIN asn b ON a.cid = b.cid AND b.vec_id > a.vec_id
            WHERE ROUND(${cosSql("a.v", "b.v")}, 6) >= 0.35),
      sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
      reach AS (
        SELECT src AS vertex, src AS root FROM sym
        UNION
        SELECT s.dst, r.root FROM reach r JOIN sym s ON s.src = r.vertex),
      comp AS (SELECT vertex, MIN(root) AS component
               FROM reach GROUP BY vertex)
      SELECT vec_id, cid FROM asn
      WHERE vec_id NOT IN (SELECT vertex FROM comp WHERE vertex <> component)
      ORDER BY vec_id"""
    } { (s, d) =>
      import graft.similarity.ArrayOps
      import org.apache.spark.sql.expressions.Window
      val emb = spread(Tables.embeddings(s, d))
        .select(col("vec_id"), ArrayOps.asDouble(col("embedding")).as("v"))
      val cents = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val w = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("cid"))
      val assigned = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("v"), col("cid"),
          round(ArrayOps.cosine(col("v"), col("cv")), 6).as("sim"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("cid"))
      val a = assigned.select(col("cid"), col("vec_id").as("id1"), col("v").as("v1"))
      val b = assigned.select(col("cid"), col("vec_id").as("id2"), col("v").as("v2"))
      val pairs = a.join(b, Seq("cid"))
        .filter(col("id2") > col("id1") &&
          round(ArrayOps.cosine(col("v1"), col("v2")), 6) >= 0.35)
        .select(col("id1").as("src"), col("id2").as("dst"))
      val drop = graft.graph.GraphOps.connectedComponents(pairs)
        .filter(col("vertex") =!= col("component"))
        .select(col("vertex"))
      assigned.select("vec_id", "cid")
        .join(drop, assigned("vec_id") === drop("vertex"), "left_anti")
        .orderBy("vec_id")
    }
  )
}
