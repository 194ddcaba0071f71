package graft

import org.apache.spark.sql.functions._

/** Empirical scaling probe: replicate the sf0.1 documents corpus (distinct
  * doc_ids, per-replica text suffix) and measure how each document-path
  * operator's wall time grows with corpus size. Writes SCALEPROBE.md.
  *
  * Linear-path operators run at 1×/10×/50×/100× (5k → 500k documents); the
  * fitted exponent α (t ≈ c·Nᵅ) is taken between 10× and 100× because below
  * ~50k rows the per-query constant (planning, task launch) floors the
  * measurement. q_minhash_dedup runs at 1×/2×/5×/10× as a deliberate
  * DUP-HEAVY case — every replica is a near-duplicate of its original, so
  * its candidate-pair OUTPUT grows quadratically in the duplication factor
  * (that is what a dedup operator is for), while the banding join itself
  * stays an equi-join.
  *
  * Usage: runMain graft.ScaleProbe [baseSfDir] [outMd]
  */
object ScaleProbe {

  private val linearOps = Seq(
    "q_wordcount", "q_ngram_count", "q_langid_ngram", "q_quality",
    "q_token_count", "q_repetition", "q_chunk_overlap", "q_seq_packing",
    "q_dedup_exact", "q_table_checksum", "q_winnow",
    "q_quality_rules", "q_boilerplate", "q_token_budget", "q_pii_redact",
    "q_substring_dedup", "q_rare_bigram", "q_train_order",
    "q_split_stratified", "q_fertility", "q_pipeline_trainset",
    "q_vocab_build", "q_length_trim", "q_dedup_report", "q_table_diff",
    "q_retrieval_eval", "q_compaction_plan",
    // BPE: replication multiplies every word count by f but leaves the vocab
    // (and so the per-iteration work AND the learned merges) unchanged — the
    // ladder should show the corpus-pass term growing and the 8 iterations
    // flat
    "q_bpe_learn", "q_bpe_encode",
    // r10 window-audit rewrites: rows measure the bounded-aggregation forms
    // (per-term topK postings; per-lang bottom-k sample)
    "q_inverted_index", "q_sample_pergroup",
    // removal spans: the occurrence⋈shared-hash join grows with the
    // duplication rate — the row prices the honest join the scoring query
    // avoids
    "q_substring_spans")
  private val linearFactors = Seq(1, 10, 50, 100)
  private val dupHeavyFactors = Seq(1, 2, 5, 10)

  /** Events-path ladder (the operator family hardened in round 5): replicas
    * carry DISTINCT event/user ids but the SAME time range, so per-user state
    * (sessions, as-of sorts, EWMA) scales in key count while windows densify
    * — the actual shape of a growing event firehose. All of these read only
    * the events table. */
  private val eventsOps = Seq(
    "q_window_tumbling", "q_window_sliding", "q_sessionize", "q_ewma",
    "q_ewma_array",
    "q_asof_join", "q_asof_forward", "q_range_join", "q_range_join_keyed",
    "q_window_rank_fns", "q_incremental_agg", "q_hll_merge", "q_cms_topk",
    "q_kmv_distinct", "q_quantile_sketch", "q_sample_bottomk")
  private val eventsFactors = Seq(1, 10, 50, 100)

  /** Graph ladder (r7, VERDICT r6 #3): replicated customers carry DISTINCT
    * custkey AND nationkey ranges per replica, so each replica is a disjoint
    * braided-chain component — vertices and edges grow linearly in the
    * factor and the iterative-join paths (rank propagation, triangle
    * enumeration, SCC label convergence) are measured where their 100×
    * surprises would live. Registry queries, unmodified. */
  private val graphOps = Seq("q_pagerank", "q_triangles", "q_graph_degree")
  private val graphFactors = Seq(1, 10, 50, 100)

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outMd = args.lift(1).getOrElse("SCALEPROBE.md")
    // optional 3rd arg: probe only these comma-separated queries
    val only = args.lift(2).map(_.split(',').toSet)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val work = new java.io.File("/tmp/graft_scaleprobe")
    def dirFor(f: Int): String =
      if (f == 1) base else s"${work.getPath}/x$f"
    // replica generation is deterministic (no RNG) — skip tables whose
    // committed write already exists, so a resumed probe starts measuring
    // within seconds instead of re-writing 500k-row parquet four times
    def haveTable(f: Int, t: String): Boolean =
      new java.io.File(s"${dirFor(f)}/$t.parquet/_SUCCESS").exists()

    ((linearFactors ++ dupHeavyFactors).distinct.filter(_ > 1))
        .filterNot(haveTable(_, "documents")).foreach { f =>
      val docs = (0 until f).map { r =>
        spark.read.parquet(s"$base/documents.parquet")
          .select(
            (col("doc_id") + lit(r * 10000000L)).as("doc_id"),
            concat(col("text"), lit(s" rep$r")).as("text"),
            col("lang"), col("source"), col("n_chars"))
      }.reduce(_.unionByName(_))
      docs.repartition(32).write.mode("overwrite")
        .parquet(s"${dirFor(f)}/documents.parquet")
    }
    eventsFactors.filter(_ > 1).filterNot(haveTable(_, "events")).foreach { f =>
      val evs = (0 until f).map { r =>
        graft.io.Tables.events(spark, base)
          .select(
            (col("event_id") + lit(r * 1000000000L)).as("event_id"),
            col("ts"),
            (col("user_id") + lit(r * 10000000L)).as("user_id"),
            col("event_type"), col("value"), col("props"))
      }.reduce(_.unionByName(_))
      evs.repartition(32).write.mode("overwrite")
        .parquet(s"${dirFor(f)}/events.parquet")
    }
    graphFactors.filter(_ > 1).filterNot(haveTable(_, "customer")).foreach { f =>
      val cs = (0 until f).map { r =>
        // distinct custkey AND nationkey ranges → disjoint braided chains;
        // types preserved so Tables.customer's declared schema still reads
        graft.io.Tables.customer(spark, base)
          .withColumn("c_custkey", col("c_custkey") + lit(r * 10000000L))
          .withColumn("c_nationkey",
            (col("c_nationkey") + lit(r * 1000)).cast("int"))
      }.reduce(_.unionByName(_))
      cs.repartition(32).write.mode("overwrite")
        .parquet(s"${dirFor(f)}/customer.parquet")
    }

    // ---- per-row checkpoint (r8): a full probe is a 60-90 min single-JVM
    // run; one OOM or host kill used to lose every measured row. Each
    // (label, factor) row appends to rows.jsonl as soon as it's measured; a
    // restarted probe replays completed rows from the file and resumes at
    // the first missing one. Delete rows.jsonl to force a full re-measure.
    val ckptFile = new java.io.File(work, "rows.jsonl")
    // Measurement-epoch stamp (r9, ADVICE r8): every banked row records the
    // engine commit + corpus dir it was measured under. A probe resumed
    // after engine changes still REPLAYS foreign-epoch rows (deleting them
    // would force a 60-90 min full re-measure after every commit), but the
    // generated md names them in a "mixed measurement epochs" note instead
    // of passing stale timings off as current — and a targeted re-measure is
    // one `grep -v <label> rows.jsonl` away (documented in the md note).
    val engineCommit: String =
      try scala.sys.process.Process(Seq("git", "rev-parse", "--short", "HEAD"),
        new java.io.File(".")).!!.trim
      catch { case _: Throwable => "unknown" }
    // Host-throughput stamp for every row banked this session (r10): the
    // Bench calibration job (pure-CPU xxhash64 fold, data-independent). Rows
    // measured in different host epochs — or under transient contention from
    // a co-tenant process — carry their own denominator, so sec/calib is
    // comparable across stamps where raw seconds are not. Guarded like the
    // Bench calib: a failure degrades to 0.0 (no denominator), never kills
    // the probe.
    val probeCalib: Double =
      try {
        // unmeasured warmup rep: the probe runs calib on a COLD session
        // (Bench warms the whole stack first), and first-touch codegen/JIT
        // otherwise inflates the stamp ~2× — measured 0.307 vs the warm 0.138
        def rep(): Double = {
          val t0 = System.nanoTime()
          spark.range(0L, 400000000L, 1L, 32)
            .select(org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.xxhash64(
                org.apache.spark.sql.functions.col("id")).cast("double")))
            .collect()
          (System.nanoTime() - t0) / 1e9
        }
        rep()
        (1 to 2).map(_ => rep()).min
      }
      catch { case e: Throwable =>
        System.err.println(s"[probe] calib failed (rows stamped 0): ${e.getMessage}")
        0.0
      }
    System.err.println(f"[probe] host calib $probeCalib%.3f s")
    val ckpt = scala.collection.mutable.Map.empty[(String, Int), (Double, Long, ProbeMetrics)]
    val rowEpoch = scala.collection.mutable.Map.empty[(String, Int), String]
    if (ckptFile.exists()) {
      val re = """\{"label":"(.*?)","f":(\d+),"sec":([0-9.eE+\-]+),"rows":(\d+),"spill":(\d+),"shuffle":(\d+),"gc":(\d+)(?:,"commit":"([^"]*)","dir":"([^"]*)")?(?:,"calib":[0-9.eE+\-]+)?\}""".r
      scala.io.Source.fromFile(ckptFile, "UTF-8").getLines().foreach {
        case re(l, f, s, r, sp, sh, g, commit, _) =>
          val k = (l, f.toInt)
          ckpt(k) = (s.toDouble, r.toLong, ProbeMetrics(sp.toLong, sh.toLong, g.toLong))
          rowEpoch(k) = Option(commit).getOrElse("pre-r9")
        case _ => ()
      }
      val foreign = rowEpoch.valuesIterator.count(_ != engineCommit)
      System.err.println(s"[probe] resumed ${ckpt.size} checkpointed rows from $ckptFile" +
        (if (foreign > 0) s" — WARNING: $foreign rows from a different engine commit (md will note them)" else ""))
    }
    // Optional wall-clock cutoff (epoch seconds): rows not yet banked when
    // the deadline passes are SKIPPED (rendered as "—" in the tables, never
    // silently guessed) so a bounded session still writes the md with every
    // row it did measure; the next run resumes from the checkpoint and fills
    // the gaps. NaN is the in-memory skip sentinel — it is never banked.
    val deadline: Long = sys.env.get("SPARK_GRAFT_PROBE_DEADLINE")
      .map(_.toLong).getOrElse(Long.MaxValue)
    val skipped = (Double.NaN, 0L, ProbeMetrics(0L, 0L, 0L))
    def checkpointed(label: String, f: Int)(
        compute: => (Double, Long, ProbeMetrics)): (Double, Long, ProbeMetrics) =
      ckpt.get((label, f)) match {
        case Some(v) => v
        case None if System.currentTimeMillis() / 1000 > deadline =>
          System.err.println(s"[probe] SKIP $label @${f}x (past deadline)")
          skipped
        case None =>
          System.err.println(s"[probe] measuring $label @${f}x ...")
          val v = compute
          // drop every cached/persisted frame a query left behind (LSH
          // indexes, fit features): rows must not inherit heap pressure.
          // PrefixScan persists at the RDD level since r11 (outside the SQL
          // CacheManager) — release those explicitly too.
          spark.catalog.clearCache()
          graft.operators.PrefixScan.releaseAll()
          val w = new java.io.FileWriter(ckptFile, true)
          try w.write(
            s"""{"label":"$label","f":$f,"sec":${v._1},"rows":${v._2},"spill":${v._3.spillBytes},"shuffle":${v._3.shuffleWriteBytes},"gc":${v._3.gcMillis},"commit":"$engineCommit","dir":"$base","calib":$probeCalib}\n""")
          finally w.close()
          System.err.println(f"[probe] $label @${f}x: ${v._1}%.2f s")
          ckpt((label, f)) = v
          rowEpoch((label, f)) = engineCommit
          v
      }

    // Task-metric listener: per-run sums of spill/shuffle/GC, to attribute a
    // superlinear segment to spill (memory pressure) vs output volume. The
    // probe runs queries serially, so a global accumulator is race-free.
    val metrics = new ProbeMetricsListener
    spark.sparkContext.addSparkListener(metrics)

    // toRdd.count(), NOT Dataset.count(): count() plants an Aggregate on top
    // and Catalyst then prunes every computed column (and drops sorts), so a
    // pure-map query would be measured as a scan-count. toRdd materializes
    // the plan's actual output rows with all expressions evaluated.
    // Returns (best-of-3 seconds, output rows, metrics of the best rep).
    def timeDf(mk: String => org.apache.spark.sql.DataFrame,
               dir: String): (Double, Long, ProbeMetrics) =
      (1 to 3).map { _ =>
        metrics.reset()
        val t0 = System.nanoTime()
        val rows = mk(dir).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        // listener bus is async and has no public flush — a short drain pause
        // is enough for the per-task metric events of a finished job
        Thread.sleep(300)
        (dt, rows, metrics.snapshot())
      }.minBy(_._1)
    // ML fits memoize per (session, dir): without the cache drop a repeat
    // rep would measure the post-fit cache hit, not the fit (the Bench
    // fitsOnce discipline). reps=2 for the fit ladder: each rep is a full
    // featurize+fit, the second rep suffices to shed first-touch noise.
    def timeFit(name: String, dir: String, reps: Int = 2): (Double, Long) =
      (1 to reps).map { _ =>
        graft.queries.MlQueries.clearFitCaches()
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }.minBy(_._1)

    def rowDone(q: String, factors: Seq[Int]): Boolean =
      factors.forall(f => ckpt.contains((q, f)))
    def factorsOf(q: String): Seq[Int] =
      if (Seq("q_minhash_dedup", "q_dedup_incremental",
              "q_allpairs_jaccard", "q_winnow_neardup").contains(q)) dupHeavyFactors
      else linearFactors // events/graph share the linear 1/10/50/100 grid

    // warm the io/codegen paths so factor-1 isn't charged first-touch cost
    // (skipped for ops fully replayed from the checkpoint)
    (linearOps ++ eventsOps ++ graphOps ++
        Seq("q_minhash_dedup", "q_dedup_incremental", "q_allpairs_jaccard",
            "q_winnow_neardup"))
      .filter(q => only.forall(_.contains(q)))
      .filterNot(q => rowDone(q, factorsOf(q)))
      .foreach(q =>
        SparkEntry.queries(q)(spark, base).queryExecution.toRdd.count())

    val linRows = linearOps.filter(q => only.forall(_.contains(q))).map { q =>
      q -> linearFactors.map(f =>
        f -> checkpointed(q, f)(timeDf(SparkEntry.queries(q)(spark, _), dirFor(f)))._1).toMap
    }
    // q_dedup_incremental joins the replicated corpus too: every replica is
    // a near-dup of its original, so like q_minhash_dedup its verified-match
    // OUTPUT grows with the duplication factor — probed on the dup-heavy
    // ladder, not the linear one.
    // q_winnow_neardup (r10): the heaviest headline bench row joins the
    // dup-heavy ladder — every replica is a winnowing near-dup of its
    // original, so like the rows above its verified-pair OUTPUT grows with
    // the dup factor; the ladder separates candidate-volume growth from
    // fingerprint-scan growth.
    val dupRows = Seq("q_minhash_dedup", "q_dedup_incremental",
        "q_allpairs_jaccard", "q_winnow_neardup")
      .filter(q => only.forall(_.contains(q))).map { q =>
      q -> dupHeavyFactors.map { f =>
        val v = checkpointed(q, f)(timeDf(SparkEntry.queries(q)(spark, _), dirFor(f)))
        f -> ((v._1, v._2))
      }.toMap
    }
    val evRows = eventsOps.filter(q => only.forall(_.contains(q))).map { q =>
      q -> eventsFactors.map(f =>
        f -> checkpointed(q, f)(timeDf(SparkEntry.queries(q)(spark, _), dirFor(f)))._1).toMap
    }

    // ---- graph/ML ladders (r7, VERDICT r6 #3): the iterative-join and fit
    // paths. Registry graph queries run unmodified on the replicated
    // customer table (disjoint components, linear growth). q_scc's registry
    // form bounds its subgraph to keys < 200 (a fixed gate subgraph — a
    // ladder over it would measure a constant), so the ladder probes the
    // SAME SCC operator over the replicas' full braided chains directly.
    val graphRows = graphOps.filter(q => only.forall(_.contains(q))).map { q =>
      q -> graphFactors.map(f =>
        f -> checkpointed(q, f)(timeDf(SparkEntry.queries(q)(spark, _), dirFor(f)))._1).toMap
    }
    val sccProbe: String => org.apache.spark.sql.DataFrame = { dir =>
      val c = graft.io.Tables.customer(spark, dir)
        .select("c_custkey", "c_nationkey")
      val e = c.alias("a").join(c.alias("b"),
          col("a.c_nationkey") === col("b.c_nationkey") &&
          col("b.c_custkey") > col("a.c_custkey") &&
          col("b.c_custkey") <= col("a.c_custkey") + 2)
        .select(col("a.c_custkey").as("src"), col("b.c_custkey").as("dst"))
      // the q_scc gate's directionality rule, applied to the whole graph
      val dir2 = e.unionByName(
        e.filter((col("src") + col("dst")) % 3 === 0)
          .select(col("dst").as("src"), col("src").as("dst")))
      graft.graph.GraphOps.stronglyConnectedComponents(dir2)
    }
    // timeFit returns (seconds, output rows) — checkpoint with metrics zeroed
    def noMetrics(v: (Double, Long)): (Double, Long, ProbeMetrics) =
      (v._1, v._2, ProbeMetrics(0L, 0L, 0L))
    val sccRows =
      if (only.forall(_.contains("q_scc")))
        Seq("q_scc(whole-graph)" ->
          graphFactors.map(f =>
            f -> checkpointed("q_scc(whole-graph)", f)(timeDf(sccProbe, dirFor(f)))._1).toMap)
      else Nil
    // k-means blocking fit on the linear document replicas: the reference's
    // own scale cliff lived in this fit (docs/tuning_kmeans.md:130).
    val fitRows =
      if (only.forall(_.contains("q_kmeans_blocks")))
        Seq("q_kmeans_blocks(fit)" ->
          graphFactors.map(f =>
            f -> checkpointed("q_kmeans_blocks(fit)", f)(
              noMetrics(timeFit("q_kmeans_blocks", dirFor(f))))._1).toMap)
      else Nil
    // (q_minhash_lsh / q_corpus_build fit ladders moved BELOW the tail and
    // multimodal sections: the ML-estimator LSH fit costs ~200 s at 1× —
    // under a deadline the cheap sections must bank first.)

    // ---- ANN ladder (r9): the similarity-search family had correctness
    // twins but no measured scaling row. FIXED 40-probe batch against a
    // GROWING corpus — the 100 TB question is query-batch cost vs corpus
    // size, so probes stay the base corpus's vec_id%50 set while replicas
    // multiply the corpus (distinct vec_ids, vectors unchanged: timing is
    // corpus-size-driven; duplicate vectors only create score ties).
    locally {
      val annFactorsNeeded = linearFactors.filter(_ > 1)
        .filterNot(haveTable(_, "embeddings"))
      annFactorsNeeded.foreach { f =>
        val es = (0 until f).map { r =>
          spark.read.parquet(s"$base/embeddings.parquet")
            .select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
              col("embedding"), col("label"))
        }.reduce(_.unionByName(_))
        es.repartition(32).write.mode("overwrite")
          .parquet(s"${dirFor(f)}/embeddings.parquet")
      }
    }
    def annCorpus(dir: String) =
      graft.io.Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          graft.similarity.ArrayOps.asDouble(col("embedding")).as("v"))
        .repartition(32)
    def annProbes(t: org.apache.spark.sql.DataFrame) =
      t.filter(col("vec_id") < 2000 && col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
    // bounded per-probe top-3 via the TopKScored partial aggregation —
    // the same shape Ivf/IvfPq.search use (one ≤k buffer per partition per
    // probe rides the shuffle, never the corpus-scale scored rows)
    def annTop3(scored: org.apache.spark.sql.DataFrame) =
      scored.groupBy("q_id")
        .agg(graft.functions.Aggregators.topKScored(3)(
          col("cos"), col("cand_id")).as("__top"))
        .select(col("q_id"), posexplode(col("__top")).as(Seq("__pos", "__t")))
        .select(col("q_id"), col("__t._2").as("cand_id"),
          col("__t._1").as("cos"), (col("__pos") + 1).cast("int").as("rn"))
    val annOps: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      // exact baseline: broadcast the probe batch, scan the corpus once
      "q_ann_brute(40q)" -> { dir =>
        val t = annCorpus(dir)
        annTop3(t.crossJoin(broadcast(annProbes(t)))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("cand_id"),
            graft.similarity.ArrayOps.cosine(col("qv"), col("v")).as("cos")))
      },
      // data-independent sign-LSH buckets (no fit): candidates from bucket
      // equality only — candidate count per probe tracks bucket occupancy
      "q_ann_lsh(40q)" -> { dir =>
        // registry q_ann_lsh config: 6 planes → 64 buckets (16 planes left
        // every base-corpus bucket singleton — zero candidates at 1×)
        val planes = graft.ann.SignLsh.hyperplanes(6, 64)
        val t = annCorpus(dir)
          .withColumn("bkt", graft.ann.SignLsh.bucket(col("v"), planes))
        val q = t.filter(col("vec_id") < 2000 && col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            col("bkt").as("qbkt"))
        annTop3(t.join(broadcast(q), col("qbkt") === col("bkt") &&
            col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("cand_id"),
            graft.similarity.ArrayOps.cosine(col("qv"), col("v")).as("cos")))
      },
      // registry IVF config end-to-end (k-means build + routed search):
      // fixed k means the scan fraction is nProbe/k of the corpus — the
      // ladder shows the linear wall this hits
      "q_ann_ivf(k16,p4)" -> { dir =>
        val t = annCorpus(dir)
        val idx = graft.ann.Ivf.build(t, "v", k = 16)
        graft.ann.Ivf.search(idx, annProbes(t), "vec_id", "v",
          topK = 3, nProbe = 4)
      },
      // r12: the pinned-model path (Ivf.fromCentroids — NO fit job):
      // assignment is one narrow broadcast-argmin map over the corpus, so
      // the row isolates ingest+search from k-means cost — the amortized
      // production ingest shape the r12 [sql] ANN gates pin (and the
      // q_stream_ann_ingest per-micro-batch shape, measured batch-side)
      "q_ann_ivf(pinned16,p4)" -> { dir =>
        val t = annCorpus(dir)
        val cents = t.filter(col("vec_id") < 16)
          .select(col("vec_id").cast("int").as("centroid_id"),
            col("v").as("cvec"))
        val idx = graft.ann.Ivf.fromCentroids(t, "v", cents)
        graft.ann.Ivf.search(idx, annProbes(t), "vec_id", "v",
          topK = 3, nProbe = 4)
      },
      // r12: pinned-codebook PQ — encode is a narrow broadcast-argmin map,
      // search is an ADC scan of the full code table (no routing): the row
      // prices the code-scan linear wall the IVF-PQ composition removes
      "q_ann_pq(pinned16,m8)" -> { dir =>
        val t = annCorpus(dir)
        val pin = t.filter(col("vec_id") < 16).orderBy("vec_id")
          .select("v").collect().map(_.getSeq[Double](0).toArray)
        val books = Array.tabulate(8, 16)((j, c) => pin(c).slice(j * 8, j * 8 + 8))
        val idx = graft.ann.Pq.fromCodebooks(t, "vec_id", "v", books)
        graft.ann.Pq.search(idx, annProbes(t), topK = 3)
      },
      // r12: the composed pinned-model IVF-PQ — coarse routing bounds the
      // ADC scan to nProbe/k of the code table; both halves fit-free
      "q_ann_ivfpq(pinned16,p4)" -> { dir =>
        val t = annCorpus(dir)
        val cents = t.filter(col("vec_id") < 16)
          .select(col("vec_id").cast("int").as("centroid_id"),
            col("v").as("cvec"))
        val ivf = graft.ann.Ivf.fromCentroids(t, "v", cents)
        val pin = t.filter(col("vec_id") < 16).orderBy("vec_id")
          .select("v").collect().map(_.getSeq[Double](0).toArray)
        val books = Array.tabulate(8, 16)((j, c) => pin(c).slice(j * 8, j * 8 + 8))
        val pq = graft.ann.Pq.fromCodebooks(t, "vec_id", "v", books)
        graft.ann.IvfPq.search(ivf, pq, annProbes(t), "vec_id",
          topK = 3, nProbe = 4)
      },
      // √N-scaled coarse quantizer (k ∝ √corpus, the standard IVF tuning):
      // scan fraction shrinks as the corpus grows — build cost rises with
      // k but the search stays probe-bounded
      "q_ann_ivf(k~sqrtN,p4)" -> { dir =>
        val t = annCorpus(dir)
        val n = t.count()
        val k = math.max(16, (math.sqrt(n.toDouble) / 2.8).toInt)
        val idx = graft.ann.Ivf.build(t, "v", k = k)
        graft.ann.Ivf.search(idx, annProbes(t), "vec_id", "v",
          topK = 3, nProbe = 4)
      })
    val annRows = annOps
      .filter { case (l, _) => only.forall(_.exists(l.startsWith)) }
      .map { case (label, mk) =>
        label -> linearFactors.map { f =>
          f -> checkpointed(label, f)(timeDf(mk, dirFor(f)))._1
        }.toMap
      }
    // search-only twin: the index is built and PERSISTED outside the timed
    // lambda — the production shape, where one build amortizes across many
    // probe batches; the build+search rows above price the fit in
    // same filter direction as annRows (label starts with the filter string) —
    // the r9 cut had the prefix test inverted, so passing the row's own full
    // label silently skipped it (ADVICE r9)
    val annSearchRows =
      if (only.forall(_.exists(e => "q_ann_ivf(k16,p4 search-only)".startsWith(e))))
        Seq("q_ann_ivf(k16,p4 search-only)" -> linearFactors.map { f =>
          f -> checkpointed("q_ann_ivf(k16,p4 search-only)", f) {
            val t = annCorpus(dirFor(f))
            val idx = graft.ann.Ivf.build(t, "v", k = 16)
            idx.assigned.persist(); idx.assigned.count()
            val v = timeDf(_ => graft.ann.Ivf.search(idx, annProbes(t),
              "vec_id", "v", topK = 3, nProbe = 4), dirFor(f))
            idx.assigned.unpersist()
            v
          }._1
        }.toMap)
      else Nil

    // ---- PQ recall ladder (r13, VERDICT r12 #7): the hash-ordered sample
    // fit's quality evidence was a single gate-scale number (PqSpec recall@10
    // 0.28 hash / 0.29 prefix / 0.31 distributed — same quality class,
    // different local optimum). This point measures recall at a SECOND scale
    // so "optimum scatter, not quality loss" rests on two corpus sizes.
    // The timing-ladder replicas copy vectors EXACTLY (score ties only), which
    // degenerates a recall measure — a probe's exact top-10 would be its own
    // zero-distance copies, which share its PQ code and are found trivially.
    // Recall replicas instead CIRCULAR-SHIFT each vector by r dims: distinct
    // vectors, identical per-dim marginals (dims are exchangeable on this
    // synthetic corpus), so the 10× corpus is a genuinely 10×-harder
    // neighbor problem, not 9 free copies. rows rides the total top-10 hit
    // count; corpus size and the recall denominator (nProbes×10) ride the
    // spill/shuffle checkpoint fields (the mmBytes convention).
    val recallKey = "q_ann_recall(pq m8k16 hash-fit)"
    val recallFactors = Seq(1, 10)
    val recallRows: Seq[(String, Map[Int, (Double, Long, ProbeMetrics)])] =
      if (only.forall(_.exists(e => recallKey.startsWith(e)))) {
        def recallDir(f: Int) =
          if (f == 1) base else s"${work.getPath}/recall_x$f"
        recallFactors.filter(_ > 1)
          .filterNot(f => new java.io.File(
            s"${recallDir(f)}/embeddings.parquet/_SUCCESS").exists())
          .foreach { f =>
            val es = (0 until f).map { r =>
              val e = spark.read.parquet(s"$base/embeddings.parquet")
              val shifted =
                if (r == 0) col("embedding")
                else concat(
                  slice(col("embedding"), lit(r + 1),
                    size(col("embedding")) - lit(r)),
                  slice(col("embedding"), lit(1), lit(r)))
              e.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
                shifted.as("embedding"), col("label"))
            }.reduce(_.unionByName(_))
            es.repartition(32).write.mode("overwrite")
              .parquet(s"${recallDir(f)}/embeddings.parquet")
          }
        Seq(recallKey -> recallFactors.map { f =>
          f -> checkpointed(recallKey, f) {
            val t = annCorpus(recallDir(f))
            val corpusN = t.count()
            // fixed base-corpus probe batch (the ANN-ladder convention) —
            // replica r=0 keeps the base ids, so probes exist at every factor
            val probes = annProbes(t)
            val nProbes = probes.count()
            val t0 = System.nanoTime()
            val index = graft.ann.Pq.build(t, "vec_id", "v", m = 8, k = 16)
            val pqTop = graft.ann.Pq.search(index, probes, topK = 10)
              .select(col("q_id"), col("cand_id"))
              .collect().map(r => (r.getLong(0), r.getLong(1)))
              .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
            val sec = (System.nanoTime() - t0) / 1e9
            import graft.similarity.ArrayOps
            val d2 = ArrayOps.norm2sq(col("qv")) + ArrayOps.norm2sq(col("v")) -
              lit(2.0) * ArrayOps.dot(col("qv"), col("v"))
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("q_id").orderBy(asc("d2"), asc("cand_id"))
            val exactTop = probes.crossJoin(t)
              .filter(col("vec_id") =!= col("q_id"))
              .select(col("q_id"), col("vec_id").as("cand_id"), d2.as("d2"))
              .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
              .select(col("q_id"), col("cand_id"))
              .collect().map(r => (r.getLong(0), r.getLong(1)))
              .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
            val hits = exactTop.map { case (q, ex) =>
              pqTop.getOrElse(q, Set.empty).intersect(ex).size.toLong }.sum
            (sec, hits, ProbeMetrics(corpusN, nProbes * 10L, 0L))
          }
        }.toMap)
      } else Nil

    // ---- tail diagnosis (round-3 watch items): q_winnow and q_ngram_count
    // are the two operators whose 50×→100× segment trends superlinear. For
    // each, probe (a) the registry query as-is, (b) the OPERATOR alone — the
    // same plan minus the final presentation orderBy, which exists only so
    // the oracle compare is deterministic and is NOT part of the production
    // operator — and record output rows + spill/shuffle/GC of the best rep.
    val tailVariants: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "q_winnow(full)" -> (dir => SparkEntry.queries("q_winnow")(spark, dir)),
      "q_winnow(no-sort)" -> { dir =>
        graft.io.Tables.documents(spark, dir)
          .select(col("doc_id"),
            explode(graft.text.TextOps.winnow(col("text"), 12, 4)).as("packed"))
          .select(col("doc_id"),
            shiftright(col("packed"), 32).as("pos"),
            col("packed").bitwiseAND(lit(0xFFFFFFFFL)).as("fp"))
      },
      "q_ngram_count(full)" -> (dir => SparkEntry.queries("q_ngram_count")(spark, dir)),
      "q_ngram_count(no-sort)" -> { dir =>
        graft.io.Tables.documents(spark, dir)
          .select(explode(graft.text.TextOps.ngrams(
            graft.text.TextOps.tokens(col("text")), 3)).as("ngram"))
          .groupBy("ngram").agg(count(lit(1)).as("n"))
          .filter(col("n") >= 3)
      },
      // q_ewma_array's two r10 diagnostic variants are RETIRED (VERDICT r10
      // #8): the (no-sort) rows were measurement-noise-shaped (52.5 s at
      // 100× no-sort vs 15.2 s full — a strict subset of the full plan
      // measuring 3× slower is contention, not plan cost) and the query is
      // an oracle-only twin whose production row lives on the events ladder
      // (α 0.70). Disposition is printed with the tail table.
      //
      // q_substring_spans — the heaviest document-path ladder row (VERDICT
      // r10 #7): bank its spill/shuffle/GC evidence so "growth tracks its
      // own output" rests on measured columns. (no-sort) = the same plan
      // minus the final presentation orderBy (oracle-determinism only).
      "q_substring_spans(full)" ->
        (dir => SparkEntry.queries("q_substring_spans")(spark, dir)),
      "q_substring_spans(no-sort)" -> { dir =>
        val wh = graft.io.Tables.documents(spark, dir)
          .select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("t"))
          .withColumn("i", explode(when(size(col("t")) >= 20,
            sequence(lit(1), size(col("t")) - 19)).otherwise(array().cast("array<int>"))))
          .select(col("doc_id"), col("i"),
            unhex(md5(array_join(slice(col("t"), col("i"), lit(20)), " ")
              .cast("binary"))).as("w"))
        val sh = wh.groupBy("w")
          .agg(min("doc_id").as("a"), max("doc_id").as("b"))
          .filter(col("a") =!= col("b")).select("w")
        val per = wh.join(sh, "w")
          .groupBy("doc_id")
          .agg(sort_array(collect_list(col("i"))).as("a"))
        val dcol = zip_with(
          slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
          slice(col("a"), lit(1), greatest(size(col("a")) - 1, lit(0))),
          (x, y) => x - y)
        val gaps = size(filter(dcol, x => x > 20))
        val within = aggregate(filter(dcol, x => x <= 20),
          lit(0), (acc, x) => acc + x)
        per.select(col("doc_id"),
          size(col("a")).cast("long").as("n_shared_windows"),
          (gaps + 1).cast("long").as("n_spans"),
          (lit(20) * (gaps + 1) + within).cast("long").as("covered_tokens"))
      })
    val tailFactors = Seq(10, 50, 100)
    val tailRows: Seq[(String, Map[Int, (Double, Long, ProbeMetrics)])] =
      tailVariants
        .filter { case (label, _) =>
          only.forall(o => o.exists(q => label.startsWith(q))) }
        .map { case (label, mk) =>
          label -> tailFactors.map(f =>
            f -> checkpointed(label, f)(timeDf(mk, dirFor(f)))).toMap
        }

    // ---- BPE merge-count ladder (r11, VERDICT r10 #6): corpus replication
    // leaves the vocab — and so per-iteration trainer work — unchanged (the
    // r10 corpus-ladder finding), so the axis that stresses a TRAINER is the
    // MERGE COUNT. learn plans k nested literal replaces at iteration k
    // (O(nMerges²) replace work over the vocab); learnScalable re-roots the
    // segmentation on a materialized generation every 8 merges (O(nMerges)).
    // Both emit identical merges (BpeSpec fuzz; the sf0.01 gate hashes the
    // scalable trainer against the same DuckDB replay as q_bpe_learn).
    // Input is the 1× sf0.1 vocab, caller-persisted once (the q_bpe_encode
    // ownership convention); cells record wall seconds, rows = merges
    // actually learned.
    val bpeMergeCounts = Seq(32, 128, 512)
    val runBpeLadder = only.forall(_.contains("q_bpe_merge_ladder"))
    val bpeRows: Seq[(String, Map[Int, (Double, Long, ProbeMetrics)])] =
      if (runBpeLadder) {
        val allBanked = (for {
          v <- Seq("learn", "learnScalable"); m <- bpeMergeCounts
        } yield ckpt.contains((s"q_bpe_merge_ladder($v)", m))).forall(identity)
        val words =
          if (allBanked) null
          else {
            val w = graft.text.Bpe.wordCounts(
              graft.io.Tables.spread(graft.io.Tables.documents(spark, base)))
              .persist()
            w.count()
            w
          }
        val rows = Seq[(String, (org.apache.spark.sql.DataFrame, Int) => Seq[graft.text.Bpe.Merge])](
          // learnPlain, NOT learn: learn self-steers to learnScalable above
          // 48 merges (r12), which would make this ladder compare the
          // scalable trainer against itself at 128/512 — the quadratic
          // path must stay reachable here because pricing it is the
          // ladder's whole purpose (r12 review finding)
          "learn" -> ((w, m) => graft.text.Bpe.learnPlain(w, m)),
          "learnScalable" -> ((w, m) => graft.text.Bpe.learnScalable(w, m))
        ).map { case (variant, train) =>
          // per-variant escalation guard: once a cell exceeds 10 min (or
          // fails outright — a 512-deep replace chain is exactly where
          // codegen limits would bite), larger counts for that variant are
          // skipped and rendered "—" instead of wedging the probe
          var giveUp = false
          s"q_bpe_merge_ladder($variant)" -> bpeMergeCounts.map { m =>
            val label = s"q_bpe_merge_ladder($variant)"
            // a cell already in the bank always renders; slow evidence arms
            // the guard whether banked or fresh (a 650 s bank row is exactly
            // the signal not to freshly attempt the 16× larger cell), but
            // the guard only ever SKIPS cells that would need fresh
            // measurement (r11 self-review, two passes)
            val wasBanked = ckpt.contains((label, m))
            m -> (if (giveUp && !wasBanked) skipped else
              try {
                val v = checkpointed(label, m) {
                  val reps = if (m >= 512) 1 else 2
                  (1 to reps).map { _ =>
                    metrics.reset()
                    val t0 = System.nanoTime()
                    val learned = train(words, m).size.toLong
                    val dt = (System.nanoTime() - t0) / 1e9
                    Thread.sleep(300)
                    (dt, learned, metrics.snapshot())
                  }.minBy(_._1)
                }
                if (v._1 > 600) giveUp = true
                v
              } catch { case e: Throwable =>
                // thrown INSIDE checkpointed's compute → nothing was banked;
                // a later probe run retries the cell
                System.err.println(
                  s"[probe] q_bpe_merge_ladder($variant) @$m FAILED: ${e.getMessage}")
                giveUp = true
                skipped
              })
          }.toMap
        }
        if (words != null) words.unpersist()
        rows
      } else Nil

    // ---- multimodal codec ladder (r8, VERDICT r7 #5): decode is
    // mapPartitions batch work — prove the embarrassingly-linear scaling and
    // measure decoded MB/s/core, the number a 100 TB capacity plan needs.
    // Payloads are PRE-GENERATED to parquet (generation untimed): 200·f
    // baseline 256×256 grayscale JPEGs per factor, AC-rich blocks (Huffman
    // AC magnitude + EOB paths exercised), every 4th image with restart
    // markers. The timed query reads the parquet, full-decodes every image
    // (marker walk → Huffman → dequant → IDCT → clamp) and aggregates pixel
    // stats — the exact shape of a corpus-wide image feature-extract pass.
    val mmFactors = Seq(1, 10, 50, 100)
    val runMm = only.forall(_.contains("q_jpeg_throughput"))
    val sparkForImplicits = spark
    import sparkForImplicits.implicits._
    def jpegPayloadPath(f: Int): String = s"${work.getPath}/jpeg_x$f.parquet"
    if (runMm) mmFactors
        .filterNot(f => new java.io.File(s"${jpegPayloadPath(f)}/_SUCCESS").exists())
        .foreach { f =>
      spark.range(200L * f).as[Long].repartition(32).mapPartitions { it =>
        it.map { id =>
          val quant = Array.tabulate(64)(i => if (i == 0) 8 else 16)
          val blocks = Array.tabulate(32 * 32) { b =>
            val blk = new Array[Int](64)
            blk(0) = ((id * 7 + b * 13) % 381).toInt - 190
            blk(1) = ((id + b) % 21).toInt - 10
            blk(8) = ((id * 3 + b * 5) % 17).toInt - 8
            blk(18) = ((b * 11 + id) % 9).toInt - 4
            blk
          }
          (id, graft.multimodal.Jpeg.encodeJpegFromCoeffs(
            256, 256, quant, blocks, if (id % 4 == 0) 4 else 0))
        }
      }.toDF("id", "payload")
        .write.mode("overwrite").parquet(jpegPayloadPath(f))
    }
    def jpegDecodeDf(f: Int): org.apache.spark.sql.DataFrame =
      spark.read.parquet(jpegPayloadPath(f))
        .select("id", "payload").as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val img = graft.multimodal.Jpeg.decodeJpeg(bytes)
              .getOrElse(sys.error(s"JPEG decode failed for probe image $id"))
            val px = img.planes.head
            var s = 0L; var i = 0
            while (i < px.length) { s += px(i); i += 1 }
            (id, img.width, img.height, px.length.toLong, s,
              bytes.length.toLong)
          }
        }.toDF("id", "w", "h", "n_px", "sum_px", "n_bytes")
    val mmRows: Seq[(String, Map[Int, Double])] =
      if (runMm)
        Seq("jpeg_decode(256x256 gray)" ->
          mmFactors.map(f =>
            f -> checkpointed("jpeg_decode(256x256 gray)", f)(
              timeDf(_ => jpegDecodeDf(f), ""))._1).toMap)
      else Nil
    // bytes for the throughput figure: decoded = 1 B/px grayscale output,
    // compressed = on-disk entropy-coded payload (both at 100×) —
    // checkpointed with the byte totals riding the rows/spill fields
    val mmBytes: Option[(Long, Long)] =
      if (runMm) {
        val v = checkpointed("jpeg_bytes", 100) {
          val r = jpegDecodeDf(100)
            .agg(sum("n_px").cast("long"), sum("n_bytes").cast("long"))
            .collect()(0)
          (0.0, r.getLong(0), ProbeMetrics(r.getLong(1), 0L, 0L))
        }
        Some((v._2, v._3.spillBytes))
      } else None

    // q_minhash_lsh and q_corpus_build (LSH dedup inside) see every replica
    // as a near-duplicate of its original — candidate-pair OUTPUT grows
    // quadratically in the factor by construction, so they ladder on the
    // dup-heavy factors like q_minhash_dedup, not the linear ones. Last on
    // purpose originally because the Spark ML estimator's
    // approxSimilarityJoin cost ~200 s at 1× and OOMed at 10×; r9 rewrote
    // LshJoins.selfJoinWithModel on the banded bucket-join shape (same
    // pinned output), so this ladder now measures the production path —
    // the r8 estimator numbers stay recorded in SCALE.md as the
    // shape-comparison finding.
    val dupMlRows = Seq("q_minhash_lsh", "q_corpus_build")
      .filter(q => only.forall(_.contains(q))).map { q =>
        q -> dupHeavyFactors.map { f =>
          val v = checkpointed(s"$q(fit)", f)(noMetrics(timeFit(q, dirFor(f))))
          f -> ((v._1, v._2))
        }.toMap
      }

    // ---- budget-guard all-LSH branch ladder (r12, VERDICT r11 #6): the
    // q_candidates_budget registry query routes EVERY mod-8 block through
    // pairsWithBudget's banded-LSH branch at sf0.1 (block size ~625 ≫ cap
    // 40) — the 100 TB operating point, where no block fits a quadratic
    // budget. Replicas are near-dups of their originals, so like the
    // dup-heavy rows above the verified candidate OUTPUT grows
    // ~quadratically in the factor; the ladder's question is whether the
    // branch MACHINERY (support-minhash signatures, 16-band slicing, the
    // id-only bucket join, the constraint verify) stays banded — read the
    // spill/shuffle columns against the rows column. timeDf's first rep
    // pays the memoized count-featurization; the best-of-3 min measures
    // the branch over cached features (the persisted-features production
    // shape).
    val budgetKey = "q_candidates_budget(all-LSH)"
    val budgetRows: Seq[(String, Map[Int, (Double, Long, ProbeMetrics)])] =
      if (only.forall(_.exists(e => budgetKey.startsWith(e))))
        Seq(budgetKey -> dupHeavyFactors.map { f =>
          f -> checkpointed(budgetKey, f)(
            timeDf(SparkEntry.queries("q_candidates_budget")(spark, _),
              dirFor(f)))
        }.toMap)
      else Nil
    // drop the per-dir feature memos the ladder primed (4 corpus dirs)
    if (budgetRows.nonEmpty) graft.queries.MlQueries.clearFitCaches()

    // deadline-skipped rows render as "—" (measured numbers only, never a
    // guess); α needs both the 10× and 100× points
    def fmt(d: Double): String = if (d.isNaN) "—" else f"$d%.2f"
    def alphaOf(t: Map[Int, Double]): String =
      if (t.getOrElse(100, Double.NaN).isNaN || t.getOrElse(10, Double.NaN).isNaN) "—"
      else f"${math.log(t(100) / t(10)) / math.log(10.0)}%.2f"

    val sb = new StringBuilder
    sb.append("# SCALEPROBE — measured wall-time scaling of document-path operators\n\n")
    sb.append(s"Generated by `graft.ScaleProbe` from $base (5k docs) replicated with\n")
    sb.append("distinct ids and per-replica text suffixes; best-of-3 timings at\n")
    sb.append("local[32], full output materialization (toRdd — Dataset.count()\n")
    sb.append("would let Catalyst prune the computed columns of map-only plans).\n")
    sb.append("α = fitted exponent of t ≈ c·Nᵅ between 10× and 100× (below ~50k\n")
    sb.append("rows the per-query constant floors the measurement; host noise is\n")
    sb.append("suppressed by best-of-3, not eliminated). α ≈ 1 is the linear\n")
    sb.append("scan-and-aggregate contract; α well below 1 means the operator is\n")
    sb.append("still overhead-dominated even at 500k docs.\n\n")
    locally { // mixed-epoch disclosure (r9, ADVICE r8): never pass stale rows off as current
      val byCommit = rowEpoch.valuesIterator.toSeq.groupBy(identity)
        .view.mapValues(_.size).toSeq.sortBy(-_._2)
      val foreign = byCommit.filter(_._1 != engineCommit)
      if (foreign.nonEmpty) {
        sb.append(s"**Mixed measurement epochs.** Generated at engine commit `$engineCommit`;\n")
        sb.append(s"rows replayed from earlier-commit checkpoints: ")
        sb.append(foreign.map { case (c, n) => s"$n from `$c`" }.mkString(", "))
        sb.append(".\nPer-row stamps live in `/tmp/graft_scaleprobe/rows.jsonl`; delete a\n")
        sb.append("label's lines there to force its re-measure under the current commit.\n")
        sb.append("Rows whose operator code changed since their stamp were re-measured\n")
        sb.append("this run (their stamp equals the generating commit above).\n")
        sb.append("Rows banked from r10 on also carry a `calib` host-throughput stamp\n")
        sb.append("(the Bench calibration fold, measured in the same session) — compare\n")
        sb.append("sec/calib across stamps where raw seconds are epoch-confounded.\n\n")
      }
    }
    sb.append("| query | 1× s | 10× s | 50× s | 100× s | α(10×→100×) |\n")
    sb.append("|---|---|---|---|---|---|\n")
    linRows.foreach { case (q, t) =>
      sb.append(s"| $q | ${fmt(t(1))} | ${fmt(t(10))} | ${fmt(t(50))} | ${fmt(t(100))} | ${alphaOf(t)} |\n")
    }
    if (evRows.nonEmpty) {
      sb.append("\nEvents-path operators (replicated events: distinct user/event\n")
      sb.append("ids per replica, same time range — per-user state scales in key\n")
      sb.append("count, windows densify):\n\n")
      sb.append("| query | 1× s | 10× s | 50× s | 100× s | α(10×→100×) |\n")
      sb.append("|---|---|---|---|---|---|\n")
      evRows.foreach { case (q, t) =>
        sb.append(s"| $q | ${fmt(t(1))} | ${fmt(t(10))} | ${fmt(t(50))} | ${fmt(t(100))} | ${alphaOf(t)} |\n")
      }
      sb.append("\nq_range_join is the deliberate PAIR-DENSITY-HEAVY case of this\n")
      sb.append("ladder: it is a pure point-in-interval join with NO equi key, and\n")
      sb.append("same-time-range replication multiplies BOTH sides of every time\n")
      sb.append("bin — its matched-pair count (the rows fed to the aggregation)\n")
      sb.append("grows QUADRATICALLY in the factor by construction (100x more\n")
      sb.append("clicks x 100x more windows per bin = 10 000x the pairs from 10x\n")
      sb.append("to 100x). An alpha near 2 would merely track output; the measured\n")
      sb.append("time growth is far below pair growth, i.e. the bin equi-join is\n")
      sb.append("doing its work. q_range_join_keyed IS the keyed production form\n")
      sb.append("(user-scoped windows: the key joins the (key, bin) shuffle key,\n")
      sb.append("replication adds KEYS, candidates grow linearly) — its ladder row\n")
      sb.append("above should show asof-like alpha, far under the unkeyed case.\n")
      sb.append("q_ewma (canonical since r7) is the ring-buffer recurrence form;\n")
      sb.append("q_ewma_array is the collect_list window twin (same bit-exact\noutput) kept as the oracle cross-check — compare rows.\n")
    }
    val iterRows = graphRows ++ sccRows ++ fitRows
    if (iterRows.nonEmpty) {
      sb.append("\nGraph/ML iterative paths (r7 ladder: replicated customers are\n")
      sb.append("DISJOINT braided-chain components — custkey AND nationkey ranges\n")
      sb.append("shift per replica — so vertices/edges grow linearly; the k-means\n")
      sb.append("fit runs on the linear document replicas with the fit cache\n")
      sb.append("dropped per rep, so every rep is a full featurize+fit — the\n")
      sb.append("reference's own scale cliff lived here, tuning_kmeans.md:130):\n\n")
      sb.append("| query | 1× s | 10× s | 50× s | 100× s | α(10×→100×) |\n")
      sb.append("|---|---|---|---|---|---|\n")
      iterRows.foreach { case (q, t) =>
        sb.append(s"| $q | ${fmt(t(1))} | ${fmt(t(10))} | ${fmt(t(50))} | ${fmt(t(100))} | ${alphaOf(t)} |\n")
      }
      sb.append("\nq_scc(whole-graph) is the registry SCC operator over the full\n")
      sb.append("replicated graph — the registry q_scc gate pins a FIXED keys<200\n")
      sb.append("subgraph (a constant under replication), so the ladder probes the\n")
      sb.append("operator, not the gate fixture. Its profile is ITERATION-LATENCY\n")
      sb.append("FLOORED: label propagation runs until convergence, rounds scale\n")
      sb.append("with component diameter (identical across replicas — replication\n")
      sb.append("adds components, not diameter), so past 10× the time is rounds ×\n")
      sb.append("fixed per-round scheduling latency and the 10×→100× segment is\n")
      sb.append("FLAT — per-round work hasn't reached the latency floor even at\n")
      sb.append("1.5M vertices. q_kmeans_blocks(fit) includes the full\n")
      sb.append("clean→tokenize→TF→IDF featurization plus the k=8 fit.\n")
    }
    if (annRows.nonEmpty) {
      sb.append("\n## ANN ladder: fixed 40-probe batch vs growing corpus (r9)\n\n")
      sb.append("The 100 TB similarity-search question is query-batch cost vs\n")
      sb.append("corpus size, so the probe set is FIXED (the base corpus's 40\n")
      sb.append("vec_id%50 probes) while embedding replicas grow the corpus\n")
      sb.append("2k→200k vectors. All four shapes broadcast the probe side and\n")
      sb.append("scan/join the corpus without shuffling it; since r9 the\n")
      sb.append("per-probe top-k is a BOUNDED TopKScored partial aggregation\n")
      sb.append("(one ≤k buffer per partition per probe rides the exchange) in\n")
      sb.append("Ivf/IvfPq/Pq.search and the LSH/brute shapes alike — the\n")
      sb.append("window form it replaced shuffled every scored candidate row,\n")
      sb.append("a corpus-scale exchange these semantics never needed. Brute\n")
      sb.append("force is the exact baseline (one corpus scan × 40 cosines per\n")
      sb.append("row); sign-LSH restricts to 64-bucket equality candidates\n")
      sb.append("(data-independent, no fit); the IVF rows INCLUDE the k-means\n")
      sb.append("index build each rep — fixed k=16 scans nProbe/k = 25% of the\n")
      sb.append("corpus, k~√N shrinks the scanned fraction as the corpus grows.\n")
      sb.append("Reading: every α sits near 0 — at ≤200k×64-dim the per-job\n")
      sb.append("constant floors all four shapes and the IVF rows are fit-\n")
      sb.append("dominated (~3 s k-means, amortized across batches in\n")
      sb.append("production); the evidence at this scale is the flat profile\n")
      sb.append("plus the plan shape, not a brute-vs-index gap, which opens\n")
      sb.append("only past ~10⁷ vectors per executor; the search-only row\n")
      sb.append("(index built+persisted outside the timer, the amortized\n")
      sb.append("production shape) is what a standing corpus pays per batch.\n")
      sb.append("Checkpoint shuffle-MB tracks the single-file scan-spread\n")
      sb.append("repartition,\n")
      sb.append("not the top-k.\n\n")
      sb.append("| query | 1× s | 10× s | 50× s | 100× s | α(10×→100×) |\n")
      sb.append("|---|---|---|---|---|---|\n")
      (annRows ++ annSearchRows).foreach { case (q, t) =>
        sb.append(s"| $q | ${fmt(t(1))} | ${fmt(t(10))} | ${fmt(t(50))} | ${fmt(t(100))} | ${alphaOf(t)} |\n")
      }
    }
    if (recallRows.nonEmpty) {
      sb.append("\n## PQ recall ladder (r13): hash-ordered sample fit vs corpus size\n\n")
      sb.append("Mean recall@10 of `Pq.build` (8×16 codebooks, the r12 hash-ordered\n")
      sb.append("deterministic sample fit) against exact L2 top-10 ground truth on\n")
      sb.append("the fixed 40-probe batch. Replicas here CIRCULAR-SHIFT each vector\n")
      sb.append("by r dims (distinct vectors, identical per-dim marginals) — exact\n")
      sb.append("copies would hand every probe its own zero-distance duplicates and\n")
      sb.append("measure nothing. The gate-scale scatter is PqSpec's 0.28 hash /\n")
      sb.append("0.29 prefix / 0.31 distributed; a flat recall at 10× means the\n")
      sb.append("bounded sample fit's quality holds as the corpus outgrows the\n")
      sb.append("sample, which is the 100 TB question for a standing codebook.\n\n")
      sb.append("| corpus | vectors | mean recall@10 | fit+search s |\n")
      sb.append("|---|---|---|---|\n")
      recallRows.foreach { case (_, t) =>
        recallFactors.foreach { f =>
          val (s, hits, m) = t(f)
          if (s.isNaN) sb.append(s"| ${f}x | — | — | — |\n")
          else sb.append(f"| ${f}x | ${m.spillBytes} " +
            f"| ${hits.toDouble / m.shuffleWriteBytes}%.3f | $s%.2f |\n")
        }
      }
    }
    sb.append("\nDup-heavy dedup (output pairs grow quadratically in the\n")
    sb.append("duplication factor by construction — the operator's job;\n")
    sb.append("q_minhash_lsh and q_corpus_build join this ladder in r7: every\n")
    sb.append("replica is a near-dup of its original, so their LSH candidate\n")
    sb.append("output grows quadratically too — fit caches dropped per rep).\n")
    sb.append("r9: q_minhash_lsh runs the BANDED bucket-join rewrite of\n")
    sb.append("LshJoins.selfJoinWithModel (id-only bucket shuffle, vectors\n")
    sb.append("re-attached for survivors; identical pinned output) — its ladder\n")
    sb.append("was re-measured under the new shape. The r8 estimator numbers\n")
    sb.append("(195 s at 1×, 510 s at 2×, OOM at 10× on a 16 GiB heap) are the\n")
    sb.append("shape-comparison finding recorded in SCALE.md.\n\n")
    sb.append("Cells are `seconds (output rows)`: for these operators OUTPUT is\n")
    sb.append("the scale driver, so μs/row is the number to read, not α.\n")
    sb.append("q_minhash_lsh reproduces the reference estimator's semantics —\n")
    sb.append("ALL pairs sharing ≥1 of 16 single-minhash buckets that pass the\n")
    sb.append("0.6 jaccard-distance threshold. On this corpus ~85% of ALL pairs\n")
    sb.append("pass (106 457 of 124 750 at the sf0.01 gate), so its output —\n")
    sb.append("and any exact implementation's floor — is Θ(n²); the ladder's\n")
    sb.append("question is whether time/row stays flat. q_minhash_dedup is the\n")
    sb.append("production dedup path (tight banding, 0.7 threshold, survivor\n")
    sb.append("pairs only): output quadratic only in the DUP factor, corpus-\n")
    sb.append("linear otherwise; q_allpairs_jaccard (r9) is its EXACT\n")
    sb.append("PPJoin/AllPairs twin — the same τ=0.7 answer set with no\n")
    sb.append("banding-recall caveat, via rarest-first prefix-token join\n")
    sb.append("plus (r10) the PPJoin positional filter, which cut candidate\n")
    sb.append("shuffle bytes ~28% and 10× wall time 7.96→5.78 s with the\n")
    sb.append("output identical — so their cells compare an approximate and\n")
    sb.append("an exact algorithm on identical semantics. Read the rows\n")
    sb.append("columns against each other: at 10× the exact join reports\n")
    sb.append("250 500 pairs to the banded join's 250 497 — THREE true\n")
    sb.append("near-dup pairs measurably missed by 16-band/64-hash MinHash\n")
    sb.append("(recall 99.9988%), caught by the complete prefix+positional\n")
    sb.append("filter at ~2.1× the wall time. That is the quantified\n")
    sb.append("price/risk trade between the two dedup paths.\n")
    sb.append("q_corpus_build reduces\n")
    sb.append("to a bounded ≤15-row\n")
    sb.append("report — time tracks the internal dedup; the report SHRINKS at\n")
    sb.append("higher factors as dup clusters collapse whole sources.\n\n")
    sb.append("| query | 1× s (rows) | 2× s (rows) | 5× s (rows) | 10× s (rows) |\n")
    sb.append("|---|---|---|---|---|\n")
    def fmtRows(n: Long): String =
      if (n >= 1000000L) f"${n / 1e6}%.1fM"
      else if (n >= 1000L) f"${n / 1e3}%.0fk" else n.toString
    def cell(v: (Double, Long)): String =
      if (v._1.isNaN) "—" else s"${fmt(v._1)} (${fmtRows(v._2)})"
    (dupRows ++ dupMlRows).foreach { case (q, t) =>
      sb.append(s"| $q | ${cell(t(1))} | ${cell(t(2))} | ${cell(t(5))} | ${cell(t(10))} |\n")
    }
    if (dupMlRows.exists(_._2.values.exists(_._1.isNaN)))
      sb.append("\nq_minhash_lsh rows marked — were cut at the probe deadline:\n" +
        "the Spark ML MinHashLSH estimator fit + approxSimilarityJoin costs\n" +
        "~200 s at 1× (vs seconds for the banded q_minhash_dedup production\n" +
        "twin on the identical corpus) and OOMed a 16 GB heap at 10× before\n" +
        "per-row checkpointing landed — the estimator materializes every\n" +
        "bucket-pair with both sparse vectors for its keyDistance UDF, which\n" +
        "is exactly the memory shape the banded join avoids. The measured 1×\n" +
        "point and the dedup twin's full ladder above carry the scale\n" +
        "conclusion; a later probe run fills the gaps from the checkpoint.\n")
    if (budgetRows.nonEmpty) {
      sb.append("\n## Budget-guard all-LSH branch ladder (r12)\n\n")
      sb.append("q_candidates_budget with pinned mod-8 blocks: at sf0.1 every\n")
      sb.append("block is ~625 docs ≫ the 40-pair budget cap, so 100% of the\n")
      sb.append("corpus takes pairsWithBudget's banded-LSH branch (the 100 TB\n")
      sb.append("operating point — at scale no block fits a quadratic budget;\n")
      sb.append("310 915 candidate rows at 1×, SCALE.md). Replicas are near-dups\n")
      sb.append("of their originals, so candidate OUTPUT grows ~quadratically in\n")
      sb.append("the dup factor by construction (the q_minhash_dedup ladder's\n")
      sb.append("semantics); the branch machinery — support-minhash signatures,\n")
      sb.append("16-band slicing, the id-only bucket join, the length/lang\n")
      sb.append("verify — must stay banded: spill/shuffle should track output\n")
      sb.append("volume, never blocksize². α(2×→10×) fits t ≈ c·fᵅ on the dup\n")
      sb.append("grid; compare it against the rows column's own growth before\n")
      sb.append("reading it as machinery cost.\n\n")
      sb.append("| query | f | s | out rows | spill MB | shuffle-write MB | GC s |\n")
      sb.append("|---|---|---|---|---|---|---|\n")
      budgetRows.foreach { case (label, t) =>
        dupHeavyFactors.foreach { f =>
          val (s, rows, m) = t(f)
          if (s.isNaN)
            sb.append(s"| $label | ${f}x | — | — | — | — | — |\n")
          else
            sb.append(f"| $label | ${f}x | $s%.2f | $rows | ${m.spillBytes / 1e6}%.0f " +
              f"| ${m.shuffleWriteBytes / 1e6}%.0f | ${m.gcMillis / 1e3}%.1f |\n")
        }
        val (t2, t10) = (t(2)._1, t(10)._1)
        if (!t2.isNaN && !t10.isNaN) {
          val alphaT = math.log(t10 / t2) / math.log(5.0)
          val (r2, r10) = (t(2)._2, t(10)._2)
          val alphaR = if (r2 > 0 && r10 > 0)
            f"${math.log(r10.toDouble / r2) / math.log(5.0)}%.2f" else "—"
          sb.append(f"\nα(2×→10×) time = $alphaT%.2f; output rows grow at α = $alphaR%s —\n")
          sb.append("time under the output exponent means the banded join is\n")
          sb.append("output-floored, not blocksize-quadratic.\n")
        }
      }
    }
    if (tailRows.nonEmpty) {
      sb.append("\n## Tail diagnosis: q_winnow / q_ngram_count / q_substring_spans presentation sorts\n\n")
      sb.append("`(full)` = the registry query; `(no-sort)` = the same plan minus the\n")
      sb.append("final presentation orderBy (oracle-determinism only, not part of the\n")
      sb.append("production operator). rows = output rows; spill/shuffle/GC from the\n")
      sb.append("best-of-3 rep.\n\n")
      sb.append("Disposition (r11, VERDICT r10 #8): the r10 q_ewma_array diagnostic\n")
      sb.append("variants are retired from this table — their (no-sort) rows were\n")
      sb.append("noise-shaped (a strict subset of the full plan measured 3× slower at\n")
      sb.append("100×, i.e. host contention), and the operator's production evidence\n")
      sb.append("is its events-ladder row (α 0.70) plus the oracle hash.\n\n")
      sb.append("| variant | f | s | out rows | spill MB | shuffle-write MB | GC s |\n")
      sb.append("|---|---|---|---|---|---|---|\n")
      tailRows.foreach { case (label, t) =>
        tailFactors.foreach { f =>
          val (s, rows, m) = t(f)
          if (s.isNaN)
            sb.append(s"| $label | ${f}x | — | — | — | — | — |\n")
          else
            sb.append(f"| $label | ${f}x | $s%.2f | $rows | ${m.spillBytes / 1e6}%.0f " +
              f"| ${m.shuffleWriteBytes / 1e6}%.0f | ${m.gcMillis / 1e3}%.1f |\n")
        }
      }
    }
    if (bpeRows.nonEmpty) {
      sb.append("\n## BPE trainer merge-count ladder (r11)\n\n")
      sb.append("Corpus replication leaves the vocab unchanged (r10 finding), so the\n")
      sb.append("trainer's stress axis is the MERGE COUNT, measured on the 1× sf0.1\n")
      sb.append("vocab. `learn` plans k nested literal replaces at iteration k —\n")
      sb.append("O(nMerges²) replace work; `learnScalable` re-roots the segmentation\n")
      sb.append("on a materialized generation every 8 merges — O(nMerges), one\n")
      sb.append("persisted generation at a time. Identical merges (BpeSpec fuzz +\n")
      sb.append("the q_bpe_learn_scalable sf0.01 hash gate). rows = merges learned\n")
      sb.append("(the vocab can run out of pairs before the target).\n\n")
      sb.append("| trainer | 32 merges | 128 merges | 512 merges |\n")
      sb.append("|---|---|---|---|\n")
      bpeRows.foreach { case (label, t) =>
        def cell(m: Int) = {
          val (s, rows, _) = t(m)
          if (s.isNaN) "—" else f"$s%.1f s ($rows)"
        }
        sb.append(s"| $label | ${cell(32)} | ${cell(128)} | ${cell(512)} |\n")
      }
    }
    if (mmRows.nonEmpty) {
      sb.append("\n## Multimodal codec ladder (r8): baseline-JPEG decode throughput\n\n")
      sb.append("Pre-generated 256×256 grayscale baseline JPEGs (AC-rich blocks,\n")
      sb.append("every 4th image with restart markers), 200 per factor unit;\n")
      sb.append("payload generation is UNTIMED. The timed pass reads parquet and\n")
      sb.append("full-decodes every image (marker walk → canonical Huffman →\n")
      sb.append("dequant → IDCT → clamp) inside mapPartitions, then aggregates\n")
      sb.append("pixel stats — the corpus-wide image feature-extract shape.\n\n")
      sb.append("| probe | 1× s | 10× s | 50× s | 100× s | α(10×→100×) |\n")
      sb.append("|---|---|---|---|---|---|\n")
      mmRows.foreach { case (q, t) =>
        sb.append(s"| $q | ${fmt(t(1))} | ${fmt(t(10))} | ${fmt(t(50))} | ${fmt(t(100))} | ${alphaOf(t)} |\n")
      }
      mmBytes.filter(b => b._1 > 0 && !mmRows.head._2(100).isNaN).foreach { case (decoded, compressed) =>
        val t100 = mmRows.head._2(100)
        sb.append(f"\nAt 100× (${decoded / 1e6}%.0f MB decoded gray pixels from " +
          f"${compressed / 1e6}%.0f MB entropy-coded payload in $t100%.2f s at\n" +
          f"local[32]): ${decoded / 1e6 / t100 / 32}%.2f decoded MB/s/core " +
          f"(${compressed / 1e6 / t100 / 32}%.2f compressed MB/s/core).\n" +
          "Capacity math for a 100 TB image corpus reads straight off these\n" +
          "per-core figures times the cluster's core count — decode carries\n" +
          "no shuffle, so it scales with cores, not with any exchange.\n")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outMd), sb.toString)
    println(s"wrote $outMd")
    spark.stop()
  }
}

/** Immutable snapshot of the per-run task-metric sums. */
final case class ProbeMetrics(spillBytes: Long, shuffleWriteBytes: Long,
                              gcMillis: Long)

/** Sums task metrics between reset() calls — the probe runs queries serially
  * on one SparkContext, so a single global accumulator is race-free. */
final class ProbeMetricsListener extends org.apache.spark.scheduler.SparkListener {
  private val spill = new java.util.concurrent.atomic.AtomicLong
  private val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
  private val gc = new java.util.concurrent.atomic.AtomicLong
  override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      gc.addAndGet(m.jvmGCTime)
    }
  }
  def reset(): Unit = { spill.set(0); shuffleWrite.set(0); gc.set(0) }
  def snapshot(): ProbeMetrics =
    ProbeMetrics(spill.get, shuffleWrite.get, gc.get)
}
