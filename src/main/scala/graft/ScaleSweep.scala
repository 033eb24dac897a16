package graft

import org.apache.spark.sql.functions._

import graft.engine.Catalog

/** 10×/1× scaling sweep (dev harness, like [[StressBench]]): materialize a
  * referentially-consistent 10× replica of the testdata tables on disk, run
  * the heavy conformance queries at BOTH scales through the exact
  * `SparkEntry.queries` entry points, and print the wall-time ratio table.
  *
  * The pass bar is near-linear scaling: ratio ≈ 10 (≤ ~12 allowing fixed
  * overheads to amortize oddly at toy scale); a super-linear outlier names
  * the next plan audit. Sub-linear ratios are expected for queries dominated
  * by fixed costs (codegen, microbatch commits) at 1×.
  *
  * Memory: run ≥100× sweeps with `SPARK_DRIVER_MEM=24g` (build.sbt's -Xmx
  * hook) — the single local JVM holds the session-scoped pipeline caches
  * AND the dimension broadcasts at replica scale; the 8g default OOMs on
  * broadcast build ("Not enough memory to build and broadcast").
  *
  * Replication: 10 copies with every KEY-domain column offset by k·10⁹ per
  * clone k — orderkey offsets match between orders and lineitem, custkey
  * between customer and orders, etc., so join cardinalities scale exactly
  * 10× while tiny dims (nation, region) stay shared, like 10 TPC-H databases
  * unioned. Events get 10× the users at the same per-user history depth;
  * documents get 10× docs, so every near-dup family and LSH bucket grows
  * 10× — exactly the load the skew caps exist for.
  */
object ScaleSweep {

  private val Off = 1000000000L

  /** Key-domain columns to offset per clone (referential integrity: the
    * same domain gets the same offset everywhere it appears). */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** The 10× sweep set: every query above ~1 s in the round-4 bench plus
    * one representative per heavy family. Streaming rows ARE swept (the
    * source handles both the single-file testdata layout and the replica's
    * parquet directories — Streams.tableStream): micro-batch rows scale on
    * state-store size + per-batch planning, not shuffle width, so their
    * ratios read differently — see the state-size note in the sweep
    * artifact / STATUS. */
  private val sweep: Seq[String] = Seq(
    // ann_bruteforce_topk is NOT swept (round 13): it is the dense
    // exactness baseline whose WORK is |Q|·|V| — with the probe set
    // scaling alongside the corpus, factor 10 is 100× the pair scorings
    // BY CONSTRUCTION, the same attribution that excludes
    // retrieval_maxsim_topk / retrieval_hybrid_batch / dedup_semantic.
    // It rode the sweep through r12 only because its wall ratio
    // incidentally landed under the threshold (×9.26); measured for the
    // record in r13: med ratio 22.1 at factor 10 (0.19 → 4.31 s) —
    // sub-linear in WORK (×100), super-linear in data, exactly the
    // excluded class. Its scale path (ann_ivf_* serves) stays swept.
    // The in-session counterparts (ann_ivf_kmeans, ann_ivf_pq_topk) ride
    // the sweep too (round 14): the scale-level serve-amortization pin
    // compares each persisted serve against its in-session path, and two
    // of its three pairs were dead letters without them (the r13 advice —
    // tNmap.get(ins) was always None, so only the maxsim pair pinned).
    "ann_ivf_kmeans", "ann_ivf_kmeans_persisted", "ann_ivf_persisted",
    "ann_pq_codes", "ann_ivf_pq_topk", "ann_ivf_pq_persisted",
    "ann_ivf_pq_append", "ann_ivf_pq_delete",
    // full_probe scores |Q|·|V| candidates by construction (every cell
    // admitted) — swept at 10× like the bruteforce exactness baseline,
    // excluded at 100× for the same |Q|-scales-with-corpus reason.
    "ann_ivf_pq_full_probe",
    "ann_ivf_pq_compacted", "sample_cluster_quota",
    "anomaly_rolling_z", "anomaly_rolling_z_bucketed",
    "basket_part_pairs",
    "bpe_pair_counts", "bpe_train_merges", "bpe_tokenize_corpus",
    "corpus_refinery",
    "dedup_clusters", "dedup_containment", "dedup_incremental",
    // retrieval_hybrid_batch is NOT swept: like dedup_ngram_jaccard_exact
    // it is an exactness baseline whose WORK is |P|·|V| — quadratic under
    // replication by construction (measured once: med 56.8× at factor 10
    // for 100× the pair scorings — sub-linear in work, super-linear in
    // data). Its scale path swaps in the IVF serve + an impact-ordered
    // index (see the row's comment); the fusion stage itself is
    // rank-lists-in/rank-lists-out and scales with |P|·k.
    // dedup_semantic is NOT swept — like dedup_ngram_jaccard_exact and
    // retrieval_hybrid_batch it is quadratic under replication BY
    // CONSTRUCTION: the session model's K is fixed, so 10× replication
    // grows every cell 10× (pairs ×100) and clones form cosine-1.0
    // cliques. Measured once for transparency: med 0.32 s → 15.08 s at
    // factor 10 (×47.7 wall for ×100 pair scorings — sub-linear in WORK).
    // The scale path is the row's own: K grows with the corpus to hold
    // cells at constant size.
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_spans", "drift_tvd_bins", "er_jaro_winkler",
    "er_resolve_entities", "export_training_shards",
    "feature_quantile_bin", "feature_robust_scale",
    "funnel_conversion", "funnel_conversion_bucketed",
    "funnel_strict_window",
    "graph_bfs_distance",
    "graph_kcore",
    // Σ deg² wedge budget, same attribution as graph_triangles: near-dup
    // family degrees grow with clone replication, so 10×-only.
    "graph_common_neighbors",
    "graph_label_propagation", "graph_weighted_distance",
    "graph_pagerank", "graph_triangles", "pack_sequences",
    // Promoted IVF-PQ serve: |Q| scales with the corpus (every 100th id
    // probes), so 10×-only like the other ann_* serve shapes.
    "ann_ivf_pq_promoted",
    // Two brute-force passes (|Q|·|V| each) — swept at 10× with the same
    // work-scales-with-output attribution as ann_bruteforce_topk.
    "embed_matryoshka_topk",
    // retrieval_maxsim_topk is NOT swept (the hybrid_batch class): both
    // the probe-token set AND the per-(query token, doc) max-group
    // cardinality scale with the corpus, so factor 10 is 100× the work
    // AND 100× the aggregation state by construction — measured once for
    // transparency (1× 1.4 s; the factor-10 point aborted past 16 min,
    // dominated by the ~100M-group partial max). Its scale path EXISTS as
    // of round 11 and IS swept below: retrieval_maxsim_ivf probes a
    // token-level IVF per query token and runs the identical MAX/fold on
    // bounded candidates only (stage-2 state = |q_tokens|·MsT per query,
    // corpus-independent). Like every ann_* serve it stays 10×-only —
    // the probe set (every 250th doc) itself scales with the corpus.
    // The IVF MaxSim serves pin their probe set to BASE doc ids (see
    // queryTokens's scaladoc): the sweep measures a FIXED query workload
    // against a growing corpus — work linear in corpus tokens (stage-1
    // candidate share; stage-2 is |q_tok|·T-bounded), so they also ride
    // the ≥100× linear set. The first, unpinned measurement is kept for
    // the record: |Q|×10 · cells×10 read 4.25 s → 138 s (×32 wall for
    // ×100 pairs — sub-linear in WORK, super-linear in data), exactly the
    // embarrassingly-parallel workload axis the pin removes.
    "retrieval_maxsim_ivf", "retrieval_maxsim_ivf_persisted",
    // The doc_id-bucketed forward serve (round 14): same fixed query
    // workload, stage-2 scan partition-pruned to candidate buckets —
    // linear like its cells-as-forward sibling, pinned by the same
    // serve-amortization pair at every factor.
    "retrieval_maxsim_ivf_fwd",
    // Impact-ordered BM25 serve: 3 bucket-pruned posting prefixes + a
    // bounded candidate rescore — linear work, constant output (also in
    // the ≥100× linear set below). The all-index hybrid (single probe,
    // two ≤50-row rank lists) is likewise linear.
    "text_bm25_impact_topk", "retrieval_hybrid_served",
    "text_bm25_impact_append", "text_bm25_impact_compacted",
    "text_bm25_impact_multiseg", "text_bm25_impact_multiseg_compacted",
    // Round-13 lifecycle + fixture rows: tombstone-filtered serves are the
    // plain serves plus one anti-join (linear); the bigvocab rows run the
    // identical serve shapes over the salted corpus (vocabulary capped at
    // 31·257 regardless of factor, so only the token stream scales).
    "text_bm25_impact_delete", "text_bm25_impact_delete_compacted",
    "text_bm25_bigvocab_topk", "retrieval_maxsim_ivf_bigvocab",
    "retrieval_maxsim_ivf_append", "retrieval_maxsim_ivf_delete",
    "retrieval_maxsim_ivf_lifecycle_compacted",
    // Round-15 bucketed-forward lifecycle serves: identical stage-1 shapes,
    // stage-2 DPP-pruned per forward segment — linear like their
    // union-forward siblings, which they must not exceed (serve pin below).
    "retrieval_maxsim_ivf_append_fwd", "retrieval_maxsim_ivf_delete_fwd",
    "retrieval_maxsim_ivf_lifecycle_compacted_fwd",
    "mv_affected_group_refresh", "retrieval_rrf_fusion",
    "profile_columns",
    "rfm_segmentation", "s12_snapshot_diff", "sample_bottomk",
    "sample_temperature", "scd2_user_state", "select_dsir_importance",
    "text_decontaminate_surgical",
    "sessionize_events", "stats_percentiles_distributed",
    "text_collocations_pmi", "text_tfidf_topk", "train_preference_pairs",
    "train_skipgram_pairs", "sample_priority_weighted", "select_pareto_front",
    "stream_ann_serve", "stream_mv_refresh", "stream_mv_refresh_partitioned",
    "stream_stream_join", "stream_dedup_events",
    "stream_incremental_dedup_sink",
    "sql_lateral_topk", "sql_variant_extract",
    "stats_percentiles_grouped", "text_bm25_topk", "text_inverted_index",
    "tpch_q1_pricing_summary", "tpch_q5_local_supplier",
    "tpch_q9_profit_proxy", "tpch_q18_large_orders",
    "tpch_q18_bucketed", "tpch_q21_waiting_supplier",
    "tpch_q21_bucketed", "ts_ewma_current", "ts_interpolate_linear",
    "w2_running_sum")

  /** The ≥100× sweep set: only queries whose WORK and OUTPUT scale
    * linearly in the inputs. Clone replication makes every pair relation
    * quadratic in family size (a semantic fact, measured at 10×) and
    * multiplies the ANN probe set with the corpus (|Q|·|V| work) — those
    * shapes measure output blow-up, not plan scaling, so they are
    * excluded here and their boundedness is pinned by the capped
    * StressBench runs instead. */
  private val sweepLinear: Seq[String] = Seq(
    "ann_pq_codes", "anomaly_rolling_z", "anomaly_rolling_z_bucketed",
    "basket_part_pairs",
    "bpe_pair_counts", "bpe_train_merges", "bpe_tokenize_corpus",
    "dedup_content_hash",
    "dedup_exact", "drift_tvd_bins", "embed_l2_normalize",
    "events_user_features",
    "events_user_features_bucketed",
    "feature_quantile_bin", "feature_robust_scale",
    "funnel_conversion", "funnel_conversion_bucketed",
    "funnel_strict_window",
    "islands_error_streaks",
    // MV refresh / snapshot diff / RRF: delta-bounded probes, one
    // full-outer key join, and fixed-size top-k lists respectively — all
    // linear work with linear (or constant) output under replication.
    "mv_affected_group_refresh", "retrieval_rrf_fusion", "s12_snapshot_diff",
    "pack_sequences", "profile_columns", "rfm_segmentation", "sample_bottomk",
    "sample_cluster_quota", "sample_temperature", "select_dsir_importance",
    "text_decontaminate_surgical",
    "scd2_user_state", "sessionize_events", "sql_lateral_topk",
    "sql_variant_extract", "stats_percentiles_distributed",
    // Micro-batch rows with linear work: state is watermark-bounded (join
    // buffers / dedup keys expire), so 100x grows data volume, not
    // retained state. The incremental-dedup sink stays 10x-only — its
    // within-batch pair mining is quadratic in clone families.
    "stream_stream_join", "stream_dedup_events", "stream_mv_refresh",
    "stream_mv_refresh_partitioned",
    "stats_percentiles_grouped", "text_bm25_topk", "text_bm25_impact_topk",
    "text_bm25_impact_append", "text_bm25_impact_compacted",
    "text_bm25_impact_multiseg", "text_bm25_impact_multiseg_compacted",
    // Round-13 rows with linear work AND fixed query workloads (the maxsim
    // serves pin probes to base ids; the bm25 terms are fixed) — the
    // ann_ivf_pq_delete row stays 10×-only like every other ann_* serve
    // (its probe set scales with the corpus).
    "text_bm25_impact_delete", "text_bm25_impact_delete_compacted",
    "text_bm25_bigvocab_topk", "retrieval_maxsim_ivf_bigvocab",
    "retrieval_maxsim_ivf_append", "retrieval_maxsim_ivf_delete",
    "retrieval_maxsim_ivf_lifecycle_compacted",
    "retrieval_maxsim_ivf_append_fwd", "retrieval_maxsim_ivf_delete_fwd",
    "retrieval_maxsim_ivf_lifecycle_compacted_fwd",
    "retrieval_hybrid_served",
    "retrieval_maxsim_ivf", "retrieval_maxsim_ivf_persisted",
    "retrieval_maxsim_ivf_fwd",
    "text_collocations_pmi", "text_inverted_index", "text_tfidf_topk",
    "text_quality", "text_token_count", "train_preference_pairs",
    // Skip-gram pairs: array-local window transforms, linear in tokens;
    // priority sample: TakeOrdered top-(k+1), constant output; Pareto
    // front: one group + one window over the bounded distinct-ratio table.
    "train_skipgram_pairs", "sample_priority_weighted", "select_pareto_front",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority", "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue", "tpch_q9_profit_proxy",
    "tpch_q18_large_orders", "tpch_q18_bucketed",
    "tpch_q21_waiting_supplier", "tpch_q21_bucketed",
    "ts_ewma_current", "ts_interpolate_linear",
    "ts_ohlc_hourly", "w2_running_sum", "w5_trailing_hour_range")

  /** Pipelines whose WORK scales linearly — safe to time at any factor.
    * The LSH pair/component builds are excluded past 10× for the same
    * quadratic-output reason as the pair-mining queries. */
  private val linearPipelines = Set(
    "bucketed_orderkey_layout", "custkey_layout", "userkey_layout",
    "zorder_layout", "xml_export", "minhash_dedup_index",
    "lloyd_kmeans", "kmeans_ivf_index", "pq_codebooks", "ivf_pq_index",
    "pq_resid_codebooks", "ivf_pq_delta", "ivf_pq_compact",
    // ivf_pq_promoted is 10×-only like the LSH builds, but for COST not
    // shape: the build is linear (n·k·m-row broadcast joins, measured
    // ratio 7.34 at 10×) yet carries a 128× constant vs the cost-floor
    // build (k 8→256, m 4→16), so the 100× point is ~50 min of wall for a
    // slope the 10× point already pins.
    "bpe_model", "cents_ranks", "cents_ranks_grouped",
    // Vocabulary-bounded Lloyd (maxsim), its cluster-partitioned cell
    // write, and one posting-table pass with a per-term rank window
    // (bm25) — all linear in corpus tokens.
    "maxsim_token_ivf", "maxsim_ivf_index", "maxsim_forward",
    "bm25_impact_index",
    "bm25_impact_delta", "bm25_impact_compact",
    "bm25_impact_segments", "bm25_multiseg_compact",
    // Round-13 lifecycle/fixture builds: tombstone writes are O(|deletes|),
    // delta/compaction cells and the bigvocab indexes are one linear pass
    // each (same shapes as their base builds).
    "maxsim_token_ivf_big", "maxsim_ivf_index_big",
    "maxsim_ivf_delta", "maxsim_ivf_tombstones",
    "maxsim_ivf_compact", "bm25_tombstones", "bm25_tombstone_compact",
    "bm25_bigvocab_index", "ivf_pq_tombstones",
    // Round-15 forward segments: one linear pass each over cells (base,
    // delta) or over the forward components themselves (compact merge).
    "maxsim_forward_big", "maxsim_forward_delta", "maxsim_forward_compact")

  /** Post-execution metrics of the first file scan whose location matches
    * `tag` — delegates to [[graft.engine.ScanMetrics.forPath]] (the shared
    * executed-metrics helper the plan pins use too). */
  private def fwdScanMetrics(df: org.apache.spark.sql.DataFrame, tag: String)
      : Option[(Long, Long, Long, Long)] =
    graft.engine.ScanMetrics.forPath(df, tag)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    require(factor >= 2 && factor.toLong * Off <= Long.MaxValue / 4)
    val spark = graft.engine.GraftSession.local("graft-scale-sweep")
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_REPLICA_DIR reuses a replica built by a previous sweep at
    // the SAME (sfDir, factor) — the replication is deterministic, so the
    // bytes are identical and the (expensive) rebuild can be skipped.
    val dst = sys.env.getOrElse("SPARK_GRAFT_REPLICA_DIR", {
      // Deliberately NOT TempDirs.create (delete-at-exit): the replica is
      // the one session artifact MEANT to outlive the JVM — a later sweep
      // at the same (sfDir, factor) reuses it via SPARK_GRAFT_REPLICA_DIR
      // to skip the expensive rebuild. The caller owns its lifetime.
      val d = java.nio.file.Files.createTempDirectory(s"graft_${factor}x").toString
      Catalog.tableNames.foreach { t =>
        // Raw read (no ts normalization) so the replica round-trips bytes;
        // events.ts arrives as plain INT64 nanos either way and
        // Catalog.normalizeEventTs handles both layouts on load.
        val src = spark.read.parquet(Catalog.path(sfDir, t))
        val out = keyCols.get(t) match {
          case None => src
          case Some(keys) =>
            // One plan branch for any factor: cross the replica index in and
            // offset every key domain by k·Off.
            val crossed = src.crossJoin(
              spark.range(factor).withColumnRenamed("id", "_k"))
            keys.foldLeft(crossed)((d, c) =>
              d.withColumn(c, col(c) + col("_k") * lit(Off))).drop("_k")
        }
        out.write.mode("overwrite").parquet(Catalog.path(d, t))
      }
      d
    })
    println(s"[sweep] ${factor}x replica at $dst")

    // Pair-mining and |Q|-scaling shapes are only meaningful at 10× (their
    // OUTPUT is quadratic under replication); past that, sweep the
    // linear-work subset. Dev aid (mirrors Bench): SPARK_GRAFT_ONLY=<regex>
    // sweeps a subset; pipelines still front the run.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    // .distinct: a name listed twice (the r13 ann_ivf_pq_delete slip) would
    // run twice per scale, emit a duplicate JSON key, and pair the first
    // entry's ratio with the warm second run's timing.
    val names = (if (factor <= 10) sweep else sweepLinear).distinct
      .filter(n => only.forall(_.findFirstIn(n).isDefined))

    def runAll(dir: String): Seq[(String, Double)] = {
      val pipelines =
        SparkEntry.pipelines
          .filter { case (name, _) => factor <= 10 || linearPipelines(name) }
          // Dev subsets (SPARK_GRAFT_ONLY) filter pipelines by the same
          // regex, so a single-family iteration builds only that family's
          // indexes; the driver leaves ONLY unset and builds everything.
          .filter { case (name, _) =>
            only.forall(_.findFirstIn(name).isDefined) }
          .map { case (name, build) =>
            println(s"[sweep] running pipeline:$name @ $dir")
            val t0 = System.nanoTime()
            build(spark, dir)
            s"pipeline:$name" -> (System.nanoTime() - t0) / 1e9
          }
      val queries = names.map { name =>
        println(s"[sweep] running $name @ $dir")
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        name -> (System.nanoTime() - t0) / 1e9
      }
      // kc AXIS for the token-IVF serve (round 12, §9's sizing claim):
      // clone replication grows the token STREAM 10x but not the
      // vocabulary — and THIS corpus's vocabulary is only 31 distinct
      // words, so the axis saturates fast: kc = 16 ≈ |vocab|/2 is the real
      // "scaled" point (measured FASTER than kc = 8 — more cells do cut
      // the probed candidate share), while kc = 32 ≥ |vocab| is the
      // degenerate endpoint (≈1 word per cell; candidate share cannot
      // shrink further because every doc contains nearly every word, and
      // the serve measures slower). All three are measured so the artifact
      // carries the saturation curve; quality on the kc knob rides the 1x
      // bench maxsim_sweep (overlap vs exact truth).
      val kcRows =
        if (!names.contains("retrieval_maxsim_ivf")) Seq.empty
        else (if (factor <= 10) Seq(8, 16, 32) else Seq(8, 16))
          // kc rows are measurement hooks, not SparkEntry rows — they ride
          // the same dev-subset regex by their own emitted names.
          .filter(kc => only.forall(
            _.findFirstIn(s"maxsim_serve_kc$kc").isDefined))
          .map { kc =>
          // kc = 32 ≥ |vocab| stays 10x-only: one word per cell means a
          // probed cell is a FULL word posting list (~1.3M occurrences per
          // word at 100x) — the exact-baseline workload by construction,
          // the same attribution that keeps retrieval_maxsim_topk
          // un-swept. The saturation datum is pinned at 10x.
          println(s"[sweep] running maxsim_serve_kc$kc @ $dir")
          // Train untimed, time SERVE ONLY (round-13 split, matching the
          // bench's maxsim_sweep): the kc rows carry the candidate-share
          // cost curve, and training cost growing with kc was polluting it.
          val q = graft.queries.SimilarityQ.maxsimQuantizerAtKc(spark, dir, kc)
          val t0 = System.nanoTime()
          graft.queries.SimilarityQ.maxsimServeQuantized(spark, dir, q).count()
          s"maxsim_serve_kc$kc" -> (System.nanoTime() - t0) / 1e9
        }
      // BIGVOCAB kc axis at scale (round 13): the same serve-only kc rows
      // on the ~7.5k-word fixture, where the axis is off-saturation — the
      // §9 sizing claim (kc ∝ |vocab| holds candidate share constant)
      // measured against a replicated corpus, not just at 1×.
      val bigKcRows =
        if (!names.contains("retrieval_maxsim_ivf_bigvocab")) Seq.empty
        else Seq(8, 32, 128)
          .filter(kc => only.forall(
            _.findFirstIn(s"maxsim_serve_bigkc$kc").isDefined))
          .map { kc =>
            println(s"[sweep] running maxsim_serve_bigkc$kc @ $dir")
            val q = graft.queries.SimilarityQ
              .maxsimQuantizerAtKc(spark, dir, kc, big = true)
            val t0 = System.nanoTime()
            graft.queries.SimilarityQ
              .maxsimServeQuantized(spark, dir, q, big = true).count()
            s"maxsim_serve_bigkc$kc" -> (System.nanoTime() - t0) / 1e9
          }
      // FORWARD-BUCKET sensitivity axis (round 15, §9's sizing rule made
      // data): the bucketed-forward serve at two moduli. Serve cost should
      // be INSENSITIVE to the count (the candidate fetch reads ≤ |candidate
      // docs| directories either way) while the PRUNED FRACTION moves —
      // both are printed, the scan metrics carrying the pruning evidence
      // (numFiles/filesSize post-DPP vs staticFilesNum/staticFilesSize).
      // Layout build is untimed (the kc-axis split discipline); 10×-only
      // like every serve axis. Cache-less layouts: a per-knob forward must
      // not evict the session's shared pipeline caches.
      val fwdBucketRows =
        if (factor > 10 || !names.contains("retrieval_maxsim_ivf_fwd"))
          Seq.empty
        else Seq(32, 128)
          .filter(b => only.forall(
            _.findFirstIn(s"maxsim_fwd_b$b").isDefined))
          .map { b =>
            println(s"[sweep] running maxsim_fwd_b$b @ $dir")
            val layout = graft.queries.SimilarityQ
              .maxsimFwdLayoutAtBuckets(spark, dir, b)
            val t0 = System.nanoTime()
            val df = graft.queries.SimilarityQ
              .maxsimFwdServeAtBuckets(spark, dir, layout, b)
            // collect, not count: count() spawns a NEW QueryExecution, so
            // df's own plan (whose scan metrics we read below) never runs.
            df.collect()
            val t = (System.nanoTime() - t0) / 1e9
            fwdScanMetrics(df, "graft_msfwd_b").foreach {
              // staticFilesSize exists only when a live dynamic filter
              // executed; ssz < 0 means NO DPP reached this scan — say so
              // instead of printing sz/1 as a garbage percentage.
              case (nf, snf, sz, ssz) if ssz > 0 => println(
                f"[sweep] maxsim_fwd_b$b forward scan: files $nf/$snf " +
                  f"bytes $sz/$ssz (read ${100.0 * sz / ssz}%.1f%% post-DPP)")
              case (nf, _, sz, _) => println(
                s"[sweep] maxsim_fwd_b$b forward scan: files $nf bytes $sz " +
                  "— NO DPP on forward scan (static metrics absent)")
            }
            s"maxsim_fwd_b$b" -> t
          }
      pipelines ++ queries ++ kcRows ++ bigKcRows ++ fwdBucketRows
    }

    // 1× first, then the replica — the SessionCache dir-eviction swaps the
    // shared pipelines over automatically.
    val t1 = runAll(sfDir)
    val tN = runAll(dst).toMap
    println(f"[sweep] ${"name"}%-34s ${"1x"}%8s ${s"${factor}x"}%8s ${"ratio"}%7s")
    val ratios = t1.map { case (name, a) =>
      val b = tN(name)
      val r = b / a
      val flag = if (r > 1.2 * factor) "  <-- flagged, re-measuring" else ""
      println(f"[sweep] $name%-34s $a%8.2f $b%8.2f $r%7.2f$flag")
      name -> r
    }
    // MEDIANS MODE for flagged rows: a single-shot timing that trips the
    // super-linear threshold is re-run medians-of-3 at BOTH scales before
    // the verdict — round 6's q18_bucketed 18.9 s was a one-shot transient
    // that cost a manual solo re-measure to clear. All 1× re-measures run
    // before all N× so the SessionCache dir swap happens twice, not per
    // query; the median discards the rep that carries any lazy rebuild.
    val flaggedNames = ratios.filter(_._2 > 1.2 * factor).map(_._1)
      // Pipelines are single-shot builds; kc-axis rows are measurement
      // hooks outside SparkEntry.queries — neither re-measures via median3.
      .filterNot(n => n.startsWith("pipeline:") ||
        !SparkEntry.queries.contains(n))
    // A flagged query that fails intermittently must NOT abort the sweep
    // after both scale runs already completed — fall back to the
    // single-shot ratio (None) and log the failure instead.
    def median3(dir: String, name: String): Option[Double] =
      try {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        Some(ts(1))
      } catch {
        case e: Exception =>
          println(s"[sweep] median3 FAILED for $name in $dir: ${e.getMessage}" +
            " -- keeping single-shot ratio")
          None
      }
    val med1 = flaggedNames.map(n => n -> median3(sfDir, n)).toMap
    val medN = flaggedNames.map(n => n -> median3(dst, n)).toMap
    val remeasured = flaggedNames.flatMap { n =>
      (med1(n), medN(n)) match {
        case (Some(a), Some(b)) =>
          val r = b / a
          println(f"[sweep] remeasured $n%-30s med1=$a%.2f medN=$b%.2f ratio=$r%.2f")
          Some(n -> r)
        case _ => None
      }
    }.toMap
    // Final verdict: single-shot ratio for unflagged rows, median ratio for
    // flagged ones (pipeline rows keep their single-shot number — they are
    // once-per-session builds by design and medians would triple them).
    val finalRatios = ratios.map { case (n, r) =>
      n -> remeasured.getOrElse(n, r) }
    val supersFinal = finalRatios.filter(_._2 > 1.2 * factor).map(_._1)
    supersFinal.foreach(n =>
      println(f"[sweep] SUPER-LINEAR (survives medians): $n ${finalRatios.toMap.apply(n)}%.2f"))
    val worst = finalRatios.maxBy(_._2)
    println(f"[sweep] worst ratio: ${worst._1} ${worst._2}%.2f")
    // SERVE-AMORTIZATION PIN AT SCALE (round 13): the bench's serve_pin
    // channel (persisted index serve ≤ 1.25× the in-session path it
    // amortizes) only covered the 1× box — round 12's persisted-MaxSim
    // serve inverted at 100× (×105, 1.6× in-session: stage 2 re-exploded
    // the text instead of forward-reading the index) and nothing fired.
    // The pin now rides the sweep at the REPLICA scale, where an index
    // matters most.
    val tNmap = tN
    val pinPairs =
      Seq(("retrieval_maxsim_ivf_persisted", "retrieval_maxsim_ivf"),
          ("retrieval_maxsim_ivf_fwd", "retrieval_maxsim_ivf"),
          ("retrieval_maxsim_ivf_append_fwd", "retrieval_maxsim_ivf_append"),
          ("retrieval_maxsim_ivf_delete_fwd", "retrieval_maxsim_ivf_delete"),
          ("retrieval_maxsim_ivf_lifecycle_compacted_fwd",
            "retrieval_maxsim_ivf_lifecycle_compacted"),
          ("ann_ivf_kmeans_persisted", "ann_ivf_kmeans"),
          ("ann_ivf_pq_persisted", "ann_ivf_pq_topk"))
    def pinOf(per: String, ins: String,
              m: Map[String, Double]): Option[String] =
      (m.get(per), m.get(ins)) match {
        // Same margin + absolute-gap guard as the bench pin (a pair
        // absent from this sweep's row set simply doesn't pin).
        case (Some(p), Some(i)) if p > i * 1.25 && p - i > 0.3 =>
          Some(f"serve_pin@${factor}x: $per $p%.2fs > 1.25x $ins $i%.2fs")
        case _ => None
      }
    // MEDIANS MODE for fired pins (round 14): the pin compared SINGLE-SHOT
    // N× timings, so one interference transient on one row faked a
    // violation (measured: persisted 54.0 s in the full sweep, 13.7 s
    // medians minutes later, pin clean) — the exact failure mode the
    // super-linear channel's median re-measure already guards. Re-measure
    // BOTH rows of every fired pair at N× and re-evaluate before the
    // verdict; a pin that survives medians is a real layout regression.
    // Verdicts are tracked PER PAIR (round 15): only provisionally-fired
    // pairs are re-evaluated with medians — a re-measured (lower) median
    // for a row SHARED with a non-fired pair must not newly fire that
    // other pair against a possibly-inflated single-shot on its
    // unmeasured side; non-fired pairs keep their single-shot verdicts.
    val firedPairs = pinPairs.filter { case (per, ins) =>
      pinOf(per, ins, tNmap).isDefined }
    val pinMeds: Map[String, Double] =
      firedPairs.flatMap { case (per, ins) => Seq(per, ins) }.distinct
        .flatMap { n =>
          val m = median3(dst, n)
          m.foreach(v => println(
            f"[sweep] pin re-measure $n%-34s single=${tNmap(n)}%.2f medN=$v%.2f"))
          m.map(n -> _)
        }.toMap
    val servePinViolations: Seq[String] = firedPairs.flatMap {
      case (per, ins) =>
        val verdict = pinOf(per, ins, tNmap ++ pinMeds)
        if (verdict.isEmpty) println(
          s"[sweep] pin transient (cleared by medians): " +
            pinOf(per, ins, tNmap).get)
        verdict
    }
    servePinViolations.foreach(v => println(s"[sweep] VIOLATION $v"))
    // Driver-visible artifact (SPARK_GRAFT_SWEEP_OUT=<file>): per-query
    // 1×/N× seconds + ratio and the super-linear verdict, so the scale gate
    // is machine-checkable instead of living in STATUS prose.
    sys.env.get("SPARK_GRAFT_SWEEP_OUT").foreach { out =>
      def r3(v: Double) = math.round(v * 1000.0) / 1000.0
      val rows = t1.map { case (name, a) =>
        s""""$name":{"t1":${r3(a)},"tN":${r3(tN(name))},"ratio":${r3(tN(name) / a)}}"""
      }.mkString(",")
      val remeas = flaggedNames.filter(remeasured.contains).map { n =>
        s""""$n":{"t1_med":${r3(med1(n).get)},"tN_med":${r3(medN(n).get)},"ratio":${r3(remeasured(n))}}"""
      }.mkString("{", ",", "}")
      val supers = supersFinal.map(n => s""""$n"""").mkString("[", ",", "]")
      val pins = servePinViolations.map(v => s""""$v"""").mkString("[", ",", "]")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        s"""{"factor":$factor,"sf":"$sfDir","super_linear_threshold":${r3(1.2 * factor)},"super_linear":$supers,"serve_pin_violations":$pins,"remeasured":$remeas,"worst":{"name":"${worst._1}","ratio":${r3(worst._2)}},"results":{$rows}}""")
      println(s"[sweep] wrote $out")
    }
    spark.stop()
  }
}
