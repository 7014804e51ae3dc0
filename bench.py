"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop sink (full computation, no driver collect
bottleneck, no disk write skew). Every query gets one untimed warm-up
execution first: the timed number is steady-state throughput (plan codegen
compiled, JIT warm, parquet footers cached) — the figure that scales to a
long-running cluster, not the one-off JVM warm-up cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES: tuple[str, ...] = (
    # flagship: full reference ETL chain (clean→parse→normalize→features)
    "secevents_etl",
    # security-event surface
    "sessionize_sessions",
    "sessionize_bucketed",
    "user_daily_avg",
    "keep_last_dedup",
    "time_since_last_error",
    "props_k_stats",
    # relational suite
    "pricing_summary",
    "top_revenue_orders",
    "regional_revenue",
    "top_orders_per_customer",
    # temporal joins
    "asof_click_before_purchase",
    "click_purchase_bursts",
    # text / dedup / similarity extensions
    "doc_quality_scores",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "knn_cosine",
    "cosine_dup_pairs",  # LSH-blocked scale form (the only registered one)
    "knn_cosine_lsh",
    "knn_cosine_ivf",
    "corpus_curation",
    # temporal/network + corpus-scoring additions
    "events_ip_lpm",
    "events_ip6_lpm",
    "events_time_bucket_rollup",
    "doc_winnow_pairs",
    "doc_lm_scores",
    # round-5 additions: exact prefix-filter join, SQ8 ANN, hybrid
    # retrieval, drift gate, heavy-hitters sketch
    "doc_jaccard_prefix_pairs",
    "knn_cosine_sq8",
    "doc_hybrid_search",
    "events_value_drift",
    "events_heavy_hitters",
    "events_hourly_resampled",
    # round-6 additions: cross-corpus dedup, bucketed LOCF, checksums,
    # GK-quantile self-check, compressed persisted index (search timed;
    # index build happens once at plan-build, outside the timed region)
    "doc_cross_corpus_dups",
    "events_ffill_bucketed",
    "events_dataset_checksum",
    "events_checksum_by_type",
    "events_quantile_check",
    "ann_index_sq8_roundtrip",
    "ann_index_staleness",
    "events_drift_trend",
    # round-7 addition: per-eval-doc contamination report (benchmark
    # grams broadcast; corpus grams broadcast-semi-filtered before the
    # df aggregation — the corpus never shuffles)
    "doc_contamination_report",
    # round-7 addition: manifest-pruned file skipping over a Z-ordered
    # layout (zorder write + manifest build happen at plan-build time;
    # the timed region is the pruned scan + aggregate)
    "events_file_skipping",
    # round-7 additions: corpus mixing family — DSIR importance
    # resampling + Gumbel top-k, per-key caps (WindowGroupLimit-pruned
    # rank-limit window), deterministic mixture upsampling, and the
    # global-shuffle training order
    "doc_importance_resample",
    "doc_source_caps",
    "doc_mixture_epochs",
    "doc_training_order",
    # round-7 additions: Bloom-filter decontamination (map-only corpus
    # pass probing a broadcast 8 KiB bit array — no join build, no corpus
    # shuffle) and KMV bottom-k corpus-overlap estimation (jaccard +
    # distinct counts from two 256-row sketches; the exact-verification
    # columns dominate the timing at bench sf, the sketch path is the
    # 100 TB story)
    "doc_bloom_decontaminate",
    "corpus_overlap_kmv",
    # round-7 additions: leakage-controlled split (near-dup clusters ->
    # one split per cluster, straddle count provably 0) and
    # temperature-scaled source mixture (counts-only agg + one-row
    # broadcast back)
    "doc_leakage_safe_split",
    "doc_source_temperature",
    # round-7 addition: Gopher repetition gate — top-n-gram fractions and
    # within-doc duplicated-8-gram coverage, all map-side folds (zero
    # shuffle; the bench witnesses the pure-scan claim)
    "doc_repetition_stats",
    # round-7 addition: per-doc curation audit trail (which stage
    # rejected each doc; the pinned gate-flag frame materializes at
    # plan build, outside the timed region — like the index builds)
    "doc_curation_audit",
    # round-7 additions: quality-weighted deterministic subsampling
    # (map-side CASE over bucket literals — a pure scan filter) and the
    # pairwise source JS-divergence matrix (one bounded-domain token
    # aggregation; the pair join runs on the tiny dense frame)
    "doc_quality_sampled",
    "source_divergence_matrix",
    # round-8 addition: IVF recall-vs-n_probe sweep (5 bounded
    # counts-only aggregates over the shared 200-query ground truth)
    "ann_recall_sweep",
    # round-9 additions: the same scaffold parameterizing LSH n_planes
    # and scalar-quantization code width
    "lsh_recall_sweep",
    "sq_recall_sweep",
    # round-10 addition: the same scaffold over kept PCA components —
    # ONE 32-component fit (prefix-stable eigenvectors), coordinates
    # projected once and sliced per arm
    "pca_recall_sweep",
    # round-10 addition: its control arm — raw prefix truncation, no fit
    "emb_truncation_recall_sweep",
    # round-11 addition: the same scaffold over PQ subspace count —
    # completing the parameter-picking surface for the last ANN family
    # without a measured curve (deterministic lowest-id codebooks refit
    # per arm)
    "pq_recall_sweep",
    # round-11 addition: the second PQ axis — recall vs codebook size
    # (nbits per code) at fixed n_sub, completing the (m, nbits) grid
    "pq_codewords_sweep",
    # round-11 addition: the DEDUP family's S-curve — candidate recall +
    # precision per (n_bands, rows_per_band) split of the same 32
    # minhashes vs the exact Jaccard-threshold pair set (pinned once)
    "lsh_band_sweep",
    # round-12 additions: measurement -> decision. The ANN picker runs
    # ALL 21 sweep arms across 5 families against ONE pinned ground
    # truth over the planted corpus (the shared-GT shape is the new
    # compute worth timing; the *_planted sweep variants repeat the
    # already-benched per-family shapes and are oracle-checked extras);
    # the banding picker adds a 4-row window pass over the benched
    # lsh_band_sweep frame; the deployment composite is benched AS the
    # driver runs it (streaming legs fold at plan build, like the index
    # builds — the timed region is the state-read + report)
    "ann_operating_point",
    "lsh_banding_pick",
    "deployment_operating_points",
    # round-9 additions: task-level ANN consumers — leave-one-out kNN
    # label eval (neighbor frame broadcast into the label scan) and
    # contrastive hard-negative mining (mismatch filter BEFORE top-k)
    "knn_label_eval",
    "emb_hard_negatives",
    # round-9 addition: IVF cluster-purity diagnostic (map-side argmax
    # assignment + one bounded (cluster, label) aggregation)
    "ivf_cluster_purity",
    # round-9 additions: behavioral/corpus analytics — per-user Markov
    # transition matrix (one user-sort window + one bounded agg), bigram
    # PMI-lift collocations (min-count filter BEFORE the unigram joins),
    # and embedding ingest-batch centroid drift (ONE conditional-sum agg)
    "event_type_transitions",
    "doc_bigram_pmi",
    "emb_batch_drift",
    # round-10 addition: interpolated bigram LM scoring (shuffle
    # equi-join on the (a,b) key — the at-scale join shape — with the
    # capped vocab broadcast)
    "doc_bigram_lm_scores",
    # round-10 additions: median/MAD robust outlier gate (two exact-
    # percentile aggregations + broadcast probes) and the map-only
    # Flesch/FK readability scan (zero shuffle)
    "events_robust_outliers",
    "doc_readability",
    # round-10 addition: cross-source trigram novelty (gram-keyed
    # co-partitioned join-back, corpus tokenized once)
    "source_ngram_novelty",
    # round-10 addition: three-signal z-ensemble gate (one co-partitioned
    # signal join, one-row moments broadcast back)
    "doc_quality_ensemble",
    # round-10 addition: deterministic stratified split report (map-side
    # md5 assignment + one bounded (source, split) aggregation)
    "doc_stratified_split",
    # round-11 addition: per-source quality-gate operating-point picker
    # (one percentile aggregation + broadcast threshold join-back)
    "doc_quality_auto_threshold",
    # round-8 additions: CCNet line-level dedup (explode → one line-key
    # agg → co-partitioned join-back → HOF rebuild), linear gap
    # interpolation (two mirrored O(1)-state windows sharing one sort),
    # and length-bucketed dynamic batching (per-(bucket, shard) windows,
    # nothing global)
    "doc_line_dedup",
    "events_hourly_interpolated",
    "doc_length_batches",
    # round-8 addition: vocabulary-coverage / OOV report (bounded vocab
    # agg collected once at plan build; scoring is a map-only HOF fold —
    # zero joins over the corpus)
    "doc_vocab_coverage",
    # round-9 addition: the 50k-entry-vocab OOV leg (explode +
    # broadcast-join membership — measures the large-vocab strategy the
    # HOF literal path can't reach)
    "doc_oov_large_vocab",
    # round-8 addition: token-budget waterfill (mixture planning on the
    # per-source frame; the corpus pays one token-count aggregation)
    "doc_token_budget",
    # round-8 additions: staleness-bounded LOCF (one O(1)-state window)
    # and per-source winsorized score normalization (decimal-exact
    # moments, broadcast join-back)
    "events_bounded_ffill",
    "doc_quality_normalized",
    # driver-window composites, benched AS the driver runs them — the
    # wall-clock the driver pays includes their union/unpivot overhead,
    # which per-arm numbers don't capture
    "temporal_net_suite",
    "event_windows_suite",
    "scale_suite",
    "curation_suite",
    "span_dedup_suite",
    "neardup_pairs_suite",
    "sketch_checks",
    "grouping_sets_suite",
    "curation_eval_suite",
    # round-10 addition: the corpus-statistics + gate-outcome family
    # composite that took the event_type_pivot window slot (pivot arm +
    # AUC/Brier, retention, transitions, PMI, Zipf, l-diversity,
    # covariance, link prediction, graph summary), benched AS the driver
    # runs it
    "corpus_stats_suite",
    # round-10 addition: the gate/quality family composite that took the
    # user_counts_salted window slot, benched AS the driver runs it
    "gate_quality_suite",
    # round-11 addition: the privacy-triad composite (k-anonymity +
    # l-diversity + t-closeness on one quasi grid, props.k stats riding
    # along) that took the props_k_stats window slot
    "privacy_suite",
    "security_detections",
    # round-9 additions: curation-gate evaluation (one-pass calibration
    # bins / ECE, one-pass suffix-sum threshold sweep) and token-graph
    # triangle counting via degree-ordered orientation
    "doc_quality_calibration",
    "doc_quality_ece",
    "doc_quality_threshold_sweep",
    "token_graph_triangles",
    # round-9 addition: fixed-iteration PageRank, decimal-summed
    # contributions, bit-deterministic vs the unrolled-CTE oracle
    "token_graph_pagerank",
    # round-9 addition: per-source exact AUC + Brier from one pass over
    # the bounded (source, rounded-score) statistic frame
    "doc_quality_eval_by_source",
    # round-9 additions: degree-capped resource-allocation link
    # prediction and the daily cohort-retention triangle
    "token_graph_link_prediction",
    "user_retention_cohorts",
    # round-9 addition: exact 64x64 embedding covariance (one map-side
    # generate + one bounded aggregation; the pca_project input)
    "emb_dim_covariance",
    # round-10 addition: centered PCA scores — the timed region includes
    # the fit (ONE statistics aggregation + driver-side eigh of the
    # 32 KiB matrix) and the map-only literal projection
    "emb_pca_projection",
    # round-9 additions: histogram-calibration remap (broadcast mapping
    # join-back) and the graph-level transitivity summary
    "doc_quality_calibrated",
    "token_graph_summary",
    # round-9 additions: l-diversity audit over the k-anonymity
    # quasi-groups and the Zipf rank-frequency corpus-naturalness fit
    "events_l_diversity",
    "doc_zipf_fit",
    # round-10 addition: t-closeness audit completing the privacy triad
    "events_t_closeness",
    # round-10 addition: calibrated-gate round trip — both sweep arms
    # from the one shared calibration statistic (single corpus scan,
    # self-check columns asserted by the oracle)
    "doc_quality_calibrated_sweep",
)

# Pinned result sizes per scale factor: a bench run also smoke-checks that
# every plan still computes the right THING, not just quickly (a silently
# empty result would otherwise look like a speedup). Unlisted sfs skip the
# assert but still run.
EXPECTED_ROWS: dict[str, dict[str, int]] = {
    "0.1": {
        "secevents_etl": 100000, "sessionize_sessions": 95465,
        "sessionize_bucketed": 95465, "user_daily_avg": 1500,
        "keep_last_dedup": 7500, "time_since_last_error": 100000,
        "props_k_stats": 5, "pricing_summary": 6, "top_revenue_orders": 10,
        "regional_revenue": 25, "top_orders_per_customer": 44953,
        "asof_click_before_purchase": 20084, "click_purchase_bursts": 46,
        "doc_quality_scores": 5000, "ngram_jaccard_pairs": 256,
        "minhash_lsh_pairs": 256, "knn_cosine": 50, "cosine_dup_pairs": 479,
        "knn_cosine_lsh": 600, "knn_cosine_ivf": 600, "corpus_curation": 20,
        "events_ip_lpm": 4, "events_ip6_lpm": 4,
        "events_time_bucket_rollup": 14385, "doc_winnow_pairs": 251,
        "doc_lm_scores": 5000,
        "temporal_net_suite": 44669, "event_windows_suite": 200000,
        "scale_suite": 287, "curation_suite": 429,
        "span_dedup_suite": 400, "neardup_pairs_suite": 824, "sketch_checks": 29,
        "grouping_sets_suite": 209, "ann_recall_sweep": 5, "lsh_recall_sweep": 4, "sq_recall_sweep": 4, "pca_recall_sweep": 5, "pq_recall_sweep": 4, "pq_codewords_sweep": 4, "lsh_band_sweep": 4, "emb_truncation_recall_sweep": 5,
        "ann_operating_point": 21, "lsh_banding_pick": 4,
        "deployment_operating_points": 354,
        "knn_label_eval": 80, "emb_hard_negatives": 600, "ivf_cluster_purity": 16,
        "event_type_transitions": 25, "doc_bigram_pmi": 20, "emb_batch_drift": 10,
        "doc_bigram_lm_scores": 5000,
        "events_robust_outliers": 4053, "doc_readability": 5000,
        "source_ngram_novelty": 20, "doc_quality_ensemble": 5000,
        "doc_stratified_split": 60, "doc_quality_auto_threshold": 20,
        "security_detections": 11195,
        "doc_repetition_stats": 5000, "doc_curation_audit": 5000,
        "doc_quality_sampled": 603, "source_divergence_matrix": 190,
        "doc_jaccard_prefix_pairs": 255, "knn_cosine_sq8": 50,
        "doc_hybrid_search": 20, "events_value_drift": 5,
        "events_heavy_hitters": 0, "events_hourly_resampled": 3600,
        "doc_cross_corpus_dups": 120, "events_ffill_bucketed": 100000,
        "events_dataset_checksum": 1, "events_checksum_by_type": 5,
        "events_quantile_check": 0, "ann_index_sq8_roundtrip": 600,
        "ann_index_staleness": 16,
        "events_drift_trend": 20, "doc_contamination_report": 20,
        "events_file_skipping": 1,
        "doc_importance_resample": 25, "doc_source_caps": 800,
        "doc_mixture_epochs": 4931, "doc_training_order": 5000,
        "doc_bloom_decontaminate": 20, "corpus_overlap_kmv": 1,
        "doc_leakage_safe_split": 3, "doc_source_temperature": 20,
        "doc_line_dedup": 5000, "events_hourly_interpolated": 3600,
        "doc_length_batches": 636, "doc_vocab_coverage": 20,
        "doc_oov_large_vocab": 20,
        "doc_token_budget": 20, "events_bounded_ffill": 3600,
        "doc_quality_normalized": 5000,
        "doc_quality_calibration": 7, "doc_quality_ece": 1,
        "doc_quality_threshold_sweep": 9, "token_graph_triangles": 31,
        "token_graph_pagerank": 31, "curation_eval_suite": 10207,
        "corpus_stats_suite": 10308, "gate_quality_suite": 4737, "privacy_suite": 518, "doc_quality_eval_by_source": 20,
        "token_graph_link_prediction": 20, "user_retention_cohorts": 111,
        "emb_dim_covariance": 2080, "emb_pca_projection": 2000,
        "doc_quality_calibrated": 5000, "token_graph_summary": 1,
        "events_l_diversity": 51, "doc_zipf_fit": 1, "events_t_closeness": 51,
        "doc_quality_calibrated_sweep": 14,
    },
    "0.01": {
        "secevents_etl": 10000, "sessionize_sessions": 9549,
        "sessionize_bucketed": 9549, "user_daily_avg": 150,
        "keep_last_dedup": 750, "time_since_last_error": 10000,
        "props_k_stats": 5, "pricing_summary": 6, "top_revenue_orders": 10,
        "regional_revenue": 25, "top_orders_per_customer": 4492,
        "asof_click_before_purchase": 1981, "click_purchase_bursts": 8,
        "doc_quality_scores": 500, "ngram_jaccard_pairs": 25,
        "minhash_lsh_pairs": 25, "knn_cosine": 50, "cosine_dup_pairs": 30,
        "knn_cosine_lsh": 600, "knn_cosine_ivf": 600, "corpus_curation": 20,
        "events_ip_lpm": 4, "events_ip6_lpm": 4,
        "events_time_bucket_rollup": 7206, "doc_winnow_pairs": 25,
        "doc_lm_scores": 500,
        "temporal_net_suite": 16129, "event_windows_suite": 20000,
        "scale_suite": 270, "curation_suite": 429,
        "span_dedup_suite": 292, "neardup_pairs_suite": 62, "sketch_checks": 29,
        "grouping_sets_suite": 209, "ann_recall_sweep": 5, "lsh_recall_sweep": 4, "sq_recall_sweep": 4, "pca_recall_sweep": 5, "pq_recall_sweep": 4, "pq_codewords_sweep": 4, "lsh_band_sweep": 4, "emb_truncation_recall_sweep": 5,
        "ann_operating_point": 21, "lsh_banding_pick": 4,
        "deployment_operating_points": 354,
        "knn_label_eval": 78, "emb_hard_negatives": 600, "ivf_cluster_purity": 16,
        "event_type_transitions": 25, "doc_bigram_pmi": 20, "emb_batch_drift": 10,
        "doc_bigram_lm_scores": 500,
        "events_robust_outliers": 392, "doc_readability": 500,
        "source_ngram_novelty": 20, "doc_quality_ensemble": 500,
        "doc_stratified_split": 56, "doc_quality_auto_threshold": 20,
        "security_detections": 1135,
        "doc_repetition_stats": 500, "doc_curation_audit": 500,
        "doc_quality_sampled": 75, "source_divergence_matrix": 190,
        "doc_jaccard_prefix_pairs": 25, "knn_cosine_sq8": 50,
        "doc_hybrid_search": 20, "events_value_drift": 5,
        "events_heavy_hitters": 0, "events_hourly_resampled": 3600,
        "doc_cross_corpus_dups": 12, "events_ffill_bucketed": 10000,
        "events_dataset_checksum": 1, "events_checksum_by_type": 5,
        "events_quantile_check": 0, "ann_index_sq8_roundtrip": 600,
        "ann_index_staleness": 16,
        "events_drift_trend": 20, "doc_contamination_report": 20,
        "events_file_skipping": 1,
        "doc_importance_resample": 25, "doc_source_caps": 439,
        "doc_mixture_epochs": 491, "doc_training_order": 500,
        "doc_bloom_decontaminate": 20, "corpus_overlap_kmv": 1,
        "doc_leakage_safe_split": 3, "doc_source_temperature": 20,
        "doc_line_dedup": 500, "events_hourly_interpolated": 3600,
        "doc_length_batches": 75, "doc_vocab_coverage": 20,
        "doc_oov_large_vocab": 20,
        "doc_token_budget": 20, "events_bounded_ffill": 3600,
        "doc_quality_normalized": 500,
        "doc_quality_calibration": 7, "doc_quality_ece": 1,
        "doc_quality_threshold_sweep": 9, "token_graph_triangles": 30,
        "token_graph_pagerank": 30, "curation_eval_suite": 1203,
        "corpus_stats_suite": 3366, "gate_quality_suite": 651, "privacy_suite": 398, "doc_quality_eval_by_source": 20,
        "token_graph_link_prediction": 20, "user_retention_cohorts": 59,
        "emb_dim_covariance": 2080, "emb_pca_projection": 500,
        "doc_quality_calibrated": 500, "token_graph_summary": 1,
        "events_l_diversity": 39, "doc_zipf_fit": 1, "events_t_closeness": 39,
        "doc_quality_calibrated_sweep": 14,
    },
}


def _skew_entries(spark):
    """Skew stress profile: the repo's 100x skew claims measured, not
    argued, on a synthesized hot-key dataset big enough for skew to bite
    (2M events, 90% of all rows on ONE user — the NAT-gateway /
    service-account shape; the sf0.1 events table is too small for any
    single task to dominate). Operator pairs over the SAME input:

    - sessionize naive vs bucketed — per-key WINDOW functions have no
      map-side combine, so the naive form sorts the hot user's 1M rows in
      ONE task; day-bucketing splits the sort and merges chains after.
      The skew-resistant form must win here, and the margin grows with
      the hot key (SCALE.md).
    - shuffle-hash join plain vs salted (broadcast disabled, AQE skew-join
      off for the pair — at 100 TB the dim side can exceed broadcast
      range) — the hot key funnels 1.8M probe+emit rows into one join
      task; salting spreads them 32-way.
    - groupBy counts plain vs salted — the CONTROL pair: algebraic aggs
      partial-aggregate map-side, so a hot key reduces to one row per
      partition BEFORE the shuffle and plain wins; salting pays an extra
      shuffle for nothing. Salting is for the non-combinable shapes
      (windows, joins, collect_*), and the bench records that boundary
      rather than pretending otherwise.

    Returns (entries, conf_overrides_for_join_pair).
    """
    import tempfile

    from pyspark.sql import functions as F

    from security_data_pipeline_spark.operators import features, skew, timeseries

    tmp = tempfile.mkdtemp(prefix="bench_skew_")
    n = 2_000_000
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.pmod("id", 10) < 9, F.lit(1))
        .otherwise(F.pmod("id", 2000) + 2)
        .alias("user_id"),
        F.timestamp_micros(
            F.lit(1700000000000000) + F.col("id") * 400_000
        ).alias("timestamp"),
        # sparse sensor reading (5% non-NULL) for the forward-fill pair
        F.when(F.pmod("id", 20) == 0, F.col("id").cast("double")).alias(
            "val"
        ),
    )
    ev.repartition(32).write.parquet(f"{tmp}/ev")
    ev = spark.read.parquet(f"{tmp}/ev")
    dim = spark.range(20_000).select(
        (F.col("id") + 1).alias("user_id"),
        # wide payload: the hot join task must emit its rows, not only
        # probe — output serialization is part of what skew serializes
        F.concat(*[F.sha2(F.col("id").cast("string"), 256)] * 4).alias(
            "attr"
        ),
    )
    dim.write.parquet(f"{tmp}/dim")
    dim = spark.read.parquet(f"{tmp}/dim")

    naive = features.add_session_features(
        ev, gap_minutes=30, tiebreak_cols=("event_id",), include_stats=False
    )
    bucketed = features.add_session_features_bucketed(
        ev, gap_minutes=30, bucket_hours=24.0,
        tiebreak_cols=("event_id",), include_stats=False,
    )
    plain_join = ev.join(dim.hint("shuffle_hash"), ["user_id"])
    salted_join = skew.salted_join(
        ev, dim.hint("shuffle_hash"), on=["user_id"], n_salts=32
    )
    plain_counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("timestamp").alias("first_ts"),
        F.max("timestamp").alias("last_ts"),
    )
    # forward-fill pair: LOCF is a per-key ordered window with NO
    # map-side combine — the naive form sorts the hot user's 1.8M rows in
    # ONE task; hour-bucketing fills locally and crosses boundaries via a
    # carry frame of one row per ACTIVE bucket (~222 rows for the hot key)
    ev_o = ev.withColumn("_ous", F.unix_micros("timestamp"))
    ffill_naive = timeseries.forward_fill(ev_o, ["user_id"], "_ous", ["val"])
    ffill_bucketed = timeseries.forward_fill_bucketed(
        ev_o, ["user_id"], "_ous", ["val"], bucket_width=3.6e9
    )
    # per-key cap pair: the SECOND control pair (SCALE.md) — plain
    # rank-limit windows are already shuffle-pruned by Spark's
    # WindowGroupLimit rewrite (the hot user forwards <= cap rows per map
    # partition), so the hand-rolled over-cap-only bypass pays a counts
    # pass + two broadcast probes to save a shuffle that was already
    # small; plain must win, and the pair records that boundary
    from security_data_pipeline_spark.operators import mixing

    cap_order = [F.desc("timestamp"), F.asc("event_id")]
    cap_plain = mixing.cap_per_key(ev, ["user_id"], 1000, cap_order)
    cap_bypass = mixing.cap_per_key_bypass(ev, ["user_id"], 1000, cap_order)
    salted_counts = skew.salted_agg(
        ev,
        keys=["user_id"],
        aggs={
            "n_events": ("event_id", "count"),
            "first_ts": ("timestamp", "min"),
            "last_ts": ("timestamp", "max"),
        },
        n_salts=16,
    )
    entries = [
        ("skew_sessionize_naive", naive, False),
        ("skew_sessionize_bucketed", bucketed, False),
        ("skew_join_plain", plain_join, True),
        ("skew_join_salted", salted_join, True),
        ("skew_counts_plain", plain_counts, False),
        ("skew_counts_salted", salted_counts, False),
        ("skew_ffill_naive", ffill_naive, False),
        ("skew_ffill_bucketed", ffill_bucketed, False),
        ("skew_cap_plain", cap_plain, False),
        ("skew_cap_bypass", cap_bypass, False),
    ]
    join_confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    }
    return entries, join_confs


def _suite_arm_names() -> dict[str, list[str]]:
    """Suite -> constituent registered-query names, extracted from the
    composite function bodies (their ``run("<name>")`` calls). Suites
    whose arms are inline expressions (no registry constituents) map to
    an empty list and are skipped by the sidecar."""
    import inspect
    import re

    from security_data_pipeline_spark.plans import composites

    out: dict[str, list[str]] = {}
    for name, fn in vars(composites).items():
        if not callable(fn) or getattr(fn, "__module__", "") != composites.__name__:
            continue
        if not (name.endswith("_suite") or name == "sketch_checks"):
            continue
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        out[name] = re.findall(r'run\("([a-z0-9_]+)"\)', src)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from security_data_pipeline_spark.plans.queries import REGISTRY
    from security_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM / parquet footer caches so per-query times measure the
    # plans, not session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    expected = EXPECTED_ROWS.get(sf, {})
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}  # per-query max over the same runs

    def bench_one(name: str, df, expected_n: int | None) -> int | None:
        n = None
        if expected_n is not None:  # untimed smoke-check of the result size
            n = df.count()
            assert n == expected_n, (
                f"{name}: {n} rows, expected {expected_n}"
            )
        elif name.startswith("skew_"):
            n = df.count()  # no pin (synthesized input); counted for the
            # cross-pair equality assert below
        # settle the JVM between queries: 20+ distinct plans in one session
        # accumulate garbage; an explicit GC here keeps collection pauses
        # out of the timed region. (The code-cache side of this problem is
        # solved at the root: session.py reserves 1g of JIT code cache —
        # with the default 240m the C2 compiler shut off mid-benchmark and
        # later queries ran interpreted, 2-6x slower, nondeterministically.)
        spark.sparkContext._jvm.System.gc()
        # two untimed warm-ups: the first compiles codegen, the second lets
        # C2 JIT the hot loops — deep plans (the ETL chain) measured ~2x
        # slower on their first post-compile execution. Timed runs stay
        # CONSECUTIVE: interleaving other plans between runs evicts this
        # plan's JIT state and re-measures the cold path (~2x, measured).
        df.write.mode("overwrite").format("noop").save()
        df.write.mode("overwrite").format("noop").save()
        # best-of-5 CONSECUTIVE runs: sub-second queries on this box are
        # hostage to host-level stalls and JIT compilation timing (round 3
        # saw 2.4x swings on byte-identical plans); five samples make the
        # minimum a stable steady-state estimate where three did not. The
        # spread is logged so a noisy window is visible in the record.
        samples = []
        for _ in range(5):
            start = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - start)
        timings[name] = round(min(samples), 3)
        # the max rides into BENCH_FULL.json next to the min: the
        # md5/gram arms' ±40% host band has cost three rounds of
        # worktree bisects — with the recorded spread, a next-round
        # delta already covered by this round's band is triaged by a
        # file read, no bisect (VERDICT r11 #5)
        spreads[name] = round(max(samples), 3)
        print(
            f"[bench] {name}: {timings[name]:.3f}s "
            f"(max {max(samples):.3f}s over {len(samples)} runs)",
            file=sys.stderr,
        )
        return n

    for name in BENCH_QUERIES:
        bench_one(name, REGISTRY[name].fn(spark, sf_dir), expected.get(name))

    # skew stress profile (same timing discipline); each pair must agree on
    # its result cardinality — the skew-resistant form is a physical-plan
    # change, never a semantics change
    skew_counts: dict[str, int] = {}
    entries, join_confs = _skew_entries(spark)
    saved = {k: spark.conf.get(k) for k in join_confs}
    for name, df, needs_join_confs in entries:
        for k, v in (join_confs if needs_join_confs else saved).items():
            spark.conf.set(k, v)
        skew_counts[name] = bench_one(name, df, None)
    for k, v in saved.items():
        spark.conf.set(k, v)
    for a, b in [
        ("skew_sessionize_naive", "skew_sessionize_bucketed"),
        ("skew_join_plain", "skew_join_salted"),
        ("skew_counts_plain", "skew_counts_salted"),
        ("skew_ffill_naive", "skew_ffill_bucketed"),
        ("skew_cap_plain", "skew_cap_bypass"),
    ]:
        assert skew_counts[a] == skew_counts[b], (a, b, skew_counts)

    # per-arm timing sidecar for the window suites: when a suite's number
    # creeps, the bisect reads per-arm baselines from THIS record instead
    # of re-running by hand. Arm lists are extracted from the composite
    # sources (the run("<name>") calls), so the map cannot drift from the
    # code. Lighter discipline than the headline numbers (1 warm-up,
    # best-of-3): these are attribution baselines, not headline figures.
    suite_arms: dict[str, dict[str, float]] = {}
    arm_spreads: dict[str, float] = {}
    for suite, arms in _suite_arm_names().items():
        if suite not in BENCH_QUERIES or not arms:
            continue
        per_arm: dict[str, float] = {}
        for arm in arms:
            df = REGISTRY[arm].fn(spark, sf_dir)
            spark.sparkContext._jvm.System.gc()
            df.write.mode("overwrite").format("noop").save()
            samples = []
            for _ in range(3):
                start = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                samples.append(time.perf_counter() - start)
            per_arm[arm] = round(min(samples), 3)
            arm_spreads[f"{suite}:{arm}"] = round(max(samples), 3)
        suite_arms[suite] = per_arm
        print(f"[bench] suite arms {suite}: {per_arm}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # The driver keeps only the last ~2000 chars of stdout and parses the
    # final JSON line.  The full per-query map outgrew that tail in round 7
    # (BENCH_r07.json "parsed": null), so: write the full map to a sidecar
    # AND print it first; the LAST stdout line is a compact (<1 KB) headline
    # carrying only the total and the top-5 slowest queries.
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_max": spreads,
        "suite_arms": suite_arms,
        "suite_arms_max": arm_spreads,
        "sf": sf,
    }
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    try:
        with open(sidecar, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError:
        pass
    print(json.dumps(full))
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    headline = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": slowest,
            "n_queries": len(timings),
            "sf": sf,
        },
        separators=(",", ":"),
    )
    assert len(headline) < 1000, len(headline)
    print(headline)
    spark.stop()


if __name__ == "__main__":
    main()
