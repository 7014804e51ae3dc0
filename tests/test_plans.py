"""Physical-plan regression tests: the scale properties COVERAGE.md/SCALE.md
claim must stay visible in the plans, not just in prose.

These don't execute jobs (plan-only), so the whole registry is cheap to
sweep.
"""

from __future__ import annotations

import pytest

from security_data_pipeline_spark.plans.queries import REGISTRY
from security_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


ALL_QUERIES = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_rowwise_python_udf_in_any_query(spark, name):
    """Zero row-at-a-time Python UDFs anywhere in the registry (SURVEY §2.11).
    (Arrow-batched nodes would show as ArrowEvalPython/MapInPandas — the
    registry currently has none of those on the hot path either.)"""
    plan = _plan(REGISTRY[name].fn(spark, SF))
    assert "BatchEvalPython" not in plan, name
    assert "ArrowEvalPython" not in plan, name


def test_dimension_joins_broadcast(spark):
    plan = _plan(REGISTRY["regional_revenue"].fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(REGISTRY["top_revenue_orders"].fn(spark, SF))
    pushed = [
        line for line in plan.splitlines() if "PushedFilters: [" in line
    ]
    assert any("BUILDING" in line for line in pushed), pushed


def test_column_pruning_reaches_scan(spark):
    # events scan for user counts must not read props/value beyond need
    df = REGISTRY["user_total_counts"].fn(spark, SF)
    plan = _plan(df)
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scans and all("props" not in l for l in scans), scans


def test_etl_exchange_budget(spark):
    """The ETL chain moves the fact table through exactly 2 hash exchanges
    (keep-last dedup by event_id; ONE user_id exchange shared by the count,
    baseline, and session windows) and zero joins — a regression here means
    a new accidental shuffle."""
    plan = _plan(REGISTRY["secevents_etl"].fn(spark, SF))
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 2, f"{n_exchange} hash exchanges:\n{plan[:3000]}"
    assert plan.count("BroadcastExchange") == 0
    assert "Join" not in plan


def test_session_stats_reuse_user_exchange(spark):
    """Per-session stat windows must not add an exchange beyond the
    session-id window's user_id partitioning."""
    plan = _plan(REGISTRY["sessionize_sessions"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_hll_sketch_within_error_bound(spark):
    """approx_count_distinct at rsd=2% must land within ~3× the bound of
    the exact count on real data (loose guard against a broken sketch)."""
    import pyspark.sql.functions as F

    from security_data_pipeline_spark.sources.catalog import load_table

    ev = load_table(spark, SF, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.06 * r["exact"]), r


def test_approx_percentile_within_rank_error(spark):
    """GK sketch at accuracy=10000 → rank error ≤ 1/10000; on sf0.001
    lineitem that means the approx quartiles must match values whose rank
    is within a handful of positions of the exact quartile."""
    import pyspark.sql.functions as F

    from security_data_pipeline_spark.sources.catalog import load_table

    li = load_table(spark, SF, "lineitem")
    approx = {
        r["l_returnflag"]: r["pq"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile(
                "l_extendedprice",
                F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
                F.lit(10000),
            ).alias("pq")
        )
        .collect()
    }
    exact = {
        r["l_returnflag"]: r["pq"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile_approx(l_extendedprice,"
                " array(0.25D, 0.5D, 0.75D), 2147483647)"
            ).alias("pq")
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for flag, av in approx.items():
        for a, e in zip(av, exact[flag]):
            # discrete-percentile sketch: within 0.5% of the exact value
            assert abs(a - e) <= max(1.0, 0.005 * abs(e)), (flag, av, exact[flag])


def test_sql_surface_matches_dataframe_plan(spark):
    """The engine's SQL entry (spark.sql over registered views) returns the
    same result as the DataFrame form — users can pick either surface."""
    from security_data_pipeline_spark.sources.catalog import register_views

    register_views(spark, SF)
    via_sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    ).collect()
    df_rows = REGISTRY["pricing_summary"].fn(spark, SF).collect()
    sql_map = {
        (r.l_returnflag, r.l_linestatus): (r.sum_qty, r.count_order)
        for r in via_sql
    }
    df_map = {
        (r.l_returnflag, r.l_linestatus): (r.sum_qty, r.count_order)
        for r in df_rows
    }
    assert sql_map == df_map and sql_map


def test_decontaminate_is_broadcast_semi_join(spark):
    """The eval-set gram join must broadcast the (small) benchmark side as
    a LEFT SEMI hash join — a sort-merge join here would shuffle the whole
    corpus gram stream on the gram key."""
    plan = _plan(REGISTRY["doc_decontaminate"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_candidates_join_is_broadcast(spark):
    """ann_ivf_topk's candidate generation must be a broadcast hash join of
    the tiny probe list against the clustered corpus — never a sort-merge
    join (which would shuffle the corpus on the probe key)."""
    plan = _plan(REGISTRY["knn_cosine_ivf"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_zorder_layout_single_range_exchange_no_udf(spark):
    from security_data_pipeline_spark.operators.layout import zorder_layout

    ev = load_table(spark, SF, "events")
    plan = _plan(zorder_layout(ev, ["user_id", "value"], num_files=8))
    assert "rangepartitioning" in plan.lower(), plan[:500]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only exchange is the final range partitioning (the quantile fit
    # runs at plan-build time, not inside this plan)
    assert plan.count("Exchange") == 1, plan


def test_incremental_partials_are_partial_aggregated(spark):
    from security_data_pipeline_spark.operators import incremental as inc

    ev = load_table(spark, SF, "events")
    p = inc.partial_aggs(ev, ["event_type"], ["value"], ["user_id"])
    plan = _plan(p)
    # HLL sketch agg forces ObjectHashAggregate; partial + final pair means
    # map-side combine before the one exchange
    assert "ObjectHashAggregate" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_lm_scoring_join_is_broadcast(spark):
    plan = _plan(REGISTRY["doc_lm_scores"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # vocab fit is TakeOrdered (top-k), never a global sort
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize("name", ("events_ip_lpm", "events_ip6_lpm"))
def test_lpm_dim_broadcast_and_narrow_reduce_keys(spark, name):
    """Both LPM joins: the CIDR dim meets the fan-out in a broadcast hash
    join (never SMJ — the dim is small by definition), and every exchange
    keys on the narrow surrogate/rollup columns (event_id / label), never
    on fact payload columns like user_id or ip."""
    import re

    plan = _plan(REGISTRY[name].fn(spark, SF))
    assert "BroadcastHashJoin" in plan, name
    for keys in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        # the rollup's countDistinct legitimately shuffles (label, user_id);
        # everything else must key on the surrogate id or the rollup label —
        # never an ip/address column, never user_id alone
        assert "ip" not in keys.replace("_lpm_rid", ""), (name, keys)
        if "user_id" in keys:
            assert "label" in keys, (name, keys)


def test_bpe_pair_counts_partial_aggregated_topk(spark):
    """The BPE pair ranking: top-20 via TakeOrdered (no global sort) over a
    partial-aggregated pair count (map-side combine before the shuffle)."""
    plan = _plan(REGISTRY["doc_bpe_top_pairs"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_" in plan or "HashAggregate" in plan


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_unbroadcast_cartesian_in_any_query(spark, name):
    """CartesianProduct (a non-broadcast cross join) shuffles |L|x|R| work
    onto the cluster — never acceptable in a registered plan. Broadcast
    nested-loop joins against 1-row bound/total frames or gated small-corpus
    baselines are the only sanctioned cross-join physical form."""
    plan = _plan(REGISTRY[name].fn(spark, SF))
    assert "CartesianProduct" not in plan, name


def test_sq8_broadcasts_queries_never_shuffles_corpus(spark):
    """SQ8 ANN: the query side is broadcast; the corpus reaches scoring
    without a hash exchange (only the top-k window shuffles, keyed on
    query_id — k rows per query)."""
    plan = _plan(REGISTRY["knn_cosine_sq8"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    pre_window = plan.split("Window", 1)[1] if "Window" in plan else plan
    assert "hashpartitioning(neighbor_id" not in pre_window


def test_prefix_join_pins_ranked_frame(spark):
    """The rarity-ranked frame is localCheckpoint-ed: its four consumers
    read materialized blocks (Scan ExistingRDD), not four corpus scans."""
    plan = _plan(REGISTRY["doc_jaccard_prefix_pairs"].fn(spark, SF))
    assert "ExistingRDD" in plan
    assert plan.count("FileScan parquet") == 0, plan.count("FileScan parquet")


def test_resample_aggregates_before_densifying(spark):
    """Resampling must reduce rows to (key, bucket) BEFORE the grid join —
    partial aggregation below the first exchange, and the grid generator
    (explode of sequence) sits above aggregated inputs, never raw rows."""
    plan = _plan(REGISTRY["events_hourly_resampled"].fn(spark, SF))
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "Generate explode(sequence" in plan.replace("\n", " ") or "explode" in plan


def test_bm25_stats_are_literals_not_joins(spark):
    """BM25 corpus statistics (N, avgdl, per-term idf) are baked as
    literals: the lexical ranker's plan has at most the fusion join — no
    stats join-back against the corpus."""
    from security_data_pipeline_spark.operators import textops

    docs = load_table(spark, SF, "documents")
    plan = _plan(textops.bm25_topk(docs, ["scan", "agg"], k=10))
    assert "Join" not in plan, plan[:1500]
    assert "TakeOrderedAndProject" in plan


def test_quantile_check_broadcasts_approx_values(spark):
    """The 25 approx quantile values broadcast back against the events
    scan — the rank-counting pass is one broadcast hash join plus one
    aggregate, never a fact-table shuffle keyed on the quantile frame."""
    plan = _plan(REGISTRY["events_quantile_check"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ks_grid_keeps_drift_window_input_aggregated(spark):
    """The KS branch's ordered window consumes the per-(group, cell)
    aggregate, not raw rows: a HashAggregate (the cell histogram) sits
    below the Window operator in the drift plan."""
    plan = _plan(REGISTRY["events_value_drift"].fn(spark, SF))
    assert "Window" in plan
    # the plan contains the bounded-cell aggregate feeding the window —
    # grid arithmetic (floor((v - mn) / ...) clamped) appears as the
    # aggregate's grouping expression
    flat = plan.replace("\n", " ")
    assert "4096" in flat  # the grid constant reached the plan


def test_span_dedup_witness_is_minmax_not_expand(spark):
    """The default min_docs=2 duplicated-gram set is a plain min/max
    aggregation (full map-side combine, one gram shuffle) — NOT
    countDistinct's Expand rewrite, which doubles the gram stream before
    the shuffle. The island merge then rides the window's doc_id
    partitioning: no extra exchange between the window and the final
    span aggregate."""
    plan = _plan(REGISTRY["doc_dup_spans"].fn(spark, SF))
    assert "Expand" not in plan
    assert "partial_min(doc_id" in plan and "partial_max(doc_id" in plan
    assert "CartesianProduct" not in plan
    # gram-agg exchange + doc_id window exchange (+ a broadcast/gram
    # exchange for the join side) — anything beyond 3 means the island
    # aggregate stopped reusing the window's partitioning
    assert plan.count("Exchange hashpartitioning") <= 3, plan.count(
        "Exchange hashpartitioning"
    )


def test_span_removal_never_explodes_the_rebuild_side(spark):
    """remove_duplicated_spans rebuilds documents with an indexed
    array-filter HOF against each doc's own span array: the only
    Generates in the plan are the two positional-gram explodes inside
    the span discovery — the corpus-side token stream is never
    exploded/re-aggregated."""
    plan = _plan(REGISTRY["doc_dup_span_removal"].fn(spark, SF))
    assert plan.count("Generate") == 2, plan.count("Generate")
    assert "Expand" not in plan
    assert "CartesianProduct" not in plan


def test_repetition_gate_is_map_only_and_funnel_pins_flags(spark):
    """Two plan guarantees around the Gopher gate: (a) the standalone
    stats pass has NO Exchange (pure per-row folds — the 100 TB scan
    claim); (b) the curation funnel consumes the keep flag through a
    MATERIALIZED frame (a checkpointed RDD scan in the plan), never by
    filtering the lazy operator output — PushDownPredicate would inline
    the gram-chain bindings into the pushed condition (the measured
    23 s / O(L^2) regression recorded in SCALE.md)."""
    plan = _plan(REGISTRY["doc_repetition_stats"].fn(spark, SF))
    assert "Exchange" not in plan, plan[:1500]
    funnel = _plan(REGISTRY["corpus_curation"].fn(spark, SF))
    assert "ExistingRDD" in funnel, funnel[:1500]


def test_line_dedup_discovery_explodes_rebuild_does_not(spark):
    """remove_duplicated_lines: the line stream explodes only inside the
    duplicated-line discovery (positional_lines feeds both the key agg
    and the join-back); the rebuild side filters each doc's own line
    array with an indexed HOF — no third Generate, no Expand, and the
    whole pass fits in two hash exchanges (line-key agg + removal-
    positions agg; the joins broadcast)."""
    plan = _plan(REGISTRY["doc_line_dedup"].fn(spark, SF))
    assert "Expand" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Generate") == 2, plan.count("Generate")
    assert plan.count("Exchange hashpartitioning") <= 2, plan.count(
        "Exchange hashpartitioning"
    )


def test_interpolation_mirrored_frames_share_one_sort(spark):
    """interpolate_linear's backward last() and forward first() frames
    ride ONE Window node over ONE sort — the mirrored-frame claim. A
    second Sort/Window would mean the two frames stopped sharing the
    (key, order) exchange."""
    plan = _plan(REGISTRY["events_hourly_interpolated"].fn(spark, SF))
    assert plan.count("Window") == 1, plan.count("Window")
    assert plan.count("Sort") == 1, plan.count("Sort")


def test_length_batches_agg_reuses_window_partitioning(spark):
    """length_bucketed_batches: the per-batch aggregate groups on a
    superset of the row_number window's (bucket_len, shard) keys, so the
    ENTIRE op is one exchange — assignment is map-side Column math and
    the final agg rides the window's partitioning."""
    plan = _plan(REGISTRY["doc_length_batches"].fn(spark, SF))
    assert plan.count("Exchange") == 1, plan.count("Exchange")
    assert "Expand" not in plan
    assert "CartesianProduct" not in plan


def test_vocab_coverage_scoring_is_scan_plus_one_agg(spark):
    """oov_stats scores each doc's token array against the collected
    vocabulary literal map-side (no explode, no join over the corpus) —
    the registered query's plan is one source-groupBy exchange and
    nothing else."""
    plan = _plan(REGISTRY["doc_vocab_coverage"].fn(spark, SF))
    assert plan.count("Generate") == 0, plan.count("Generate")
    assert plan.count("Exchange") == 1, plan.count("Exchange")
    assert "Join" not in plan, plan[:1200]


def test_bounded_ffill_single_window_single_sort(spark):
    """forward_fill_bounded is ONE O(1)-state window over one sort (the
    carried value and its observation time travel in one struct — no
    second pass to age values out)."""
    plan = _plan(REGISTRY["events_bounded_ffill"].fn(spark, SF))
    assert plan.count("Window") == 1, plan.count("Window")
    assert plan.count("Sort") == 1, plan.count("Sort")


def test_score_normalization_broadcasts_group_moments(spark):
    """normalize_scores_by_group joins the bounded per-group moment frame
    back by BROADCAST (never a corpus shuffle on the group key for the
    join) and computes moments in one aggregation — no window, no sort,
    no explode anywhere."""
    plan = _plan(REGISTRY["doc_quality_normalized"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Window") == 0 and plan.count("Sort") == 0
    assert plan.count("Generate") == 0


def test_transitions_matrix_work_is_bounded_after_one_corpus_window(spark):
    """event_type_transitions shuffles the corpus ONCE (the per-user lag
    window — the sessionizer's shape); everything after runs on the
    |types|^2-bounded matrix (one count agg exchange + one normalizing
    window exchange). No explode, no join anywhere."""
    plan = _plan(REGISTRY["event_type_transitions"].fn(spark, SF))
    assert plan.count("Exchange") == 3, plan.count("Exchange")
    assert plan.count("Window") == 2, plan.count("Window")
    assert plan.count("Generate") == 0
    assert "Join" not in plan


def test_bigram_pmi_totals_attach_as_one_row_broadcasts(spark):
    """doc_bigram_pmi: the two corpus totals (n_tok, n_pairs) attach as
    one-row BroadcastNestedLoopJoins (the audited scalar-attachment
    pattern), never a CartesianProduct; the unigram membership joins are
    hash joins on the token key."""
    plan = _plan(REGISTRY["doc_bigram_pmi"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 2, plan[:1500]
    assert "HashJoin" in plan


def test_batch_drift_is_one_conditional_sum_aggregation(spark):
    """emb_batch_drift computes BOTH ingest halves' 64 decimal sums in a
    single map-side-combined aggregation — one exchange on the label
    key, no self-join of halves, no explode; the cosine/L2 folds run on
    the |labels|-sized aggregated frame."""
    plan = _plan(REGISTRY["emb_batch_drift"].fn(spark, SF))
    assert plan.count("Exchange") == 1, plan.count("Exchange")
    assert plan.count("Generate") == 0
    assert "Join" not in plan


def test_gate_evaluation_is_one_corpus_scan_each(spark):
    """The evaluation family's claim is sufficient statistics from ONE
    corpus pass: calibration, ECE, the 9-threshold sweep, and per-source
    AUC+Brier each read the documents parquet exactly once — m
    thresholds never cost m scans, the ranking window runs over the
    statistic frame."""
    for name in (
        "doc_quality_calibration",
        "doc_quality_ece",
        "doc_quality_threshold_sweep",
        "doc_quality_eval_by_source",
    ):
        plan = _plan(REGISTRY[name].fn(spark, SF))
        scans = [
            l for l in plan.splitlines() if "FileScan parquet" in l
        ]
        assert len(scans) == 1, (name, scans)


def test_calibrated_sweep_runs_on_the_pinned_statistic_only(spark):
    """The round-trip sweep's FINAL plan must contain ZERO corpus scans:
    both arms are subset sums over the pinned <=10-row calibration
    statistic (the pin barrier shows as an ExistingRDD/InMemory leaf), so
    the corpus is paid exactly once at statistic build — m thresholds x 2
    arms never re-reads documents."""
    plan = _plan(REGISTRY["doc_quality_calibrated_sweep"].fn(spark, SF))
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert not scans, scans
    assert ("ExistingRDD" in plan) or ("InMemory" in plan)


def test_threshold_sweep_suffix_join_is_broadcast_grid(spark):
    """The sweep's suffix sums ride a band>=j theta join of two
    grid-sized frames — physical form must be a BROADCAST nested-loop
    (bounded operands), never a CartesianProduct, and the corpus side
    passes through exactly one hash aggregation exchange."""
    plan = _plan(REGISTRY["doc_quality_threshold_sweep"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_triangle_and_linkpred_have_no_theta_joins(spark):
    """Degree-ordered triangle counting and capped RA link prediction
    shuffle on real keys everywhere: wedge pairing and closure are
    equi-joins, the non-edge removal is an anti equi-join — no
    CartesianProduct, no broadcast nested loop anywhere."""
    for name in ("token_graph_triangles", "token_graph_link_prediction"):
        plan = _plan(REGISTRY[name].fn(spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_retention_has_no_expand_and_coparitioned_user_join(spark):
    """retention_cohorts: no COUNT DISTINCT survives to the wide stage
    (no Expand node — distinctness comes from the narrow (user, period)
    aggregation) and the first-seen/activity join happens on already-
    reduced per-user frames."""
    plan = _plan(REGISTRY["user_retention_cohorts"].fn(spark, SF))
    assert "Expand" not in plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) <= 2, scans  # one per side of the per-user join


@pytest.mark.parametrize(
    "name,max_scans",
    [
        # The cell frame feeds four consumers; unpinned, the (quasi,
        # sensitive) corpus aggregation re-inlined into every branch
        # (measured 4 scans, round 11). The pin hides the one real scan
        # behind the barrier, so the static plan shows zero.
        ("events_t_closeness", 1),
        # _recall_sweep_union pins the brute-force ground truth: each of
        # the 5 arms re-scans for its own index, but the exact top-k must
        # not be re-derived per arm (was 30 scans unpinned, round 11).
        ("ann_recall_sweep", 12),
        ("pq_recall_sweep", 10),
        ("lsh_band_sweep", 10),
    ],
)
def test_fanout_frames_stay_pinned(spark, name, max_scans):
    """Multi-consumer frames must not re-inline their corpus-sized
    subtree into every consumer branch — the round-11 scan-count audit
    class (SCALE.md 'Two fan-out pins'). Counts FileScan nodes in the
    executed plan; a pin regression multiplies the count well past the
    bound."""
    plan = _plan(REGISTRY[name].fn(spark, SF))
    n = plan.count("Scan parquet")
    assert n <= max_scans, f"{name}: {n} parquet scans (bound {max_scans})"
