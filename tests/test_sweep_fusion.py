"""Round-12 sweep-scaffold refactor pins.

The recall sweeps were restructured for performance (operators split into
``*_scored`` + top-k window wrappers; ``_recall_sweep_union`` fuses a
family's arms through one shared window/join/agg when ``fuse=True`` and
keeps fully independent per-arm DAGs when ``fuse=False``). These tests pin
the invariant the oracle hash depends on: BOTH physical shapes produce
bit-identical sweep frames, and every scored form ranked through the shared
window reproduces its public top-k operator exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import similarity
from security_data_pipeline_spark.plans.queries import (
    _load_planted,
    _lsh_sweep_arms,
    _pqm_sweep_arms,
    _recall_sweep_union,
)
from security_data_pipeline_spark.sources.catalog import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "scored_fn, topk_fn, kwargs, score_col, desc",
    [
        (
            similarity.knn_bruteforce_scored,
            similarity.knn_bruteforce,
            {},
            "cosine_sim",
            True,
        ),
    ],
)
def test_bruteforce_scored_plus_window_equals_topk(
    spark, sf_smoke, scored_fn, topk_fn, kwargs, score_col, desc
):
    emb = load_table(spark, sf_smoke, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    scored = scored_fn(corpus=emb, queries=q, **kwargs)
    order = F.col(score_col).desc() if desc else F.col(score_col).asc()
    w = Window.partitionBy("query_id").orderBy(order, F.col("neighbor_id"))
    manual = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= 3)
        .drop("_r")
    )
    assert _rows(manual) == _rows(topk_fn(corpus=emb, queries=q, k=3, **kwargs))


def test_ann_scored_forms_match_topk(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    pred = F.col("vec_id") < 10
    cases = [
        (
            similarity.ann_ivf_scored(
                emb, n_centroids=8, n_probe=2, query_pred=pred
            ),
            similarity.ann_ivf_topk(
                emb, k=3, n_centroids=8, n_probe=2, query_pred=pred
            ),
            "cosine_sim",
            True,
        ),
        (
            similarity.ann_pq_adc_scored(
                emb, n_codewords=8, n_sub=4, query_pred=pred
            ),
            similarity.ann_pq_adc_topk(
                emb, k=3, n_codewords=8, n_sub=4, query_pred=pred
            ),
            "adc_dist",
            False,
        ),
        (
            similarity.ann_sq8_scored(emb, query_pred=pred),
            similarity.ann_sq8_topk(emb, k=3, query_pred=pred),
            "cosine_sim",
            True,
        ),
        (
            similarity.ann_lsh_scored(
                emb, n_planes=8, n_bands=4, seed=42, query_pred=pred, dim=64
            ),
            similarity.ann_lsh_topk(
                emb, k=3, n_planes=8, n_bands=4, seed=42,
                query_pred=pred, dim=64,
            ),
            "cosine_sim",
            True,
        ),
    ]
    for scored, topk, score_col, desc in cases:
        order = (
            F.col(score_col).desc() if desc else F.col(score_col).asc()
        )
        w = Window.partitionBy("query_id").orderBy(
            order, F.col("neighbor_id")
        )
        manual = (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= 3)
            .drop("_r")
        )
        assert _rows(manual) == _rows(topk)


@pytest.mark.parametrize(
    "arms_fn, param, score_col, desc",
    [
        (_lsh_sweep_arms, "n_planes", "cosine_sim", True),
        (_pqm_sweep_arms, "n_sub", "adc_dist", False),
    ],
)
def test_fused_and_per_arm_sweeps_bit_equal(
    spark, sf_smoke, arms_fn, param, score_col, desc
):
    """fuse=True and fuse=False are alternate PHYSICAL plans of the same
    sweep — the frames must match to the bit (mean_recall is a rounded
    double; tuple equality on collected rows compares exact values)."""
    k = 3
    pred = F.col("vec_id") < 10
    emb = _load_planted(spark, sf_smoke)
    exact = similarity.knn_bruteforce(
        corpus=emb, queries=emb.filter(pred), k=k
    ).select("query_id", "neighbor_id")
    fused = _recall_sweep_union(
        emb, exact, arms_fn(emb, pred, k), param, k,
        score_col=score_col, score_desc=desc, fuse=True,
    )
    per_arm = _recall_sweep_union(
        emb, exact, arms_fn(emb, pred, k), param, k,
        score_col=score_col, score_desc=desc, fuse=False,
    )
    assert fused.columns == per_arm.columns
    assert _rows(fused) == _rows(per_arm)
