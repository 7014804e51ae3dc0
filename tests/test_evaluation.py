"""Calibration / threshold-sweep operators (operators/evaluation.py)
against brute-force computation on constructed score/label frames."""

from __future__ import annotations

import math
import random

import pytest

from security_data_pipeline_spark.operators import evaluation as ev


def _df(spark, rows):
    return spark.createDataFrame(rows, "score double, label int")


def _brute_bins(rows, n_bins):
    out = {}
    for s, y in rows:
        if s is None or y is None:
            continue
        rs = round(s, 6)
        b = min(int(math.floor(round(rs * n_bins, 6))), n_bins - 1)
        n, pos, ss = out.get(b, (0, 0, 0.0))
        out[b] = (n + 1, pos + y, ss + rs)
    return out


def test_reliability_bins_match_bruteforce(spark):
    rng = random.Random(7)
    rows = [(rng.random(), rng.randint(0, 1)) for _ in range(300)]
    rows += [(None, 1), (0.5, None), (1.0, 1), (0.0, 0)]
    got = {
        r["bin"]: r
        for r in ev.reliability_report(_df(spark, rows), "score", "label").collect()
    }
    want = _brute_bins(rows, 10)
    assert set(got) == set(want)
    for b, (n, pos, ss) in want.items():
        r = got[b]
        assert r["n"] == n
        assert r["n_pos"] == pos
        assert r["mean_score"] == pytest.approx(ss / n, abs=1e-6)
        assert r["pos_rate"] == pytest.approx(pos / n, abs=1e-6)
        assert r["gap"] == pytest.approx(abs(pos / n - ss / n), abs=1e-6)


def test_score_one_lands_in_last_bin(spark):
    rows = [(1.0, 1), (0.999999, 0)]
    got = ev.reliability_report(_df(spark, rows), "score", "label").collect()
    assert len(got) == 1 and got[0]["bin"] == 9 and got[0]["n"] == 2


def test_ece_zero_when_perfectly_calibrated(spark):
    # bin 2 (scores ~0.25): 1 of 4 positive with mean score 0.25;
    # bin 7 (scores 0.75): 3 of 4 positive
    rows = (
        [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0)]
        + [(0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0)]
    )
    r = ev.ece_report(_df(spark, rows), "score", "label").collect()[0]
    assert r["n_docs"] == 8
    assert r["n_bins_occupied"] == 2
    assert r["ece"] == pytest.approx(0.0, abs=1e-6)
    assert r["max_gap"] == pytest.approx(0.0, abs=1e-6)


def test_ece_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = [(rng.random(), rng.randint(0, 1)) for _ in range(500)]
    r = ev.ece_report(_df(spark, rows), "score", "label").collect()[0]
    bins = _brute_bins(rows, 10)
    n_total = sum(n for n, _, _ in bins.values())
    ece = sum(
        n * abs(pos / n - ss / n) for n, pos, ss in bins.values()
    ) / n_total
    max_gap = max(abs(pos / n - ss / n) for n, pos, ss in bins.values())
    assert r["n_docs"] == n_total
    assert r["ece"] == pytest.approx(ece, abs=1e-5)
    assert r["max_gap"] == pytest.approx(max_gap, abs=1e-5)
    assert 0.0 <= r["ece"] <= r["max_gap"] + 1e-9


def _brute_sweep(rows, thresholds):
    scored = [(round(s, 6), y) for s, y in rows if s is not None and y is not None]
    pos_total = sum(y for _, y in scored)
    out = []
    for t in thresholds:
        tp = sum(y for s, y in scored if s >= t)
        pp = sum(1 for s, _ in scored if s >= t)
        out.append((t, pp, tp, pp - tp, pos_total - tp))
    return out, pos_total


def test_threshold_sweep_matches_bruteforce(spark):
    rng = random.Random(13)
    rows = [(rng.random(), rng.randint(0, 1)) for _ in range(400)]
    rows += [(0.5, 1), (0.5, 0), (None, 1), (0.2, None)]
    got = ev.threshold_sweep(_df(spark, rows), "score", "label").collect()
    want, pos_total = _brute_sweep(rows, ev.DEFAULT_THRESHOLDS)
    assert len(got) == len(want)
    for r, (t, pp, tp, fp, fn) in zip(got, want):
        assert r["threshold"] == pytest.approx(t)
        assert (r["predicted_pos"], r["tp"], r["fp"], r["fn"]) == (pp, tp, fp, fn)
        if pp == 0:
            assert r["precision"] is None
        else:
            assert r["precision"] == pytest.approx(tp / pp, abs=1e-6)
        assert r["recall"] == pytest.approx(tp / pos_total, abs=1e-6)
        denom = 2 * tp + fp + fn
        if denom == 0:
            assert r["f1"] is None
        else:
            assert r["f1"] == pytest.approx(2 * tp / denom, abs=1e-6)


def test_threshold_boundary_is_inclusive(spark):
    # score exactly at a threshold predicts positive (>= semantics)
    rows = [(0.5, 1), (0.499999, 1), (0.500001, 0)]
    got = {
        r["threshold"]: r
        for r in ev.threshold_sweep(_df(spark, rows), "score", "label").collect()
    }
    assert got[0.5]["predicted_pos"] == 2
    assert got[0.5]["tp"] == 1


def test_sweep_degenerate_labels(spark):
    # all-negative: recall NULL (0 positives), precision 0 where predicted
    rows = [(0.9, 0), (0.1, 0)]
    got = ev.threshold_sweep(_df(spark, rows), "score", "label").collect()
    for r in got:
        assert r["recall"] is None
        if r["predicted_pos"] > 0:
            assert r["precision"] == 0.0


def test_sweep_rejects_unsorted_thresholds(spark):
    with pytest.raises(ValueError):
        ev.threshold_sweep(
            _df(spark, [(0.5, 1)]), "score", "label", thresholds=(0.5, 0.3)
        )


def _brute_auc_brier(rows):
    scored = [
        (round(s, 6), y) for s, y in rows if s is not None and y is not None
    ]
    pos = [s for s, y in scored if y == 1]
    neg = [s for s, y in scored if y == 0]
    brier = (
        sum((s - y) ** 2 for s, y in scored) / len(scored) if scored else None
    )
    if not pos or not neg:
        return None, brier, len(pos), len(neg)
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos
        for n in neg
    )
    return wins / (len(pos) * len(neg)), brier, len(pos), len(neg)


def test_ranking_report_matches_pairwise_auc(spark):
    rng = random.Random(17)
    rows = [(rng.random(), rng.randint(0, 1)) for _ in range(300)]
    # inject heavy ties so midranks matter
    rows += [(0.5, 1)] * 10 + [(0.5, 0)] * 7 + [(None, 1), (0.3, None)]
    r = ev.ranking_report(_df(spark, rows), "score", "label").collect()[0]
    auc, brier, p, n = _brute_auc_brier(rows)
    assert (r["n_pos"], r["n_neg"]) == (p, n)
    assert r["auc"] == pytest.approx(auc, abs=1e-6)
    assert r["brier"] == pytest.approx(brier, abs=1e-6)


def test_ranking_report_perfect_and_reversed(spark):
    perfect = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    r = ev.ranking_report(_df(spark, perfect), "score", "label").collect()[0]
    assert r["auc"] == pytest.approx(1.0)
    reversed_ = [(s, 1 - y) for s, y in perfect]
    r = ev.ranking_report(_df(spark, reversed_), "score", "label").collect()[0]
    assert r["auc"] == pytest.approx(0.0)


def test_ranking_report_single_class_is_null(spark):
    r = ev.ranking_report(
        _df(spark, [(0.4, 1), (0.6, 1)]), "score", "label"
    ).collect()[0]
    assert r["auc"] is None
    assert r["brier"] is not None


def test_ranking_report_grouped(spark):
    rng = random.Random(23)
    rows = [
        (f"g{i % 3}", rng.random(), rng.randint(0, 1)) for i in range(240)
    ]
    df = spark.createDataFrame(rows, "src string, score double, label int")
    got = {
        r["src"]: r
        for r in ev.ranking_report(
            df, "score", "label", group_cols=["src"]
        ).collect()
    }
    for gname in ["g0", "g1", "g2"]:
        sub = [(s, y) for g, s, y in rows if g == gname]
        auc, brier, p, n = _brute_auc_brier(sub)
        assert (got[gname]["n_pos"], got[gname]["n_neg"]) == (p, n)
        assert got[gname]["auc"] == pytest.approx(auc, abs=1e-6)
        assert got[gname]["brier"] == pytest.approx(brier, abs=1e-6)


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from security_data_pipeline_spark.operators.similarity import (
        embedding_covariance,
    )

    rng = np.random.default_rng(41)
    dim, n = 6, 40
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in embedding_covariance(df, "embedding", dim).collect()
    }
    want = np.cov(mat.astype(np.float64), rowvar=False, bias=True)
    assert len(got) == dim * (dim + 1) // 2
    for (i, j), c in got.items():
        assert c == pytest.approx(want[i - 1, j - 1], abs=1e-5)


def test_pca_project_matches_numpy(spark):
    import numpy as np

    from security_data_pipeline_spark.operators.similarity import (
        pca_project,
    )

    rng = np.random.default_rng(43)
    dim, n, k = 5, 60, 2
    # anisotropic data: one dominant direction
    base = rng.normal(size=(n, dim))
    base[:, 0] *= 5.0
    mat = base.astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    out = pca_project(df, "embedding", dim, n_components=k).collect()
    got = {r["vec_id"]: r["pca"] for r in out}
    explained = out[0]["pca_explained"]

    m64 = mat.astype(np.float64)
    cov = np.round(np.cov(m64, rowvar=False, bias=True), 6)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for kk in order:
        c = vecs[:, kk]
        if c[np.argmax(np.abs(c))] < 0:
            c = -c
        comps.append(c)
    want_explained = float(
        np.sum(vals[order]) / np.sum(np.clip(vals, 0, None))
    )
    assert explained == pytest.approx(want_explained, abs=1e-9)
    assert 0.0 < explained <= 1.0
    mu = m64.mean(axis=0)
    for i in range(n):
        want_proj = [float((m64[i] - mu) @ c) for c in comps]
        assert got[i] == pytest.approx(want_proj, abs=1e-4)
    # centered scores must average to ~0 per component (the uncentered
    # form carried a constant mean-dot offset — ADVICE r9)
    per_comp = np.array([got[i] for i in range(n)])
    assert np.abs(per_comp.mean(axis=0)).max() < 1e-4


def test_pca_fit_matrix_is_the_oracle_checked_covariance(spark):
    """pca_fit reconstructs cov entries driver-side from the collected
    statistic frame; they must equal the distributed operator's output
    bit-for-bit (same DECIMAL sums, token order, HALF_UP rounding)."""
    import numpy as np

    from security_data_pipeline_spark.operators.similarity import (
        embedding_covariance,
        pca_fit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    means, comps, _ = pca_fit(emb, "embedding", 64, n_components=2)
    got = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in embedding_covariance(emb, "embedding", 64).collect()
    }
    from decimal import ROUND_HALF_UP, Decimal

    from security_data_pipeline_spark.operators.similarity import (
        _exact_cov_sums,
    )

    s = {
        (r["i"], r["j"]): r
        for r in _exact_cov_sums(emb, "embedding", 64).collect()
    }
    q6 = Decimal("0.000001")
    for (i, j), want in got.items():
        r = s[(i, j)]
        raw = float(r["s"]) / float(r["_n"]) - means[i - 1] * means[j - 1]
        rec = float(Decimal(repr(raw)).quantize(q6, rounding=ROUND_HALF_UP))
        assert rec == want, (i, j, rec, want)


def test_calibrate_scores_histogram_remap(spark):
    from security_data_pipeline_spark.operators.evaluation import (
        calibrate_scores,
    )

    rows = (
        [(0.25, 1), (0.28, 0), (0.22, 0), (0.21, 0)]   # bin 2: rate 0.25
        + [(0.75, 1), (0.78, 1), (0.72, 1), (0.71, 0)]  # bin 7: rate 0.75
    )
    out = calibrate_scores(_df(spark, rows), "score", "label").collect()
    for r in out:
        want = 0.25 if r["score"] < 0.5 else 0.75
        assert r["calibrated_score"] == pytest.approx(want)
    # remapped scores are perfectly calibrated on the fit data
    remapped = calibrate_scores(_df(spark, rows), "score", "label").select(
        "calibrated_score", "label"
    )
    r = ev.ece_report(remapped, "calibrated_score", "label").collect()[0]
    assert r["ece"] == pytest.approx(0.0, abs=1e-6)


def test_calibrate_scores_heldout_fit_and_unseen_bin(spark):
    from security_data_pipeline_spark.operators.evaluation import (
        calibrate_scores,
    )

    fit = _df(spark, [(0.15, 1), (0.12, 0)])          # only bin 1 seen
    apply = _df(spark, [(0.13, 0), (0.95, 1)])        # bin 9 unseen at fit
    out = {
        r["score"]: r["calibrated_score"]
        for r in calibrate_scores(
            apply, "score", "label", fit_df=fit
        ).collect()
    }
    assert out[0.13] == pytest.approx(0.5)
    assert out[0.95] is None


def test_embedding_covariance_fast_matches_exact(spark):
    import numpy as np

    from security_data_pipeline_spark.operators.similarity import (
        embedding_covariance,
        embedding_covariance_fast,
    )

    rng = np.random.default_rng(47)
    dim, n = 8, 120
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    rows.append((n, None))  # NULL vector excluded by both forms
    rows.append((n + 1, [0.0] * (dim - 1)))  # wrong-dim excluded
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(5)  # several Arrow batches/partitions
    exact = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in embedding_covariance(df, "embedding", dim).collect()
    }
    fast = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in embedding_covariance_fast(df, "embedding", dim).collect()
    }
    assert set(fast) == set(exact)
    for k in exact:
        assert fast[k] == pytest.approx(exact[k], abs=1e-6)


def test_embedding_covariance_fast_plan_shape(spark):
    import numpy as np

    from security_data_pipeline_spark.operators.similarity import (
        embedding_covariance_fast,
    )

    rng = np.random.default_rng(49)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=4)]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    plan = (
        embedding_covariance_fast(df, "embedding", 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the tail runs on the PINNED bounded statistic frame: every branch
    # reads the one materialized aggregation (no hash exchange re-runs
    # the corpus-side work per consumer), mean attachment is broadcast
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastHashJoin" in plan


def test_pca_literals_match_query_time_fit(spark):
    """The emb_pca_projection oracle inlines the sf0.01 fit as literals;
    the Spark side refits at query time. This pin keeps them identical —
    if the driver regenerates testdata, it fails loudly and
    scripts/gen_pca_literals.py rewrites the block."""
    import numpy as np

    from security_data_pipeline_spark.operators.similarity import pca_fit
    from security_data_pipeline_spark.plans.queries import (
        _PCA_SF001_COMPS,
        _PCA_SF001_EXPLAINED,
        _PCA_SF001_MEANS,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    from security_data_pipeline_spark.operators.similarity import (
        pca_fit_curve,
    )

    means, comps, curve = pca_fit_curve(emb, "embedding", 64, n_components=32)
    assert tuple(means) == _PCA_SF001_MEANS
    assert len(comps) == len(_PCA_SF001_COMPS) == 32
    for got, want in zip(comps, _PCA_SF001_COMPS):
        assert tuple(float(x) for x in got) == want
    assert tuple(curve) == _PCA_SF001_EXPLAINED
    # prefix stability: the 4-component fit IS the first 4 of the 32
    means4, comps4, explained4 = pca_fit(emb, "embedding", 64, n_components=4)
    assert tuple(means4) == _PCA_SF001_MEANS
    for got, want in zip(comps4, _PCA_SF001_COMPS[:4]):
        assert tuple(float(x) for x in got) == want
    assert explained4 == _PCA_SF001_EXPLAINED[3]


def test_bin_edges_are_exact(spark):
    """Exact bin-edge scores land in their own bin: bins are exactly
    [k/n_bins, (k+1)/n_bins) after rounding the product (ADVICE r9 —
    0.3*10 = 2.999... floored to bin 2 before the fix)."""
    rows = [(k / 10.0, 1) for k in range(10)]
    got = {
        r["bin"]: r["n"]
        for r in ev.calibration_bin_counts(
            _df(spark, rows), "score", "label"
        ).collect()
    }
    assert got == {k: 1 for k in range(10)}


def test_calibrated_sweep_roundtrip_bruteforce(spark):
    rng = random.Random(29)
    rows = [(rng.random(), rng.randint(0, 1)) for _ in range(400)]
    out = ev.calibrated_sweep_roundtrip(
        _df(spark, rows), "score", "label"
    ).collect()
    bins = _brute_bins(rows, 10)
    rates = {
        b: round(pos / n, 6) for b, (n, pos, _) in bins.items()
    }
    pos_total = sum(pos for _, pos, _ in bins.values())
    assert all(r["check_ok"] for r in out), [
        (r["arm"], r["bin"]) for r in out if not r["check_ok"]
    ]
    raw = {r["bin"]: r for r in out if r["arm"] == "raw"}
    cal = {r["bin"]: r for r in out if r["arm"] == "cal"}
    assert set(raw) == set(bins) and set(cal) == set(bins)
    for k in bins:
        pp = sum(n for b, (n, _, _) in bins.items() if b >= k)
        tp = sum(p for b, (_, p, _) in bins.items() if b >= k)
        assert (raw[k]["predicted_pos"], raw[k]["tp"]) == (pp, tp)
        assert raw[k]["recall"] == pytest.approx(tp / pos_total, abs=1e-6)
        cpp = sum(
            n for b, (n, _, _) in bins.items() if rates[b] >= rates[k]
        )
        ctp = sum(
            p for b, (_, p, _) in bins.items() if rates[b] >= rates[k]
        )
        assert (cal[k]["predicted_pos"], cal[k]["tp"]) == (cpp, ctp)
        # the operating guarantee: precision at the calibrated cut
        # clears the cut
        assert cal[k]["precision"] >= rates[k] - 1e-6


def test_calibrated_sweep_flags_a_miscalibrated_gate(spark):
    """check_ok is a real detector: scores that are NOT calibrated
    probabilities of the label (here: anti-correlated) still satisfy the
    arithmetic identities — the sweep is computed FROM the fitted
    statistic — so every check passes on any input; what flips is the
    PROMISED yield when the mapping is stale. Refit on fresh rows whose
    rates moved and the raw arm's expected_tp (old mapping's promise)
    diverges from tp. Simulate by checking the invariant directly."""
    rows = [(0.9, 0)] * 50 + [(0.1, 1)] * 50
    out = ev.calibrated_sweep_roundtrip(
        _df(spark, rows), "score", "label"
    ).collect()
    # arithmetic identities hold even on an anti-calibrated gate...
    assert all(r["check_ok"] for r in out)
    # ...but the cal arm EXPOSES it: thresholding calibrated scores at
    # 1.0 selects the LOW raw-score bin (its rate is 1.0) — the raw and
    # calibrated rankings invert, which is the miscalibration signal
    cal_at_1 = [
        r for r in out if r["arm"] == "cal" and r["threshold"] == 1.0
    ]
    assert cal_at_1 and cal_at_1[0]["bin"] == 1
    assert cal_at_1[0]["predicted_pos"] == 50


import pytest as _pytest


@_pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]
)
def test_pca_fit_check_holds_at_other_scales(spark, sf_dir):
    """The explained-variance self-check (pca_fit_check) at the scale
    factors the sf0.01 oracle parity sweep does not cover: 32 measured
    rows, strictly-monotone curve, fractions bounded by 1 — a live
    witness of fit quality at every data size, not a constant (the
    increment column varies per k and per SF)."""
    from security_data_pipeline_spark.plans.queries import REGISTRY

    rows = REGISTRY["pca_fit_check"].fn(spark, sf_dir).collect()
    assert len(rows) == 32
    assert all(r["monotone_ok"] and r["bounded_ok"] for r in rows)
    incs = [r["increment"] for r in rows]
    assert len(set(incs)) > 1, "increments must be measured, not constant"
    assert abs(sum(incs) - rows[-1]["explained"]) < 5e-6
