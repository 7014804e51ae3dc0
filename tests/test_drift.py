"""PSI/KS drift detection: identical slices score ~0, shifted slices score
high, reference-range clamping and per-group independence hold."""

from __future__ import annotations

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators.drift import value_drift


def _mk(spark, rows):
    return spark.createDataFrame(rows, "grp string, v double")


def _drift(spark, ref_rows, cur_rows, n_bins=10):
    out = value_drift(
        _mk(spark, ref_rows), _mk(spark, cur_rows), "v", ["grp"], n_bins
    )
    return {r["grp"]: r.asDict() for r in out.collect()}


def test_identical_distributions_score_zero(spark):
    rows = [("a", float(i % 100)) for i in range(2000)]
    d = _drift(spark, rows, rows)
    assert d["a"]["psi"] == 0.0
    assert d["a"]["ks"] == 0.0
    assert d["a"]["n_ref"] == d["a"]["n_cur"] == 2000


def test_shifted_distribution_detected(spark):
    ref = [("a", float(i % 100)) for i in range(2000)]
    cur = [("a", float(i % 100) + 80.0) for i in range(2000)]  # big shift
    d = _drift(spark, ref, cur)
    assert d["a"]["psi"] > 0.25, d  # the standard "drifted" threshold
    assert d["a"]["ks"] > 0.5, d


def test_out_of_range_mass_clamps_to_edge_bins(spark):
    ref = [("a", float(i)) for i in range(100)]
    cur = [("a", 1e6)] * 100  # entirely above the reference range
    d = _drift(spark, ref, cur)
    assert d["a"]["psi"] > 1.0
    assert d["a"]["ks"] == 1.0  # ECDFs never overlap


def test_groups_independent_and_one_sided_groups_dropped(spark):
    ref = [("a", float(i % 10)) for i in range(500)] + [
        ("only_ref", 1.0)
    ] * 10
    cur = [("a", float(i % 10)) for i in range(500)] + [
        ("only_cur", 2.0)
    ] * 10
    d = _drift(spark, ref, cur)
    assert set(d) == {"a"}
    assert d["a"]["psi"] == 0.0 and d["a"]["ks"] == 0.0


def test_constant_reference_range(spark):
    # mx == mn on the reference: everything lands in bin 0; KS still works
    ref = [("a", 5.0)] * 100
    cur = [("a", 5.0)] * 50 + [("a", 9.0)] * 50
    d = _drift(spark, ref, cur)
    assert d["a"]["ks"] == 0.5
    assert d["a"]["psi"] == 0.0  # one shared bin -> same share both sides


def test_ks_grid_bounds_ecdf_input_at_high_cardinality(spark):
    """A continuous metric (distinct ~ row count) must NOT feed the KS
    window one row per distinct value — the grid caps it at grid+2 rows
    per group, the property that keeps one group from serializing into a
    single giant task at 100x."""
    from security_data_pipeline_spark.operators.drift import _ks_value_frame

    n = 50_000
    rows = [("a", i * 0.0001) for i in range(n)]  # all-distinct values
    ref = _mk(spark, rows)
    cur = _mk(spark, [("a", 1.0 + i * 0.0001) for i in range(n)])
    g = ["grp"]
    sides = ref.selectExpr("grp", "v AS _v", "'r' AS _side").unionByName(
        cur.selectExpr("grp", "v AS _v", "'c' AS _side")
    )
    stats = (
        sides.filter(F.col("_side") == "r")
        .groupBy("grp")
        .agg(F.min("_v").alias("_mn"), F.max("_v").alias("_mx"))
    )
    both = sides.join(stats, g)
    grid = 512
    bounded = _ks_value_frame(both, g, grid)
    assert bounded.count() <= grid + 2  # vs 100k rows for the exact ECDF
    exact = _ks_value_frame(both, g, None)
    assert exact.count() > 100 * (grid + 2)  # sanity: truly high-cardinality


def test_ks_grid_tracks_exact_ks_within_cell_resolution(spark):
    """Grid KS is a lower bound on exact KS with error <= max in-range
    cell mass; on a smooth shifted distribution 4096 cells are far finer
    than the true gap."""
    import random

    rng = random.Random(7)
    ref = [("a", rng.gauss(0.0, 1.0)) for _ in range(4000)]
    cur = [("a", rng.gauss(0.6, 1.0)) for _ in range(4000)]
    d_grid = _drift(spark, ref, cur)  # default ks_grid=4096
    out_exact = value_drift(
        _mk(spark, ref), _mk(spark, cur), "v", ["grp"], 10, ks_grid=None
    )
    exact = {r["grp"]: r.asDict() for r in out_exact.collect()}
    kg, ke = d_grid["a"]["ks"], exact["a"]["ks"]
    assert kg <= ke + 1e-9
    assert ke - kg < 0.02, (kg, ke)  # shift of 0.6 sigma -> KS ~ 0.23
    assert kg > 0.15
    # PSI identical: the grid only touches the KS branch
    assert d_grid["a"]["psi"] == exact["a"]["psi"]


def test_drift_trend_pairs_equal_pairwise_value_drift(spark):
    """Each bucket's trend PSI must equal value_drift on that (prev, cur)
    slice pair — the one-pass trend is a re-arrangement, not a new
    statistic; and an injected shift bucket is flagged."""
    import random

    from security_data_pipeline_spark.operators.drift import (
        drift_trend,
        value_drift,
    )

    rng = random.Random(9)
    rows = []
    step = 3600  # one bucket = 1h here
    for b in range(4):
        mean = 10.0 if b != 2 else 30.0  # bucket 2 drifts vs bucket 1
        for i in range(300):
            ts = b * step + rng.randrange(step)
            rows.append(("a", ts, rng.gauss(mean, 2.0)))
    df = spark.createDataFrame(
        rows, "grp string, sec long, v double"
    ).select(
        "grp", F.timestamp_seconds(F.col("sec")).alias("ts"), "v"
    )
    trend = {
        r["bucket"]: (r["n_ref"], r["n_cur"], r["psi"])
        for r in drift_trend(
            df, "ts", "v", ["grp"], bucket_seconds=step
        ).collect()
    }
    assert sorted(trend) == [1, 2, 3]
    for b in (1, 2, 3):
        ref = df.filter(
            F.floor(F.unix_micros("ts") / (step * 1_000_000)) == b - 1
        )
        cur = df.filter(
            F.floor(F.unix_micros("ts") / (step * 1_000_000)) == b
        )
        pair = value_drift(ref, cur, "v", ["grp"]).first()
        assert trend[b] == (pair["n_ref"], pair["n_cur"], pair["psi"]), b
    assert trend[2][2] > 0.25  # the injected shift crosses the thumb-rule
    assert trend[1][2] < 0.1 and trend[3][2] > 0.25  # and the recovery too
