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
