"""Nonzero-witness guards: window slots whose 0 = 0 row match proved only
schema agreement for multiple rounds now must return rows that exercise the
exclusion/check logic (VERDICT r9 "What's wrong #3")."""

from __future__ import annotations

from pyspark.sql import functions as F

from security_data_pipeline_spark.plans.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.01"


def test_customers_without_orders_excludes_someone(spark):
    """The date-sliced anti-join must both return rows (customers lapsed
    before the cutoff) and exclude rows (customers active after it) —
    otherwise the witness degenerates to an identity or empty scan."""
    got = REGISTRY["customers_without_orders"].fn(spark, SF_DIR)
    n_lapsed = got.count()
    n_customers = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    )
    assert 0 < n_lapsed < n_customers


def test_sketch_checks_witness_rows_nonzero_and_healthy(spark):
    df = REGISTRY["sketch_checks"].fn(spark, SF_DIR).cache()
    try:
        ok = df.filter(F.col("metric") == "bound_ok")
        assert ok.count() >= 9, "indicator rows missing"
        assert ok.filter(F.col("value") != 1.0).count() == 0, (
            "a sketch bound is violated"
        )
        exact = df.filter(F.col("metric") == "exact_users")
        assert exact.count() > 0
        assert exact.filter(F.col("value") <= 0).count() == 0
        # violation arms stay empty when every bound holds
        assert (
            df.filter(F.col("metric").isin("rel_err", "approx_value")).count()
            == 0
        )
    finally:
        df.unpersist()
