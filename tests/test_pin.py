"""Pin-strategy knob (security_data_pipeline_spark/pin.py): the same pin
sites must run under all three mechanisms — localCheckpoint (local
default), replayable persist(DISK_ONLY) (cluster default), reliable
checkpoint (driver-loss survival) — with identical results, and the knob
must fail loudly on misconfiguration."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from security_data_pipeline_spark.pin import PIN_MODE_CONF, pin, pin_lazy


@contextlib.contextmanager
def _mode(spark, mode):
    old = spark.conf.get(PIN_MODE_CONF, "local")
    spark.conf.set(PIN_MODE_CONF, mode)
    try:
        yield
    finally:
        spark.conf.set(PIN_MODE_CONF, old)


def test_default_mode_is_local_checkpoint(spark):
    df = spark.range(10).transform(pin)
    assert df.count() == 10
    # localCheckpoint truncates lineage: the plan is a scan, not a Range
    assert "Scan ExistingRDD" in df._jdf.queryExecution().executedPlan().toString()


def test_persist_mode_keeps_lineage_and_materializes(spark):
    with _mode(spark, "persist"):
        df = spark.range(10).withColumn("x", F.col("id") * 2).transform(pin)
        assert df.storageLevel.useDisk and not df.storageLevel.useMemory
        assert df.count() == 10
        lazy = spark.range(5).transform(pin_lazy)
        assert lazy.storageLevel.useDisk
        assert lazy.count() == 5
    df.unpersist()
    lazy.unpersist()


def test_reliable_mode_requires_checkpoint_dir(spark):
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    with _mode(spark, "reliable"):
        with pytest.raises(ValueError, match="setCheckpointDir"):
            spark.range(3).transform(pin)


def test_reliable_mode_checkpoints_when_dir_set(spark, tmp_path):
    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        with _mode(spark, "reliable"):
            df = spark.range(7).transform(pin)
            assert df.count() == 7
    finally:
        # other tests assert no checkpoint dir is set ($-named Scala setter)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.empty()
        )
    assert sc.getCheckpointDir() is None


def test_unknown_mode_raises(spark):
    with _mode(spark, "turbo"):
        with pytest.raises(ValueError, match="pinMode"):
            spark.range(3).transform(pin)


def test_pinned_operator_equal_across_modes(spark):
    """An operator whose loop depends on pinning (connected components'
    per-iteration checkpoint) must produce identical labels under every
    mode — the knob changes fault tolerance, never semantics."""
    from security_data_pipeline_spark.operators import dedup

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20)], ["doc_id"]
    )

    def labels():
        return {
            tuple(r) for r in dedup.connected_components(edges, nodes).collect()
        }

    base = labels()
    with _mode(spark, "persist"):
        assert labels() == base
