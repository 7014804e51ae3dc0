"""End-to-end pass over the pin-using queries under pinMode=persist
(security_data_pipeline_spark/pin.py): the cluster-safe mechanism
(persist DISK_ONLY — replayable lineage, InMemoryRelation barrier) must
produce results identical to the localCheckpoint default on the REAL
registered queries, not just on unit-sized frames, and the plan shapes
the pins exist to protect must hold across the InMemoryRelation barrier
(e.g. an InMemoryRelation blocking a pushdown the localCheckpoint
barrier allowed would only surface here, on a real cluster run)."""

from __future__ import annotations

import contextlib

import pytest

from security_data_pipeline_spark.pin import PIN_MODE_CONF
from security_data_pipeline_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# every registered query whose plan routes through pin()/pin_lazy() —
# directly (the curation funnel's rep_keep frame, the incremental
# labeler's shared edge frame) or through a pinned operator (drift's
# unioned sides, connected components' per-iteration loop state,
# SemDeDup's pinned centroid assignment)
PIN_QUERIES = (
    "corpus_curation",
    "doc_curation_audit",
    "neardup_clusters",
    "neardup_clusters_incremental",
    "events_value_drift",
    "events_drift_trend",
    "semantic_dedup",
    "doc_leakage_safe_split",
    # graph family: canonical-edge/oriented/adjacency frames and the
    # per-iteration PageRank rank frame all route through pin_lazy
    "token_graph_triangles",
    "token_graph_summary",
    "token_graph_pagerank",
    "token_graph_link_prediction",
)


@contextlib.contextmanager
def _persist_mode(spark):
    old = spark.conf.get(PIN_MODE_CONF, "local")
    spark.conf.set(PIN_MODE_CONF, "persist")
    try:
        yield
    finally:
        spark.conf.set(PIN_MODE_CONF, old)
        # drop the DISK_ONLY blocks the persist-mode pins accumulated —
        # later tests must not inherit a warm cache or leak executor disk
        spark.catalog.clearCache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", PIN_QUERIES)
def test_pin_query_identical_under_persist(spark, name):
    fn = REGISTRY[name].fn
    base = _rows(fn(spark, SF))
    with _persist_mode(spark):
        assert _rows(fn(spark, SF)) == base


def test_funnel_barrier_is_inmemory_relation_under_persist(spark):
    """The curation funnel's rep_keep pin exists to stop
    PushDownPredicate from re-inlining the gram-chain bindings (the
    measured 23 s / O(L^2) regression, SCALE.md). Under persist mode the
    barrier is the InMemoryRelation, not a checkpointed RDD scan — it
    must actually appear in the executed plan (i.e. the pin is not
    silently skipped), and the localCheckpoint scan must not."""
    with _persist_mode(spark):
        plan = (
            REGISTRY["corpus_curation"]
            .fn(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    assert "InMemoryTableScan" in plan, plan[:2000]


def test_drift_plan_shape_survives_persist_barrier(spark):
    """The drift plan's pinned union must keep its local-mode shape
    across the InMemoryRelation: the KS window still consumes the
    bounded-cell aggregate (grid constant in the plan), and the barrier
    does not introduce a fact-sized cartesian or extra shuffle family."""
    with _persist_mode(spark):
        plan = (
            REGISTRY["events_value_drift"]
            .fn(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    assert "Window" in plan
    assert "4096" in plan.replace("\n", " ")
    assert "CartesianProduct" not in plan
