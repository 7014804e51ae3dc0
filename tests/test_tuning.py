"""Operating-point pickers (operators/tuning.py) and the planted
embedding fixture (sources/synthetic.py): decision semantics on hand-
built frames, cross-engine bit-parity of the planted construction, and
the scale-stability pin the banding picker's theory gate exists for."""

from __future__ import annotations

import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators.tuning import (
    banding_operating_point,
    banding_threshold_powers,
    recall_operating_point,
)
from security_data_pipeline_spark.plans.queries import REGISTRY
from security_data_pipeline_spark.sources.synthetic import (
    planted_embeddings,
    planted_embeddings_sql,
)


# ---------------------------------------------------------------------------
# planted fixture
# ---------------------------------------------------------------------------


def test_planted_embeddings_bit_parity(spark, sf_smoke):
    """The construction must come out of Spark Column algebra and DuckDB
    SQL bit-for-bit — every planted sweep's oracle check rests on it."""
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    got = {
        r["vec_id"]: (r["embedding"], r["label"])
        for r in planted_embeddings(emb).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_smoke}/embeddings.parquet'"
    )
    exp = con.sql(
        f"SELECT vec_id, embedding, label FROM {planted_embeddings_sql()}"
    ).fetchall()
    con.close()
    assert len(exp) == len(got) > 0
    for vec_id, vec, label in exp:
        gvec, glabel = got[vec_id]
        assert glabel == label == vec_id % 8
        assert len(gvec) == len(vec) == 64
        for a, b in zip(gvec, vec):
            assert struct.pack("<d", a) == struct.pack("<d", b), (
                vec_id,
                a,
                b,
            )


def test_planted_corpus_is_discriminating(spark, sf_smoke):
    """The fixture's reason to exist: clear within/cross cluster cosine
    contrast (the real testdata is near-isotropic and shows none)."""
    from security_data_pipeline_spark.operators.similarity import (
        knn_bruteforce,
    )

    emb = planted_embeddings(
        spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    )
    top = knn_bruteforce(
        corpus=emb, queries=emb.filter(F.col("vec_id") < 40), k=3
    )
    same = top.select(
        F.avg(
            (
                (F.col("query_id") % 8) == (F.col("neighbor_id") % 8)
            ).cast("double")
        ).alias("rate")
    ).collect()[0]["rate"]
    assert same > 0.9, same


# ---------------------------------------------------------------------------
# recall_operating_point decision semantics (hand-built frames)
# ---------------------------------------------------------------------------


def _frame(spark, rows):
    return spark.createDataFrame(
        rows,
        "family string, param_name string, param_value int, "
        "bytes_per_vec double, mean_recall double",
    )


def test_recall_op_picks_max_recall_within_budget(spark):
    rows = [
        ("pq", "n_sub", 2, 1.0, 0.4),
        ("pq", "n_sub", 4, 2.0, 0.7),
        ("pq", "n_sub", 8, 4.0, 0.9),   # best within budget
        ("pq", "n_sub", 16, 32.0, 0.99),  # better but over budget
    ]
    out = recall_operating_point(
        _frame(spark, rows), byte_budget=8.0, target_recall=0.95
    ).collect()
    chosen = [r for r in out if r["chosen"]]
    assert len(chosen) == 1
    assert chosen[0]["param_value"] == 8
    assert chosen[0]["deployed"]
    assert all(
        not r["within_budget"] for r in out if r["param_value"] == 16
    )


def test_recall_op_ties_break_to_fewer_bytes(spark):
    rows = [
        ("lsh", "n_planes", 8, 1.0, 0.9),
        ("lsh", "n_planes", 16, 2.0, 0.9),  # same recall, more bytes
    ]
    out = recall_operating_point(
        _frame(spark, rows), byte_budget=8.0, target_recall=0.95
    ).collect()
    chosen = [r for r in out if r["chosen"]]
    assert [c["param_value"] for c in chosen] == [8]


def test_recall_op_family_with_no_fit_has_no_chosen_row(spark):
    rows = [
        ("sq", "bits", 4, 32.0, 0.9),
        ("sq", "bits", 8, 64.0, 0.95),
        ("lsh", "n_planes", 8, 1.0, 0.5),
    ]
    out = recall_operating_point(
        _frame(spark, rows), byte_budget=8.0, target_recall=0.95
    ).collect()
    assert not any(r["chosen"] for r in out if r["family"] == "sq")
    # the deployed row falls to the only in-budget family
    dep = [r for r in out if r["deployed"]]
    assert [d["family"] for d in dep] == ["lsh"]


def test_recall_op_ivf_min_probe_meeting_target(spark):
    rows = [
        ("ivf", "n_probe", 1, 256.0, 0.80),
        ("ivf", "n_probe", 2, 256.0, 0.96),  # cheapest meeting target
        ("ivf", "n_probe", 4, 256.0, 0.99),
    ]
    out = recall_operating_point(
        _frame(spark, rows), byte_budget=8.0, target_recall=0.95
    ).collect()
    chosen = [r for r in out if r["chosen"]]
    assert [(c["family"], c["param_value"]) for c in chosen] == [("ivf", 2)]
    assert not any(r["deployed"] for r in out)  # ivf never deploys


def test_recall_op_ivf_fallback_is_max_recall(spark):
    rows = [
        ("ivf", "n_probe", 1, 256.0, 0.60),
        ("ivf", "n_probe", 4, 256.0, 0.85),
    ]
    out = recall_operating_point(
        _frame(spark, rows), byte_budget=8.0, target_recall=0.95
    ).collect()
    chosen = [r for r in out if r["chosen"]]
    assert [(c["param_value"], c["mean_recall"]) for c in chosen] == [
        (4, 0.85)
    ]


# ---------------------------------------------------------------------------
# banding picker: theory gate + scale stability
# ---------------------------------------------------------------------------


def test_banding_threshold_powers_are_plain_python_pow():
    tpow = banding_threshold_powers(0.3, (1, 2, 4, 8))
    assert tpow == {1: 0.3, 2: 0.3**2, 4: 0.3**4, 8: 0.3**8}


def test_banding_theory_gate(spark):
    # t=0.3: eligible bandings need t^r * b >= 1 — (16,2): 0.09*16=1.44
    # ok; (32,1): 0.3*32=9.6 ok; (8,4): 0.0081*8 no; (4,8): no
    rows = [
        (4, 8, 100, 100, 1.0, 1.0),
        (8, 4, 100, 100, 1.0, 1.0),
        (16, 2, 120, 100, 1.0, 0.8),
        (32, 1, 9000, 100, 1.0, 0.01),  # theory-ok but over budget
    ]
    frame = spark.createDataFrame(
        rows,
        "n_bands int, rows_per_band int, n_candidates long, "
        "n_truth long, recall double, precision double",
    )
    out = banding_operating_point(
        frame, candidate_ratio=3.0, jaccard_threshold=0.3
    ).collect()
    by_band = {r["n_bands"]: r for r in out}
    assert not by_band[4]["theory_ok"]
    assert not by_band[8]["theory_ok"]
    assert by_band[16]["theory_ok"] and by_band[16]["chosen"]
    assert by_band[32]["theory_ok"] and not by_band[32]["within_budget"]


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_banding_pick_stable_across_sfs(spark, sf_dir):
    """The round-11 verdict's ask: the deployed banding must not flip
    with corpus size. The theory gate guarantees it — measured-recall
    ties that flip between sf0.001/sf0.01/sf0.1 sit on arms the gate
    already excluded. sf0.1 is pinned through the DuckDB oracle below
    (the Spark leg at sf0.1 belongs to bench, not the test suite)."""
    got = REGISTRY["lsh_banding_pick"].fn(spark, sf_dir)
    chosen = [r for r in got.collect() if r["chosen"]]
    assert [(c["n_bands"], c["rows_per_band"]) for c in chosen] == [(16, 2)]
    assert chosen[0]["recall"] == 1.0  # the theory-gate witness


def test_banding_pick_stable_at_sf01_oracle():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        "SELECT * FROM '/root/testdata/sf0.1/documents.parquet'"
    )
    df = con.sql(REGISTRY["lsh_banding_pick"].sql).df()
    con.close()
    ch = df[df.chosen]
    assert list(zip(ch.n_bands, ch.rows_per_band)) == [(16, 2)]


# ---------------------------------------------------------------------------
# ann_operating_point: the chosen rows provably dominate the frame
# ---------------------------------------------------------------------------


def test_ann_operating_point_dominates_its_frame(spark, sf_smoke):
    rows = REGISTRY["ann_operating_point"].fn(spark, sf_smoke).collect()
    assert len(rows) == 21
    by_family: dict[str, list] = {}
    for r in rows:
        by_family.setdefault(r["family"], []).append(r)
    budget = rows[0]["byte_budget"]
    target = rows[0]["target_recall"]
    for fam, frows in by_family.items():
        chosen = [r for r in frows if r["chosen"]]
        if fam == "ivf":
            assert len(chosen) == 1
            meeting = [r for r in frows if r["mean_recall"] >= target]
            if meeting:
                assert chosen[0]["param_value"] == min(
                    r["param_value"] for r in meeting
                )
            else:
                assert chosen[0]["mean_recall"] == max(
                    r["mean_recall"] for r in frows
                )
            continue
        in_budget = [r for r in frows if r["bytes_per_vec"] <= budget]
        if not in_budget:
            assert chosen == []
            continue
        assert len(chosen) == 1
        best = max(r["mean_recall"] for r in in_budget)
        assert chosen[0]["mean_recall"] == best
        assert chosen[0]["bytes_per_vec"] == min(
            r["bytes_per_vec"]
            for r in in_budget
            if r["mean_recall"] == best
        )
    deployed = [r for r in rows if r["deployed"]]
    assert len(deployed) == 1
    code_chosen = [
        r for r in rows if r["chosen"] and r["family"] != "ivf"
    ]
    assert deployed[0]["mean_recall"] == max(
        r["mean_recall"] for r in code_chosen
    )
