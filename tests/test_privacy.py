"""k-anonymity, generalization, and the logistic classifier gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import textops
from security_data_pipeline_spark.operators.privacy import (
    generalize_numeric,
    k_anonymize,
)


def test_k_anonymize_suppresses_rare_tuples(spark):
    rows = [("a", "x")] * 5 + [("a", "y")] * 2 + [("b", "x")] * 3
    df = spark.createDataFrame(rows, "g string, h string")
    kept = k_anonymize(df, ["g", "h"], k=3)
    got = {(r["g"], r["h"]) for r in kept.collect()}
    assert got == {("a", "x"), ("b", "x")}
    assert kept.count() == 8  # rows survive intact, not just group keys


def test_k_anonymize_nulls_form_their_own_group(spark):
    rows = [(None, 1)] * 4 + [("v", 1)] * 2
    df = spark.createDataFrame(rows, "g string, n long")
    kept = k_anonymize(df, ["g"], k=3, count_col="sz")
    got = {(r["g"], r["sz"]) for r in kept.collect()}
    assert got == {(None, 4)}


def test_k_anonymize_rejects_bad_k(spark):
    df = spark.createDataFrame([("a",)], "g string")
    try:
        k_anonymize(df, ["g"], k=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_generalize_numeric_labels(spark):
    df = spark.createDataFrame(
        [(37.0,), (-1.0,), (50.0,), (None,)], "v double"
    )
    out = df.select(generalize_numeric("v", width=50).alias("r")).collect()
    assert [r["r"] for r in out] == ["[0,50)", "[-50,0)", "[50,100)", None]


def test_classifier_score_matches_math(spark):
    df = spark.createDataFrame([(0.2, 0.1), (None, 0.5)], "f1 double, f2 double")
    score = textops.classifier_score({"f1": 2.0, "f2": -1.0}, bias=0.5)
    got = [r["s"] for r in df.select(score.alias("s")).collect()]
    exp0 = 1.0 / (1.0 + math.exp(-(0.5 + 0.2 * 2.0 + 0.1 * -1.0)))
    exp1 = 1.0 / (1.0 + math.exp(-(0.5 + 0.0 + 0.5 * -1.0)))  # null -> 0
    assert abs(got[0] - exp0) < 1e-12
    assert abs(got[1] - exp1) < 1e-12


def test_classifier_gate_is_single_stage(spark):
    # the scorer must fuse into the projection: no exchange, no python eval
    df = spark.createDataFrame([("hello world the a of to in is",)], "text string")
    feats = textops.quality_features(df)
    out = feats.select(
        textops.classifier_score({"quality_score": 1.0}).alias("s")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_l_diversity_report_flags(spark):
    from security_data_pipeline_spark.operators.privacy import (
        l_diversity_report,
    )

    rows = (
        # group A: 4 rows, 3 distinct sensitive values -> l=3 passes
        [("A", "s1"), ("A", "s2"), ("A", "s3"), ("A", "s1")]
        # group B: large but homogeneous -> fails (the k-anonymity blind
        # spot l-diversity exists to catch)
        + [("B", "s1")] * 6
        # group C: NULL sensitive values count as one value
        + [("C", None), ("C", None), ("C", "s2")]
    )
    df = spark.createDataFrame(rows, "qid string, sensitive string")
    got = {
        r["qid"]: (r["group_size"], r["n_sensitive"], r["l_diverse"])
        for r in l_diversity_report(df, ["qid"], "sensitive", l=3).collect()
    }
    assert got["A"] == (4, 3, True)
    assert got["B"] == (6, 1, False)
    # countDistinct ignores NULL: C has 1 distinct non-null value
    assert got["C"] == (3, 1, False)


def test_l_diversity_rejects_bad_l(spark):
    import pytest as _pytest

    from security_data_pipeline_spark.operators.privacy import (
        l_diversity_report,
    )

    df = spark.createDataFrame([("a", "s")], "qid string, sensitive string")
    with _pytest.raises(ValueError):
        l_diversity_report(df, ["qid"], "sensitive", l=0)


def test_t_closeness_bruteforce(spark):
    import random

    from security_data_pipeline_spark.operators.privacy import (
        t_closeness_report,
    )

    rng = random.Random(31)
    rows = [
        (f"g{i % 4}", rng.choice(["a", "b", "c", "d"])) for i in range(400)
    ]
    # one deliberately skewed group: almost all one value
    rows += [("skewed", "a")] * 95 + [("skewed", "b")] * 5
    df = spark.createDataFrame(rows, "grp string, sv string")
    got = {
        r["grp"]: r
        for r in t_closeness_report(df, ["grp"], "sv", t=0.2).collect()
    }

    from collections import Counter

    total = Counter(sv for _, sv in rows)
    n = len(rows)
    pg = {v: round(c / n, 6) for v, c in total.items()}
    for grp in {g for g, _ in rows}:
        sub = Counter(sv for g, sv in rows if g == grp)
        gn = sum(sub.values())
        present = {v: round(c / gn, 6) for v, c in sub.items()}
        tvd = 0.5 * (
            sum(abs(present[v] - pg[v]) for v in present)
            + (1.0 - sum(pg[v] for v in present))
        )
        assert got[grp]["group_size"] == gn
        assert abs(got[grp]["tvd"] - tvd) < 2e-6, (grp, got[grp]["tvd"], tvd)
        assert got[grp]["t_close"] == (round(tvd, 6) <= 0.2) or abs(
            round(tvd, 6) - 0.2
        ) < 2e-6
    assert not got["skewed"]["t_close"]


def test_t_closeness_uniform_group_passes(spark):
    from security_data_pipeline_spark.operators.privacy import (
        t_closeness_report,
    )

    rows = [("g1", v) for v in ["a", "b"] * 50] + [
        ("g2", v) for v in ["a", "b"] * 30
    ]
    df = spark.createDataFrame(rows, "grp string, sv string")
    out = {r["grp"]: r for r in t_closeness_report(df, ["grp"], "sv").collect()}
    assert out["g1"]["tvd"] == 0.0 and out["g1"]["t_close"]
    assert out["g2"]["tvd"] == 0.0 and out["g2"]["t_close"]


def test_privacy_cells_stream_equals_batch_and_flips_on_skew(
    spark, tmp_path
):
    """The streamed cell state must reproduce the batch audit over the
    cumulative input, a replayed batch id must be a no-op, and a second
    batch that skews one group's sensitive distribution must flip that
    group's flag — the live-release-gate property."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators.privacy import (
        t_closeness_from_cells,
        t_closeness_report,
    )
    from security_data_pipeline_spark.streaming.pipeline import (
        _lineage_tag,
        _privacy_cells_fold,
        maintain_privacy_cells_stream,
        privacy_cells_state,
    )

    # batch 0: both groups uniform over {a, b}; batch 1 floods g2 with
    # 'a', which drags the GLOBAL distribution toward 'a' — so the
    # group left behind (g1, still uniform) is the one that deviates
    # from the corpus and flips to not-t-close, while g2 now dominates
    # the global and sits near it. Flags track the CUMULATIVE
    # distributions, which is the live-gate property under test
    b0 = [("g1", v) for v in ["a", "b"] * 30] + [
        ("g2", v) for v in ["a", "b"] * 30
    ]
    b1 = [("g2", "a")] * 120
    src = tmp_path / "in"
    src.mkdir()
    for bi, rows in enumerate([b0, b1]):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "grp": [r[0] for r in rows],
                    "sv": [r[1] for r in rows],
                }
            ),
            f,
        )
        os.utime(f, (1_700_000_000 + bi, 1_700_000_000 + bi))

    state = str(tmp_path / "cells")
    ckpt = str(tmp_path / "ckpt")
    q = maintain_privacy_cells_stream(
        spark.readStream.schema("grp string, sv string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        ckpt,
        quasi_cols=["grp"],
        sensitive_col="sv",
    )
    q.awaitTermination(120)

    cells = privacy_cells_state(spark, state)
    got = {
        r["grp"]: r
        for r in t_closeness_from_cells(cells, ["grp"], t=0.2).collect()
    }
    all_df = spark.read.parquet(str(src))
    want = {
        r["grp"]: r
        for r in t_closeness_report(all_df, ["grp"], "sv", t=0.2).collect()
    }
    assert {g: (r["group_size"], r["tvd"], r["t_close"]) for g, r in got.items()} == {
        g: (r["group_size"], r["tvd"], r["t_close"]) for g, r in want.items()
    }
    assert got["g2"]["t_close"] and not got["g1"]["t_close"]

    # replaying the last batch id must not change the state
    fold = _privacy_cells_fold(state, ["grp"], "sv", _lineage_tag(ckpt))
    fold(all_df, 1)
    again = {
        (r["grp"], r["_v"]): r["_c"]
        for r in privacy_cells_state(spark, state).collect()
    }
    direct = {
        (r["grp"], r["_v"]): r["_c"]
        for r in __import__(
            "security_data_pipeline_spark.operators.privacy",
            fromlist=["t_closeness_cells"],
        ).t_closeness_cells(all_df, ["grp"], "sv").collect()
    }
    assert again == direct


def test_t_closeness_null_sensitive_values_excluded(spark):
    """ADVICE r10 (medium): NULL sensitive values used to count in
    group_size and the global total but vanish from the present-side TVD
    sum (the equi-join on the sensitive value drops NULL keys), silently
    understating TVD — and a quasi-group whose only sensitive value was
    NULL escaped the audit with inconsistent totals. Convention now:
    NULL sensitive values are excluded AT THE CELL SOURCE
    (t_closeness_cells), so the audit equals the audit of the
    NULL-filtered frame — group sizes, global distribution, and TVD all
    agree, and l-diversity's countDistinct-ignores-NULL convention is
    matched."""
    from security_data_pipeline_spark.operators.privacy import (
        t_closeness_report,
    )

    rows = (
        [("g1", "a")] * 6 + [("g1", "b")] * 2 + [("g1", None)] * 2
        + [("g2", "a")] * 4 + [("g2", "b")] * 4
        + [("gnull", None)] * 5  # all-NULL group: must not appear at all
    )
    df = spark.createDataFrame(rows, "grp string, sv string")
    got = {r["grp"]: r for r in t_closeness_report(df, ["grp"], "sv").collect()}

    assert "gnull" not in got, "all-NULL-sensitive group must be absent"
    # group sizes count only rows with a known sensitive value
    assert got["g1"]["group_size"] == 8
    assert got["g2"]["group_size"] == 8
    # hand-computed TVD over the NULL-filtered frame:
    # non-null totals: a = 6 + 4 = 10, b = 2 + 4 = 6, n = 16
    pga, pgb = round(10 / 16.0, 6), round(6 / 16.0, 6)
    tvd_g1 = round(
        0.5 * (abs(round(6 / 8.0, 6) - pga) + abs(round(2 / 8.0, 6) - pgb)),
        6,
    )
    tvd_g2 = round(
        0.5 * (abs(round(4 / 8.0, 6) - pga) + abs(round(4 / 8.0, 6) - pgb)),
        6,
    )
    assert abs(got["g1"]["tvd"] - tvd_g1) < 2e-6, (got["g1"]["tvd"], tvd_g1)
    assert abs(got["g2"]["tvd"] - tvd_g2) < 2e-6, (got["g2"]["tvd"], tvd_g2)


def test_privacy_audit_from_cells_all_three_flags(spark):
    """One cell frame -> the whole triad: group sizes / distinct counts /
    TVD with all three flags, matching hand computation on seeded cells
    (the known-sensitive convention: cells are the only input)."""
    from security_data_pipeline_spark.operators.privacy import (
        privacy_audit_from_cells,
    )

    cells = spark.createDataFrame(
        # g1: 30 rows over 3 values (k-anon at 25, l at 3, balanced-ish)
        [("g1", "a", 10), ("g1", "b", 10), ("g1", "c", 10),
         # g2: 5 rows, single value (fails all three)
         ("g2", "a", 5)],
        "grp string, _v string, _c long",
    )
    got = {
        r["grp"]: r
        for r in privacy_audit_from_cells(cells, ["grp"], k=25, l=3, t=0.2)
        .collect()
    }
    g1, g2 = got["g1"], got["g2"]
    assert g1["group_size"] == 30 and g1["n_sensitive"] == 3
    assert g1["k_anonymous"] and g1["l_diverse"]
    assert g2["group_size"] == 5 and g2["n_sensitive"] == 1
    assert not g2["k_anonymous"] and not g2["l_diverse"]
    # global: a=15/35, b=10/35, c=10/35; g2 is all-a
    pa, pb, pc = round(15 / 35, 6), round(10 / 35, 6), round(10 / 35, 6)
    tvd_g2 = round(0.5 * (abs(1.0 - pa) + (1.0 - pa)), 6)
    assert abs(g2["tvd"] - tvd_g2) < 2e-6, (g2["tvd"], tvd_g2)
    assert not g2["t_close"]


def test_stream_privacy_audit_flags_are_live(spark):
    """The streamed-state triad audit at sf0.1 (the parity sweep covers
    sf0.01): every flag column must be MIXED — a constant flag is a dead
    witness."""
    from security_data_pipeline_spark.plans.queries import REGISTRY

    rows = REGISTRY["events_stream_privacy_audit"].fn(
        spark, "/root/testdata/sf0.1"
    ).collect()
    assert len(rows) > 10
    for flag in ("k_anonymous", "l_diverse", "t_close"):
        vals = {r[flag] for r in rows}
        assert vals == {True, False}, (flag, vals)
