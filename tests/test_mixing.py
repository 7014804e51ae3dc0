"""Corpus-mixing operators: importance resampling, per-key caps, mixture
upsampling (operators/mixing.py).

Property strategy: tiny random corpora with deliberate degeneracies (empty
texts, single tokens, tied order keys, all-same-key frames) — each example
round-trips a Spark job, so the budget goes to input diversity."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import mixing

_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]

_texts = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=6).map(
        " ".join
    )
    | st.sampled_from(["", " ", "  alpha  ", "alpha"]),
    min_size=1,
    max_size=10,
)


def _docs(spark, texts, extra_flag=True):
    rows = [
        (i, t, i % 2 == 0 if extra_flag else False)
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")


# ---------------------------------------------------------------------------
# bigram buckets
# ---------------------------------------------------------------------------


def test_bigram_buckets_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "  "), (3, "one"), (4, "a b"), (5, "a  b   c")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["bk"]
        for r in df.select(
            "doc_id", mixing.bigram_buckets("text", 16).alias("bk")
        ).collect()
    }
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert len(got[4]) == 1
    # repeated separators collapse via the empty-token filter: "a  b   c"
    # tokenizes to [a, b, c], so its first bigram bucket equals "a b"'s
    assert len(got[5]) == 2 and got[5][0] == got[4][0]
    assert all(0 <= b < 16 for bk in got.values() for b in bk)


# ---------------------------------------------------------------------------
# importance weights: fused ≡ join, zero-bigram docs score 0
# ---------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts)
def test_importance_fused_equals_join(spark, texts):
    docs = _docs(spark, texts)
    target = docs.filter(F.col("tgt"))
    j = mixing.importance_weights(docs, target, num_buckets=32)
    f = mixing.importance_weights_fused(docs, target, num_buckets=32)
    a = {r["doc_id"]: r["importance"] for r in j.collect()}
    b = {r["doc_id"]: r["importance"] for r in f.collect()}
    assert a == b
    for i, t in enumerate(texts):
        if len([w for w in t.split(" ") if w]) < 2:
            assert a[i] == 0.0


def test_importance_weights_prefer_target_like_docs(spark):
    # target speaks only 'alpha beta'; raw adds 'gamma delta' noise — the
    # target-like doc must outscore the noise doc
    rows = [
        (0, "alpha beta alpha beta", True),
        (1, "alpha beta alpha beta", False),
        (2, "gamma delta gamma delta", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    w = mixing.importance_weights(docs, docs.filter(F.col("tgt")), num_buckets=64)
    got = {r["doc_id"]: r["importance"] for r in w.collect()}
    assert got[1] > got[2]
    assert got[0] == got[1]  # identical text, identical weight


# ---------------------------------------------------------------------------
# gumbel top-k
# ---------------------------------------------------------------------------


def test_gumbel_topk_deterministic_and_bounded(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).cast("double").alias("w")
    )
    a = [r["doc_id"] for r in mixing.gumbel_topk(df, "w", 10).collect()]
    b = [
        r["doc_id"]
        for r in mixing.gumbel_topk(df.repartition(13), "w", 10).collect()
    ]
    assert len(a) == 10 and sorted(a) == sorted(b)
    # a different salt draws a different sample (overwhelmingly)
    c = [
        r["doc_id"]
        for r in mixing.gumbel_topk(df, "w", 10, salt="other").collect()
    ]
    assert sorted(a) != sorted(c)
    # the noise keys stay finite (u strictly inside (0,1))
    keys = [r["samp_key"] for r in mixing.gumbel_topk(df, "w", 100).collect()]
    assert all(math.isfinite(k) for k in keys)


# ---------------------------------------------------------------------------
# cap_per_key ≡ bypass variant
# ---------------------------------------------------------------------------

_cap_rows = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),
        st.integers(min_value=0, max_value=3),  # tied order values likely
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_cap_rows, cap=st.integers(min_value=1, max_value=4))
def test_cap_per_key_bypass_matches_plain(spark, rows, cap):
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "rid long, key string, val long",
    )
    order = [F.desc("val"), F.asc("rid")]
    plain = mixing.cap_per_key(df, ["key"], cap, order)
    bypass = mixing.cap_per_key_bypass(df, ["key"], cap, order)
    assert {r["rid"] for r in plain.collect()} == {
        r["rid"] for r in bypass.collect()
    }


def test_cap_per_key_shuffle_is_group_limit_pruned(spark):
    # the scale claim in the docstring is a PLAN property: Spark must
    # plant a partial WindowGroupLimit below the exchange so a hot key
    # forwards <= cap rows per map partition, plus the final node above —
    # if an engine upgrade drops the rewrite, the cap silently reverts to
    # shuffling whole hot keys and this pin catches it
    df = spark.range(100).select(
        (F.col("id") % 5).cast("string").alias("key"),
        F.col("id").alias("rid"),
        (F.col("id") % 3).alias("val"),
    )
    out = mixing.cap_per_key(df, ["key"], 3, [F.desc("val"), F.asc("rid")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") == 2
    assert plan.count("Window [row_number()") == 1
    assert out.count() == 15


def test_cap_per_key_bypass_windows_only_over_cap_rows(spark):
    # the bypass is structural: under-cap rows reach the output through a
    # broadcast anti join, never a Window
    df = spark.range(100).select(
        (F.col("id") % 5).cast("string").alias("key"),
        F.col("id").alias("rid"),
        (F.col("id") % 3).alias("val"),
    )
    out = mixing.cap_per_key_bypass(
        df, ["key"], 3, [F.desc("val"), F.asc("rid")]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window [row_number()") == 1
    assert plan.count("BroadcastHashJoin") == 2
    assert out.count() == 15


def test_cap_per_key_rejects_bad_cap(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        mixing.cap_per_key(df, ["k"], 0, [F.asc("k")])


# ---------------------------------------------------------------------------
# mixture upsampling
# ---------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    w=st.floats(min_value=0.0, max_value=3.0, allow_nan=False).map(
        lambda x: round(x, 2)
    )
)
def test_mixture_copy_counts_bracket_weight(spark, w):
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    out = mixing.mixture_upsample(docs, {"s": w})
    per_doc = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    lo, hi = int(w), int(w) + (0 if w == int(w) else 1)
    assert all(lo <= n <= max(hi, 1) for n in per_doc.values())
    # epochs are 1..n per doc
    eps = out.groupBy("doc_id").agg(
        F.min("epoch").alias("mn"), F.max("epoch").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = eps.filter(
        (F.col("mn") != 1) | (F.col("mx") != F.col("n"))
    ).count()
    assert bad == 0


def test_mixture_deterministic_across_partitioning(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    wts = {"s0": 2.5, "s1": 0.25, "s2": 0.0}
    a = sorted(
        tuple(r) for r in mixing.mixture_upsample(docs, wts).collect()
    )
    b = sorted(
        tuple(r)
        for r in mixing.mixture_upsample(docs.repartition(17), wts).collect()
    )
    assert a == b
    assert not any(r[1] == "s2" for r in a)


def test_mixture_rejects_negative_weight(spark):
    docs = spark.range(1).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    with pytest.raises(ValueError):
        mixing.mixture_upsample(docs, {"s": -0.5})


# ---------------------------------------------------------------------------
# plan shape: the fused scorer adds no exchange over the raw corpus
# ---------------------------------------------------------------------------


def test_fused_importance_plan_has_no_exchange(spark, sf_oracle):
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    scored = mixing.importance_weights_fused(docs, target, num_buckets=64)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # scoring is fused into the scan: project over FileScan, nothing else
    assert "Exchange" not in plan
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# training order / shard writing
# ---------------------------------------------------------------------------


def test_training_order_is_a_balanced_permutation(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = mixing.training_order(df, n_shards=16)
    rows = out.collect()
    assert len(rows) == 2000
    assert len({r["sort_key"] for r in rows}) == 2000  # injective key
    per_shard = {}
    for r in rows:
        per_shard[r["shard"]] = per_shard.get(r["shard"], 0) + 1
    assert set(per_shard) == set(range(16))
    # md5 is uniform: no shard wildly off 125 (loose 3x bound, not a
    # statistical test — catches a broken mod, not bad luck)
    assert all(40 <= n <= 375 for n in per_shard.values())
    # different salt -> different permutation
    other = mixing.training_order(df, n_shards=16, salt="epoch2")
    a = {r["doc_id"]: r["sort_key"] for r in rows}
    b = {r["doc_id"]: r["sort_key"] for r in other.collect()}
    assert a != b


def test_write_training_shards_sorted_dirs(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    path = str(tmp_path / "shards")
    mixing.write_training_shards(df, path, n_shards=8)
    dirs = sorted(glob.glob(f"{path}/shard=*"))
    assert len(dirs) == 8
    seen = set()
    for d in dirs:
        for f in sorted(glob.glob(f"{d}/*.parquet")):
            keys = pq.read_table(f, columns=["sort_key"])["sort_key"].to_pylist()
            assert keys == sorted(keys)  # within-file order
        tbl = spark.read.parquet(d)
        seen |= {r["doc_id"] for r in tbl.select("doc_id").collect()}
    assert seen == set(range(500))  # a permutation: nothing lost or duplicated


def test_temperature_weights_properties(spark):
    """alpha=1 is the identity mix (factor 1 everywhere); alpha=0.5
    shares sum to 1, lift small sources above large ones, and match the
    hand-computed sqrt shares."""
    import math

    rows = [("a",)] * 100 + [("b",)] * 25 + [("c",)] * 4
    df = spark.createDataFrame(rows, "source string")

    ident = {
        r["source"]: r["factor"]
        for r in mixing.temperature_weights(df, "source", alpha=1.0).collect()
    }
    assert all(abs(f - 1.0) < 1e-6 for f in ident.values()), ident

    out = {
        r["source"]: r
        for r in mixing.temperature_weights(df, "source", alpha=0.5).collect()
    }
    assert abs(sum(r["p_temp"] for r in out.values()) - 1.0) < 1e-5
    assert abs(sum(r["p_raw"] for r in out.values()) - 1.0) < 1e-5
    # smaller source -> larger factor under alpha < 1
    assert out["c"]["factor"] > out["b"]["factor"] > out["a"]["factor"]
    assert out["a"]["factor"] < 1.0 < out["c"]["factor"]
    denom = math.sqrt(100) + math.sqrt(25) + math.sqrt(4)
    for src, n in (("a", 100), ("b", 25), ("c", 4)):
        assert abs(out[src]["p_temp"] - math.sqrt(n) / denom) < 1e-5


# --- source_divergence -------------------------------------------------------


def test_source_divergence_zero_for_identical_sources(spark):
    df = spark.createDataFrame(
        [("a", "x y z x y w"), ("b", "x y z x y w")],
        "source string, text string",
    )
    r = mixing.source_divergence(df, num_buckets=64).collect()
    assert len(r) == 1
    assert r[0]["src_a"] == "a" and r[0]["src_b"] == "b"
    assert r[0]["js_divergence"] == 0.0


def test_source_divergence_orders_similarity(spark):
    """Disjoint vocabularies diverge more than a half-overlapping mix,
    and everything sits inside [0, ln 2]."""
    import math

    a = "x " * 200
    b = "q " * 200
    mix = ("x " * 100) + ("q " * 100)
    df = spark.createDataFrame(
        [("a", a.strip()), ("b", b.strip()), ("m", mix.strip())],
        "source string, text string",
    )
    got = {
        (r["src_a"], r["src_b"]): r["js_divergence"]
        for r in mixing.source_divergence(df, num_buckets=64).collect()
    }
    assert set(got) == {("a", "b"), ("a", "m"), ("b", "m")}
    assert all(0.0 <= v <= math.log(2) + 1e-9 for v in got.values())
    assert got[("a", "m")] < got[("a", "b")]
    assert got[("b", "m")] < got[("a", "b")]


def test_length_bucketed_batches_invariants(spark):
    from security_data_pipeline_spark.operators import mixing

    rows = [(i, 3 + (i * 7) % 90) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = mixing.length_bucketed_batches(
        df, batch_size=8, bucket_width=16, n_shards=4
    ).collect()
    # conservation: every doc lands in exactly one batch
    assert sum(r["n_docs"] for r in out) == 300
    assert sum(r["token_sum"] for r in out) == sum(n for _, n in rows)
    for r in out:
        assert 1 <= r["n_docs"] <= 8
        # bucket invariant: members' lengths are in (bucket_len-16, bucket_len]
        assert r["batch_max_tokens"] <= r["bucket_len"]
        assert r["token_sum"] > r["n_docs"] * (r["bucket_len"] - 16)
        assert 0.0 <= r["pad_frac"] < 1.0
        expect = 1.0 - r["token_sum"] / (r["batch_max_tokens"] * r["n_docs"])
        assert abs(r["pad_frac"] - expect) < 1e-12
        assert 0 <= r["shard"] < 4


def test_length_bucketed_batches_reduces_padding_vs_arrival_order(spark):
    from security_data_pipeline_spark.operators import mixing

    # adversarial arrival order: lengths alternate short/long, so naive
    # consecutive batches pad every short doc to the long length
    rows = [(i, 8 if i % 2 == 0 else 120) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = mixing.length_bucketed_batches(
        df, batch_size=8, bucket_width=16, n_shards=2
    ).collect()
    padded = sum(r["batch_max_tokens"] * r["n_docs"] for r in out)
    actual = sum(r["token_sum"] for r in out)
    # arrival-order control: batch i = docs [8i, 8i+8) -> max is always 120
    naive_padded = 120 * 400
    assert padded < 0.60 * naive_padded  # bucketing kills the padding
    assert actual == sum(n for _, n in rows)


def test_token_budget_waterfill_cases(spark):
    from security_data_pipeline_spark.operators import mixing

    counts = spark.createDataFrame(
        [("a", 100), ("b", 1000)], "source string, avail_tokens long"
    )

    def got(budget, weights=None):
        return {
            r["source"]: (
                r["saturated"],
                r["alloc_tokens"],
                r["sampling_rate"],
            )
            for r in mixing.token_budget_waterfill(
                counts, budget, weights
            ).collect()
        }

    # small source saturates; its unused share redistributes
    g = got(600)
    assert g["a"] == (True, 100.0, 1.0)
    assert g["b"] == (False, 500.0, 0.5)
    # nothing saturates: allocation proportional to weights
    g = got(120, {"a": 2.0, "b": 1.0})
    assert g["a"] == (False, 80.0, 0.8)
    assert g["b"] == (False, 40.0, 0.04)
    # proportional share exceeds a small source's supply: it saturates
    # and the unused share redistributes to the rest
    g = got(300, {"a": 2.0, "b": 1.0})
    assert g["a"] == (True, 100.0, 1.0)
    assert g["b"] == (False, 200.0, 0.2)
    # budget exceeds corpus: everything saturated, take it all
    g = got(10_000)
    assert g["a"] == (True, 100.0, 1.0)
    assert g["b"] == (True, 1000.0, 1.0)
    # zero budget: nothing allocated
    g = got(0)
    assert g["a"][1] == 0.0 and g["b"][1] == 0.0
    # weight-0 sources are dropped from the plan
    g = got(600, {"a": 0.0, "b": 1.0})
    assert set(g) == {"b"}
    assert g["b"] == (False, 600.0, 0.6)


def test_token_budget_waterfill_conserves_budget(spark):
    from security_data_pipeline_spark.operators import mixing

    rows = [(f"s{i}", 50 + 137 * i) for i in range(20)]
    counts = spark.createDataFrame(rows, "source string, avail_tokens long")
    total = sum(a for _, a in rows)
    for budget in (0, 1000, total // 2, total, total * 2):
        out = mixing.token_budget_waterfill(
            counts, budget, {f"s{i}": 1.0 + (i % 3) for i in range(20)}
        ).collect()
        alloc = sum(r["alloc_tokens"] for r in out)
        assert abs(alloc - min(budget, total)) < 1e-6, (budget, alloc)
        for r in out:
            assert r["alloc_tokens"] <= r["avail_tokens"] + 1e-9 or not r[
                "saturated"
            ]


def test_stratified_split_rates_and_determinism(spark):
    from security_data_pipeline_spark.operators.mixing import (
        stratified_split,
    )

    rows = [(i, f"s{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_split(df)
    counts = {
        (r["source"], r["split"]): r["n"]
        for r in out.groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for s in ("s0", "s1", "s2"):
        tot = sum(counts.get((s, sp), 0) for sp in ("train", "val", "test"))
        assert tot == 1000
        # per-stratum rates near 80/10/10 (hash uniformity, 1000 draws)
        assert abs(counts.get((s, "train"), 0) / tot - 0.8) < 0.05
        assert abs(counts.get((s, "val"), 0) / tot - 0.1) < 0.04
        assert abs(counts.get((s, "test"), 0) / tot - 0.1) < 0.04
    # determinism: same assignment on a rerun and under repartitioning
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in stratified_split(df.repartition(7)).collect()
    }
    assert a == b
    # a different salt reshuffles membership but keeps rates
    c = {
        r["doc_id"]: r["split"]
        for r in stratified_split(df, salt="epoch2").collect()
    }
    assert c != a


def test_stratified_split_validates_inputs(spark):
    import pytest as _pytest

    from security_data_pipeline_spark.operators.mixing import (
        stratified_split,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with _pytest.raises(ValueError):
        stratified_split(df, fractions=(0.9, 0.2), names=("a", "b"))
    with _pytest.raises(ValueError):
        stratified_split(df, fractions=(0.8, 0.1), names=("a", "b", "c"))


def test_stratified_split_null_ids_hash_deterministically(spark):
    """ADVICE r10: a NULL id used to make the md5 NULL, so every
    when-condition was NULL and ALL NULL-id rows silently fell through
    to the last split name ('test'), skewing the eval split. NULL ids
    now hash under a \\x00-prefixed sentinel: they receive one
    deterministic split within their stratum (they are
    indistinguishable, so they must travel together), and the engines
    agree on the sentinel's hash."""
    import duckdb

    from security_data_pipeline_spark.operators.mixing import (
        stratified_split,
    )

    rows = [(None, "web")] * 5 + [(f"d{i}", "web") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = stratified_split(df).collect()
    null_splits = {r["split"] for r in out if r["doc_id"] is None}
    assert len(null_splits) == 1, "NULL ids must travel together"
    # the sentinel must flow through the SAME bucket math as real ids,
    # not the old fall-through: recompute the expected split exactly
    con = duckdb.connect()
    (bucket,) = con.sql(
        "SELECT CAST(CONCAT('0x', substr(md5("
        "'split' || '|' || 'web' || '|' || chr(0) || 'null_id'"
        "), 1, 8)) AS BIGINT) % 1000000"
    ).fetchone()
    con.close()
    expected = "train" if bucket < 800000 else (
        "val" if bucket < 900000 else "test"
    )
    assert null_splits == {expected}, (null_splits, bucket)
    # a real id spelled like the sentinel-free text must not collide
    df2 = spark.createDataFrame(
        [("null_id", "web"), (None, "web")], "doc_id string, source string"
    )
    got = {r["doc_id"]: r["split"] for r in stratified_split(df2).collect()}
    assert set(got) == {"null_id", None}
