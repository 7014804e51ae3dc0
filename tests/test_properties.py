"""Property-based tests (hypothesis): Spark operators vs tiny Python models.

Few examples, tiny data: each example round-trips through a Spark job, so
the budget goes to input diversity (timestamps that collide, gaps exactly at
the threshold, single-event users) rather than volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from security_data_pipeline_spark.operators import features, joins

T0 = dt.datetime(2024, 1, 1)
GAP_MIN = 30.0

# offsets in minutes; duplicates and exact-gap values intentionally likely
_offsets = st.lists(
    st.integers(min_value=0, max_value=120).map(float)
    | st.sampled_from([0.0, 29.0, 30.0, 31.0, 60.0]),
    min_size=1,
    max_size=8,
)
_users_events = st.dictionaries(
    st.sampled_from(["u1", "u2", "u3"]), _offsets, min_size=1, max_size=3
)


def _model_sessions(offsets: list[float], gap_min: float) -> list[int]:
    """Reference sessionization over sorted offsets: id increments when the
    gap from the previous event strictly exceeds the threshold."""
    out, sid, prev = [], 0, None
    for o in sorted(offsets):
        if prev is None or (o - prev) > gap_min:
            sid += 1
        out.append(sid)
        prev = o
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_users_events)
def test_sessionization_matches_model(spark, data):
    rows = []
    eid = 0
    for user, offsets in data.items():
        for o in offsets:
            rows.append((eid, user, T0 + dt.timedelta(minutes=o)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, timestamp timestamp"
    )
    got = features.add_session_features(
        df, gap_minutes=GAP_MIN, include_stats=False
    ).collect()
    by_user: dict[str, list[tuple]] = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(
            (r["timestamp"], r["session_id"])
        )
    for user, offsets in data.items():
        rows_u = sorted(by_user[user])
        assert [sid for _, sid in rows_u] == _model_sessions(offsets, GAP_MIN)


_left_times = st.lists(
    st.integers(min_value=0, max_value=100), min_size=1, max_size=6
)
_right_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=0,
    max_size=6,
    unique_by=lambda t: t[0],  # unique right ts → deterministic as-of match
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lefts=_left_times, rights=_right_rows)
def test_asof_join_matches_model(spark, lefts, rights):
    left = spark.createDataFrame(
        [(1, T0 + dt.timedelta(minutes=m), i) for i, m in enumerate(lefts)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(1, T0 + dt.timedelta(minutes=m), v) for m, v in rights],
        "k long, ts timestamp, val long",
    ) if rights else spark.createDataFrame([], "k long, ts timestamp, val long")

    got = {
        r["lid"]: r["val"]
        for r in joins.asof_join(left, right, on=["k"]).collect()
    }
    for i, m in enumerate(lefts):
        eligible = [(rm, v) for rm, v in rights if rm <= m]
        expected = max(eligible)[1] if eligible else None
        assert got[i] == expected, (i, m, rights)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_users_events)
def test_bucketed_sessionization_equals_plain(spark, data):
    """The skew-resistant bucketed form must renumber identically to the
    single-window form — tiny 1-hour buckets force many boundary merges."""
    rows = []
    eid = 0
    for user, offsets in data.items():
        for o in offsets:
            rows.append((eid, user, T0 + dt.timedelta(minutes=o)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, timestamp timestamp"
    )
    plain = {
        r["event_id"]: (r["session_id"], r["session_event_count"],
                        r["session_duration_seconds"])
        for r in features.add_session_features(
            df, gap_minutes=GAP_MIN, tiebreak_cols=("event_id",)
        ).collect()
    }
    bucketed = {
        r["event_id"]: (r["session_id"], r["session_event_count"],
                        r["session_duration_seconds"])
        for r in features.add_session_features_bucketed(
            df,
            gap_minutes=GAP_MIN,
            bucket_hours=1.0,
            tiebreak_cols=("event_id",),
        ).collect()
    }
    assert bucketed == plain


_ZPOINTS = st.lists(
    st.tuples(
        st.floats(0, 100, allow_nan=False), st.floats(0, 100, allow_nan=False)
    ),
    min_size=2,
    max_size=30,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=_ZPOINTS)
def test_zvalue_fixed_monotone_per_dimension(spark, pts):
    """Fixing every other dimension, the Morton code is non-decreasing in
    any single dimension — the property that makes z-range scans align
    with per-column predicates."""
    from pyspark.sql import functions as F

    from security_data_pipeline_spark.operators.layout import zvalue_fixed

    df = spark.createDataFrame(pts, "x double, y double")
    z = zvalue_fixed(
        [
            (F.col("x"), F.lit(0.0), F.lit(100.0)),
            (F.col("y"), F.lit(0.0), F.lit(100.0)),
        ],
        bits_per_col=6,
    )
    rows = df.select("x", "y", z.alias("z")).collect()
    for fixed_dim, free_dim in (("y", "x"), ("x", "y")):
        groups: dict = {}
        for r in rows:
            groups.setdefault(r[fixed_dim], []).append((r[free_dim], r["z"]))
        for vals in groups.values():
            vals.sort()
            zs = [v for _, v in vals]
            assert zs == sorted(zs), (fixed_dim, vals)


_CIDR_STRAT = st.lists(
    st.tuples(st.integers(0, 2**32 - 1), st.integers(1, 32)),
    min_size=1,
    max_size=8,
    unique_by=lambda t: (t[0] >> (32 - t[1]), t[1]),
)
_IP_STRAT = st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=20)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cidr_raw=_CIDR_STRAT, ips=_IP_STRAT)
def test_ip_lpm_join_matches_bruteforce_model(spark, cidr_raw, ips):
    from security_data_pipeline_spark.operators.joins import ip_lpm_join

    cidrs = [
        ((p >> (32 - ln)) << (32 - ln), ln, f"r{i}")
        for i, (p, ln) in enumerate(cidr_raw)
    ]

    def model(ip: int):
        best = None
        for prefix, ln, label in cidrs:
            if (ip >> (32 - ln)) == (prefix >> (32 - ln)):
                if best is None or ln > best[0]:
                    best = (ln, label)
        return best

    facts = spark.createDataFrame(
        [(i, ip) for i, ip in enumerate(ips)], "row_id long, ip long"
    )
    dim = spark.createDataFrame(cidrs, "prefix long, prefix_len int, label string")
    got = {
        r["row_id"]: (r["matched_len"], r["label"])
        for r in ip_lpm_join(facts, dim).collect()
    }
    for i, ip in enumerate(ips):
        exp = model(ip)
        assert got[i] == (exp if exp else (None, None)), (ip, cidrs)


_U128 = st.integers(0, 2**128 - 1)
_CIDR6_STRAT = st.lists(
    st.tuples(_U128, st.integers(0, 128)),
    min_size=1,
    max_size=8,
    unique_by=lambda t: (t[0] >> (128 - t[1]) if t[1] else 0, t[1]),
)
_IP6_STRAT = st.lists(_U128, min_size=1, max_size=20)


def _s64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _halves(v: int) -> tuple[int, int]:
    return _s64(v >> 64), _s64(v & ((1 << 64) - 1))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cidr_raw=_CIDR6_STRAT, ips=_IP6_STRAT)
def test_ip6_lpm_join_matches_bruteforce_model(spark, cidr_raw, ips):
    from security_data_pipeline_spark.operators.joins import ip6_lpm_join

    # mask host bits in the 128-bit integer model, then split to halves
    cidrs = [
        ((p >> (128 - ln)) << (128 - ln) if ln else 0, ln, f"r{i}")
        for i, (p, ln) in enumerate(cidr_raw)
    ]

    def model(ip: int):
        best = None
        for prefix, ln, label in cidrs:
            if ln == 0 or (ip >> (128 - ln)) == (prefix >> (128 - ln)):
                if best is None or ln > best[0]:
                    best = (ln, label)
        return best

    facts = spark.createDataFrame(
        [(i, *_halves(ip)) for i, ip in enumerate(ips)],
        "row_id long, ip_hi long, ip_lo long",
    )
    dim = spark.createDataFrame(
        [(*_halves(p), ln, lab) for p, ln, lab in cidrs],
        "prefix_hi long, prefix_lo long, prefix_len int, label string",
    )
    got = {
        r["row_id"]: (r["matched_len"], r["label"])
        for r in ip6_lpm_join(facts, dim).collect()
    }
    for i, ip in enumerate(ips):
        exp = model(ip)
        assert got[i] == (exp if exp else (None, None)), (hex(ip), cidrs)


# --- round-5 operators vs tiny Python models ---

_corpus = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
        min_size=1,
        max_size=6,
    ),
    min_size=2,
    max_size=7,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_corpus, thr=st.sampled_from([0.34, 0.5, 0.67, 0.8]))
def test_jaccard_prefix_join_matches_bruteforce_model(spark, docs, thr):
    """The PPJoin bound must be recall-lossless for ANY corpus/threshold:
    output == brute-force token-set Jaccard (same rounding)."""
    import itertools

    from security_data_pipeline_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_prefix_join(df, threshold=thr).collect()
    }
    sets = {i: set(d) for i, d in enumerate(docs)}
    exp = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
        if j >= thr:
            exp[(a, b)] = j
    assert got == exp, (docs, thr, got, exp)


_stream = st.lists(
    st.lists(
        st.sampled_from(["h", "w", "x", "y", "z"]), min_size=1, max_size=30
    ),
    min_size=2,
    max_size=3,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_stream, k=st.sampled_from([2, 3, 8]))
def test_heavy_hitter_merge_invariants_random_streams(spark, batches, k):
    """Merging per-batch sketches must keep the brackets and the detection
    guarantee against exact combined counts, for any batches and k."""
    from collections import Counter

    from security_data_pipeline_spark.operators import sketches

    states = []
    for items in batches:
        df = spark.createDataFrame(
            [(i, it) for i, it in enumerate(items)], "i long, item string"
        )
        states.append(sketches.heavy_hitters(df, "item", k=k))
    merged = states[0].select("item", "count_lo", "threshold")
    for s in states[1:]:
        merged = sketches.merge_heavy_hitter_states(merged, s, k=k)
    rows = merged.collect()
    # a NULL-item carrier row may hold the threshold when every counter
    # decremented away; real counters stay bounded at k
    counters = [r for r in rows if r["item"] is not None]
    assert len(counters) <= k
    exact = Counter(it for items in batches for it in items)
    thr = max((r["threshold"] for r in rows), default=0)
    for r in counters:
        assert r["count_lo"] <= exact[r["item"]] <= r["count_lo"] + r["threshold"]
    for item, n in exact.items():
        if n > thr:
            assert item in {r["item"] for r in counters}, (
                batches, k, item, n, thr,
            )


# --- round-6: bucketed LOCF ≡ plain, incremental components ≡ full -------

_gap_rows = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),
        st.integers(min_value=0, max_value=40),
        st.one_of(st.none(), st.integers(min_value=0, max_value=9).map(float)),
    ),
    min_size=1,
    max_size=14,
    unique_by=lambda t: (t[0], t[1]),  # unique (key, order) -> total order
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_gap_rows)
def test_forward_fill_bucketed_equals_plain_property(spark, rows):
    from security_data_pipeline_spark.operators import timeseries

    df = spark.createDataFrame(
        [(k, float(o), v) for k, o, v in rows], "k string, o double, v double"
    )
    plain = {
        (r["k"], r["o"]): r["v_ffill"]
        for r in timeseries.forward_fill(df, ["k"], "o", ["v"]).collect()
    }
    # width 7 never aligns with the 0..40 offsets' gap structure
    bucketed = {
        (r["k"], r["o"]): r["v_ffill"]
        for r in timeseries.forward_fill_bucketed(
            df, ["k"], "o", ["v"], bucket_width=7.0
        ).collect()
    }
    assert bucketed == plain


_graph = st.tuples(
    st.lists(  # old edges over nodes 0..11
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ),
        max_size=8,
    ),
    st.lists(  # new edges over nodes 0..19 (bridges old<->new likely)
        st.tuples(
            st.integers(min_value=0, max_value=19),
            st.integers(min_value=0, max_value=19),
        ),
        max_size=10,
    ),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(g=_graph)
def test_incremental_components_equal_full_property(spark, g):
    from pyspark.sql import functions as F

    from security_data_pipeline_spark.operators import dedup

    old_edges, new_edges = g

    def edf(e):
        rows = [(a, b) for a, b in e if a != b]
        return spark.createDataFrame(
            rows or [(0, 0)], "id_a long, id_b long"
        ).filter(F.col("id_a") != F.col("id_b"))

    def ndf(n):
        return spark.createDataFrame([(x,) for x in n], "doc_id long")

    old_nodes, new_nodes = list(range(12)), list(range(12, 20))
    prev = dedup.connected_components(edf(old_edges), ndf(old_nodes))
    inc = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components_incremental(
            prev, edf(new_edges), ndf(new_nodes)
        ).collect()
    }
    full = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(
            edf(old_edges + new_edges), ndf(old_nodes + new_nodes)
        ).collect()
    }
    assert inc == full


_ip_like = st.one_of(
    # well-formed dotted quads
    st.tuples(*[st.integers(0, 255)] * 4).map(
        lambda t: ".".join(map(str, t))
    ),
    # near-misses: bad octets, wrong counts, junk, leading zeros
    st.tuples(*[st.integers(0, 400)] * 4).map(
        lambda t: ".".join(map(str, t))
    ),
    st.sampled_from(
        ["", "1.2.3", "1.2.3.4.5", "01.2.3.4", "a.b.c.d", "1..2.3",
         "256.1.1.1", " 1.2.3.4", "1.2.3.4 ", "1.2.3.4\n", "1.2.3.4\r\n"]
    ),
    st.text(alphabet="0123456789.x:", max_size=16),
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_ip_like, min_size=1, max_size=30, unique=True))
def test_ip_to_long_matches_stdlib(spark, ips):
    """ip_to_long vs the stdlib ipaddress oracle over valid AND malformed
    strings: valid dotted quads map to the exact u32, everything the
    stdlib rejects maps to NULL (never a crash, never a wrong number).
    The stdlib also rejects leading-zero octets — same policy."""
    import ipaddress

    from security_data_pipeline_spark.operators import joins

    def model(s):
        try:
            return int(ipaddress.IPv4Address(s))
        except Exception:
            return None

    df = spark.createDataFrame([(s,) for s in ips], "ip string")
    got = {
        r["ip"]: r["v"]
        for r in df.select("ip", joins.ip_to_long("ip").alias("v")).collect()
    }
    for s in ips:
        assert got[s] == model(s), s


_hex_group = st.integers(0, 0xFFFF).map(lambda v: format(v, "x"))
_v6_like = st.one_of(
    # full 8-group form
    st.lists(_hex_group, min_size=8, max_size=8).map(":".join),
    # one :: compression with random halves
    st.tuples(
        st.lists(_hex_group, min_size=0, max_size=3),
        st.lists(_hex_group, min_size=0, max_size=3),
    ).map(lambda t: ":".join(t[0]) + "::" + ":".join(t[1])),
    # v4-mapped tails
    st.tuples(*[st.integers(0, 255)] * 4).map(
        lambda t: "::ffff:" + ".".join(map(str, t))
    ),
    # malformed
    st.sampled_from(
        ["junk::zz", "1:2:3:4:5:6:7:8:9", ":::", "12345::", "::ffff:300.1.2.3",
         "1:2:3:4:5:6:7", "g::1", "", "2001:db8::1\n",
         # a '::' must replace AT LEAST one group (RFC 4291)
         "1:2:3:4:5:6:7:8::", "1::2:3:4:5:6:7:8", "::1:2:3:4:5:6:7:8",
         "1:2:3:4::5:6:7:8"]
    ),
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_v6_like, min_size=1, max_size=25, unique=True))
def test_ip6_to_longs_matches_stdlib(spark, ips):
    """ip6_to_longs vs the stdlib ipaddress oracle: every address the
    stdlib accepts maps to the exact (hi, lo) 64-bit halves (two's
    complement); everything it rejects maps to NULL."""
    import ipaddress

    from security_data_pipeline_spark.operators import joins

    def signed64(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    def model(s):
        try:
            v = int(ipaddress.IPv6Address(s))
        except Exception:
            return None
        return (signed64(v >> 64), signed64(v & ((1 << 64) - 1)))

    df = spark.createDataFrame([(s,) for s in ips], "ip string")
    got = {
        r["ip"]: (None if r["s"] is None else (r["s"]["hi"], r["s"]["lo"]))
        for r in df.select("ip", joins.ip6_to_longs("ip").alias("s")).collect()
    }
    for s in ips:
        assert got[s] == model(s), s


_words = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_doc_text = st.lists(_words, min_size=0, max_size=8).map(" ".join)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_doc_text, min_size=1, max_size=5),
    st.lists(_doc_text, min_size=1, max_size=5),
)
def test_contamination_report_matches_model(spark, bench_texts, corpus_texts):
    """contamination_report vs a pure-python model over tiny vocabularies
    (gram collisions and shared boilerplate likely): per-bench-doc gram
    counts, hit counts, fraction, and worst corpus document frequency."""
    from security_data_pipeline_spark.operators import dedup

    n = 2

    def grams(text):
        toks = [t for t in text.split(" ")]
        return {
            " ".join(toks[i : i + n])
            for i in range(len(toks) - n + 1)
        } if len(toks) >= n else set()

    corpus_grams = [grams(t) for t in corpus_texts]
    df_of = {}
    for gs in corpus_grams:
        for g in gs:
            df_of[g] = df_of.get(g, 0) + 1

    bench = spark.createDataFrame(
        list(enumerate(bench_texts)), "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(corpus_texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_grams"], r["n_hit"], r["contamination_frac"],
            r["max_corpus_df"],
        )
        for r in dedup.contamination_report(corpus, bench, n=n).collect()
    }
    for i, t in enumerate(bench_texts):
        gs = grams(t)
        hits = [g for g in gs if g in df_of]
        frac = round(len(hits) / len(gs), 6) if gs else 0.0
        mx = max((df_of[g] for g in hits), default=0)
        assert got[i] == (len(gs), len(hits), frac, mx), (i, t)


# --- shingles construction vs a Python model --------------------------------

_tok = st.sampled_from(["a", "bb", "ccc", "", "aa"])  # "" = consecutive spaces
_texts = st.lists(
    st.lists(_tok, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _py_shingles(text: str, n: int, delim: str = " ") -> list[str]:
    toks = text.split(delim)
    grams = [
        delim.join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    ]
    return list(dict.fromkeys(grams))  # distinct, first-occurrence order


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_texts, n=st.integers(min_value=1, max_value=5))
def test_shingles_zip_chain_matches_python_model(spark, texts, n):
    """The zip_with gram chain yields exactly the indexed-transform
    semantics: same gram strings, duplicates removed preserving first
    occurrence, empty array for short docs — including empty-string
    tokens from consecutive delimiters."""
    from security_data_pipeline_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["s"])
        for r in df.select(
            "doc_id", dedup.shingles("text", n).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_shingles(t, n), (t, n)


_WORDS = st.lists(
    st.sampled_from(["a", "bb", "ccc", "dd", "e", "ffff", "Zz", ""]),
    max_size=8,
)
_OOV_DOCS = st.lists(_WORDS, min_size=1, max_size=8)
_OOV_VOCAB = st.lists(
    st.sampled_from(["a", "bb", "ccc", "zz", "qq"]),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_OOV_DOCS, vocab=_OOV_VOCAB)
def test_oov_stats_paths_agree(spark, docs, vocab):
    """oov_stats's two membership strategies — the HOF literal fold and
    the explode + broadcast-join — must agree on arbitrary doc/vocab
    combinations, including empty docs, repeated and duplicate vocab
    entries, and case folding."""
    from security_data_pipeline_spark.operators import textops

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hof = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_frac"])
        for r in textops.oov_stats(df, vocab).collect()
    }
    joined = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_frac"])
        for r in textops.oov_stats(df, vocab, hof_max_vocab=0).collect()
    }
    assert hof == joined


# --- gate-evaluation invariants (operators/evaluation.py) -----------------

_score_label_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100).map(lambda i: i / 100.0)
        | st.sampled_from([0.0, 0.1, 0.5, 0.9, 1.0]),
        st.integers(min_value=0, max_value=1),
    ),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_score_label_rows)
def test_auc_label_flip_symmetry(spark, rows):
    """AUC(scores, labels) + AUC(scores, 1-labels) = 1 exactly (both
    classes present) — the Mann-Whitney complement identity, sensitive
    to any off-by-one in the midrank bookkeeping."""
    from security_data_pipeline_spark.operators import evaluation as ev

    df = spark.createDataFrame(rows, "score double, label int")
    flipped = spark.createDataFrame(
        [(s, 1 - y) for s, y in rows], "score double, label int"
    )
    a = ev.ranking_report(df, "score", "label").collect()[0]
    b = ev.ranking_report(flipped, "score", "label").collect()[0]
    assert (a["n_pos"], a["n_neg"]) == (b["n_neg"], b["n_pos"])
    if a["auc"] is not None:
        assert abs(a["auc"] + b["auc"] - 1.0) < 2e-6


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_score_label_rows)
def test_threshold_sweep_monotone_and_consistent(spark, rows):
    """Raising the threshold can only shrink the predicted-positive set:
    predicted_pos and tp are non-increasing in the threshold, tp+fn is
    the constant class total, and recall is non-increasing."""
    from security_data_pipeline_spark.operators import evaluation as ev

    df = spark.createDataFrame(rows, "score double, label int")
    got = ev.threshold_sweep(df, "score", "label").collect()
    pps = [r["predicted_pos"] for r in got]
    tps = [r["tp"] for r in got]
    assert pps == sorted(pps, reverse=True)
    assert tps == sorted(tps, reverse=True)
    totals = {r["tp"] + r["fn"] for r in got}
    assert len(totals) == 1
    recalls = [r["recall"] for r in got if r["recall"] is not None]
    assert recalls == sorted(recalls, reverse=True)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_score_label_rows, split=st.integers(min_value=1, max_value=11))
def test_calibration_counts_merge_by_addition(spark, rows, split):
    """The streaming-soundness property at the operator level: bin
    statistics of a union equal the per-part statistics summed — for ANY
    split point, including empty parts."""
    from security_data_pipeline_spark.operators import evaluation as ev

    schema = "score double, label int"
    whole = ev.calibration_bin_counts(
        spark.createDataFrame(rows, schema), "score", "label"
    ).collect()
    parts = []
    for part in (rows[:split], rows[split:]):
        if part:
            parts.extend(
                ev.calibration_bin_counts(
                    spark.createDataFrame(part, schema), "score", "label"
                ).collect()
            )
    merged = {}
    for r in parts:
        n, np_, ss = merged.get(r["bin"], (0, 0, 0))
        merged[r["bin"]] = (n + r["n"], np_ + r["n_pos"], ss + r["sum_score"])
    assert {r["bin"]: (r["n"], r["n_pos"], r["sum_score"]) for r in whole} == merged
