"""Span-level exact substring dedup (operators/dedup.py: positional_grams /
duplicated_spans / remove_duplicated_spans / duplicated_span_stats).

Crafted fixtures pin the semantics (island merging, short/NULL docs,
cross-doc vs any scope, full-removal survivors); a hypothesis strategy
holds `duplicated_spans` to a brute-force Python model and asserts
hash-keyed grams ≡ text-keyed grams on collision-free inputs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from security_data_pipeline_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


BOILER = "the quick brown fox jumps over the lazy dog again and again"


def test_spans_cross_doc(spark):
    df = _docs(
        spark,
        [
            (1, BOILER + " unique tail one two three"),
            (2, "prefix words here " + BOILER + " other ending"),
            (3, "totally unrelated content with no shared runs at all ok"),
            (4, "short doc"),
            (5, None),
        ],
    )
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in dedup.duplicated_spans(df, n=8).collect()
    }
    # the 12-token boilerplate: positions 0-11 in doc 1, 3-14 in doc 2
    assert out == {1: (0, 11, 12), 2: (3, 14, 12)}


def test_self_repetition_needs_any_scope(spark):
    df = _docs(
        spark,
        [
            (6, "rep rep rep rep rep rep rep rep rep rep rep rep"),
            (7, "unrelated filler text padding words beyond the gram width"),
        ],
    )
    assert dedup.duplicated_spans(df, n=8).count() == 0
    rows = dedup.duplicated_spans(df, n=8, scope="any").collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"]) for r in rows] == [
        (6, 0, 11)
    ]


def test_islands_merge_overlapping_and_adjacent(spark):
    # two docs share two runs separated by one non-shared token in doc 8:
    # with n=3 the duplicated gram starts are NOT contiguous, exercising
    # the gap flag and producing two distinct spans.
    df = _docs(
        spark,
        [
            (8, "a b c d X e f g h"),
            (9, "a b c d Y e f g h"),
        ],
    )
    rows = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicated_spans(df, n=3).collect()
    )
    assert rows == [(8, 0, 3), (8, 5, 8), (9, 0, 3), (9, 5, 8)]


def test_islands_merge_exactly_abutting_coverage(spark):
    # doc 1's duplicated grams start at 0 and 4 with n=4: their coverage
    # intervals [0,3] and [4,7] touch with no overlap (start gap == n).
    # Maximal-span semantics: ONE span [0,7], not two touching spans.
    df = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d x"),
            (3, "y e f g h"),
        ],
    )
    rows = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in dedup.duplicated_spans(df, n=4).collect()
    )
    assert rows == [(1, 0, 7, 8), (2, 0, 3, 4), (3, 1, 4, 4)]


def test_removal_rebuild_and_passthrough(spark):
    df = _docs(
        spark,
        [
            (1, BOILER + " unique tail one two three"),
            (2, "prefix words here " + BOILER + " other ending"),
            (3, "untouched document stays byte identical ok"),
            (5, None),
        ],
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
        for r in dedup.remove_duplicated_spans(df, n=8).collect()
    }
    assert out[1] == ("unique tail one two three", 12)
    assert out[2] == ("prefix words here other ending", 12)
    assert out[3] == ("untouched document stays byte identical ok", 0)
    assert out[5] == ("", 0)


def test_fully_duplicated_doc_survives_empty(spark):
    df = _docs(spark, [(1, BOILER), (2, BOILER)])
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
        for r in dedup.remove_duplicated_spans(df, n=8).collect()
    }
    assert out == {1: ("", 12), 2: ("", 12)}


def test_stats_by_group(spark):
    df = spark.createDataFrame(
        [
            (1, BOILER + " unique tail one two three", "web"),
            (2, "prefix words here " + BOILER + " other ending", "web"),
            (3, "totally unrelated content with no shared runs at all ok", "book"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        r["source"]: r
        for r in dedup.duplicated_span_stats(df, by="source", n=8).collect()
    }
    assert out["web"]["n_docs"] == 2
    assert out["web"]["n_docs_affected"] == 2
    assert out["web"]["dup_tokens"] == 24
    assert out["web"]["total_tokens"] == 17 + 17
    assert out["book"]["dup_tokens"] == 0
    assert out["book"]["dup_token_frac"] == 0.0


def _model_spans(rows: list[tuple[int, str]], n: int) -> set[tuple]:
    """Brute-force reference: duplicated gram starts → merged islands."""
    grams: dict[tuple, set[int]] = {}
    per_doc: dict[int, list[int]] = {}
    for doc_id, text in rows:
        toks = (text or "").split(" ")
        for p in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[p : p + n]), set()).add(doc_id)
    for doc_id, text in rows:
        toks = (text or "").split(" ")
        for p in range(len(toks) - n + 1):
            if len(grams[tuple(toks[p : p + n])]) >= 2:
                per_doc.setdefault(doc_id, []).append(p)
    spans = set()
    for doc_id, ps in per_doc.items():
        start = prev = ps[0]
        for p in ps[1:]:
            # gap == n means exactly-abutting coverage: still one span
            if p > prev + n:
                spans.add((doc_id, start, prev + n - 1, prev + n - 1 - start + 1))
                start = p
            prev = p
        spans.add((doc_id, start, prev + n - 1, prev + n - 1 - start + 1))
    return spans


_corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
    ).map(" ".join),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=_corpus, n=st.integers(min_value=2, max_value=4))
def test_spans_match_model_and_hash_mode(spark, texts, n):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    expect = _model_spans(rows, n)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in dedup.duplicated_spans(df, n=n).collect()
    }
    assert got == expect
    hashed = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in dedup.duplicated_spans(df, n=n, gram_key="hash").collect()
    }
    assert hashed == expect
