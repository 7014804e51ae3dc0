"""BPE tokenizer training vs a pure-Python reference implementation of the
published algorithm (word histogram → iterative best-pair merges). BPE has
no SQL oracle (inherently iterative), so the reference IS the oracle here."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import bpe


def _ref_histogram(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                c[w] += 1
    return c


def _ref_merge_word(sym: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out: list[str] = []
    for s in sym:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return tuple(out)


def _ref_bpe_train(
    texts: list[str], n_merges: int, min_pair_freq: int = 2
) -> list[tuple[str, str]]:
    hist = _ref_histogram(texts)
    syms = {w: tuple(w) + (bpe.END_TOKEN,) for w in hist}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, f in hist.items():
            s = syms[w]
            for pair in zip(s, s[1:]):
                counts[pair] += f
        if not counts:
            break
        top = max(counts.values())
        if top < min_pair_freq:
            break
        # tie-break identical to the Spark orderBy(desc(n), a, b)
        best = min(p for p, n in counts.items() if n == top)
        merges.append(best)
        syms = {w: _ref_merge_word(s, *best) for w, s in syms.items()}
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low newer low wide lowest",
]


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                                 "doc_id long, text string")


def test_bpe_train_matches_reference(corpus):
    got = bpe.bpe_train(corpus, n_merges=12)
    exp = _ref_bpe_train(TEXTS, n_merges=12)
    assert got == exp
    assert len(got) >= 5  # the toy corpus supports a real merge sequence


def test_bpe_train_deterministic_across_partitionings(corpus):
    merges = bpe.bpe_train(corpus, n_merges=6)
    again = bpe.bpe_train(corpus.repartition(7), n_merges=6)
    assert merges == again


def test_merge_pair_greedy_left_to_right(spark):
    df = spark.createDataFrame([(["a", "a", "a"],)], "s array<string>")
    out = df.select(bpe.merge_pair(F.col("s"), "a", "a").alias("m")).collect()
    assert out[0]["m"] == ["aa", "a"]  # non-overlapping, published semantics


def test_apply_bpe_encodes_with_trained_merges(corpus):
    merges = bpe.bpe_train(corpus, n_merges=12)
    enc = bpe.apply_bpe(corpus, merges)
    rows = {r["doc_id"]: r["bpe_tokens"] for r in enc.collect()}
    # reference encode: same merges applied per word in training order
    for i, text in enumerate(TEXTS):
        toks: list[str] = []
        for w in text.split(" "):
            s: tuple[str, ...] = tuple(w) + (bpe.END_TOKEN,)
            for a, b in merges:
                s = _ref_merge_word(s, a, b)
            toks.extend(s)
        assert rows[i] == toks, (i, rows[i], toks)
    # frequent whole words collapse to few tokens
    low = next(t for t in rows[0] if t.startswith("low"))
    assert low in ("low", "low</w>")


def test_word_histogram_counts(corpus):
    hist = {
        r["word"]: r["freq"] for r in bpe.word_histogram(corpus).collect()
    }
    assert hist["low"] == 5 and hist["newer"] == 3 and hist["widest"] == 1
