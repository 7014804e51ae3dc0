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


def test_merge_pair_matches_reference_on_random_sequences(spark):
    """The Column fold and the reference greedy merge must agree on
    arbitrary symbol runs — including overlapping-candidate runs (aaaa)
    and merged-symbol collisions (ab next to a, b)."""
    import itertools

    seqs = [
        list(p)
        for n in (1, 2, 3, 4, 5)
        for p in itertools.product("ab", repeat=n)
    ]
    df = spark.createDataFrame([(s,) for s in seqs], "s array<string>")
    for a, b in (("a", "a"), ("a", "b"), ("b", "a")):
        got = [
            r["m"]
            for r in df.select(bpe.merge_pair(F.col("s"), a, b).alias("m"))
            .collect()
        ]
        exp = [list(_ref_merge_word(tuple(s), a, b)) for s in seqs]
        assert got == exp, (a, b)


def test_ip4_mapped_cidr_feeds_ip6_lpm(spark):
    """A dual-stack feed row written as an IPv4-mapped CIDR
    (::ffff:10.0.0.0/104 = the v4 10/8 inside the mapped range) matches
    mapped fact addresses end to end."""
    from security_data_pipeline_spark.operators import joins

    cidrs = spark.createDataFrame(
        [("::ffff:10.0.0.0/104", "corp-mapped"), ("::/0", "default")],
        "cidr string, label string",
    ).select(joins.parse_cidr6("cidr").alias("c"), "label").select(
        "c.prefix_hi", "c.prefix_lo", "c.prefix_len", "label"
    )
    facts = spark.createDataFrame(
        [(1, "::ffff:10.1.2.3"), (2, "::ffff:11.0.0.1")],
        "row_id long, addr string",
    ).select("row_id", joins.ip6_to_longs("addr").alias("a")).select(
        "row_id", "a.hi", "a.lo"
    )
    out = {
        r["row_id"]: r["label"]
        for r in joins.ip6_lpm_join(
            facts, cidrs, hi_col="hi", lo_col="lo"
        ).collect()
    }
    assert out == {1: "corp-mapped", 2: "default"}


def test_word_histogram_counts(corpus):
    hist = {
        r["word"]: r["freq"] for r in bpe.word_histogram(corpus).collect()
    }
    assert hist["low"] == 5 and hist["newer"] == 3 and hist["widest"] == 1


def test_bpe_train_local_equals_distributed(corpus):
    loc = bpe.bpe_train(corpus, n_merges=12, mode="local")
    dist = bpe.bpe_train(corpus, n_merges=12, mode="distributed")
    assert loc == dist
    assert loc == _ref_bpe_train(TEXTS, n_merges=12)


def test_bpe_train_local_equals_distributed_random_corpus(spark):
    import random

    rng = random.Random(7)
    vocab = [
        "".join(rng.choice("abcdefgh") for _ in range(rng.randint(2, 7)))
        for _ in range(60)
    ]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    loc = bpe.bpe_train(df, n_merges=25, mode="local", min_pair_freq=1)
    dist = bpe.bpe_train(df, n_merges=25, mode="distributed", min_pair_freq=1)
    assert loc == dist
    assert loc == _ref_bpe_train(texts, n_merges=25, min_pair_freq=1)


def test_apply_bpe_arrow_equals_column_fold(corpus):
    merges = bpe.bpe_train(corpus, n_merges=12)
    fold = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.apply_bpe(corpus, merges).collect()
    }
    arrow = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.apply_bpe(corpus, merges, max_fold_merges=0).collect()
    }
    assert fold == arrow


def test_apply_bpe_arrow_null_text(spark):
    df = spark.createDataFrame([(1, None), (2, "ab ab")],
                               "doc_id long, text string")
    merges = [("a", "b")]
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.apply_bpe(df, merges, max_fold_merges=0).collect()
    }
    assert out[1] is None
    assert out[2] == ["ab", bpe.END_TOKEN, "ab", bpe.END_TOKEN]


def test_bpe_production_vocab_5k_merges(spark):
    """The production path end to end: a realistic-cardinality vocabulary,
    >=5k merges trained driver-local (zero Spark jobs per merge), encoded
    over the sf0.1 documents corpus in one Arrow pass — the regime where
    the per-merge-job loop and the nested Column fold both fall over."""
    import random

    rng = random.Random(13)
    vocab = [
        "".join(rng.choice("abcdefghijklmnop") for _ in range(rng.randint(4, 10)))
        for _ in range(2500)
    ]
    # every vocab word appears (so the merge space is the full ~17k symbol
    # pairs), plus a zipf-ish popular head so rankings are meaningful
    texts = [" ".join(vocab[i : i + 25]) for i in range(0, len(vocab), 25)]
    texts += [
        " ".join(rng.choice(vocab[:100]) for _ in range(80))
        for _ in range(100)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe.bpe_train(df, n_merges=5000, min_pair_freq=1, mode="local")
    assert len(merges) >= 5000, len(merges)

    from security_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    enc = bpe.apply_bpe(docs, merges)  # > max_fold_merges -> Arrow path
    stats = enc.select(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size("bpe_tokens")).alias("toks"),
    ).collect()[0]
    assert stats["docs"] == 5000
    assert stats["toks"] > 0
