"""Fuzzy-dedup family: internal consistency between the exact n-gram
Jaccard path and the MinHash-LSH / SimHash candidate generators."""

from __future__ import annotations

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import dedup

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the old barn"),
    (2, "the quick brown fox jumps over the lazy dog near the old shed"),
    (3, "the quick brown fox jumps over the lazy dog near the old barn"),
    (4, "completely different text about spark shuffles and partitions here"),
    (5, "another unrelated document mentioning catalyst optimizer rules only"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_minhash_verified_subset_of_exact_jaccard(spark):
    df = _docs_df(spark)
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    verified = dedup.minhash_lsh_pairs(df, verify_threshold=0.5).collect()
    assert verified, "near-identical docs must collide in some band"
    for r in verified:
        # verification must agree exactly with the standalone Jaccard op
        assert exact[(r["id_a"], r["id_b"])] == r["jaccard"]
    # the identical pair (1,3) has jaccard 1.0 and always collides
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified}
    assert got[(1, 3)] == 1.0


def test_minhash_candidates_no_verify(spark):
    df = _docs_df(spark)
    cand = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(df, verify_threshold=None).collect()
    }
    assert (1, 3) in cand


def test_simhash_identical_docs_hamming_zero(spark):
    df = _docs_df(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_dup_pairs(df, max_hamming=3).collect()
    }
    assert pairs.get((1, 3)) == 0
    # unrelated docs must not appear within hamming 3
    assert (4, 5) not in pairs


def test_exact_and_keep_last_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "c", 30)],
        "k long, payload string, ord long",
    )
    assert dedup.exact_dedup(df, ["k"]).count() == 2
    kept = {
        r["k"]: r["payload"]
        for r in dedup.keep_last_dedup(df, ["k"], "ord").collect()
    }
    assert kept == {1: "b", 2: "c"}


def test_connected_components_chain_and_singletons(spark):
    from pyspark.sql import functions as F

    from security_data_pipeline_spark.operators import dedup

    # chain 1-2-3-4-5 needs several propagation rounds; 10 is isolated
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (4, 5), (7, 6)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 6, 7, 10]], ["doc_id"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(
            edges, nodes=nodes, id_col="doc_id"
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 6, 10: 10}


def test_winnow_guarantee_shared_run_yields_fingerprint(spark):
    """MOSS guarantee: two docs sharing a run of k+window-1 tokens share at
    least one selected fingerprint."""
    from security_data_pipeline_spark.operators.dedup import winnow_fingerprints

    shared_run = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, "intro words here " + shared_run + " tail one"),
        (2, "completely different lead " + shared_run + " other ending"),
        (3, "no overlap with anything else at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=5, window=4)
    rowsc = fps.collect()
    d = {}
    for r in rowsc:
        d.setdefault(r["doc_id"], set()).add(r["fp"])
    assert d[1] & d[2], "shared 8-token run must yield a common fingerprint"
    assert not (d[1] & d[3]) and not (d[2] & d[3])


def test_winnow_short_doc_still_fingerprinted(spark):
    from security_data_pipeline_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame([(1, "two words")], "doc_id long, text string")
    out = winnow_fingerprints(df, k=5, window=4).collect()
    assert len(out) == 1  # one fingerprint of the whole short text


def test_winnow_dup_pairs_containment(spark):
    from security_data_pipeline_spark.operators.dedup import winnow_dup_pairs

    base = "one two three four five six seven eight nine ten " * 3
    rows = [(1, base + "ending alpha"), (2, base + "ending beta"),
            (3, "unrelated content entirely different from the rest ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_dup_pairs(df, min_shared=2).collect()
    pairs = {(r["id_a"], r["id_b"]): r["containment"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5
    assert all(p == (1, 2) for p in pairs)


def test_winnow_null_text_emits_no_fingerprints(spark):
    from security_data_pipeline_spark.operators.dedup import (
        winnow_dup_pairs,
        winnow_fingerprints,
    )

    rows = [(1, None), (2, None), (3, "real content here for this doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df).collect()
    assert {r["doc_id"] for r in fps} == {3}
    # without the NULL filter, docs 1 and 2 would share md5('') and pair up
    assert winnow_dup_pairs(df, min_shared=1).count() == 0


def test_jaccard_prefix_join_exact_vs_bruteforce(spark):
    """The prefix filter must lose NOTHING: every pair with token-set
    Jaccard >= t, verified against an O(n^2) brute force on a corpus with
    known overlaps."""
    import itertools

    texts = {
        1: "alpha beta gamma delta epsilon",
        2: "alpha beta gamma delta zeta",      # 4/6 = 0.667 vs 1
        3: "alpha beta gamma delta epsilon",   # exact dup of 1
        4: "omega psi chi phi upsilon",        # disjoint
        5: "alpha beta gamma theta iota",      # 3/7 vs 1
        6: "omega psi chi phi tau",            # 4/6 vs 4
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    t = 0.6
    sets = {i: set(s.split()) for i, s in texts.items()}
    expect = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        jac = inter / (len(sets[a]) + len(sets[b]) - inter)
        if round(jac, 6) >= t:
            expect.add((a, b, round(jac, 6)))
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.jaccard_prefix_join(df, threshold=t).collect()
    }
    assert got == expect, (got, expect)
    assert (1, 3, 1.0) in got and (1, 2, 0.666667) in got


def test_jaccard_prefix_join_matches_bucketed_ngram_form(spark):
    """ngram=5 mode returns EXACTLY the pairs of ngram_jaccard_pairs
    (uncapped) — the recall-lossless sibling over the same shingle sets."""
    from security_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    pp = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.jaccard_prefix_join(
            docs, threshold=0.8, ngram=5
        ).collect()
    }
    ng = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert pp == ng and len(pp) == 25


def test_jaccard_prefix_join_prunes_stopword_buckets(spark):
    """The rarity order puts ubiquitous tokens at the END of each set, so
    a stop-word shared by every doc never enters a short prefix — unlike
    share-any-token candidate generation, which would go quadratic."""
    n = 60
    # every doc: 9 shared stop-words + 6 unique tokens -> jaccard between
    # distinct docs = 9/21 < 0.6; prefix length = 15 - ceil(0.6*15) + 1 = 7
    # < 7 unique slots only if... unique tokens are rarer than the shared
    # ones, so prefixes hold ONLY unique tokens -> zero candidates
    stop = " ".join(f"the{j}" for j in range(9))
    rows = [
        (i, f"{stop} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f") for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.jaccard_prefix_join(df, threshold=0.6)
    assert out.count() == 0


def test_cross_corpus_neardups_matches_self_join_cross_pairs(spark):
    """Two-sided pairing must recover exactly the self-join's pairs that
    straddle the side split — same index, cheaper pairing, no recall
    change; and it must never pair within one side."""
    from security_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    new = docs.filter(F.col("doc_id") % 2 == 0)
    ref = docs.filter(F.col("doc_id") % 2 == 1)
    cross = {
        (r["new_id"], r["ref_id"], r["jaccard"])
        for r in dedup.cross_corpus_neardups(
            new, ref, verify_threshold=0.05, portable=True
        ).collect()
    }
    self_pairs = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs(
            docs, verify_threshold=0.05, portable=True
        ).collect()
    }
    want = {
        (a, b, j) if a % 2 == 0 else (b, a, j)
        for (a, b, j) in self_pairs
        if (a % 2) != (b % 2)
    }
    assert cross == want and len(cross) > 0
    assert all(n % 2 == 0 and r % 2 == 1 for n, r, _ in cross)


def test_pick_cluster_survivors_policy(spark):
    """Highest score wins; ties break to the lowest id; every member of a
    cluster maps to the same survivor; singletons keep themselves."""
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 9), (10, 9)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (7, 1.0), (9, 2.0), (10, 2.0)],
        "doc_id long, score double",
    )
    out = {
        r["doc_id"]: (r["survivor_id"], r["keep"])
        for r in dedup.pick_cluster_survivors(clusters, scores).collect()
    }
    # cluster 1: 2 and 3 tie at 9.0 -> lowest id 2 wins
    assert out[1] == (2, False) and out[2] == (2, True) and out[3] == (2, False)
    assert out[7] == (7, True)  # singleton
    # cluster 9: tie at 2.0 -> 9 wins
    assert out[9] == (9, True) and out[10] == (9, False)


def test_pick_cluster_survivors_string_ids(spark):
    """String doc ids (what connected_components/minhash accept) must work:
    the tie-break orders ids lexicographically without numeric casts."""
    clusters = spark.createDataFrame(
        [("d/a", "c1"), ("d/b", "c1"), ("d/c", "c1"), ("x", "x")],
        "doc_id string, cluster_id string",
    )
    scores = spark.createDataFrame(
        [("d/a", 1.0), ("d/b", 7.0), ("d/c", 7.0), ("x", 0.5)],
        "doc_id string, score double",
    )
    out = {
        r["doc_id"]: (r["survivor_id"], r["keep"])
        for r in dedup.pick_cluster_survivors(clusters, scores).collect()
    }
    # d/b and d/c tie at 7.0 -> lexicographically lowest id d/b wins
    assert out["d/a"] == ("d/b", False)
    assert out["d/b"] == ("d/b", True)
    assert out["d/c"] == ("d/b", False)
    assert out["x"] == ("x", True)


def test_pick_cluster_survivors_null_scores_lose(spark):
    """A NULL score must never beat a scored member (a bare -score struct
    key sorts the NULL field first and would elect the unscored doc); a
    cluster whose members are ALL unscored falls back to the lowest id."""
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (6, 5)], "doc_id long, cluster_id long"
    )
    scores = spark.createDataFrame(
        [(1, None), (2, 0.9), (5, None), (6, None)],
        "doc_id long, score double",
    )
    out = {
        r["doc_id"]: (r["survivor_id"], r["keep"])
        for r in dedup.pick_cluster_survivors(clusters, scores).collect()
    }
    # cluster 1: the scored doc 2 wins over NULL-scored doc 1
    assert out[1] == (2, False) and out[2] == (2, True)
    # cluster 5: all NULL -> lowest id 5
    assert out[5] == (5, True) and out[6] == (5, False)


def test_incremental_components_equal_full_recompute(spark):
    """Star contraction: folding a new batch's nodes/edges into an old
    labeling equals the full recompute on the cumulative graph — across
    merges of old components, brand-new components, and singletons."""
    import random

    rng = random.Random(17)
    nodes1 = list(range(0, 60))
    edges1 = [(i, i + 1) for i in range(0, 30, 2)]  # 15 two-cliques
    nodes2 = list(range(60, 100))
    # new-new edges, plus bridges that MERGE old components
    edges2 = (
        [(rng.choice(nodes2), rng.choice(nodes2)) for _ in range(25)]
        + [(1, 3), (5, 61)]  # old-old bridge, old-new bridge
    )

    def df_edges(e):
        return spark.createDataFrame(
            [(a, b) for a, b in e if a != b] or [(0, 0)],
            "id_a long, id_b long",
        ).filter(F.col("id_a") != F.col("id_b"))

    def df_nodes(n):
        return spark.createDataFrame([(x,) for x in n], "doc_id long")

    full = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(
            df_edges(edges1 + edges2), df_nodes(nodes1 + nodes2)
        ).collect()
    }
    prev = dedup.connected_components(df_edges(edges1), df_nodes(nodes1))
    inc = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components_incremental(
            prev, df_edges(edges2), df_nodes(nodes2)
        ).collect()
    }
    assert inc == full


def test_incremental_cc_propagates_only_affected_components(spark, monkeypatch):
    """The scale contract of the incremental fold: components no new edge
    touches never enter the propagation (they pass through an anti-join),
    so per-batch shuffle volume follows the touched slice, not the
    corpus. Pinned by spying on the node set handed to
    connected_components."""
    prev = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 10), (11, 10), (20, 20)],
        "doc_id long, cluster_id long",
    )
    edges = spark.createDataFrame([(2, 30)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(30,)], "doc_id long")

    captured = {}
    orig = dedup.connected_components

    def spy(e, n, *a, **k):
        captured["nodes"] = {r[0] for r in n.collect()}
        return orig(e, n, *a, **k)

    monkeypatch.setattr(dedup, "connected_components", spy)
    out = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components_incremental(
            prev, edges, nodes
        ).collect()
    }
    # only the touched component {1,2} and the new node walk
    assert captured["nodes"] == {1, 2, 30}
    assert out == {(1, 1), (2, 1), (30, 1), (10, 10), (11, 10), (20, 20)}


def test_contamination_report_edges(spark):
    """Per-eval-doc report: hit counts and worst corpus df are exact;
    clean docs report zeros; docs shorter than n tokens report 0 grams
    and frac 0.0 rather than disappearing or dividing by zero."""
    bench = spark.createDataFrame(
        [
            (1, "a b c d e"),      # grams: "a b c", "b c d", "c d e"
            (2, "x y z w"),        # grams: "x y z", "y z w" — clean
            (3, "too short"),      # < 3 tokens -> zero grams
        ],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "a b c d q"),     # contains "a b c", "b c d"
            (11, "p q a b c"),     # contains "a b c"
            (12, "nothing here at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (
            r["n_grams"], r["n_hit"], r["contamination_frac"],
            r["max_corpus_df"],
        )
        for r in dedup.contamination_report(corpus, bench, n=3).collect()
    }
    # doc 1: 3 grams, 2 leaked; "a b c" appears in 2 corpus docs
    assert out[1] == (3, 2, round(2 / 3, 6), 2)
    assert out[2] == (2, 0, 0.0, 0)
    assert out[3] == (0, 0, 0.0, 0)


def test_shingle_ops_tolerate_short_and_null_docs(spark):
    """Docs shorter than n tokens (or NULL) must neither crash the
    shingle pipeline (sequence(1,0) counts DOWN into an illegal slice
    start) nor band-collide with each other on empty signatures (ANSI
    divide-by-zero in the verify ratio, spurious candidate pairs
    without it). They carry no n-gram evidence, so they simply never
    pair."""
    df = spark.createDataFrame(
        [
            (1, "hi"),
            (2, "yo"),
            (3, None),
            (4, "the quick brown fox jumps over the lazy dog today ok"),
            (5, "the quick brown fox jumps over the lazy dog today no"),
        ],
        "doc_id long, text string",
    )
    jac = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(df, threshold=0.3).collect()}
    assert jac == {(4, 5)}
    ver = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(df, verify_threshold=0.3).collect()}
    assert ver == {(4, 5)}
    cand = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(df, verify_threshold=None).collect()}
    assert cand == {(4, 5)}, "empty signatures must not band-collide"
    cross = {(r.new_id, r.ref_id) for r in dedup.cross_corpus_neardups(df, df, verify_threshold=0.3).collect()}
    assert cross == {(4, 4), (4, 5), (5, 4), (5, 5)}
