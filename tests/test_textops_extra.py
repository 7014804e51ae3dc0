"""Edge-case tests for the corpus-curation text operators added in round 2:
repetition signals, sliding-window chunking, PII scrubbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_uniform_doc_is_fully_repeated(spark):
    df = _docs(spark, [(1, "spam spam spam spam spam spam")])
    r = textops.repetition_features(df).first()
    # 5 bigrams, all "spam spam" → coverage 2*5/6
    assert r["distinct_token_ratio"] == round(1 / 6, 6)
    assert r["top_bigram_frac"] == round(10 / 6, 6)


def test_repetition_all_distinct_doc(spark):
    df = _docs(spark, [(1, "a b c d e f")])
    r = textops.repetition_features(df).first()
    assert r["distinct_token_ratio"] == 1.0
    # every bigram unique → max multiplicity 1 → 2/6
    assert r["top_bigram_frac"] == round(2 / 6, 6)


def test_chunking_exact_window_yields_one_chunk(spark):
    df = _docs(spark, [(1, " ".join(f"t{i}" for i in range(32)))])
    rows = textops.chunk_documents(df, window=32, stride=24).collect()
    assert len(rows) == 1 and rows[0]["chunk_tokens"] == 32


def test_chunking_overlap_and_tail(spark):
    # 40 tokens, window 32 stride 24 → chunks at offsets 0 and 24 (16-token tail)
    toks = [f"t{i}" for i in range(40)]
    df = _docs(spark, [(1, " ".join(toks))])
    rows = sorted(
        textops.chunk_documents(df, window=32, stride=24).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["chunk_tokens"] for r in rows] == [32, 16]
    # overlap: chunk 1 starts at token 24 → 8 shared tokens with chunk 0
    assert rows[0]["chunk_fp"] != rows[1]["chunk_fp"]


def test_chunking_invariants_all_lengths(spark):
    """For every doc length 1..120 (one Spark job): chunk i holds exactly
    min(window, n - stride·i) tokens, chunk count matches the closed form,
    and the final chunk is never empty — i.e. chunks tile the doc with
    window-stride overlap and no token is dropped."""
    import math

    window, stride = 32, 24
    rows = [(n, " ".join(f"t{i}" for i in range(n))) for n in range(1, 121)]
    out = textops.chunk_documents(
        _docs(spark, rows), window=window, stride=stride
    ).collect()
    chunks: dict[int, dict[int, int]] = {}
    for r in out:
        chunks.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_tokens"]
    for n in range(1, 121):
        k_expect = 1 if n <= window else 1 + math.ceil((n - window) / stride)
        got = chunks[n]
        assert sorted(got) == list(range(k_expect)), (n, sorted(got))
        for i, size in got.items():
            assert size == min(window, n - stride * i) and size > 0, (n, i, size)


def test_scrub_pii_replaces_emails_and_ips_only(spark):
    df = _docs(
        spark,
        [(1, "mail alice.smith+x@sub.example.org or 192.168.0.1 but not 1.2.3")],
    )
    out = df.select(textops.scrub_pii("text").alias("s")).first()["s"]
    assert "<EMAIL>" in out and "<IP>" in out
    assert "example.org" not in out and "192.168" not in out
    assert "1.2.3" in out  # three octets: not an IPv4, untouched


def test_unigram_lm_scores_rank_fluency(spark):
    from security_data_pipeline_spark.operators.textops import unigram_lm_scores

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "zqx jvw kpt qqq zzz aab"),  # all-rare tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_lm_scores(df).collect()}
    assert out[1]["n_tokens"] == 6
    # docs built from corpus-frequent tokens score better (higher avg
    # logprob, lower perplexity) than the all-singleton doc
    assert out[1]["avg_logprob"] > out[3]["avg_logprob"]
    assert out[1]["perplexity"] < out[3]["perplexity"]
    assert out[2]["perplexity"] < out[3]["perplexity"]


def test_unigram_lm_vocab_cap_sends_tail_to_oov(spark):
    from security_data_pipeline_spark.operators.textops import unigram_lm_scores

    rows = [(1, "a a a b b c"), (2, "c b a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cap=1 keeps only 'a' in vocab; 'b'/'c' fall back to the OOV mass, so
    # both docs still score and doc 1 (more 'a' mass) scores better
    out = {r["doc_id"]: r for r in unigram_lm_scores(df, max_vocab=1).collect()}
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]


def test_bm25_ranks_term_frequency_and_length(spark):
    from security_data_pipeline_spark.operators import textops

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark tuning"),          # high tf, short
            (2, "spark " + "filler " * 50),            # one hit, long doc
            (3, "spark tuning guide"),                 # one hit, short
            (4, "nothing relevant here"),              # no hit
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["bm25"], r["rank"])
        for r in textops.bm25_topk(docs, ["spark"], k=10).collect()
    }
    assert 4 not in out  # zero-score docs never rank
    assert out[1][1] == 1  # tf saturation still rewards repetition
    # length normalization: the short single-hit doc outranks the long one
    assert out[3][0] > out[2][0]


def test_hybrid_rrf_fuses_and_is_deterministic(spark):
    from pyspark.sql import functions as F

    from security_data_pipeline_spark.operators import textops

    a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(12, 1), (13, 2)], "doc_id long, rank int"
    )
    out = {
        r["doc_id"]: (r["rrf_score"], r["fused_rank"])
        for r in textops.hybrid_rrf(a, b, k=10).collect()
    }
    # doc 12 appears in both lists -> highest fused score
    assert out[12][1] == 1
    assert out[12][0] == round(1 / 63 + 1 / 61, 6)
    # one-list docs score exactly their single reciprocal term
    assert out[10][0] == round(1 / 61, 6)
    assert out[13][0] == round(1 / 62, 6)
    assert set(out) == {10, 11, 12, 13}


# --- Gopher repetition gate (gopher_repetition_stats) -----------------------


def _py_gopher(text: str, top_ns=(2, 3, 4), dup_n=8):
    """Reference model: brute-force counts + interval-union coverage."""
    toks = (text or "").split(" ")
    n_tok = len(toks)
    out = {"n_tokens": n_tok}
    for n in top_ns:
        grams = [" ".join(toks[i : i + n]) for i in range(n_tok - n + 1)]
        mult = max((grams.count(g) for g in set(grams)), default=0)
        out[f"top{n}gram_frac"] = round(n * mult / n_tok, 6)
    grams = [" ".join(toks[i : i + dup_n]) for i in range(n_tok - dup_n + 1)]
    from collections import Counter

    cnt = Counter(grams)
    pos = sorted(i for i, g in enumerate(grams) if cnt[g] >= 2)
    covered, end = 0, -1
    for p in pos:
        covered += dup_n if p > end else max(0, p + dup_n - 1 - end)
        end = p + dup_n - 1
    out["dup_gram_frac"] = round(covered / n_tok, 6)
    return out


def test_gopher_single_token_doc_no_crash(spark):
    # regression: sequence(1, 0) is DESCENDING [1, 0] in Spark, so the
    # unguarded bigram index crashed stage-fatal on 1-token documents
    df = _docs(spark, [(1, "x"), (2, ""), (3, None)])
    rows = textops.gopher_repetition_stats(df).collect()
    assert all(r["rep_keep"] for r in rows)
    assert all(r["dup_gram_frac"] == 0.0 for r in rows)
    # the older repetition_features shared the bug via its bigram build
    feats = textops.repetition_features(df.fillna({"text": ""})).collect()
    assert all(f["top_bigram_frac"] == 0.0 for f in feats)


def test_gopher_periodic_doc_flagged(spark):
    df = _docs(spark, [(1, "a b c d e f g h a b c d e f g h")])
    r = textops.gopher_repetition_stats(df).first()
    # the 8-gram at 0 repeats at 8: coverage [0,7] ∪ [8,15] = all 16
    assert r["dup_gram_frac"] == 1.0
    assert not r["rep_keep"]


def test_gopher_overlapping_occurrences_merge_once(spark):
    # "a b" starts at 0,2,4: dup 2-gram intervals [0,1],[2,3],[4,5] chain
    # with [1,2],[3,4] from "b a" → one island covering all 6 tokens
    df = _docs(spark, [(1, "a b a b a b")])
    r = textops.gopher_repetition_stats(df, dup_n=2, top_ns=(2,)).first()
    assert r["dup_gram_frac"] == 1.0
    # Gopher's top-n definition overcounts overlaps by design (can exceed 1)
    assert r["top2gram_frac"] == 1.0


def test_gopher_matches_python_model_random_docs(spark):
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 24))))
        for i in range(60)
    ]
    df = _docs(spark, rows)
    got = {
        r["doc_id"]: r.asDict()
        for r in textops.gopher_repetition_stats(df, dup_n=3).collect()
    }
    for i, text in rows:
        exp = _py_gopher(text, dup_n=3)
        g = got[i]
        for k, v in exp.items():
            assert g[k] == v, f"doc {i} ({text!r}) {k}: {g[k]} != {v}"


def test_gopher_plan_is_map_only(spark):
    # the 100 TB claim: stats are per-row folds — no Exchange anywhere
    df = _docs(spark, [(1, "a b c")])
    plan = textops.gopher_repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_curation_audit_reconciles_with_funnel(spark):
    """The per-doc audit verdicts GROUP to exactly the funnel's counts —
    the two views of the same pipeline cannot drift apart."""
    from collections import Counter

    from security_data_pipeline_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    audit = REGISTRY["doc_curation_audit"].fn(spark, sf).collect()
    funnel = {
        r["source"]: r
        for r in REGISTRY["corpus_curation"].fn(spark, sf).collect()
    }
    per: dict[str, Counter] = {}
    for r in audit:
        per.setdefault(r["source"], Counter())[r["verdict"]] += 1
    assert set(per) == set(funnel)
    for src, c in per.items():
        f = funnel[src]
        total = sum(c.values())
        assert total == f["docs_in"]
        assert total - c["low_quality"] == f["docs_kept"]
        assert total - c["low_quality"] - c["duplicate"] == f["docs_unique"]
        assert (
            total - c["low_quality"] - c["duplicate"] - c["repetitive"]
            == f["docs_rep_ok"]
        )
        assert c["kept"] == f["docs_clean"]


def test_vocab_topk_order_and_bound(spark):
    from security_data_pipeline_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b c d"), (3, "A")],
        "doc_id long, text string",
    )
    # counts: a=4 (lowercased), b=3, c=2, d=1; ties broken by token asc
    assert textops.vocab_topk(docs, k=3) == ["a", "b", "c"]
    assert textops.vocab_topk(docs, k=10) == ["a", "b", "c", "d"]


def test_oov_stats_per_doc_and_grouped(spark):
    from security_data_pipeline_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "s1", "a b x"), (2, "s1", "a a"), (3, "s2", "y z"), (4, "s2", "")],
        "doc_id long, source string, text string",
    )
    vocab = ["a", "b"]
    per_doc = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_frac"])
        for r in textops.oov_stats(docs, vocab).collect()
    }
    assert per_doc[1] == (3, 1, 1.0 / 3.0)
    assert per_doc[2] == (2, 0, 0.0)
    assert per_doc[3] == (2, 2, 1.0)
    assert per_doc[4] == (0, 0, None)  # empty doc: no division by zero
    by_src = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["oov_tokens"])
        for r in textops.oov_stats(docs, vocab, by="source").collect()
    }
    assert by_src["s1"] == (2, 5, 1)
    assert by_src["s2"] == (2, 2, 2)


def test_oov_stats_join_path_equals_hof_path(spark):
    """The two membership strategies (HOF fold for tiny vocabs,
    explode + broadcast-join for tokenizer-scale vocabs) must produce
    identical results — including the zero-token doc that explode_outer
    has to preserve — and the join path must broadcast the vocab, never
    sort-merge it."""
    from security_data_pipeline_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "s1", "a b x"), (2, "s1", "a a"), (3, "s2", "y z"), (4, "s2", "")],
        "doc_id long, source string, text string",
    )
    vocab = ["a", "b"]
    hof = textops.oov_stats(docs, vocab)
    joined = textops.oov_stats(docs, vocab, hof_max_vocab=0)
    key = lambda df: {  # noqa: E731
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_frac"])
        for r in df.collect()
    }
    assert key(hof) == key(joined)
    hof_by = textops.oov_stats(docs, vocab, by="source")
    joined_by = textops.oov_stats(docs, vocab, by="source", hof_max_vocab=0)
    gkey = lambda df: {  # noqa: E731
        r["source"]: (
            r["n_docs"], r["total_tokens"], r["oov_tokens"], r["oov_frac"]
        )
        for r in df.collect()
    }
    assert gkey(hof_by) == gkey(joined_by)
    # duplicate vocab entries must not double-count join rows
    assert key(textops.oov_stats(docs, ["a", "b", "a"], hof_max_vocab=0)) == key(hof)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_normalize_scores_by_group(spark):
    from security_data_pipeline_spark.operators import textops

    df = spark.createDataFrame(
        [
            ("a", 1, 0.0), ("a", 2, 1.0), ("a", 3, 2.0),   # mu=1, sd=sqrt(2/3)
            ("b", 4, 5.0), ("b", 5, 5.0),                   # sd=0: degenerate
            ("c", 6, 0.0), ("c", 7, 100.0),                 # extreme: clipped
        ],
        "source string, doc_id long, s double",
    )
    out = {
        r["doc_id"]: r["s_z"]
        for r in textops.normalize_scores_by_group(
            df, by="source", score_col="s", clip=2.0
        ).collect()
    }
    import math

    sd = math.sqrt(2.0 / 3.0)
    assert abs(out[1] - (-1.0 / sd)) < 1e-9
    assert abs(out[2]) < 1e-9
    assert abs(out[3] - (1.0 / sd)) < 1e-9
    assert out[4] == 0.0 and out[5] == 0.0   # sigma=0 group maps to 0
    assert out[6] == -1.0 and out[7] == 1.0  # two-point group: z=±1, unclipped
    # clipping engages on a genuinely heavy tail
    df2 = spark.createDataFrame(
        [("d", i, 0.0) for i in range(9)] + [("d", 9, 100.0)],
        "source string, doc_id long, s double",
    )
    out2 = {
        r["doc_id"]: r["s_z"]
        for r in textops.normalize_scores_by_group(
            df2, by="source", score_col="s", clip=2.0
        ).collect()
    }
    assert out2[9] == 2.0  # raw z=3: winsorized to the clip


def test_zipf_fit_recovers_slope(spark):
    """A corpus built with exact freq(rank) = round(1000 * rank^-1)
    token counts must fit slope ~ -1; a uniform corpus fits slope 0."""
    from security_data_pipeline_spark.operators.textops import zipf_fit

    words = []
    for rank in range(1, 21):
        words += [f"w{rank:02d}"] * round(1000 / rank)
    # one doc per chunk of 50 tokens
    docs = [
        (i, " ".join(words[i * 50 : (i + 1) * 50]))
        for i in range(len(words) // 50 + 1)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = zipf_fit(df, "text", top_k=20).collect()[0]
    assert r["n_ranked"] == 20
    assert abs(r["slope"] - (-1.0)) < 0.01

    uniform = spark.createDataFrame(
        [(0, (" ".join(f"u{i}" for i in range(30)) + " ") * 3)],
        "doc_id long, text string",
    )
    ru = zipf_fit(uniform, "text", top_k=30).collect()[0]
    assert abs(ru["slope"]) < 1e-9


def test_bigram_lm_flags_word_salad(spark):
    """The interpolated bigram LM must separate natural-order text from
    a shuffle of the same unigrams — the exact failure mode a unigram LM
    cannot see (identical token counts, identical unigram perplexity)."""
    from security_data_pipeline_spark.operators.textops import (
        bigram_lm_scores,
        unigram_lm_scores,
    )

    natural = "the cat sat on the mat and the dog sat on the rug"
    # same multiset of tokens, scrambled transitions
    salad = "mat the on dog sat rug the cat the and on sat the"
    corpus = [(i, natural) for i in range(20)] + [(100, salad)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")

    bi = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert bi[0]["avg_logprob"] > bi[100]["avg_logprob"]
    assert bi[100]["perplexity"] > bi[0]["perplexity"]

    uni = {r["doc_id"]: r for r in unigram_lm_scores(df).collect()}
    # unigram scores are blind to the scramble (same token multiset)
    assert uni[0]["avg_logprob"] == uni[100]["avg_logprob"]


def test_bigram_lm_bruteforce(spark):
    import math

    from security_data_pipeline_spark.operators.textops import (
        bigram_lm_scores,
    )

    docs = [(1, "a b a c"), (2, "b a"), (3, "a"), (4, "c c b a b")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert 3 not in got  # single-token doc has no bigram positions

    toks = [t for _, s in docs for t in s.split(" ")]
    uni = {}
    for t in toks:
        uni[t] = uni.get(t, 0) + 1
    T, V = len(toks), len(uni)
    pairs = [
        (w[i], w[i + 1])
        for _, s in docs
        for w in [s.split(" ")]
        if len(w) >= 2
        for i in range(len(w) - 1)
    ]
    cab, ca = {}, {}
    for a, b in pairs:
        cab[(a, b)] = cab.get((a, b), 0) + 1
        ca[a] = ca.get(a, 0) + 1
    for doc_id, s in docs:
        w = s.split(" ")
        if len(w) < 2:
            continue
        lps = [
            math.log(
                0.7 * (cab[(a, b)] / ca[a])
                + 0.3 * ((uni.get(b, 0) + 0.5) / (T + 0.5 * (V + 1.0)))
            )
            for a, b in zip(w, w[1:])
        ]
        avg = sum(lps) / len(lps)
        assert got[doc_id]["n_bigrams"] == len(lps)
        assert abs(got[doc_id]["avg_logprob"] - avg) < 1e-5
        assert abs(got[doc_id]["perplexity"] - math.exp(-avg)) < 1e-3


def test_quality_auto_threshold_hits_target_rate_with_tie_overshoot(spark):
    """The operating-point picker keeps AT LEAST the target fraction per
    stratum (percentile semantics: >= threshold catches every tied doc),
    thresholds differ across strata with different score distributions,
    and a stratum of identical scores keeps everything (the extreme tie
    case the realized_rate column exists to expose)."""
    from security_data_pipeline_spark.operators.textops import (
        quality_auto_threshold_report,
    )

    # srcA: 10 docs with increasing length -> spread scores
    rows = [("a", " ".join(["the"] * (5 + 10 * i))) for i in range(10)]
    # srcB: 10 identical docs -> one score, total tie
    rows = [("srcA", t) for _, t in rows] + [
        ("srcB", "the a of to in is word " * 4)
    ] * 10
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r["source"]: r
        for r in quality_auto_threshold_report(
            df, keep_rate=0.3, drop_pct=0.7
        ).collect()
    }
    a, b = got["srcA"], got["srcB"]
    assert a["n_docs"] == 10 and b["n_docs"] == 10
    assert a["realized_rate"] >= 0.3 - 1e-9
    assert a["n_kept"] < 10, "spread scores must actually gate"
    assert b["n_kept"] == 10 and b["realized_rate"] == 1.0, (
        "an all-tied stratum keeps everything — the honest tie cost"
    )
    assert a["threshold"] != b["threshold"]
    assert a["target_rate"] == b["target_rate"] == 0.3


def test_threshold_from_score_counts_bitwise_equals_batch_picker(spark):
    """The histogram tail must reproduce the batch picker's thresholds
    and keep report BIT-for-bit from the additive (source, score, count)
    statistic — at a second scale factor (sf0.001; the oracle-parity
    sweep covers sf0.01 through the streamed registered query). Also the
    regression trap for the `_N`-vs-`_n` case-collision bug: under the
    default case-insensitive resolver, withColumn("_N", ...) silently
    REPLACED the `_n` count column and every cumulative was garbage."""
    import struct

    from security_data_pipeline_spark.operators.evaluation import (
        score_label_counts,
    )
    from security_data_pipeline_spark.operators.textops import (
        quality_auto_threshold_report,
        quality_features,
        threshold_from_score_counts,
    )
    from security_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    scored = quality_features(docs).select(
        "source", "quality_score", F.lit(0).alias("_lbl")
    )
    counts = score_label_counts(scored, "quality_score", "_lbl", ["source"])
    got = {
        r["source"]: r for r in threshold_from_score_counts(counts).collect()
    }
    exp = {
        r["source"]: r
        for r in quality_auto_threshold_report(docs).collect()
    }
    assert set(got) == set(exp) and got, "source sets differ"
    for s in exp:
        for col in ("n_docs", "n_kept"):
            assert got[s][col] == exp[s][col], (s, col, got[s], exp[s])
        for col in ("threshold", "realized_rate", "target_rate"):
            assert struct.pack("<d", got[s][col]) == struct.pack(
                "<d", exp[s][col]
            ), (s, col, got[s][col], exp[s][col])
