"""Text-analysis operators for large-scale document pipelines.

Language-ID (stopword heuristic), quality scoring, token counting, document
fingerprinting — the text ops a training-data pipeline runs over billions of
documents. Everything is built-in Column expressions (split / filter /
aggregate higher-order functions): JVM-side, codegen-friendly, no UDFs, so
the same expressions run unchanged in Structured Streaming.

Determinism note: formulas avoid engine-specific float reductions so the
DuckDB oracle can reproduce them bit-for-bit (integer counts + one final
double division).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Small English stopword core — enough for a ratio heuristic; deliberately
# tiny and fixed so the oracle SQL can inline it.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "to", "in", "and", "is", "it", "for",
    "on", "with", "as", "at", "by", "be", "this", "that", "or", "are",
)


def tokens(col: Column | str, delim: str = " ") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, delim)


def token_count(col: Column | str) -> Column:
    """Whitespace token count (BPE-ish subword estimate ≈ chars/4 is a
    separate column — see quality_features)."""
    return F.size(tokens(col))


def stopword_count(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # simple class — identical semantics in Java regex and RE2
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-collapsed,
    lowercased, trimmed text. md5 is available verbatim in the DuckDB oracle
    (unlike xxhash64), so fingerprints are cross-engine comparable."""
    c = F.col(col) if isinstance(col, str) else col
    canon = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(canon)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality columns:

    - n_tokens, n_chars, avg_token_len
    - stopword_ratio (fluency proxy), punct_ratio
    - quality_score ∈ [0,1]: 0.5·min(n_tokens,200)/200 + 0.5·stopword-signal

    One projection; all counts integer, ratios one double division each.
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    n_chars = F.length(t)
    n_stop = stopword_count(t)
    n_punct = punct_count(t)
    stop_ratio = n_stop.cast("double") / F.nullif(n_tok, F.lit(0)).cast("double")
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_chars_computed", n_chars)
        .withColumn(
            "avg_token_len",
            F.round(n_chars.cast("double") / F.nullif(n_tok, F.lit(0)).cast("double"), 6),
        )
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn(
            "punct_ratio",
            F.round(n_punct.cast("double") / F.nullif(n_chars, F.lit(0)).cast("double"), 6),
        )
        .withColumn(
            "quality_score",
            F.round(
                0.5 * F.least(n_tok, F.lit(200)).cast("double") / 200.0
                + 0.5 * F.least(stop_ratio * 5.0, F.lit(1.0)),
                6,
            ),
        )
    )


def classifier_score(
    features: dict[str, float],
    bias: float = 0.0,
) -> Column:
    """Logistic quality-classifier score: ``sigmoid(bias + Σ w_i · x_i)``
    over already-computed feature columns (e.g. :func:`quality_features`
    output). This is the standard fasttext/logreg-style quality gate of LLM
    data pipelines, evaluated as ONE Column expression — the model rides the
    projection, no UDF, no batch hop, trivially fused into the scan at
    100 TB. Weights arrive as plain literals so the identical arithmetic is
    reproducible in any SQL engine up to libm ulps — ``exp`` is not
    required to be correctly rounded, so engines may differ in the last
    bits; consumers should round before thresholding or comparing (the
    registered gate compares ``round(score, 6)`` on both engines, and the
    6dp rounding absorbs the ulps).

    NULL features contribute 0 (treated as missing-at-neutral).
    """
    z: Column = F.lit(float(bias))
    for name, w in features.items():
        z = z + F.coalesce(F.col(name).cast("double"), F.lit(0.0)) * F.lit(
            float(w)
        )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def unigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 50_000,
    smoothing_k: float = 0.5,
) -> DataFrame:
    """Unigram language-model quality scores: fit add-k-smoothed token
    logprobs on the corpus itself, then score each document by mean token
    logprob and perplexity — the classic LM-based quality filter
    (perplexity-vs-corpus), done with two aggregations and one broadcast
    join, no model runtime.

    Model: ``p(tok) = (count + k) / (T + k·(V+1))`` over the top
    ``max_vocab`` tokens (ties broken by token asc for determinism); any
    other token is OOV with ``p = k / (T + k·(V+1))``. ``T`` counts ALL
    token occurrences, so vocab truncation only affects which tokens fall
    back to the OOV mass.

    At 100 TB: the vocab fit is one token-level groupBy + TakeOrdered
    (top-k, no full sort); the capped vocab (~MBs) broadcasts to the
    scoring join, so the only wide exchange of the scoring pass is the
    per-document re-aggregation. Output: id_col, n_tokens, avg_logprob
    (6dp), perplexity (4dp) — rounding absorbs float-sum ordering and
    libm ulp differences across engines by a MEASURED margin, not by
    assumption: the closest any doc's mean sits to a 6 dp half-boundary
    is ~2.5e-11 absolute vs ~2e-12 of realistic accumulation difference
    (SCALE.md "Round-11 measurements"; DECIMAL-casting the ln() terms
    would move the edge risk to every token and make parity worse).
    """
    k = float(smoothing_k)
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = cnt.orderBy(F.desc("c"), "tok").limit(max_vocab)
    totals = cnt.agg(F.sum("c").alias("t")).crossJoin(
        vocab.agg(F.count(F.lit(1)).alias("v"))
    )
    denom = F.log(
        F.col("t").cast("double") + F.lit(k) * (F.col("v").cast("double") + 1.0)
    )
    lp = (
        F.log(F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(k))
        - denom
    )
    scored = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), lp.alias("_lp"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("_lp").alias("_lp_sum"),
    )
    avg = F.col("_lp_sum") / F.col("n_tokens").cast("double")
    return per_doc.select(
        id_col,
        "n_tokens",
        F.round(avg, 6).alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("perplexity"),
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram array of a token array, KEEPING duplicate occurrences
    (unlike ``dedup.shingles``, which distincts for set semantics). A
    document with fewer than ``n`` tokens yields an EMPTY array — the
    length guard matters because Spark's ``sequence(1, 0)`` is the
    DESCENDING ``[1, 0]``, not empty (the 1-token crash fixed here;
    DuckDB's generate_series(1, 0) IS empty, which is why the oracle
    side never showed it).

    Construction is an INCREMENTAL ``zip_with`` chain — grams of length
    k extend the length-(k-1) grams with the k-shifted token array, so
    each gram costs one two-string concat instead of an indexed
    ``slice`` + ``concat_ws`` per element (measured ~10× cheaper at
    sf0.1: 0.4 s vs 4.1 s for the n = 2,3,4 family). The chain keeps
    full length with NULL tails (``concat`` propagates the shifted
    side's trailing NULLs) and one final ``slice`` trims to the exact
    ``L − n + 1`` grams.

    The chain puts ``n − 1`` zip nodes in the PLAN and ``n − 1`` array
    passes in the row evaluation, so the win holds for SMALL n (the
    curation range: measured 1.2 s for the whole dup-8 coverage path at
    sf0.1); for n beyond ~16 an indexed transform would start winning,
    and ``n`` is capped at 64 so a stray parameter can't silently build
    a megabyte expression tree."""
    if n < 1 or n > 64:
        raise ValueError(f"word_ngrams: n must be in [1, 64], got {n}")
    g = toks
    length = F.size(toks)
    for k in range(1, n):
        shifted = F.slice(
            toks, k + 1, F.greatest(length - k, F.lit(1))
        )
        g = F.zip_with(
            g, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(
        length >= n, F.slice(g, 1, length - (n - 1))
    ).otherwise(F.array().cast("array<string>"))


def max_multiplicity(arr: Column) -> Column:
    """Count of the most frequent element of a string array, MAP-SIDE:
    sort the array, then a longest-equal-run fold (struct accumulator in
    ``F.aggregate``) — max multiplicity without any per-document shuffle.
    Empty array → 0."""
    run_state = F.aggregate(
        F.sort_array(arr),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return run_state


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition quality signals (the Gopher-rules family): documents
    dominated by a repeated phrase are low-value training data.

    - ``distinct_token_ratio`` — |distinct tokens| / |tokens|.
    - ``top_bigram_frac`` — tokens covered by the most frequent word
      2-gram: 2·max_count / n_tokens.

    The bigram mode is computed MAP-SIDE as a longest-run fold over the
    sorted bigram array (:func:`max_multiplicity`) — no per-document
    shuffle, so the operator scans 100 TB without a groupBy; the DuckDB
    oracle uses the equivalent relational unnest+count form. For the
    full top-n / duplicated-coverage profile see
    :func:`gopher_repetition_stats`.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    run_state = max_multiplicity(word_ngrams(toks, 2))
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn(
            "distinct_token_ratio",
            F.round(
                F.size(F.array_distinct(toks)).cast("double")
                / F.nullif(n_tok, F.lit(0)).cast("double"),
                6,
            ),
        )
        .withColumn(
            "top_bigram_frac",
            F.round(
                (F.lit(2) * run_state).cast("double")
                / F.nullif(n_tok, F.lit(0)).cast("double"),
                6,
            ),
        )
    )


def gopher_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_n: int = 8,
    thresholds: dict[int, float] | None = None,
    dup_threshold: float = 0.10,
) -> DataFrame:
    """Per-document intra-document repetition profile — the Gopher
    repetition gate (Rae et al. 2021, §A1.1) adapted to token fractions:

    - ``top{n}gram_frac`` for each n in ``top_ns`` — tokens covered by
      the most frequent word n-gram: ``n · max_count / n_tokens``;
    - ``dup_gram_frac`` — fraction of tokens inside WITHIN-document
      duplicated ``dup_n``-gram spans (overlapping occurrences merged,
      each token counted once — interval union, not a sum of counts);
    - ``rep_keep`` — True iff every fraction is within its threshold
      (defaults: Gopher's 0.20 / 0.18 / 0.16 for n = 2 / 3 / 4, and
      ``dup_threshold`` for the coverage).

    ENTIRELY map-side — no shuffle, no join, no explode: each document's
    stats come from folds over its own token array, so the operator is a
    pure scan at 100 TB (contrast :func:`operators.dedup.duplicated_spans`,
    whose cross-document semantics force a gram shuffle). The three HOF
    tricks that keep it linear per document:

    1. top-n multiplicity = longest equal-run over the SORTED gram array
       (:func:`max_multiplicity`) — no per-doc groupBy;
    2. duplicated-gram detection = neighbor equality in the gram-sorted
       positional array, with the array bound to a REAL column first
       (``_pg``) so ``element_at`` inside the lambda reads the row value
       instead of re-evaluating the sort per element (the HOF
       re-evaluation pitfall measured on ``contaminated_doc_ids``);
    3. coverage = a single interval-merge fold over the ascending dup
       positions with a scalar (end, total) accumulator — no array
       growth inside the fold.

    The DuckDB oracle mirrors it relationally (unnest + count + the
    gaps-and-islands span merge of ``_dup_span_cte``); equality of the
    fold and the relational island sum is the registered parity check.
    """
    if thresholds is None:
        thresholds = {2: 0.20, 3: 0.18, 4: 0.16}
    from security_data_pipeline_spark.operators.skew import fan_out

    # per-row CPU (tokenize + four n-gram arrays + sorts + folds) with NO
    # downstream shuffle to spread it: on a single-row-group corpus file
    # the whole gate otherwise runs as ONE task (measured 2.5 s -> 0.5 s
    # at sf0.1 with the fan-out; a no-op at scale where scans split)
    df = fan_out(df, text_col)
    t = F.col(text_col)
    toks = tokens(F.coalesce(t, F.lit("")))
    n_tok = F.size(toks)
    out = df.withColumn("n_tokens", n_tok)
    frac_cols: list[tuple[str, float]] = []
    for n in top_ns:
        name = f"top{n}gram_frac"
        out = out.withColumn(
            name,
            F.round(
                (F.lit(n) * max_multiplicity(word_ngrams(toks, n))).cast(
                    "double"
                )
                / F.nullif(n_tok, F.lit(0)).cast("double"),
                6,
            ),
        )
        frac_cols.append((name, float(thresholds.get(n, 1.0))))

    # positional dup_n-grams sorted by (gram, pos): grams from the cheap
    # zip_with chain, positions from one more zip against the index
    # sequence. The gram array is bound to a REAL column first — it is
    # referenced three times below, and interpreted HOF projections get
    # no common-subexpression reuse, so an unbound expression would
    # rebuild the whole chain per reference (same pitfall as ``_pg``)
    out = out.withColumn("_gd", word_ngrams(toks, dup_n))
    gd = F.col("_gd")
    n_grams = F.size(gd)
    pg = F.when(
        n_grams > 0,
        F.sort_array(
            F.zip_with(
                gd,
                F.sequence(F.lit(0), F.greatest(n_grams - 1, F.lit(0))),
                lambda g, p: F.struct(
                    g.alias("gram"), p.cast("int").alias("pos")
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<gram:string,pos:int>>"))
    out = out.withColumn("_pg", pg).drop("_gd")
    arr = F.col("_pg")

    # duplicated-position detection by NEIGHBOR EQUALITY in the sorted
    # array, expressed as zips against shifted copies — deliberately NO
    # element_at(<array expr>, i) inside a lambda: predicate pushdown
    # substitutes column bindings back into a pushed filter condition,
    # and an indexed lookup whose array argument is then a full
    # expression re-evaluates that expression PER ELEMENT (the
    # corpus_curation funnel hung at sf0.1 on exactly that O(L²) until
    # this form). Array-level zip/slice/concat reference each input a
    # constant number of times, so even fully inlined the work stays
    # O(L log L) per document.
    gs = F.transform(arr, lambda x: x["gram"])
    out = out.withColumn("_gs", gs)
    gsc = F.col("_gs")
    n_pg = F.size(gsc)
    null_s = F.array(F.lit(None).cast("string"))
    prev_g = F.concat(null_s, F.slice(gsc, 1, F.greatest(n_pg - 1, F.lit(0))))
    next_g = F.concat(
        F.when(n_pg >= 2, F.slice(gsc, 2, n_pg - 1)).otherwise(
            F.array().cast("array<string>")
        ),
        null_s,
    )
    eq_prev = F.zip_with(
        gsc, prev_g, lambda a, b: F.coalesce(a == b, F.lit(False))
    )
    eq_next = F.zip_with(
        gsc, next_g, lambda a, b: F.coalesce(a == b, F.lit(False))
    )
    flags = F.zip_with(eq_prev, eq_next, lambda a, b: a | b)
    pos_flag = F.zip_with(
        F.transform(arr, lambda x: x["pos"]),
        flags,
        lambda p, fl: F.struct(p.alias("p"), fl.alias("fl")),
    )
    dup_pos = F.sort_array(
        F.transform(
            F.filter(pos_flag, lambda x: x["fl"]), lambda x: x["p"]
        )
    )
    covered = F.aggregate(
        dup_pos,
        F.struct(
            F.lit(-1).cast("int").alias("end"),
            F.lit(0).cast("int").alias("tot"),
        ),
        lambda acc, p: F.struct(
            F.greatest(acc["end"], p + (dup_n - 1)).alias("end"),
            (
                acc["tot"]
                + F.when(p > acc["end"], F.lit(dup_n)).otherwise(
                    F.greatest(p + (dup_n - 1) - acc["end"], F.lit(0))
                )
            ).alias("tot"),
        ),
        lambda acc: acc["tot"],
    )
    out = out.withColumn(
        "dup_gram_frac",
        F.round(
            covered.cast("double") / F.nullif(n_tok, F.lit(0)).cast("double"),
            6,
        ),
    ).drop("_pg", "_gs")
    keep = F.col("dup_gram_frac") <= F.lit(dup_threshold)
    for name, bound in frac_cols:
        keep = keep & (F.col(name) <= F.lit(bound))
    return out.withColumn("rep_keep", keep)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding token-window chunking — the context-length splitter of a
    pretraining pipeline (window tokens per chunk, ``window - stride``
    overlap, last partial chunk kept).

    Emits one row per (doc, chunk): ``chunk_id`` (0-based), the chunk's
    token count, and ``chunk_fp`` (md5 of the re-joined chunk text —
    cross-engine checkable content proof). Pure Column math: the chunk
    index sequence and slices evaluate map-side; exploding multiplies rows
    but never shuffles.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - window).cast("double") / F.lit(float(stride))).cast("int")
    )
    chunk = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    ).select(
        id_col,
        "chunk_id",
        F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, F.lit(window)).alias(
            "_chunk"
        ),
    )
    return chunk.select(
        id_col,
        "chunk_id",
        F.size("_chunk").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", F.col("_chunk")).cast("binary")).alias("chunk_fp"),
    )


# Conservative patterns with identical semantics in Java regex (Spark) and
# RE2 (DuckDB): no lookaround, no backrefs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_pii(col: Column | str) -> Column:
    """Replace emails and IPv4 addresses with typed placeholder tokens —
    the minimum-viable PII pass every public-corpus pipeline runs before
    training. Order matters: emails first (an address can contain digits),
    then IPs."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram-free language heuristic: English if stopword density clears a
    threshold. A real deployment swaps in fastText/CLD3 behind the same
    column contract; the heuristic keeps the operator oracle-checkable."""
    n_tok = token_count(F.col(text_col))
    n_stop = stopword_count(F.col(text_col))
    ratio = n_stop.cast("double") / F.nullif(n_tok, F.lit(0)).cast("double")
    return df.withColumn(
        "lang_guess", F.when(ratio >= 0.03, "en").otherwise("other")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k retrieval for a literal term query — the lexical
    ranking half of hybrid search (pair with an ANN ranker through
    :func:`hybrid_rrf`). Lucene-style idf ``ln((N - df + 0.5)/(df + 0.5)
    + 1)`` (never negative), standard tf saturation and length
    normalization.

    Scale shape: per-term tf and the doc length are per-row Column math
    over ONE corpus scan; the only driver traffic is one tiny row of
    corpus statistics (N, avgdl, one df per query term — |terms| values,
    embedded as literals like the ANN codebooks), so scoring fuses into
    the scan and the only shuffle is the top-k TakeOrdered. Output:
    ``(id, bm25, rank)`` for the k best (score DESC, id ASC — ties
    deterministic).
    """
    import math

    # NULL text = empty document: it scores nothing but still counts in
    # N/avgdl, and an all-NULL corpus must not crash the driver-side
    # stats collection (sum of all-NULL lengths is NULL)
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != F.lit(""),
    )
    tf_cols = [
        F.size(F.filter(toks, lambda t: t == F.lit(term))).alias(f"_tf{i}")
        for i, term in enumerate(query_terms)
    ]
    base = df.select(
        F.col(id_col), F.size(toks).alias("_dl"), *tf_cols
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_dlsum"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    ).first()
    n_docs = stats["_n"]
    if not n_docs:
        raise ValueError("empty corpus")
    avgdl = float(stats["_dlsum"]) / float(n_docs)
    if avgdl == 0.0:
        # every document is empty: no term can match (all tf = 0, every
        # score filtered), but the length norm must not divide by zero
        avgdl = 1.0
    idfs = [
        math.log((n_docs - stats[f"_df{i}"] + 0.5) / (stats[f"_df{i}"] + 0.5) + 1.0)
        for i in range(len(query_terms))
    ]

    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl").cast("double") / F.lit(avgdl)
    )
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"_tf{i}").cast("double")
        term_score = F.lit(idfs[i]) * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = term_score if score is None else score + term_score
    # TakeOrdered first (distributed partial top-k, no global sort task),
    # THEN a row_number over the k survivors — the rank window only ever
    # sees k rows
    top = (
        base.select(id_col, F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("bm25"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def hybrid_rrf(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rrf_k: int = 60,
    k: int = 20,
    rank_col: str = "rank",
    suffixes: tuple[str, str] = ("a", "b"),
) -> DataFrame:
    """Reciprocal-rank fusion of two rankers (Cormack et al., SIGIR'09):
    ``score(d) = Σ 1/(rrf_k + rank_i(d))`` over the lists containing d.
    The standard way to combine lexical (BM25) and vector (ANN) retrieval
    without score calibration — only RANKS cross the boundary.

    Fusion is a full-outer join on the id with the two reciprocal terms
    added in FIXED order (no aggregation), so the result is deterministic
    to the last bit; candidate lists are top-k sized — the join is over
    hundreds of rows regardless of corpus size. Output:
    ``(id, rrf_score, rank_{a}, rank_{b})`` for the ``k`` best
    (score DESC, id ASC).
    """
    sa, sb = suffixes
    a = ranked_a.select(
        F.col(id_col), F.col(rank_col).alias(f"rank_{sa}")
    )
    bdf = ranked_b.select(
        F.col(id_col), F.col(rank_col).alias(f"rank_{sb}")
    )
    j = a.join(bdf, id_col, "full_outer")
    term = lambda c: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(c).cast("double")),
        F.lit(0.0),
    )
    w = Window.orderBy(F.desc("rrf_score"), F.col(id_col))
    return (
        j.withColumn(
            "rrf_score", F.round(term(f"rank_{sa}") + term(f"rank_{sb}"), 6)
        )
        .withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
        .select(id_col, "rrf_score", "fused_rank", f"rank_{sa}", f"rank_{sb}")
    )


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 50) -> list[str]:
    """Driver-local top-``k`` vocabulary by corpus token frequency
    (count desc, token asc — a total order, so the list is deterministic
    on any engine/partitioning). One token aggregation + TakeOrdered;
    the collect is bounded by ``k`` (the BPE-histogram collect
    discipline). Tokens are lowercased, empties dropped."""
    rows = (
        df.select(
            F.explode(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " ")
            ).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(k)
        .collect()
    )
    return [r["token"] for r in rows]


def oov_stats(
    df: DataFrame,
    vocab: list[str],
    by: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    hof_max_vocab: int = 128,
) -> DataFrame:
    """Out-of-vocabulary token rate against a FIXED vocabulary — the
    coverage signal that tells a curation pipeline how well a tokenizer
    or frozen vocab fits each source (high OOV ⇒ domain mismatch,
    boilerplate noise, or the wrong language).

    Two membership strategies, picked by vocabulary size:

    - ``len(vocab) <= hof_max_vocab``: a map-only HOF fold of each
      document's token array against the vocabulary literal (the DSIR
      fused-scorer shape) — zero joins, zero shuffles over the corpus;
      at 100 TB this is a pure scan. ``array_contains`` is a linear
      scan per token, so this path is capped: at a realistic tokenizer
      vocab (32k-100k) it would be |tokens|·|vocab| work and a plan
      tree with one literal per entry.
    - larger vocabularies: explode tokens and LEFT JOIN a BROADCAST
      vocab frame (hash probe per token — O(1) in |vocab|, and the
      vocab rides the broadcast, never the plan tree), then re-aggregate
      per doc. ``explode_outer`` keeps zero-token docs. Costs one
      map-side-combined shuffle of per-doc count rows — the membership
      itself stays map-side. The 50k-vocab leg is benched
      (``doc_oov_large_vocab``) so this cost is measured, not assumed.

    Both paths produce identical results (asserted in
    tests/test_textops.py). With ``by`` set, one bounded groupBy
    follows; otherwise one row per document. Tokens lowercase, empties
    excluded from both numerator and denominator (the doc_token_stats
    convention).

    Output: per doc ``(id, n_tokens, n_oov, oov_frac)`` or per group
    ``(by, n_docs, total_tokens, oov_tokens, oov_frac)``.
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda t: t != "",
    )
    if len(vocab) <= hof_max_vocab:
        va = F.array(*[F.lit(t) for t in vocab])
        n_tokens = F.size(toks).cast("bigint")
        n_oov = F.size(
            F.filter(toks, lambda t: ~F.array_contains(va, t))
        ).cast("bigint")
        if by is None:
            return df.select(
                F.col(id_col),
                n_tokens.alias("n_tokens"),
                n_oov.alias("n_oov"),
                F.when(
                    n_tokens > 0,
                    n_oov.cast("double") / n_tokens.cast("double"),
                ).alias("oov_frac"),
            )
        scored = df.select(
            F.col(by), n_tokens.alias("_n"), n_oov.alias("_oov")
        )
        return scored.groupBy(by).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").cast("bigint").alias("total_tokens"),
            F.sum("_oov").cast("bigint").alias("oov_tokens"),
            (
                F.sum("_oov").cast("double") / F.sum("_n").cast("double")
            ).alias("oov_frac"),
        )
    spark = df.sparkSession
    vdf = (
        spark.createDataFrame([(t,) for t in vocab], "token string")
        .dropDuplicates(["token"])
        .withColumn("_inv", F.lit(True))
    )
    carry = [id_col] if by is None else [id_col, by]
    tokd = df.select(*carry, F.explode_outer(toks).alias("_t"))
    joined = tokd.join(
        F.broadcast(vdf), tokd["_t"] == vdf["token"], "left"
    )
    per_doc = joined.groupBy(*carry).agg(
        F.count("_t").alias("n_tokens"),
        F.sum(
            F.when(
                F.col("_t").isNotNull() & F.col("_inv").isNull(), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_oov"),
    )
    if by is None:
        return per_doc.select(
            F.col(id_col),
            "n_tokens",
            "n_oov",
            F.when(
                F.col("n_tokens") > 0,
                F.col("n_oov").cast("double")
                / F.col("n_tokens").cast("double"),
            ).alias("oov_frac"),
        )
    return per_doc.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_oov").cast("bigint").alias("oov_tokens"),
        (
            F.sum("n_oov").cast("double")
            / F.sum("n_tokens").cast("double")
        ).alias("oov_frac"),
    )


def normalize_scores_by_group(
    df: DataFrame,
    by: str,
    score_col: str,
    clip: float = 2.0,
    suffix: str = "_z",
) -> DataFrame:
    """Per-group z-score normalization with a winsorizing clip — the
    featurization step that makes a quality score comparable ACROSS
    sources before a single global threshold or sampler consumes it (a
    0.6 in a clean source and a 0.6 in a noisy one are not the same
    signal; normalizing per group removes the per-source offset/scale).

    Appends ``{score_col}{suffix}`` = ``clamp((x - μ_g)/σ_g, ±clip)``;
    a degenerate group (σ = 0, e.g. one doc) maps to 0. Group moments
    come from ONE map-side-combined aggregation: x rounds to 6 decimals,
    casts to DECIMAL, and BOTH the sum and the sum of squares accumulate
    in exact decimal arithmetic. Two cross-engine traps dodged here:
    (a) the square is a decimal·decimal product, never a
    double→high-scale-decimal cast (Spark renders that cast through the
    17-digit string repr while engines that expand the binary exactly
    disagree in the 18th decimal); (b) the squares accumulate at scale
    12, not 18 — DuckDB converts DECIMAL→DOUBLE naively (int128→double,
    then divide by 10^scale), which double-rounds once the sum exceeds
    ~15 significant digits, while Spark's BigDecimal conversion is
    correctly rounded. μ/σ are therefore bit-identical on any
    partitioning and in the DuckDB oracle; the bounded per-group frame
    broadcasts back. Domain: |x| < 10^5 (the DECIMAL(11,6) term type).
    """
    stats = moments_to_stats(group_score_moments(df, by, score_col), by)
    return normalize_with_stats(df, stats, by, score_col, clip, suffix)


def group_score_moments(
    df: DataFrame, by: str, score_col: str
) -> DataFrame:
    """Per-group exact-decimal moment sums ``(_n, _s1, _s2)`` — the
    MERGEABLE state behind :func:`normalize_scores_by_group`: counts and
    decimal sums add, so moments from disjoint slices (micro-batches,
    partitions, shards) fold into the whole-corpus moments exactly —
    the streaming maintainer's summary
    (streaming/pipeline.py:maintain_score_moments_stream). Sums widen to
    DECIMAL(38,6)/(38,12) so repeated merges never change precision."""
    x = F.col(score_col).cast("double")
    xr = F.round(x, 6).cast("decimal(11,6)")
    return df.groupBy(by).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(xr).cast("decimal(38,6)").alias("_s1"),
        F.sum(xr * xr).cast("decimal(38,12)").alias("_s2"),
    )


def moments_to_stats(moments: DataFrame, by: str) -> DataFrame:
    """Finalize moment sums into ``(by, _mu, _sd)``. The decimal→double
    casts happen HERE, on the fully merged sums — so batch and streamed
    moments finalize to bit-identical stats (the decimal sums are exact;
    only the final division is IEEE)."""
    n = F.col("_n").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    mean = s1 / n
    var = F.greatest(s2 / n - (s1 / n) * (s1 / n), F.lit(0.0))
    return moments.select(by, mean.alias("_mu"), F.sqrt(var).alias("_sd"))


def normalize_with_stats(
    df: DataFrame,
    stats: DataFrame,
    by: str,
    score_col: str,
    clip: float = 2.0,
    suffix: str = "_z",
) -> DataFrame:
    """Apply precomputed per-group ``(_mu, _sd)`` stats to ``df`` —
    the join-back half of :func:`normalize_scores_by_group`, factored so
    a batch can normalize against STREAMED corpus-so-far moments
    (``normalize_with_stats(batch, moments_to_stats(state, by), ...)``)
    without rescanning the corpus."""
    x = F.col(score_col).cast("double")
    z = F.when(
        F.col("_sd") > 0, (x - F.col("_mu")) / F.col("_sd")
    ).otherwise(F.lit(0.0))
    clipped = F.greatest(
        F.lit(-float(clip)), F.least(F.lit(float(clip)), z)
    )
    return (
        df.join(F.broadcast(stats), by)
        .withColumn(f"{score_col}{suffix}", clipped)
        .drop("_mu", "_sd")
    )


def vocab_topk_from_counts(
    counts: DataFrame, k: int = 50
) -> list[str]:
    """:func:`vocab_topk` from a pre-aggregated ``(token, c)`` frame —
    the reader for the streamed token-count state
    (streaming/pipeline.py:maintain_token_counts_stream), using the same
    (count desc, token asc) total order so batch and streamed
    vocabularies cannot diverge."""
    rows = (
        counts.orderBy(F.desc("c"), "token").limit(k).collect()
    )
    return [r["token"] for r in rows]


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Zipf rank-frequency fit: OLS slope/intercept of ln(freq) on
    ln(rank) over the top-``top_k`` tokens — natural language sits near
    slope −1; flat slopes mark templated/synthetic corpora and steep
    ones mark degenerate repetition. A corpus-naturalness diagnostic for
    ingest gating, next to the Gopher repetition rules.

    Scale shape: one token hash count (map-side combined), TakeOrdered
    top-k, then every regression moment is computed on the ≤``top_k``
    frame — the ordered rank window and the four moment sums never see
    the corpus. Determinism: ranks break ties on (count DESC, token ASC)
    — total; ln() operands are identical integers cross-engine and the
    moment terms sum as DECIMAL(28,12) (accumulation-order-free), so the
    6-dp-rounded fit is stable up to libm's ln, which the rounding
    absorbs (the doc_lm_scores precedent). Output: one row —
    ``n_ranked, slope, intercept``.
    """
    from pyspark.sql import Window

    counts = (
        df.select(
            F.explode(
                F.filter(
                    F.split(
                        F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "
                    ),
                    lambda t: t != "",
                )
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return zipf_fit_from_counts(counts, top_k)


def zipf_fit_from_counts(counts: DataFrame, top_k: int = 100) -> DataFrame:
    """:func:`zipf_fit` from a pre-aggregated ``(token, c)`` frame — the
    reader for the streamed token-count state
    (streaming/pipeline.py:maintain_token_counts_stream), so the corpus-
    naturalness gate stays live at ingest cadence; same (count DESC,
    token ASC) total order as the batch form, so streamed and batch fits
    cannot diverge on equal counts."""
    from pyspark.sql import Window

    toks = counts.orderBy(F.desc("c"), "token").limit(top_k)
    w = Window.orderBy(F.desc("c"), "token")
    ranked = toks.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    dec = "decimal(28,12)"
    moments = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    slope = (n * F.col("sxy").cast("double") - sx * sy) / (
        n * F.col("sxx").cast("double") - sx * sx
    )
    return moments.select(
        F.col("n").alias("n_ranked"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 50_000,
    lambda_bi: float = 0.7,
    lambda_uni: float = 0.3,
    smoothing_k: float = 0.5,
) -> DataFrame:
    """Interpolated bigram language-model quality scores — the context-
    aware step up from :func:`unigram_lm_scores` (Jelinek-Mercer
    interpolation, Chen & Goodman 1999 — public technique): per-position
    ``p = λ_bi·p_bi(b|a) + λ_uni·p_uni(b)``, per-doc mean logprob and
    perplexity. The two weights are INDEPENDENT literals (not
    ``1 − λ_bi`` — see the inline note) so the Spark expression and the
    oracle SQL share the exact same float tokens. Word-salad documents that fool a unigram filter (right
    words, impossible transitions) score badly here; the model is fit on
    the corpus itself, no model runtime.

    ``p_bi(b|a) = c(a,b)/c(a·)`` (maximum likelihood — safe under
    interpolation because the unigram term keeps every position
    nonzero); ``p_uni`` is :func:`unigram_lm_scores`' add-k model over
    the same capped vocab with the same OOV fallback mass.

    At 100 TB: the bigram count table can exceed broadcast range, so
    position->count scoring is a SHUFFLE equi-join on the (a, b) key
    (both sides keyed — the correct join at scale), context counts fold
    FROM the bigram frame (no second corpus pass), and only the capped
    unigram vocab broadcasts. Documents with < 2 tokens have no bigram
    positions and drop out. Output: ``id_col, n_bigrams, avg_logprob
    (6dp), perplexity (4dp)`` — rounding absorbs float-sum ordering and
    libm ulps cross-engine by a MEASURED ≥10x margin at both test SFs
    (SCALE.md "Round-11 measurements"), and the bit-exact parity sweep
    is the standing tripwire if a future corpus lands closer to an edge.
    """
    k = float(smoothing_k)
    lam = float(lambda_bi)
    # lambda_uni is its OWN literal, not computed as 1.0 - lambda_bi:
    # 1.0 - 0.7 = 0.30000000000000004 in float64 while the oracle SQL
    # hard-codes 0.3 (= 0.2999999999999999889), a 1-ulp formula
    # divergence that could flip a 6-dp rounding on an exact boundary
    # (ADVICE r10). Both engines now share the same literal token.
    lam_uni = float(lambda_uni)
    ts = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col), ts.alias("_ts"))
    pairs = base.filter(F.size("_ts") >= 2).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(F.col("_ts")) - 1),
                lambda i: F.struct(
                    F.element_at(F.col("_ts"), i).alias("a"),
                    F.element_at(F.col("_ts"), i + 1).alias("b"),
                ),
            )
        ).alias("_p"),
    ).select(id_col, F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
    uni = (
        base.select(F.explode("_ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = uni.orderBy(F.desc("c"), "tok").limit(max_vocab)
    totals = uni.agg(F.sum("c").alias("t")).crossJoin(
        vocab.agg(F.count(F.lit(1)).alias("v"))
    )
    cab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("nab"))
    ca = cab.groupBy("a").agg(F.sum("nab").alias("na"))
    p_uni = (
        F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(k)
    ) / (
        F.col("t").cast("double")
        + F.lit(k) * (F.col("v").cast("double") + 1.0)
    )
    lp = F.log(
        F.lit(lam)
        * (F.col("nab").cast("double") / F.col("na").cast("double"))
        + F.lit(lam_uni) * p_uni
    )
    scored = (
        pairs.join(cab, ["a", "b"])
        .join(ca, "a")
        .join(
            F.broadcast(vocab.withColumnRenamed("tok", "b")), "b", "left"
        )
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), lp.alias("_lp"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("_lp").alias("_lp_sum"),
    )
    avg = F.col("_lp_sum") / F.col("n_bigrams").cast("double")
    return per_doc.select(
        id_col,
        "n_bigrams",
        F.round(avg, 6).alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("perplexity"),
    )


def readability_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch Reading Ease + Flesch-Kincaid grade (public formulas) from
    three counting heuristics — words (non-empty space splits),
    sentences ([.!?]+ runs, floor 1), syllables (vowel-group runs,
    the standard dictionary-free approximation): the classic filter for
    boilerplate/legalese (very low ease) and keyword-stuffing fragments
    (implausibly high ease). A pure map-only scan — three regex counts
    and two fixed formulas, zero shuffle, zero joins; at 100 TB this is
    the cheapest quality column in the gate.

    Output: ``id_col, n_words, n_sentences, n_syllables, flesch_ease,
    fk_grade`` (6 dp — the repo's cross-engine rounding convention; 2 dp
    put ~0.4% of rows on exact .xx5 halfway points where the engines'
    ROUND implementations disagree). Empty/NULL texts yield zero words
    and NULL scores rather than a divide error.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.size(F.filter(F.split(t, " "), lambda w: w != ""))
    sentences = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)
    )
    syllables = F.regexp_count(F.lower(t), F.lit("[aeiouy]+"))
    wps = words.cast("double") / sentences.cast("double")
    spw = syllables.cast("double") / F.nullif(words, F.lit(0)).cast(
        "double"
    )
    return df.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
        ).alias("flesch_ease"),
        F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
        ).alias("fk_grade"),
    )


def quality_auto_threshold_report(
    df: DataFrame,
    strata_col: str = "source",
    keep_rate: float = 0.3,
    drop_pct: float = 0.7,
    text_col: str = "text",
) -> DataFrame:
    """Pick each stratum's quality-gate OPERATING POINT from a target
    keep budget: the per-stratum threshold is the exact interpolated
    ``drop_pct`` percentile of the 6dp-rounded quality score, and the
    report shows what gating at it actually keeps — the step between
    measuring a gate (the threshold sweep) and deploying one ("keep the
    best ~30% of every source"). Per-stratum thresholds mean no source
    is starved just because another scores systematically higher — the
    same fairness argument as the stratified split.

    ``keep_rate`` and ``drop_pct`` are INDEPENDENT literals, not
    ``1 − keep_rate`` (the bigram-LM lesson: ``1.0 - 0.3`` is
    0.7000000000000001 in float64 while the oracle writes 0.7 — a 1-ulp
    percentile request that can move an interpolated threshold's 6dp
    rounding). ``realized_rate`` can overshoot ``target_rate`` on score
    ties (every doc AT the threshold keeps); the gap is the report's
    point — it is the honest keep cost of this operating point.

    Shape at 100 TB: one scored scan, ONE per-stratum percentile
    aggregation (map-side-combinable), the |strata|-row threshold table
    broadcast back, one counting aggregation. Output: ``strata_col,
    n_docs, threshold, n_kept, realized_rate, target_rate``.
    """
    q = quality_features(df, text_col=text_col).select(
        F.col(strata_col),
        F.round("quality_score", 6).alias("_q"),
    )
    th = q.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("_q", F.lit(float(drop_pct))), 6).alias(
            "threshold"
        ),
    )
    return (
        q.join(F.broadcast(th), strata_col)
        .groupBy(strata_col, "n_docs", "threshold")
        .agg(
            # explicit otherwise(0): a stratum whose scores are all NULL
            # yields threshold NULL, and summing NULL comparisons would
            # return NULL n_kept where the oracle's CASE WHEN ... ELSE 0
            # yields 0 — the F.when form matches CASE semantics exactly
            F.sum(
                F.when(F.col("_q") >= F.col("threshold"), F.lit(1))
                .otherwise(F.lit(0))
            ).cast("long").alias("n_kept")
        )
        .select(
            strata_col,
            "n_docs",
            "threshold",
            "n_kept",
            F.round(
                F.col("n_kept").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("realized_rate"),
            F.lit(float(keep_rate)).alias("target_rate"),
        )
    )


def threshold_from_score_counts(
    counts: DataFrame,
    strata_col: str = "source",
    keep_rate: float = 0.3,
    drop_pct: float = 0.7,
) -> DataFrame:
    """:func:`quality_auto_threshold_report`'s tail over the ADDITIVE
    (stratum, 6dp-rounded score, count) histogram — the exact statistic
    ``maintain_ranking_counts_stream`` folds — so the operating-point
    picker runs against STREAMED state: thresholds current at ingest
    cadence with zero corpus rescans (the privacy-cells pattern).

    Exact interpolated percentile from the histogram: with per-stratum
    total N, position ``h = drop_pct·(N−1)``; the floor(h)-th and
    ceil(h)-th order statistics read off the cumulative counts, and the
    threshold interpolates ``x_lo + (x_hi − x_lo)·(h − floor h)``,
    rounded to 6 dp — bit-equal to the batch report's ``F.percentile``
    (pinned by test at two SFs: the 6 dp round absorbs the interpolation
    forms' last-ulp freedom the same way it does cross-engine). The
    histogram is score-domain-bounded, so every window here runs over
    ≤10⁶+1 rows per stratum, never the corpus. Output matches the batch
    report: ``strata_col, n_docs, threshold, n_kept, realized_rate,
    target_rate``. One convention delta: the histogram only ever holds
    SCORED rows (``score_label_counts`` filters NULL scores), so
    ``n_docs`` here counts scored docs, where the batch report's count
    includes NULL-score docs that ``F.percentile`` silently skips — the
    histogram form is the more self-consistent of the two.
    """
    c = counts.select(strata_col, "_s", "_n")
    w_all = Window.partitionBy(strata_col)
    w_ord = (
        Window.partitionBy(strata_col)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "_tot", NOT "_N": withColumn is case-INsensitive under the default
    # spark.sql.caseSensitive=false, so "_N" silently REPLACES the "_n"
    # count column and every downstream cumulative is garbage
    c = c.withColumn("_tot", F.sum("_n").over(w_all)).withColumn(
        "_cum", F.sum("_n").over(w_ord)
    )
    h = F.lit(float(drop_pct)) * (F.col("_tot") - F.lit(1)).cast("double")
    i_lo = F.floor(h).cast("long")
    i_hi = F.ceil(h).cast("long")
    prev = F.col("_cum") - F.col("_n")
    th = c.groupBy(strata_col).agg(
        F.max("_tot").cast("long").alias("n_docs"),
        F.max(
            F.when((prev <= i_lo) & (i_lo < F.col("_cum")), F.col("_s"))
        ).alias("_xlo"),
        F.max(
            F.when((prev <= i_hi) & (i_hi < F.col("_cum")), F.col("_s"))
        ).alias("_xhi"),
        F.max(h - F.floor(h)).alias("_frac"),
    )
    th = th.select(
        strata_col,
        "n_docs",
        F.round(
            F.col("_xlo")
            + (F.col("_xhi") - F.col("_xlo")) * F.col("_frac"),
            6,
        ).alias("threshold"),
    )
    return (
        c.join(F.broadcast(th), strata_col)
        .groupBy(strata_col, "n_docs", "threshold")
        .agg(
            F.sum(
                F.when(F.col("_s") >= F.col("threshold"), F.col("_n"))
                .otherwise(F.lit(0))
            ).cast("long").alias("n_kept")
        )
        .select(
            strata_col,
            "n_docs",
            "threshold",
            "n_kept",
            F.round(
                F.col("n_kept").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("realized_rate"),
            F.lit(float(keep_rate)).alias("target_rate"),
        )
    )
