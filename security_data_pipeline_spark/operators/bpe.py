"""Byte-pair-encoding tokenizer training on a corpus — the classic
subword-vocabulary build (Sennrich et al. 2016, the public BPE algorithm
GPT-2/RoBERTa-style tokenizers derive from) as Spark jobs.

Scale shape (the reason BPE is tractable at 100 TB):

1. The corpus reduces ONCE to a word histogram — ``groupBy(word).sum`` —
   and every merge iteration runs on the histogram, whose size is the
   number of DISTINCT words (millions), not corpus tokens (trillions).
   This is exactly how the reference implementations train (on
   ``word -> freq`` dicts); here the histogram stays a distributed
   DataFrame instead of a driver dict.
2. Each merge iteration is one job: adjacent-pair counts (weighted by word
   freq, partial-aggregated map-side) → TakeOrdered(1) for the best pair →
   a map-side fold rewrites the symbol arrays. Driver traffic is ONE ROW
   per merge (the chosen pair) — the histogram never leaves the executors.
3. ``localCheckpoint`` after every merge materializes the rewritten symbol
   arrays and truncates both lineage and the growing fold-expression
   chain, so iteration k costs O(histogram), not O(k · histogram).

Determinism: pair selection orders by (count DESC, a ASC, b ASC) — a total
order — and the greedy left-to-right merge fold is sequential per word, so
the same corpus always yields the same merge list under any partitioning
(counts are exact BIGINT sums of BIGINT frequencies).

Production-vocabulary path (32k+ merges): one Spark job PER MERGE is fine
at the default 50 merges but is ~32k sequential jobs at real tokenizer
sizes — days of scheduler overhead on any cluster — and the encode path's
one-nested-``aggregate``-per-merge Column fold overflows codegen far below
that. So past the small-vocab regime the SAME histogram-once reduction
feeds a DRIVER-LOCAL merge loop (the histogram is |distinct words| rows —
millions, not trillions; the published algorithm trains on exactly this
dict) with incrementally-maintained pair counts + a lazy-deletion heap, and
encoding applies the trained merge table inside one Arrow ``mapInPandas``
pass (per-word memoization; min-rank merge order, provably equivalent to
training-order application because a merge can never create an adjacency
targeted by an EARLIER merge — earlier merges predate the merged symbol).
``bpe_train(mode="auto")`` picks the local loop when the histogram fits,
``apply_bpe`` switches to Arrow past the Column-fold depth limit. The two
train paths and the two encode paths are asserted equal in tests/test_bpe.py.

No SQL oracle: BPE training is inherently iterative (each merge's input
depends on the previous merge's rewrite), one of the driver brief's
"genuinely non-SQL-expressible" cases — verified instead against a pure
Python reference implementation in ``tests/test_bpe.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from security_data_pipeline_spark.pin import pin

END_TOKEN = "</w>"


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` — the one corpus-wide reduction BPE trains on."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_symbols(word_col: Column | str) -> Column:
    """Character symbols plus the end-of-word marker: ``"low"`` →
    ``["l", "o", "w", "</w>"]`` (the marker keeps word-final merges
    distinct from word-internal ones, as in the published algorithm)."""
    c = F.col(word_col) if isinstance(word_col, str) else word_col
    chars = F.filter(F.split(c, ""), lambda x: x != F.lit(""))
    return F.concat(chars, F.array(F.lit(END_TOKEN)))


def _adjacent_pairs(sym_col: Column) -> Column:
    """array<struct(a, b)> of adjacent symbol pairs; empty for 1-symbol
    words. ``sequence`` is guarded: Spark's sequence(1, 0) would count
    DOWN, not produce an empty array."""
    idx = F.when(
        F.size(sym_col) >= 2, F.sequence(F.lit(1), F.size(sym_col) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(sym_col, i).alias("a"),
            F.element_at(sym_col, i + 1).alias("b"),
        ),
    )


def merge_pair(sym_col: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent ``(a, b)``
    into one symbol — the published merge semantics (``a a a`` under merge
    ``(a, a)`` becomes ``[aa, a]``). A sequential ``aggregate`` fold;
    ``try_element_at`` makes the empty-accumulator probe NULL-safe (Spark
    boolean AND does not short-circuit)."""
    merged = F.lit(a + b)
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _initial_symbols_py(word: str) -> list[str]:
    """Python twin of :func:`initial_symbols` (chars + end marker)."""
    return list(word) + [END_TOKEN]


def _merge_word_py(syms: list[str], a: str, b: str) -> list[str]:
    """Python twin of :func:`merge_pair`: greedy left-to-right
    non-overlapping merge of adjacent ``(a, b)``."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_from_histogram(
    items: list[tuple[str, int]],
    n_merges: int,
    min_pair_freq: int,
) -> list[tuple[str, str]]:
    """Driver-local BPE merge loop over a collected ``(word, freq)``
    histogram — the published algorithm, with the incremental bookkeeping
    that makes 32k+ merges tractable: pair counts are maintained by
    DIFFING only the words a chosen merge touches (a pair→word-set index
    says which), and the argmax rides a lazy-deletion heap (every count
    update pushes a fresh entry; stale entries are skipped on pop). Each
    merge costs O(touched words × word length + heap ops), not one pass
    over the vocabulary — and zero Spark jobs.

    Selection order is identical to the distributed loop's
    ``ORDER BY n DESC, a, b``: the heap key is ``(-count, a, b)`` and
    Python's code-point string order equals Spark's UTF-8 binary order
    (UTF-8 is code-point monotonic), so both paths emit the same merges.
    """
    import heapq
    from collections import Counter

    words = [_initial_symbols_py(w) for w, _ in items]
    freqs = [f for _, f in items]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, f) in enumerate(zip(words, freqs)):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(idx)
    heap = [(-c, a, b) for (a, b), c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, a, b = heapq.heappop(heap)
        cur = pair_counts.get((a, b))
        if cur is None or -negc != cur:
            continue  # stale heap entry
        if cur < min_pair_freq:
            break  # heap top is the true max -> nothing reaches the floor
        merges.append((a, b))
        for idx in sorted(pair_words.get((a, b), ())):
            old = words[idx]
            new = _merge_word_py(old, a, b)
            f = freqs[idx]
            old_pairs = Counter(zip(old, old[1:]))
            new_pairs = Counter(zip(new, new[1:]))
            for p in set(old_pairs) | set(new_pairs):
                d = new_pairs.get(p, 0) - old_pairs.get(p, 0)
                if d:
                    c = pair_counts.get(p, 0) + d * f
                    if c > 0:
                        pair_counts[p] = c
                        heapq.heappush(heap, (-c, p[0], p[1]))
                    else:
                        pair_counts.pop(p, None)
                if p in old_pairs and p not in new_pairs:
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(idx)
                        if not s:
                            pair_words.pop(p, None)
                elif p in new_pairs and p not in old_pairs:
                    pair_words.setdefault(p, set()).add(idx)
            words[idx] = new
        pair_words.pop((a, b), None)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_freq: int = 2,
    mode: str = "auto",
    local_max_words: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list (the tokenizer artifact). Stops early when no pair reaches
    ``min_pair_freq``. See the module docstring for the scale design.

    ``mode``: ``"local"`` collects the word histogram (|distinct words|
    rows — the ONE corpus reduction, already computed distributed) and runs
    the merge loop on the driver — zero Spark jobs per merge, the only
    tractable shape at production vocabulary sizes; ``"distributed"`` keeps
    the histogram on the executors with one job per merge — for histograms
    too large for driver memory; ``"auto"`` (default) picks local when the
    histogram has ≤ ``local_max_words`` distinct words. Both paths produce
    identical merge lists (asserted in tests/test_bpe.py).
    """
    if mode not in ("auto", "local", "distributed"):
        raise ValueError(f"mode must be auto|local|distributed, got {mode!r}")
    hist = word_histogram(df, text_col)
    if mode != "distributed":
        if mode == "local":
            collected = hist.collect()
        else:
            # cap+1 probe: decide without a full count when huge
            collected = hist.limit(local_max_words + 1).collect()
            if len(collected) > local_max_words:
                collected = None
        if collected is not None:
            return _train_from_histogram(
                [(r["word"], r["freq"]) for r in collected],
                n_merges,
                min_pair_freq,
            )
        # auto fell through: histogram too large for the driver

    syms = (
        hist
        .select("freq", initial_symbols("word").alias("symbols"))
        .transform(pin)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            syms.select(F.explode(_adjacent_pairs(F.col("symbols"))).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        syms = syms.withColumn(
            "symbols", merge_pair(F.col("symbols"), a, b)
        ).transform(pin)
    return merges


def _encode_word_py(
    syms: tuple[str, ...], ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Encode one word against a merge-rank table: repeatedly merge the
    LOWEST-RANK adjacent pair present (all its occurrences, greedy
    left-to-right) until none remains — the standard encoder loop, O(word²)
    independent of |merges|. Equivalent to applying the merge list in
    training order: a merge only removes symbols from the stream (neighbors
    become adjacent to the NEW symbol, never to each other), so it cannot
    create an adjacency an earlier merge targets — earlier merges predate
    the merged symbol and cannot mention it. Asserted against the
    sequential Column-fold path in tests/test_bpe.py.
    """
    word = list(syms)
    while len(word) >= 2:
        best_rank = None
        best = None
        for p in zip(word, word[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        word = _merge_word_py(word, best[0], best[1])
    return word


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    max_fold_merges: int = 96,
) -> DataFrame:
    """Tokenize text with a learned merge list: whitespace words → char
    symbols → the merge list applied in training order (the standard
    encode path). Output: ``array<string>`` of subword tokens per document
    (end-of-word markers retained on word-final tokens).

    Two physical strategies, same results (asserted in tests/test_bpe.py):

    - ≤ ``max_fold_merges`` merges: pure Column folds — one nested
      ``aggregate`` per merge, JVM-side, map-only, fuses into any
      downstream scan. The expression tree grows linearly with the merge
      count, so codegen caps this at a few hundred merges.
    - beyond that: one Arrow ``mapInPandas`` pass — the merge table is a
      plain dict in the UDF closure (broadcast to every worker once per
      task), each distinct word in a batch is encoded ONCE via the
      min-rank loop and memoized, and the pass is still map-only (no
      shuffle, no state). This is the production-vocabulary path: 32k
      merges is just a bigger dict, not a deeper expression tree.
    """
    if len(merges) <= max_fold_merges:
        words = F.filter(
            F.split(F.col(text_col), " "), lambda x: x != F.lit("")
        )

        def encode_word(w: Column) -> Column:
            toks = initial_symbols(w)
            for a, b in merges:
                toks = merge_pair(toks, a, b)
            return toks

        return df.withColumn(
            out_col, F.flatten(F.transform(words, encode_word))
        )

    import pandas as pd  # noqa: F401 — Arrow batch path

    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    ranks = {p: i for i, p in enumerate(merges)}
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(StringType()))]
    )
    if text_col not in df.columns:
        raise ValueError(f"column {text_col!r} not in DataFrame")

    def encode_batches(batches):
        cache: dict[str, list[str]] = {}

        def encode_doc(text):
            if text is None:
                return None
            toks: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = _encode_word_py(tuple(_initial_symbols_py(w)), ranks)
                    cache[w] = hit
                toks.extend(hit)
            return toks

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(encode_doc)
            yield pdf

    return df.mapInPandas(encode_batches, schema=out_schema)
