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

No SQL oracle: BPE training is inherently iterative (each merge's input
depends on the previous merge's rewrite), one of the driver brief's
"genuinely non-SQL-expressible" cases — verified instead against a pure
Python reference implementation in ``tests/test_bpe.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list (the tokenizer artifact). Stops early when no pair reaches
    ``min_pair_freq``. See the module docstring for the scale design."""
    syms = (
        word_histogram(df, text_col)
        .select("freq", initial_symbols("word").alias("symbols"))
        .localCheckpoint()
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
        ).localCheckpoint()
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize text with a learned merge list: whitespace words → char
    symbols → each merge applied in training order (the standard encode
    path). Pure Column folds, map-side only — encoding never shuffles, so
    it fuses into any downstream scan at 100 TB. Output:
    ``array<string>`` of subword tokens per document (end-of-word markers
    retained on word-final tokens)."""
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))

    def encode_word(w: Column) -> Column:
        toks = initial_symbols(w)
        for a, b in merges:
            toks = merge_pair(toks, a, b)
        return toks

    return df.withColumn(out_col, F.flatten(F.transform(words, encode_word)))
