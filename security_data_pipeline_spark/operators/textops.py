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

from pyspark.sql import Column, DataFrame
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
