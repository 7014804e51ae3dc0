"""Deterministic sampling / dataset splitting for training-data pipelines.

RNG-based sampling (``df.sample``, ``sampleBy``) is engine-specific and
non-reproducible across reruns with different partitioning — useless for
train/val/test splits that must stay stable as a 100 TB corpus is re-read,
re-partitioned, or incrementally extended. The standard fix is *hash
bucketing*: a row's split is a pure function of its key, so membership is
reproducible on any engine, any partitioning, any subset of the data.

Everything here is pure Column math over ``md5`` (identical lowercase-hex
output on Spark, DuckDB, Postgres, Trino — oracle-checkable), map-side only:
no shuffle, no RNG state, no driver coordination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 4 hex chars = 16 bits → split boundaries quantized to 1/65536
_BUCKET_SPACE = 1 << 16


def hash_hex16(key: Column | str, salt: str = "") -> Column:
    """First 4 hex chars of md5(salt || key) — a uniform 16-bit bucket id
    as a lexicographically ordered hex string. ``salt`` derives independent
    bucketings from the same key (e.g. one per experiment)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(
        F.md5(F.concat(F.lit(salt), c.cast("string")).cast("binary")), 1, 4
    )


def _hex4(frac: float) -> str:
    return format(min(int(frac * _BUCKET_SPACE), _BUCKET_SPACE - 1), "04x")


def _keep_expr(h: Column, frac: float) -> Column:
    """Membership test for one keep rate. Rates at or beyond the ends of
    [0, 1] short-circuit to literals: the quantized ``h < _hex4(r)`` form
    clamps 1.0 to ``"ffff"`` and the strict comparison would drop the
    ~1/65536 of keys whose 16-bit md5 prefix is exactly ``ffff`` — a
    rate-1.0 bucket must keep EVERYTHING ("all of the best"), and a
    rate-0.0 bucket must keep nothing."""
    if frac >= 1.0:
        return F.lit(True)
    if frac <= 0.0:
        return F.lit(False)
    return h < F.lit(_hex4(frac))


def hash_sample(
    df: DataFrame, key: Column | str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by key hash. Rows with the
    same key always land together (doc-level, not row-level, sampling when
    keyed by doc id) — exactly the property corpus subsampling needs.
    ``fraction >= 1.0`` keeps every row exactly (no hex-quantization edge);
    ``<= 0.0`` keeps none."""
    return df.filter(_keep_expr(hash_hex16(key, salt), fraction))


def hash_split(
    df: DataFrame,
    key: Column | str,
    fractions: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a named split by cumulative hash ranges.

    ``fractions`` maps split name → fraction (must sum to ~1.0; the last
    split absorbs the hex-quantization remainder). Assignment is stable
    under re-partitioning, appends, and engine changes; the same key can
    never leak across splits.
    """
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    items = list(fractions.items())
    h = hash_hex16(key, salt)
    expr: Column | None = None
    cum = 0.0
    for name, frac in items[:-1]:
        cum += frac
        cond = h < F.lit(_hex4(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(items[-1][0])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def stratified_sample(
    df: DataFrame,
    group_col: Column | str,
    k: int,
    key: Column | str,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sample: the ``k`` rows ranking lowest by
    ``(md5-hash, key)`` within each ``group_col`` value — a uniform
    fixed-size draw per stratum (per source, per language, per label) that
    is reproducible on any engine and stable under re-partitioning and
    appends-that-don't-change-membership, unlike ``sampleBy``'s RNG.

    One shuffle on the stratum key; the rank sort is partition-local.
    Heavily skewed strata rank all their rows through one task's sort —
    for pathological cases pre-filter with :func:`hash_sample` at a few ×
    the target rate, then rank the survivors (two-phase top-k).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    kc = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(group_col).orderBy(hash_hex16(kc, salt), kc)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def rate_stratified_sample(
    df: DataFrame,
    key: Column | str,
    score_col: Column | str,
    buckets: list[tuple[float, float]],
    salt: str = "",
) -> DataFrame:
    """Quality-weighted deterministic subsampling: keep a DIFFERENT
    fraction per score bucket — the "all of the best, a sliver of the
    worst" curation step of quality-weighted corpus recipes.

    ``buckets`` is ``[(min_score, keep_rate), ...]`` sorted strictly
    DESCENDING by ``min_score``; a row draws the rate of the first
    bucket whose threshold its score reaches, and rows below every
    threshold are dropped (add a floor bucket to keep a tail slice).
    Membership is ``md5(salt || key) < rate`` (rates at/beyond 1.0 and
    0.0 short-circuit to keep-all / keep-none, so a 1.0 bucket really
    keeps every key) — the same hash family as
    :func:`hash_sample` / :func:`hash_split`, so the draw is
    reproducible on any engine and partitioning, and MONOTONE in the
    rate: raising a bucket's rate only ADDS documents, so recipe tuning
    never churns previously kept docs in and out of the training set.

    Map-side only — one CASE over bucket literals per row, zero
    shuffles; at 100 TB the sample is a pure scan filter.
    """
    if not buckets:
        raise ValueError("buckets must be non-empty")
    thresholds = [t for t, _ in buckets]
    if thresholds != sorted(thresholds, reverse=True) or len(
        set(thresholds)
    ) != len(thresholds):
        raise ValueError(
            f"bucket thresholds must be strictly descending: {thresholds}"
        )
    for t, r in buckets:
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for threshold {t} outside [0, 1]: {r}")
    kc = F.col(key) if isinstance(key, str) else key
    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    h = hash_hex16(kc, salt)
    keep: Column = F.lit(False)
    cond = None
    for t, r in buckets:
        branch = _keep_expr(h, r)
        cond = (
            F.when(sc >= F.lit(float(t)), branch)
            if cond is None
            else cond.when(sc >= F.lit(float(t)), branch)
        )
    keep = cond.otherwise(F.lit(False))
    return df.filter(keep)


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment by near-dup CLUSTER, not by document —
    the leakage-controlled split: a plain :func:`hash_split` on doc ids
    scatters the members of a near-dup cluster across splits, so a
    validation document's near-verbatim twin trains the model and the
    eval is contaminated BY CONSTRUCTION. Keying the hash on the cluster
    label instead sends every member of a cluster to the same split
    (straddle count provably zero — the registered query witnesses it),
    while singleton docs (absent from ``clusters``) fall back to their
    own id, preserving hash_split's marginal fractions.

    ``clusters`` is any (id, cluster) labeling —
    ``dedup.connected_components`` output, the incremental fold's state,
    or SemDeDup cluster ids. Physical shape: ONE equi-join on the doc id
    (broadcast when the labeling is small, AQE-planned otherwise) and a
    map-side md5 range test; assignment is stable under re-partitioning,
    appends, and engine changes, and adding a NEW crawl's labels never
    moves an existing cluster's split (the hash keys on the cluster
    label, which star-contraction folds keep stable unless components
    genuinely merge).
    """
    lab = clusters.select(
        F.col(id_col),
        F.col(cluster_col).cast("string").alias("_ckey"),
    )
    keyed = df.join(lab, id_col, "left").withColumn(
        "_ckey", F.coalesce(F.col("_ckey"), F.col(id_col).cast("string"))
    )
    return hash_split(keyed, "_ckey", fractions, salt, split_col).drop(
        "_ckey"
    )
