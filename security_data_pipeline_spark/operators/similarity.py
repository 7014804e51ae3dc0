"""Similarity search over embedding columns (``array<float>``).

Two tiers (SURVEY.md §2.12):

- :func:`knn_bruteforce` — exact cosine top-k. The query side is broadcast
  (queries ≪ corpus), so the corpus NEVER shuffles: each corpus partition
  scores locally and only k rows per (query, partition) survive the
  partial TakeOrdered. Scales linearly in corpus size across executors.
- :func:`lsh_bucket_candidates` — random-hyperplane LSH for the 100 TB path:
  sign-bit signatures via a broadcast plane matrix (deterministic seed),
  band-bucketed so candidate generation is a hash-partition equi-join, not a
  cross join. Recall is tunable via (n_planes, n_bands).

Cosine math uses :mod:`security_data_pipeline_spark.functions.vectors`
(higher-order functions — JVM-side, sequential fold, reproducible by the
DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from security_data_pipeline_spark.pin import pin, pin_lazy

from security_data_pipeline_spark.functions.rounding import fround
from security_data_pipeline_spark.functions.vectors import cosine_similarity


def knn_bruteforce_scored(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """The exact-cosine pair frame :func:`knn_bruteforce` ranks — every
    (query, corpus) pair with its round-6 similarity, no per-query top-k
    yet. Exposed so multi-arm consumers (the recall-sweep scaffold) can
    union several arms' scored pairs and pay ONE top-k window exchange
    instead of one per arm (the round-12 sweep fusion)."""
    from security_data_pipeline_spark.functions.vectors import (
        directional,
        dot_product,
        l2_norm,
    )

    queries = directional(queries, vec_col)
    corpus = directional(corpus, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
        l2_norm(vec_col).alias("_qnrm"),
    )
    from security_data_pipeline_spark.operators.skew import fan_out

    c = fan_out(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
        l2_norm(vec_col).alias("_cnrm"),
    )
    pairs = c.join(F.broadcast(q), how="cross")
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    # norms precomputed once per vector; identical float math to
    # cosine_similarity()
    sim = F.round(
        dot_product(F.col("_qvec"), F.col("_cvec"))
        / (F.col("_qnrm") * F.col("_cnrm")),
        6,
    )
    return pairs.select("query_id", "neighbor_id", sim.alias("cosine_sim"))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: ``query_id, neighbor_id, cosine_sim`` — ranked on
    round(sim, 6) DESC with neighbor-id ASC tiebreak (deterministic across
    engines; raw-double rank order could differ in the last ulp).
    """
    scored = knn_bruteforce_scored(
        corpus, queries, id_col=id_col, vec_col=vec_col,
        exclude_self=exclude_self,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-nearest-neighbor majority-vote classification — the task-level
    consumer of the ANN family (label a new embedding by its neighbors;
    with ``queries ⊆ corpus`` and the self-match excluded this is
    leave-one-out evaluation of how separable the label space is, the
    standard embedding-quality probe before spending a training run).

    Output: ``(query_id, pred_label, n_votes)`` — one row per query.
    The vote is deterministic on any engine/partitioning: neighbor set
    from :func:`knn_bruteforce` (round-6 sim DESC, neighbor-id ASC),
    majority by (votes DESC, label ASC).

    Scale shape: the neighbor frame is |queries|·k rows; labels attach
    by broadcasting IT into the corpus label scan (the corpus never
    shuffles), and the vote is one map-side-combined aggregation plus a
    WindowGroupLimit-prunable rank window over ≤|labels| rows per query.
    """
    nn = knn_bruteforce(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("_nlabel"),
    )
    voted = (
        labels.join(F.broadcast(nn), "neighbor_id")
        .groupBy("query_id", "_nlabel")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("_nlabel")
    )
    return (
        voted.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "query_id",
            F.col("_nlabel").alias("pred_label"),
            "n_votes",
        )
    )


def hard_negative_topk(
    corpus: DataFrame,
    k: int = 3,
    query_pred: F.Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    allow_quadratic: bool = False,
) -> DataFrame:
    """Hard-negative mining: for each query vector, the ``k`` MOST
    similar corpus vectors carrying a DIFFERENT label — the pairs a
    contrastive/metric-learning run needs most (easy negatives teach
    nothing; the near-miss wrong-label examples define the margin).

    The label-mismatch filter runs BEFORE the top-k window — mining
    wants the nearest wrong-label examples, not the wrong-label subset
    of the overall top-k (which can be empty for well-clustered
    queries). Output: ``(query_id, query_label, neighbor_id,
    neighbor_label, cosine_sim, hard_rank)``, ranked round-6 sim DESC /
    neighbor-id ASC. Same scale shape as :func:`knn_bruteforce`:
    queries broadcast with their labels, the corpus never shuffles, one
    per-query top-k window.
    """
    from security_data_pipeline_spark.functions.vectors import (
        directional,
        dot_product,
        l2_norm,
    )
    from security_data_pipeline_spark.operators.skew import fan_out

    if query_pred is None and not allow_quadratic:
        raise ValueError(
            "hard_negative_topk without query_pred scores every corpus "
            "vector against every other (O(n²)); pass a bounded "
            "query_pred, or allow_quadratic=True for a small oracle corpus"
        )
    base = directional(corpus, vec_col)
    queries = base if query_pred is None else base.filter(query_pred)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
        l2_norm(vec_col).alias("_qnrm"),
    )
    c = fan_out(base, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
        l2_norm(vec_col).alias("_cnrm"),
    )
    pairs = c.join(
        F.broadcast(q),
        F.col("query_label") != F.col("neighbor_label"),
    )
    sim = F.round(
        dot_product(F.col("_qvec"), F.col("_cvec"))
        / (F.col("_qnrm") * F.col("_cnrm")),
        6,
    )
    scored = pairs.select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        sim.alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("hard_rank", F.row_number().over(w)).filter(
        F.col("hard_rank") <= k
    )


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold).

    ``block_col`` (e.g. an LSH bucket or label) restricts comparisons to
    same-block pairs — at scale ALWAYS pass one; the unblocked form is
    O(n²) and only for oracle-checkable small corpora, so it must be
    explicitly opted into with ``allow_quadratic=True`` (otherwise this
    raises — use :func:`cosine_dup_pairs_lsh`, the registered scale path).

    Physical shape: norms are computed ONCE per vector before the join (not
    per pair), the right side is broadcast (nested-loop join on the `<`
    predicate), and the streamed left side is repartitioned so the O(n²)
    scoring parallelizes across all cores instead of one task.
    """
    from security_data_pipeline_spark.functions.vectors import dot_product, l2_norm

    if block_col is None and not allow_quadratic:
        raise ValueError(
            "cosine_dup_pairs without block_col is an O(n²) cross-compare; "
            "pass allow_quadratic=True for a small oracle corpus, or use "
            "cosine_dup_pairs_lsh (bucketed candidates) at scale"
        )
    shuffle_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    from security_data_pipeline_spark.functions.vectors import directional

    base = directional(df, vec_col).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        l2_norm(vec_col).alias("_nrm"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    )
    a = base.toDF(*[f"{c}_a" for c in base.columns]).repartition(shuffle_parts)
    b = base.toDF(*[f"{c}_b" for c in base.columns])
    cond = F.col("_id_a") < F.col("_id_b")
    if block_col:
        cond = cond & (F.col("_blk_a") == F.col("_blk_b"))
        joined = a.join(b, cond)
    else:
        joined = a.join(F.broadcast(b), cond)
    # dot/(na*nb) with precomputed norms — identical float math to
    # cosine_similarity(), each norm just evaluated once per vector
    sim = F.round(
        dot_product(F.col("_v_a"), F.col("_v_b"))
        / (F.col("_nrm_a") * F.col("_nrm_b")),
        6,
    )
    return (
        joined.select(
            F.col("_id_a").alias("id_a"),
            F.col("_id_b").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def lsh_bucket_candidates(
    df: DataFrame,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: assign each vector to ``n_bands`` bucket keys.

    Deterministic plane matrix from ``numpy.random.default_rng(seed)``,
    broadcast as a literal — signature computation is pure Column math (dot
    sign bits), no Python UDF. Join on ``(band, bucket)`` to get candidate
    pairs, then verify with exact cosine. Returns the input plus ``band`` and
    ``bucket`` columns (exploded: n_bands rows per input row).
    """
    import numpy as np

    from security_data_pipeline_spark.operators.skew import fan_out

    if dim is None:
        sample = df.select(F.size(vec_col).alias("d")).first()
        if sample is None:
            raise ValueError("empty DataFrame; pass dim= explicitly")
        dim = sample["d"]
    df = fan_out(df, id_col)  # per-row CPU — spread before compute

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bits_per_band = n_planes // n_bands

    vec = F.col(vec_col).cast("array<double>")
    bit_cols = []
    for i in range(n_planes):
        plane_lit = F.array(*[F.lit(float(x)) for x in planes[i]])
        dot = F.aggregate(
            F.zip_with(vec, plane_lit, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit_cols.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))

    band_rows = []
    for b in range(n_bands):
        bucket = F.lit(0)
        for j in range(bits_per_band):
            bucket = bucket * 2 + bit_cols[b * bits_per_band + j]
        band_rows.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))

    return df.withColumn("_bands", F.explode(F.array(*band_rows))).select(
        "*", F.col("_bands.band").alias("band"), F.col("_bands.bucket").alias("bucket")
    ).drop("_bands")


def cosine_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.99,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs, LSH-blocked — the 100 TB form of
    :func:`cosine_dup_pairs`.

    Candidates are same-(band, bucket) pairs (hash equi-join, work bounded
    by bucket occupancy), then exact-cosine verified against ``threshold``.
    Deterministic seed → oracle-checkable, like :func:`ann_lsh_topk`.
    Recall < 1 by design: a pair only surfaces if it collides in ≥1 band.
    """
    from security_data_pipeline_spark.functions.vectors import (
        directional,
        dot_product,
        l2_norm,
    )

    base = directional(df, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    bands = lsh_bucket_candidates(
        base, n_planes=n_planes, n_bands=n_bands, seed=seed, dim=dim
    ).select("vec_id", "band", "bucket")
    cand = (
        bands.select(F.col("vec_id").alias("id_a"), "band", "bucket")
        .join(
            bands.select(F.col("vec_id").alias("id_b"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    norms = base.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("_v"),
        l2_norm("embedding").alias("_nrm"),
    )
    a = norms.toDF("id_a", "_v_a", "_nrm_a")
    b = norms.toDF("id_b", "_v_b", "_nrm_b")
    sim = F.round(
        dot_product(F.col("_v_a"), F.col("_v_b"))
        / (F.col("_nrm_a") * F.col("_nrm_b")),
        6,
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def ann_lsh_scored(
    corpus: DataFrame,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: F.Column | None = None,
    dim: int | None = None,
) -> DataFrame:
    """:func:`ann_lsh_topk`'s verified candidate frame before the per-query
    top-k window — ``query_id, neighbor_id, cosine_sim``. Exposed for the
    fused recall-sweep scaffold (one window exchange across all arms)."""
    from security_data_pipeline_spark.functions.vectors import directional

    base = directional(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    bands = lsh_bucket_candidates(
        base, n_planes=n_planes, n_bands=n_bands, seed=seed, dim=dim
    ).select("vec_id", "band", "bucket")
    q = bands.filter(query_pred) if query_pred is not None else bands
    cand = (
        q.select(F.col("vec_id").alias("query_id"), "band", "bucket")
        .join(
            bands.select(F.col("vec_id").alias("neighbor_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )

    from security_data_pipeline_spark.functions.vectors import dot_product, l2_norm

    norms = base.select(
        F.col("vec_id"),
        F.col("embedding").cast("array<double>").alias("_v"),
        l2_norm("embedding").alias("_nrm"),
    )
    a = norms.toDF("query_id", "_v_q", "_nrm_q")
    b = norms.toDF("neighbor_id", "_v_c", "_nrm_c")
    sim = F.round(
        dot_product(F.col("_v_q"), F.col("_v_c"))
        / (F.col("_nrm_q") * F.col("_nrm_c")),
        6,
    )
    return (
        cand.join(a, "query_id")
        .join(b, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )


def ann_lsh_topk(
    corpus: DataFrame,
    k: int = 3,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: F.Column | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors via LSH bucketing — the scale path.

    Candidate pairs come from an equi-join on ``(band, bucket)`` (hash
    shuffle bounded by bucket occupancy — never a cross join), deduped, then
    verified with exact cosine; ``row_number`` keeps k per query. With a
    deterministic seed the whole pipeline is reproducible cross-engine, so
    unlike most ANN code paths this one is oracle-checkable.

    ``query_pred`` restricts which vectors act as queries (all rows remain
    candidates); neighbors are only as complete as the buckets allow —
    that's the approximation.
    """
    scored = ann_lsh_scored(
        corpus, n_planes=n_planes, n_bands=n_bands, seed=seed,
        id_col=id_col, vec_col=vec_col, query_pred=query_pred, dim=dim,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def _normalize_rows(rows: list[list[float]]) -> list[list[float]]:
    """L2-normalize with the SAME sequential float ops both engines use
    (left-to-right Σx², sqrt, per-element divide) so driver-side codebooks
    equal SQL-side ones bit-for-bit."""
    import math

    out = []
    for v in rows:
        acc = 0.0
        for x in v:
            acc = acc + x * x
        nrm = math.sqrt(acc)
        out.append([x / nrm for x in v])
    return out


def pq_codebooks_lowest_ids(
    corpus: DataFrame,
    n_codewords: int = 16,
    n_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: subvector m of codebook = the m-th
    slices of the ``n_codewords`` lowest-id vectors (L2-normalized).

    Like :func:`ivf_centroid_vectors`, a seeded *selection* rather than a
    fit — derivable in ANSI SQL (``ORDER BY id LIMIT k`` + list slicing),
    so the whole PQ index is oracle-checkable. ``pq_fit_codebooks`` is the
    realistic per-subspace k-means form behind the same interface.
    Returns ``codebooks[m][k] = list[d_sub floats]``.
    """
    from security_data_pipeline_spark.functions.vectors import directional

    rows = (
        directional(corpus, vec_col)
        .orderBy(id_col)
        .limit(n_codewords)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    normed = _normalize_rows([list(r["v"]) for r in rows])
    dim = len(normed[0])
    d_sub = dim // n_sub
    return [
        [vec[m * d_sub : (m + 1) * d_sub] for vec in normed]
        for m in range(n_sub)
    ]


def pq_fit_codebooks(
    corpus: DataFrame,
    n_codewords: int = 16,
    n_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 4096,
    n_iter: int = 10,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Realistic PQ codebooks: independent k-means per subspace on a
    deterministic md5-ordered sample (same sampling/init recipe as
    :func:`ivf_fit_codebook`). Swap for :func:`pq_codebooks_lowest_ids`
    without touching encode/search."""
    import numpy as np

    from security_data_pipeline_spark.functions.vectors import directional
    from security_data_pipeline_spark.operators.sampling import hash_hex16

    rows = (
        directional(corpus, vec_col)
        .select(
            F.col(vec_col).cast("array<double>").alias("v"),
            hash_hex16(F.col(id_col)).alias("_h"),
        )
        .orderBy("_h", "v")
        .limit(sample_cap)
        .collect()
    )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = xn.shape[1]
    d_sub = dim // n_sub
    rng = np.random.default_rng(seed)
    books = []
    for m in range(n_sub):
        sub = xn[:, m * d_sub : (m + 1) * d_sub]
        c = sub[rng.choice(len(sub), size=n_codewords, replace=False)].copy()
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for k in range(n_codewords):
                members = sub[assign == k]
                if len(members):
                    c[k] = members.mean(axis=0)
        books.append([[float(v) for v in row] for row in c])
    return books


def _normalized_vec(vec_col: str) -> F.Column:
    """x_i / ||x|| with the sequential fold both engines share."""
    from security_data_pipeline_spark.functions.vectors import l2_norm

    v = F.col(vec_col).cast("array<double>")
    nrm = l2_norm(vec_col)
    return F.transform(v, lambda x: x / nrm)


def _pq_sub_dists(vn: F.Column, codebooks: list[list[list[float]]], m: int) -> F.Column:
    """array<double> of squared L2 distances from subvector m of ``vn`` to
    the 16 codewords — token-identical fold to the SQL oracle."""
    d_sub = len(codebooks[m][0])
    sub = F.slice(vn, m * d_sub + 1, d_sub)
    dists = []
    for cw in codebooks[m]:
        lit = F.array(*[F.lit(float(c)) for c in cw])
        dists.append(
            F.aggregate(
                F.zip_with(sub, lit, lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*dists)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Map-side PQ encoding: per subspace, the 1-based index of the nearest
    codeword (ties → lowest index) — ``array<int>`` of length n_sub. The
    compressed code is what rides shuffles at scale (n_sub bytes-ish vs
    4·dim for the raw vector)."""
    vn = _normalized_vec(vec_col)
    df = df.withColumn("_vn", vn)
    codes = []
    for m in range(len(codebooks)):
        d = _pq_sub_dists(F.col("_vn"), codebooks, m)
        codes.append(F.array_position(d, F.array_min(d)).cast("int"))
    return df.withColumn(code_col, F.array(*codes)).drop("_vn")


def ann_pq_adc_scored(
    corpus: DataFrame,
    n_codewords: int = 16,
    n_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: F.Column | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """:func:`ann_pq_adc_topk`'s full scored pair frame before the
    per-query top-k window — ``query_id, neighbor_id, adc_dist``
    (ascending = most similar). Exposed for the fused recall-sweep
    scaffold (one window exchange across all arms)."""
    from security_data_pipeline_spark.functions.vectors import directional

    # deliberately NOT fan_out here (round-12 measurement): the PQ sweep
    # arms run as independent single-task pipelines that AQE executes
    # concurrently; hash-spreading each arm's encode added an exchange +
    # 32-task scheduling per arm and measured SLOWER on the 4-arm sweeps
    # (4.7 s -> 5.8 s). At scale a real corpus scans as many splits and
    # parallelizes without help.
    corpus = directional(corpus, vec_col)
    cbs = (
        codebooks
        if codebooks is not None
        else pq_codebooks_lowest_ids(
            corpus, n_codewords=n_codewords, n_sub=n_sub,
            id_col=id_col, vec_col=vec_col,
        )
    )
    n_sub = len(cbs)
    coded = pq_encode(
        corpus.select(F.col(id_col).alias("neighbor_id"), vec_col), cbs,
        vec_col=vec_col,
    ).select("neighbor_id", "pq_codes")

    q = corpus.select(F.col(id_col).alias("query_id"), vec_col)
    if query_pred is not None:
        q = q.filter(query_pred)
    # per-query LUT: q_dists[m][cid] — computed once per query row, and
    # STORED as 9dp-scaled longs so the per-(query, candidate) hot loop
    # is m element_at lookups + m long adds. The old form cast each
    # looked-up double to DECIMAL(20,9) per pair — m BigDecimal
    # constructions x |queries|·|corpus| pairs dominated the sweep bench
    # (13.5 s -> ~halved at sf0.1, round 11). Bit parity is preserved
    # exactly: round(d, 9) is the nearest double to n/1e9 (error
    # <= 4e-16), so * 1e9 + round-to-nearest recovers the integer n the
    # decimal held; per-subspace d <= 4 and m <= 16 bound the long sum
    # by 6.4e10 << 2^53, so long->double is exact and the single final
    # /1e9 is the same correctly-rounded double the DECIMAL sum cast to.
    vn = _normalized_vec(vec_col)
    q = q.withColumn("_vn", vn)
    q = q.select(
        "query_id",
        F.array(
            *[
                F.transform(
                    _pq_sub_dists(F.col("_vn"), cbs, m),
                    lambda d: F.round(F.round(d, 9) * F.lit(1e9), 0).cast(
                        "long"
                    ),
                )
                for m in range(n_sub)
            ]
        ).alias("_lut"),
    )

    pairs = coded.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    term = lambda m: F.element_at(  # noqa: E731
        F.element_at(F.col("_lut"), m + 1), F.element_at(F.col("pq_codes"), m + 1)
    )
    adc = term(0)
    for m in range(1, n_sub):
        adc = adc + term(m)
    return pairs.select(
        "query_id",
        "neighbor_id",
        (adc.cast("double") / F.lit(1e9)).alias("adc_dist"),
    )


def ann_pq_adc_topk(
    corpus: DataFrame,
    k: int = 3,
    n_codewords: int = 16,
    n_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: F.Column | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ + asymmetric distance computation (ADC) approximate top-k — the
    memory-bound ANN scale path (complement of LSH's hash pruning and
    IVF's cluster pruning): the corpus is stored/shuffled as tiny PQ codes,
    queries stay exact, and each (query, candidate) distance is a SUM of
    per-subspace lookups into the query's distance-to-codeword table.

    Determinism for the oracle: per-subspace distances are rounded to 9dp
    and summed as DECIMAL (exact, order-free — a float SUM across a group
    is accumulation-order-dependent and differs between engines), then
    ranked with a total (distance, neighbor_id) order. Returns
    ``query_id, neighbor_id, adc_dist`` (ascending distance = most
    similar; vectors are L2-normalized, so d² = 2 − 2·cos).
    """
    scored = ann_pq_adc_scored(
        corpus, n_codewords=n_codewords, n_sub=n_sub, id_col=id_col,
        vec_col=vec_col, query_pred=query_pred, codebooks=codebooks,
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def ivf_centroid_vectors(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic IVF codebook: the ``n_centroids`` lowest-id vectors.

    No Lloyd iterations — the codebook is a seeded *selection*, not a fit,
    so the same centroids are derivable in ANSI SQL (``ORDER BY id LIMIT
    k``) and the whole index is oracle-checkable. At 100 TB you'd swap in
    k-means|| centroids from a sample; every downstream step is unchanged
    (the codebook is an opaque list of literals either way). Zero-norm
    and NULL vectors are skipped — a zero centroid has no direction and
    its literal norm would divide every assignment by zero.
    """
    from security_data_pipeline_spark.functions.vectors import directional

    rows = (
        directional(corpus, vec_col)
        .orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    return [list(r["v"]) for r in rows]


def ivf_fit_codebook(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 4096,
    n_iter: int = 10,
    seed: int = 42,
) -> list[list[float]]:
    """Spherical k-means codebook fit on a deterministic sample — the
    realistic IVF build (vs :func:`ivf_centroid_vectors`'s oracle-friendly
    lowest-id selection; both return the same opaque literal list, so every
    downstream step is shared).

    Standard large-scale recipe: the codebook is fit on a SAMPLE and only
    assignment runs over the full corpus (map-side, no shuffle). The sample
    is the ``sample_cap`` rows with the smallest ``md5(id)`` — a TakeOrdered
    (top-k per partition + driver merge, never a full sort) that is stable
    under any partitioning/appending, unlike ``df.sample``'s RNG. Lloyd
    iterations then run driver-side in numpy (sample_cap × dim floats —
    KBs-to-MBs) with seeded k-means++-style init: deterministic end to end,
    so a recall test pins the index quality. Cosine geometry → vectors and
    centroids are L2-normalized and assignment maximizes the dot product.
    """
    import numpy as np

    from security_data_pipeline_spark.functions.vectors import directional
    from security_data_pipeline_spark.operators.sampling import hash_hex16

    rows = (
        directional(corpus, vec_col)
        .select(
            F.col(vec_col).cast("array<double>").alias("v"),
            hash_hex16(F.col(id_col)).alias("_h"),
        )
        .orderBy("_h", "v")
        .limit(sample_cap)
        .collect()
    )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    if len(x) < n_centroids:
        raise ValueError(f"sample ({len(x)}) smaller than n_centroids")
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    rng = np.random.default_rng(seed)
    # k-means++-style init on the normalized sample: first pick seeded, the
    # rest greedy-probabilistic by squared cosine distance
    cents = [xn[rng.integers(len(xn))]]
    for _ in range(n_centroids - 1):
        sims = np.max(np.stack([xn @ c for c in cents]), axis=0)
        d2 = np.maximum(1.0 - sims, 0.0) ** 2
        if d2.sum() <= 0:
            cents.append(xn[rng.integers(len(xn))])
            continue
        cents.append(xn[rng.choice(len(xn), p=d2 / d2.sum())])
    c = np.stack(cents)
    for _ in range(n_iter):
        assign = np.argmax(xn @ c.T, axis=1)
        for k in range(n_centroids):
            members = xn[assign == k]
            if len(members):
                mean = members.mean(axis=0)
                c[k] = mean / max(np.linalg.norm(mean), 1e-12)
    return [list(map(float, row)) for row in c]


_SUM_DEC = "decimal(38,18)"  # exact, order-free accumulation of unit-vector
# components: |x| <= 1 and <= 10^20 rows before integer digits overflow


def ivf_fit_codebook_distributed(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 10,
) -> list[list[float]]:
    """Spherical k-means codebook fit over the FULL corpus with Lloyd
    iterations as DataFrame jobs — the genuinely-large-codebook path the
    sampled :func:`ivf_fit_codebook` defers to (same return contract; swap
    freely, every downstream step takes the codebook as an opaque list).

    Per iteration: map-side nearest-centroid assignment against the
    broadcast codebook literal (:func:`ivf_assign` — no corpus shuffle),
    then ONE partial-aggregated ``groupBy(cluster)`` producing per-cluster
    counts and per-dimension component sums. Only k rows of (count, d
    sums) ever reach the driver — the k×d centroid matrix Lloyd's
    inherently rebuilds to broadcast the next round (Spark ML's KMeans
    collects the same). Spherical update: the renormalized component SUM
    equals the renormalized mean (scaling preserves direction), so no
    division by the count is needed; empty clusters keep their previous
    centroid.

    Deterministic under any partitioning: init is the ``n_centroids``
    lowest-``md5(id)`` vectors (TakeOrdered, not ``df.sample``), component
    sums accumulate as DECIMAL (exact, order-free — a double SUM across
    partitions is accumulation-order-dependent), assignment ties break to
    the lowest centroid id, and the driver-side renormalization is a fixed
    left-to-right fold. Same inputs → bit-identical codebook.
    """
    import math

    from security_data_pipeline_spark.operators.sampling import hash_hex16

    from security_data_pipeline_spark.functions.vectors import directional

    corpus = directional(corpus, vec_col)
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if dim_row is None:
        raise ValueError("corpus is empty")
    dim = dim_row["d"]

    vn = corpus.select(_normalized_vec(vec_col).alias("_vn"))
    init_rows = (
        corpus.select(
            _normalized_vec(vec_col).alias("_vn"),
            hash_hex16(F.col(id_col)).alias("_h"),
        )
        .orderBy("_h", "_vn")
        .limit(n_centroids)
        .collect()
    )
    if len(init_rows) < n_centroids:
        raise ValueError(
            f"corpus ({len(init_rows)}) smaller than n_centroids"
        )
    cents = [list(r["_vn"]) for r in init_rows]

    sums = [
        F.sum(F.col("_vn")[i].cast(_SUM_DEC)).alias(f"_s{i}")
        for i in range(dim)
    ]
    # the normalized corpus is read once per Lloyd iteration: persist it so
    # the scan + normalization run ONCE, not n_iter times (bit-identical
    # output — caching changes where rows come from, not their values)
    vn = vn.persist()
    try:
        for _ in range(n_iter):
            agg = (
                ivf_assign(vn, cents, vec_col="_vn", cluster_col="_c")
                .groupBy("_c")
                .agg(F.count(F.lit(1)).alias("_n"), *sums)
                .collect()
            )
            new = [list(c) for c in cents]
            for r in agg:
                s = [float(r[f"_s{i}"]) for i in range(dim)]
                acc = 0.0
                for x in s:
                    acc = acc + x * x
                nrm = math.sqrt(acc)
                if nrm > 1e-12:
                    new[r["_c"] - 1] = [x / nrm for x in s]
            cents = new
    finally:
        vn.unpersist()
    return cents


def pq_fit_codebooks_distributed(
    corpus: DataFrame,
    n_codewords: int = 16,
    n_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 10,
) -> list[list[list[float]]]:
    """Per-subspace k-means PQ codebooks fit over the FULL corpus — the
    distributed sibling of :func:`pq_fit_codebooks` (same return contract).

    All ``n_sub`` subspaces train in ONE job per iteration: each corpus row
    explodes to (subspace, subvector) pairs map-side, nearest-codeword
    assignment indexes a single 3-level codebook literal by subspace, and
    one ``groupBy(subspace, codeword)`` yields n_sub·k rows of counts +
    d_sub-dimension DECIMAL sums — never a per-subspace corpus scan.
    Update is the plain Euclidean mean (sums / count); empty cells keep
    their previous codeword. Deterministic end to end for the same reasons
    as :func:`ivf_fit_codebook_distributed` (lowest-``md5(id)`` init rows,
    exact decimal sums, lowest-index tie-breaks).
    """
    from security_data_pipeline_spark.functions.vectors import directional

    corpus = directional(corpus, vec_col)
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if dim_row is None:
        raise ValueError("corpus is empty")
    dim = dim_row["d"]
    if dim % n_sub != 0:
        raise ValueError(
            f"vector dim {dim} is not divisible by n_sub {n_sub}; trailing "
            "dims would be silently dropped — pad the vectors or pick a "
            "divisor"
        )
    d_sub = dim // n_sub

    from security_data_pipeline_spark.operators.sampling import hash_hex16

    vn = _normalized_vec(vec_col)
    slices = F.array(
        *[F.slice(vn, m * d_sub + 1, d_sub) for m in range(n_sub)]
    )
    subs = corpus.select(F.posexplode(slices).alias("_m", "_sv"))

    init_rows = (
        corpus.select(vn.alias("_vn"), hash_hex16(F.col(id_col)).alias("_h"))
        .orderBy("_h", "_vn")
        .limit(n_codewords)
        .collect()
    )
    if len(init_rows) < n_codewords:
        raise ValueError(
            f"corpus ({len(init_rows)}) smaller than n_codewords"
        )
    books = [
        [list(r["_vn"])[m * d_sub : (m + 1) * d_sub] for r in init_rows]
        for m in range(n_sub)
    ]

    sums = [
        F.sum(F.col("_sv")[i].cast(_SUM_DEC)).alias(f"_s{i}")
        for i in range(d_sub)
    ]
    # one materialization of the exploded (subspace, subvector) rows feeds
    # every Lloyd iteration instead of n_iter corpus rescans
    subs = subs.persist()
    try:
        for _ in range(n_iter):
            books = _pq_lloyd_step(subs, books, sums, d_sub)
    finally:
        subs.unpersist()
    return books


def _pq_lloyd_step(
    subs: DataFrame,
    books: list[list[list[float]]],
    sums: list,
    d_sub: int,
) -> list[list[list[float]]]:
    """One PQ Lloyd iteration: assign every (subspace, subvector) row to
    its nearest codeword against the broadcast codebook literal, reduce to
    n_sub·k rows of counts + DECIMAL sums, update means driver-side."""
    lit = F.lit([[[float(x) for x in cw] for cw in b] for b in books])
    scored = F.transform(
        F.element_at(lit, F.col("_m") + 1),
        lambda cw, i: F.struct(
            F.aggregate(
                F.zip_with(F.col("_sv"), cw, lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
            i.cast("int").alias("idx"),
        ),
    )
    best = F.aggregate(
        scored,
        F.struct(
            F.lit(float("inf")).alias("d2"),
            F.lit(-1).cast("int").alias("idx"),
        ),
        lambda acc, x: F.when(x["d2"] < acc["d2"], x).otherwise(acc),
    )
    agg = (
        subs.withColumn("_k", best["idx"])
        .groupBy("_m", "_k")
        .agg(F.count(F.lit(1)).alias("_n"), *sums)
        .collect()
    )
    new = [[list(cw) for cw in b] for b in books]
    for r in agg:
        if r["_k"] < 0:
            # every squared distance compared NaN (NaN < x is false for
            # all x), so idx never advanced past the -1 seed — a NaN
            # subvector in the corpus. Failing loudly beats the silent
            # Python-negative-index overwrite of the LAST codeword.
            raise ValueError(
                f"NaN subvector(s) in subspace {r['_m']}: "
                f"{r['_n']} rows could not be assigned to any codeword"
            )
        n = r["_n"]
        new[r["_m"]][r["_k"]] = [
            float(r[f"_s{i}"]) / n for i in range(d_sub)
        ]
    return new


def _centroid_sims(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """Array of round(cosine(vec, centroid_i), 6) — JVM-side, no shuffle,
    no Python.

    The codebook enters the plan as ONE ``array<array<double>>`` literal
    iterated by ``transform``, not as k unrolled per-centroid expressions:
    the unrolled form builds a k×dim-node expression tree whose analysis +
    codegen cost ~1.2 s of driver time PER FRESH PLAN at k=16, dim=64
    (measured: first-run 1.30 s vs 0.13 s steady — pure planning overhead,
    and at k=256 the generated method would blow past JIT limits). The
    literal-matrix form plans in ~10 ms at any k and evaluates the same
    fold per element — bit-identical output (same operand order)."""
    import math

    from security_data_pipeline_spark.functions.vectors import dot_product, l2_norm

    zero = [i for i, cv in enumerate(centroids) if not any(cv)]
    if zero:
        raise ValueError(
            f"codebook has zero-norm centroids at positions {zero} — a "
            "zero centroid has no direction and divides every assignment "
            "by zero; fit the codebook on directional vectors"
        )
    matrix = F.lit([[float(x) for x in cv] for cv in centroids])
    norms = F.lit(
        [math.sqrt(sum(x * x for x in cv)) for cv in centroids]
    )
    vnrm = l2_norm(vec_col)
    return F.transform(
        matrix,
        lambda cv, i: F.round(
            dot_product(F.col(vec_col), cv)
            / (vnrm * F.element_at(norms, i + F.lit(1))),
            6,
        ),
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cluster_col: str = "ivf_cluster",
) -> DataFrame:
    """Map-side IVF list assignment: nearest centroid by cosine (1-based id,
    ties → lowest id). Pure per-row expression — the corpus never shuffles
    to get clustered, which is the property that matters at 100 TB.

    Argmax is a single ``aggregate`` fold over the (sim, id) structs, not
    ``array_position(array_max(sims))``: the latter references the sims
    array twice, and after ``CollapseProject`` inlines the alias the whole
    k×dim similarity computation runs TWICE per row. The strict ``>`` in
    the fold keeps the earlier (lowest-id) centroid on ties — the same
    tie-break ``array_position``'s first-match gives. Zero-norm and
    NULL vectors are dropped (no direction, and the cosine fold would
    divide by zero)."""
    from security_data_pipeline_spark.functions.vectors import directional

    df = directional(df, vec_col)
    scored = F.transform(
        _centroid_sims(vec_col, centroids),
        lambda s, i: F.struct(
            s.alias("sim"), (i + F.lit(1)).cast("int").alias("cid")
        ),
    )
    best = F.aggregate(
        scored,
        F.struct(
            F.lit(-2.0).alias("sim"), F.lit(0).cast("int").alias("cid")
        ),
        lambda acc, x: F.when(x["sim"] > acc["sim"], x).otherwise(acc),
    )
    return df.withColumn(cluster_col, best["cid"])


def ann_ivf_scored(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: F.Column | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """:func:`ann_ivf_topk`'s probed + exact-scored candidate frame before
    the per-query top-k window — ``query_id, neighbor_id, cosine_sim``.
    Exposed for the fused recall-sweep scaffold (one window exchange
    across all arms)."""
    cents = centroids if centroids is not None else ivf_centroid_vectors(
        corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
    )

    from security_data_pipeline_spark.functions.vectors import l2_norm
    from security_data_pipeline_spark.operators.skew import fan_out

    clustered = ivf_assign(
        fan_out(corpus, id_col).select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ),
        cents,
        vec_col="embedding",
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("_v_c"),
        l2_norm("embedding").alias("_nrm_c"),
        "ivf_cluster",
    )

    q = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    if query_pred is not None:
        q = q.filter(query_pred)
    return _ivf_probe_and_score(clustered, q, cents, n_probe)


def ann_ivf_topk(
    corpus: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: F.Column | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k cosine neighbors — the cluster-pruned scale path
    (complement of :func:`ann_lsh_topk`'s hash-pruned one).

    Corpus rows get a map-side cluster id (:func:`ivf_assign`); each query
    ranks the codebook and probes its ``n_probe`` nearest clusters; the
    probe list (queries × n_probe rows, tiny) is **broadcast** against the
    clustered corpus, so candidate generation is a broadcast hash join that
    scans each corpus partition once — no corpus shuffle, no cross join.
    Exact cosine re-rank keeps k per query. Recall < 1 by design: misses
    exactly the neighbors whose cluster the query didn't probe.

    ``centroids`` plugs in any codebook (e.g. :func:`ivf_fit_codebook`'s
    sampled k-means fit — the realistic index); the default stays the
    deterministic lowest-id selection so the registered query remains
    oracle-checkable end to end.
    """
    scored = ann_ivf_scored(
        corpus, n_centroids=n_centroids, n_probe=n_probe, id_col=id_col,
        vec_col=vec_col, query_pred=query_pred, centroids=centroids,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def _ivf_probe_queries(q: DataFrame, cents: list[list[float]], n_probe: int) -> DataFrame:
    """(query_id, _v_q, _nrm_q, _probe) — each query exploded to its
    ``n_probe`` nearest clusters. Per-query probe ranking is ARRAY-LOCAL:
    all centroid sims for a query already sit in one array, so top-n_probe
    is a sort_array + slice in the same projection — no posexplode →
    shuffle → row_number round trip (which costs a full exchange of the
    query set at any scale). The struct sorts (sim DESC, -cid DESC ≡ cid
    ASC): lowest centroid id wins ties, matching the window form it
    replaces."""
    from security_data_pipeline_spark.functions.vectors import (
        directional,
        l2_norm,
    )

    q = directional(q, "embedding")
    ranked = F.slice(
        F.sort_array(
            F.transform(
                _centroid_sims("embedding", cents),
                lambda s, i: F.struct(
                    s.alias("sim"),
                    (-(i + F.lit(1))).cast("int").alias("negcid"),
                ),
            ),
            asc=False,
        ),
        1,
        n_probe,
    )
    return q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("_v_q"),
        l2_norm("embedding").alias("_nrm_q"),
        F.explode(ranked).alias("_probe_s"),
    ).select(
        "query_id",
        "_v_q",
        "_nrm_q",
        (-F.col("_probe_s")["negcid"]).alias("_probe"),
    )


def _ivf_probe_and_score(
    clustered: DataFrame,
    q: DataFrame,
    cents: list[list[float]],
    n_probe: int,
) -> DataFrame:
    """Broadcast the probe list against the clustered corpus and
    exact-cosine score every candidate — :func:`_ivf_probe_and_rerank`
    before its top-k window. Exposed for the fused recall-sweep scaffold
    (one window exchange across all arms)."""
    from security_data_pipeline_spark.functions.vectors import dot_product

    probes = _ivf_probe_queries(q, cents, n_probe)
    sim = F.round(
        dot_product(F.col("_v_q"), F.col("_v_c"))
        / (F.col("_nrm_q") * F.col("_nrm_c")),
        6,
    )
    return (
        clustered.join(
            F.broadcast(probes), F.col("ivf_cluster") == F.col("_probe")
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )


def _ivf_probe_and_rerank(
    clustered: DataFrame,
    q: DataFrame,
    cents: list[list[float]],
    k: int,
    n_probe: int,
) -> DataFrame:
    """Broadcast the probe list against the clustered corpus, exact-cosine
    re-rank, keep k per query (sim DESC, neighbor-id ASC)."""
    scored = _ivf_probe_and_score(clustered, q, cents, n_probe)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]] | None = None,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "error",
) -> list[list[float]]:
    """PERSIST an IVF index: the corpus written as parquet PARTITIONED BY
    its map-side cluster assignment under a GENERATION level
    (``_b=base/ivf_cluster=<cid>/`` directories — the same two-level
    layout the streaming index maintainer and the incremental appenders
    produce, so built, appended, and streamed generations coexist under
    one discovery root), plus the codebook returned for the search side.
    This is the 100 TB index shape: a probed search touches ONLY its
    n_probe cluster directories — the other
    (n_centroids - n_probe)/n_centroids of the corpus is never opened,
    enforced by parquet partition pruning rather than a runtime filter.
    Build cost is one corpus pass + one shuffle (the partitioned write);
    incremental refreshes land as their own idempotent ``_b=a-<token>``
    generation directories (:func:`append_to_ivf_index`).
    """
    cents = centroids if centroids is not None else ivf_centroid_vectors(
        corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
    )
    clustered = ivf_assign(
        corpus.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ),
        cents,
        vec_col="embedding",
    )
    clustered.write.mode(mode).partitionBy("ivf_cluster").parquet(
        f"{path}/_b=base"
    )
    return cents


def search_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probed search over a :func:`build_ivf_index` layout. The union of
    the queries' probe lists (≤ |queries|·n_probe cluster ids, driver-
    collected — tiny) becomes a LITERAL ``isin`` filter on the partition
    column, so the scan statically prunes to the probed directories
    (``PartitionFilters`` in the plan — asserted in tests); scoring and
    re-rank are identical to :func:`ann_ivf_topk` (bit-equal results,
    asserted). Identical output contract: (query_id, neighbor_id,
    cosine_sim)."""
    from security_data_pipeline_spark.functions.vectors import l2_norm

    q = queries.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    probe_ids = sorted(
        r["_probe"]
        for r in _ivf_probe_queries(q, centroids, n_probe)
        .select("_probe")
        .distinct()
        .collect()
    )
    corpus = spark.read.parquet(path).filter(
        F.col("ivf_cluster").isin(probe_ids)
    )
    clustered = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("_v_c"),
        l2_norm("embedding").alias("_nrm_c"),
        "ivf_cluster",
    )
    return _ivf_probe_and_rerank(clustered, q, centroids, k, n_probe)


def build_ivf_sq8_index(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]] | None = None,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "error",
) -> list[list[float]]:
    """PERSIST a compressed IVF index: cluster-partitioned directories
    like :func:`build_ivf_index`, but storing SQ8 CODES (array<int>,
    0..255 — 4-8x smaller than the float arrays) quantized on a
    PER-CLUSTER (mins, maxs) grid, written beside the index as a
    ``{path}__grid`` sidecar of n_centroids rows. This is the production
    index layout: partition pruning bounds WHICH directories a probe
    opens, scalar quantization bounds HOW MANY bytes each opened
    directory scans — and the per-cluster grid is tighter than a global
    one because each cluster spans a fraction of every dimension's range,
    so the same 8 bits buy finer reconstruction exactly where the
    re-rank needs it.

    Build cost: one corpus pass for assignment, one 2·dim-column
    aggregate for the grids (map-side combined), one partitioned write.
    Returns the codebook for the search side.
    """
    cents = centroids if centroids is not None else ivf_centroid_vectors(
        corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
    )
    dim = len(cents[0])
    clustered = ivf_assign(
        corpus.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ),
        cents,
        vec_col="embedding",
    )
    v = F.col("embedding").cast("array<double>")
    grid = clustered.groupBy("ivf_cluster").agg(
        F.array(*[F.min(v[i]) for i in range(dim)]).alias("mins"),
        F.array(*[F.max(v[i]) for i in range(dim)]).alias("maxs"),
    )
    # encode each vector on ITS cluster's grid (grid is n_centroids rows
    # -> broadcast); constant-range dims take code 0 and dequant to mn
    mn = F.col("mins")
    mx = F.col("maxs")
    codes = F.transform(
        v,
        lambda x, i: F.when(
            F.element_at(mx, i + 1) == F.element_at(mn, i + 1), F.lit(0)
        )
        .otherwise(
            F.floor(
                (x - F.element_at(mn, i + 1))
                / (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
                * F.lit(255.0)
                + F.lit(0.5)
            )
        )
        .cast("int"),
    )
    (
        clustered.join(F.broadcast(grid), "ivf_cluster")
        .select("vec_id", codes.alias("sq8_codes"), "ivf_cluster")
        .write.mode(mode)
        .partitionBy("ivf_cluster")
        .parquet(f"{path}/_b=base")
    )
    grid.write.mode(
        "overwrite" if mode == "overwrite" else mode
    ).parquet(f"{path}__grid")
    return cents


def _append_generation_dir(path: str, token: str) -> str:
    """Directory of one idempotent append generation. ``token`` names the
    INGEST RUN (a date, a batch id — stable across retries of the same
    run, distinct across runs): the generation is written with
    ``overwrite``, so a retry after a partial failure replaces its own
    directory instead of duplicating rows — the same discipline as the
    streaming maintainer's per-batch ``_b=<lineage>-<id>`` directories,
    which share this namespace."""
    if not token or "/" in token or token in ("base",):
        raise ValueError(
            "token must be a non-empty path-safe ingest-run name"
            f" (not 'base'), got {token!r}"
        )
    return f"{path}/_b=a-{token}"


def append_to_ivf_index(
    new_vectors: DataFrame,
    path: str,
    centroids: list[list[float]],
    token: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental refresh of a :func:`build_ivf_index` layout — the
    nightly-ingest path: assign ONLY the new vectors map-side against the
    EXISTING codebook (a driver-list literal, so the only shuffle is the
    partitioned write of the new rows) and land them as ONE new
    generation directory ``_b=a-<token>/ivf_cluster=<c>/``. The write is
    an OVERWRITE of the generation's own directory, so retrying a failed
    ingest run (same ``token``) is idempotent — a plain append would
    duplicate every vector the first attempt already committed. Search
    plans are unchanged — partition pruning prunes on ``ivf_cluster``
    across however many generations exist. Given the same codebook, an
    append-built index holds exactly the rows a full rebuild would
    (assignment is a deterministic argmax), asserted bit-equal in tests.

    Centroids are NOT refitted here; after many appends the assignment
    drifts from what a refit would give — watch
    :func:`ivf_index_staleness` for when a rebuild pays for itself.
    """
    clustered = ivf_assign(
        new_vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ),
        centroids,
        vec_col="embedding",
    )
    clustered.write.mode("overwrite").partitionBy("ivf_cluster").parquet(
        _append_generation_dir(path, token)
    )


def sq8_encode_against_grid(clustered: DataFrame, grid: DataFrame) -> DataFrame:
    """Encode assigned vectors (``vec_id, embedding, ivf_cluster``) on an
    EXISTING per-cluster grid: codes CLAMP to [0, 255] when a component
    falls outside the fitted (mins, maxs) box and the row is flagged
    ``_oog``. Raises if any vector lands in a cluster with no fitted grid
    (a cluster empty at build time — silently dropping its vectors would
    lose data; lowest-id / k-means codebooks always seed every cluster,
    so this only fires on a hand-supplied degenerate codebook). Returns a
    locally-checkpointed ``(vec_id, sq8_codes, ivf_cluster, _oog)``
    frame — the shared encode half of :func:`append_to_ivf_sq8_index`
    and the streaming index maintainer."""
    v = F.col("embedding").cast("array<double>")
    mn = F.col("mins")
    mx = F.col("maxs")
    out_of_grid = F.exists(
        F.transform(
            v,
            lambda x, i: (x < F.element_at(mn, i + 1))
            | (x > F.element_at(mx, i + 1)),
        ),
        lambda b: b,
    )
    codes = F.transform(
        v,
        lambda x, i: F.when(
            F.element_at(mx, i + 1) == F.element_at(mn, i + 1), F.lit(0)
        )
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(255),
                    F.floor(
                        (x - F.element_at(mn, i + 1))
                        / (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
                        * F.lit(255.0)
                        + F.lit(0.5)
                    ),
                ),
            )
        )
        .cast("int"),
    )
    enc = (
        clustered.join(F.broadcast(grid), "ivf_cluster", "left")
        .select(
            "vec_id",
            codes.alias("sq8_codes"),
            "ivf_cluster",
            out_of_grid.alias("_oog"),
            F.col("mins").isNull().alias("_no_grid"),
        )
        .transform(pin)
    )
    n_no_grid = enc.filter("_no_grid").count()
    if n_no_grid:
        raise ValueError(
            f"{n_no_grid} vectors assigned to clusters with no fitted grid"
            " — rebuild the index"
        )
    return enc.drop("_no_grid")


def append_to_ivf_sq8_index(
    spark,
    new_vectors: DataFrame,
    path: str,
    centroids: list[list[float]],
    token: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental refresh of a :func:`build_ivf_sq8_index` layout: new
    vectors are assigned against the existing codebook and encoded on the
    EXISTING per-cluster grids (read from the ``{path}__grid`` sidecar —
    the grids must stay fixed, or old codes would decode on a different
    scale than new ones). A new vector can fall OUTSIDE its cluster's
    fitted (mins, maxs) box; its codes CLAMP to [0, 255] (reconstruction
    saturates at the grid edge) and the vector is counted as an
    out-of-grid violation. Returns the per-cluster violation report
    ``(ivf_cluster, n_appended, n_out_of_grid)`` and journals it to
    ``{path}__viol`` so :func:`ivf_index_staleness` can accumulate grid
    staleness across appends. One batch-sized pass; both the index rows
    and the journal land as the ingest run's OWN ``_b=a-<token>``
    generation directory (overwrite — a retry after a partial failure,
    e.g. the index write committed but the journal write died, replaces
    its own generation instead of duplicating vectors and double-counting
    violations).
    """
    grid = spark.read.parquet(f"{path}__grid")
    gen_dir = _append_generation_dir(path, token)
    clustered = ivf_assign(
        new_vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ),
        centroids,
        vec_col="embedding",
    )
    enc = sq8_encode_against_grid(clustered, grid)
    enc.drop("_oog").write.mode("overwrite").partitionBy(
        "ivf_cluster"
    ).parquet(gen_dir)
    report = enc.groupBy("ivf_cluster").agg(
        F.count(F.lit(1)).alias("n_appended"),
        F.sum(F.col("_oog").cast("long")).alias("n_out_of_grid"),
    )
    report.write.mode("overwrite").parquet(f"{path}__viol/_b=a-{token}")
    return report


def _index_generations(spark, path: str) -> list[str]:
    """Names of the ``_b=<gen>`` generation directories under an index
    root (build ``base``, appends ``a-<token>``, streamed batches
    ``<lineage>-<id>``, compactions ``c<n>``)."""
    jvm = spark._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(path)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jroot):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(jroot)
        if st.getPath().getName().startswith("_b=")
    ]


def _read_viol_journal(spark, viol_root: str) -> DataFrame:
    """Canonical, replay-safe view of the append/violation journal:
    ``(src_gen, ivf_cluster, n_appended, n_out_of_grid)``.

    Every report row is keyed by the GENERATION that first produced it —
    fresh per-batch/append directories carry the key implicitly as their
    ``_b`` partition value; a folded generation preserves it explicitly
    in a ``src_gen`` column. The read coalesces the two and dedups by
    ``(src_gen, ivf_cluster)``, so a crash-replayed micro-batch that
    re-creates its per-batch directory AFTER a fold already captured it
    (the identical report now present under both its own ``_b`` and the
    fold's ``src_gen``) counts exactly ONCE. Duplicates can only arise
    from idempotent re-writes of the same generation, so their contents
    are identical and the surviving row is deterministic in value.
    Legacy pre-src_gen folds read back keyed by their own fold name —
    correct sums, though batches folded before the keyed layout cannot
    retroactively heal an already-double-counted replay."""
    df = spark.read.option("mergeSchema", "true").parquet(viol_root)
    if "src_gen" not in df.columns:
        df = df.withColumn("src_gen", F.lit(None).cast("string"))
    return (
        df.withColumn(
            "src_gen", F.coalesce("src_gen", F.col("_b").cast("string"))
        )
        .dropDuplicates(["src_gen", "ivf_cluster"])
        .select("src_gen", "ivf_cluster", "n_appended", "n_out_of_grid")
    )


def _fold_viol_journal(spark, path: str, new_gen: str) -> None:
    """Fold the append journal's accumulated ``_b=`` generations into ONE
    generation of generation-keyed rows: ``src_gen`` preserved per row,
    values untouched, so :func:`ivf_index_staleness` (which sums the
    deduped :func:`_read_viol_journal` view) is unchanged. Keying rows by
    source generation is what makes the swap safe around crashes WITHOUT
    a resume protocol: the fold is written to a scratch sibling, renamed
    in FIRST, and only then are the captured generations deleted — any
    crash in the window leaves duplicate reports the read-time dedup
    already ignores, and a generation landing after the capture listing
    (a replayed batch, a concurrent ingest run) is never deleted because
    only the captured names are."""
    viol_root = f"{path}__viol"
    vscratch = f"{viol_root}__compacting"
    jvm = spark._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(viol_root)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())

    # A leftover KEYED scratch (src_gen column — this protocol) is
    # discardable: the swap never mutates the journal before the fold is
    # safely renamed in, so a refold re-derives everything. A committed
    # LEGACY scratch (pre-src_gen pure sums) is NOT: the replaced
    # protocol deleted journal generations BEFORE its rename, so the
    # scratch may hold the only copy of some sums — honor it with the
    # legacy resume semantics once (delete the journal generations, move
    # the fold in; a generation that landed after that crash is lost,
    # which was the replaced protocol's documented behavior and the
    # reason it was replaced).
    def _committed(gen_dir: str) -> bool:
        return fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{gen_dir}/_SUCCESS")
        )

    vs_gens = [
        g for g in _index_generations(spark, vscratch)
        if _committed(f"{vscratch}/{g}")
    ]
    if vs_gens:
        legacy = (
            "src_gen"
            not in spark.read.parquet(f"{vscratch}/{vs_gens[0]}").columns
        )
        if legacy:
            for g in _index_generations(spark, viol_root):
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(f"{viol_root}/{g}"), True
                )
            src = jvm.org.apache.hadoop.fs.Path(f"{vscratch}/{vs_gens[0]}")
            dst = jvm.org.apache.hadoop.fs.Path(f"{viol_root}/{vs_gens[0]}")
            if not fs.rename(src, dst):
                raise IOError(f"rename {src} -> {dst} failed")
    fs.delete(jvm.org.apache.hadoop.fs.Path(vscratch), True)
    captured = _index_generations(spark, viol_root)
    if len(captured) <= 1:
        return
    folded = _read_viol_journal(spark, viol_root)
    folded.write.mode("overwrite").parquet(f"{vscratch}/_b={new_gen}")
    src = jvm.org.apache.hadoop.fs.Path(f"{vscratch}/_b={new_gen}")
    dst = jvm.org.apache.hadoop.fs.Path(f"{viol_root}/_b={new_gen}")
    if not fs.rename(src, dst):
        raise IOError(f"rename {src} -> {dst} failed")
    for g in captured:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{viol_root}/{g}"), True)
    fs.delete(jvm.org.apache.hadoop.fs.Path(vscratch), True)


def compact_ann_index(spark, path: str) -> dict:
    """Fold an IVF index's accumulated generation directories (the build,
    every append run, every streamed batch) into ONE generation with one
    file per cluster directory — the small-files maintenance a
    long-ingesting index needs (10k streamed batches × 16 clusters is
    160k tiny files; a compacted index is 16). Works on float and SQ8
    layouts alike: rows are copied VERBATIM (no re-encode, no refit —
    grids and codebook unchanged), so probed searches return bit-equal
    results over the compacted tree.

    Rows are deduplicated by ``vec_id``, which is what makes the
    operation CRASH-RESUMABLE: the compacted generation is renamed into
    the root before the old generations are deleted, so a crash in the
    window leaves every row present (some twice) — re-running dedups and
    finishes. The survivor is DETERMINISTIC: per ``vec_id``, append and
    streamed-batch generations outrank the build/compaction/rebuild
    generation they sit beside (anything beside a fold landed after it,
    or is an identical replay), the numeric suffix then orders streamed
    batches so the LATEST batch wins — a re-appended embedding keeps its
    newest value — and name then row content break any remaining tie, so
    which row survives never depends on partition evaluation order and
    re-running a crashed compaction converges on the same tree. Run it OFFLINE: until the old
    generations are gone, a probed search can surface a duplicated
    neighbor. The append journal's per-run generations fold too
    (generation-keyed rows — staleness report unchanged; see
    :func:`_fold_viol_journal` for its duplicate-tolerant swap).
    Returns ``{"generations_before", "files_before", "files_after",
    "rows"}``.
    """
    from security_data_pipeline_spark.operators.layout import list_data_files

    gens = _index_generations(spark, path)
    if not gens:
        return {
            "generations_before": 0,
            "files_before": 0,
            "files_after": 0,
            "rows": 0,
        }
    taken = {g.split("=", 1)[1] for g in gens}
    n = 0
    while f"c{n}" in taken:
        n += 1
    new_gen = f"c{n}"

    files_before = len(list_data_files(spark, path))
    raw = spark.read.parquet(path)
    val_cols = [c for c in raw.columns if c != "_b"]
    # generation recency: build/compaction/rebuild generations (base,
    # c<n>, r<n>) rank below appends and streamed batches — anything
    # sitting beside a fold either landed after it or is an identical
    # replay — and within a class the numeric suffix orders streamed
    # batches so the latest batch wins; name then row content break
    # remaining ties, so the survivor never depends on partition order
    gen_name = F.col("_b").cast("string")
    suffix = F.regexp_extract(gen_name, r"(\d+)\z", 1)
    gen_order = F.struct(
        (~gen_name.rlike(r"\A(base|[cr]\d+)\z")).cast("int").alias("cls"),
        F.when(suffix == "", F.lit(-1))
        .otherwise(suffix.cast("long"))
        .alias("num"),
        gen_name.alias("name"),
    )
    row = F.struct(*val_cols)
    data = (
        raw.groupBy("vec_id")
        .agg(F.max_by(row, F.struct(gen_order, row)).alias("_r"))
        .select("_r.*")
        .repartition(F.col("ivf_cluster"))
    )
    scratch = f"{path}__compacting"
    out_dir = f"{scratch}/_b={new_gen}"
    data.write.mode("overwrite").partitionBy("ivf_cluster").parquet(out_dir)
    rows = spark.read.parquet(out_dir).count()

    jvm = spark._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(path)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    src = jvm.org.apache.hadoop.fs.Path(out_dir)
    dst = jvm.org.apache.hadoop.fs.Path(f"{path}/_b={new_gen}")
    if not fs.rename(src, dst):
        raise IOError(f"rename {src} -> {dst} failed")
    fs.delete(jvm.org.apache.hadoop.fs.Path(scratch), True)
    for g in gens:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{g}"), True)

    _fold_viol_journal(spark, path, new_gen)
    return {
        "generations_before": len(gens),
        "files_before": files_before,
        "files_after": len(list_data_files(spark, path)),
        "rows": rows,
    }


def rebuild_ivf_index(
    spark,
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    centroids: list[list[float]] | None = None,
    sq8: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Act on :func:`ivf_index_staleness`'s ``rebuild_hint``: re-fit the
    codebook on the CURRENT corpus (:func:`ivf_fit_codebook` spherical
    k-means on a deterministic sample, unless ``centroids`` pins one),
    rebuild the index from SOURCE vectors into one fresh generation, swap
    it in, and reset the append/violation journal — closing the loop the
    staleness report opens (size-skewed clusters re-split, and for
    ``sq8=True`` the per-cluster grids re-fit so clamped appends decode
    on a box that actually covers them).

    ``corpus`` must be the source float vectors: an SQ8 index stores only
    codes, and re-fitting grids on lossy reconstructions would compound
    quantization error generation over generation.

    Same offline/crash contract as :func:`compact_ann_index`: the new
    generation is fully written to a scratch sibling, renamed in, and
    only then are the old generations, the ``__viol`` journal, and (for
    a layout switching off sq8) the stale ``__grid`` sidecar removed;
    re-running heals any window. Returns the new codebook.
    """
    cents = (
        centroids
        if centroids is not None
        else ivf_fit_codebook(
            corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        )
    )
    old_gens = _index_generations(spark, path)
    scratch = f"{path}__rebuilding"
    build = build_ivf_sq8_index if sq8 else build_ivf_index
    build(
        corpus,
        scratch,
        centroids=cents,
        id_col=id_col,
        vec_col=vec_col,
        mode="overwrite",
    )

    jvm = spark._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(path)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.mkdirs(jroot)
    taken = {g.split("=", 1)[1] for g in old_gens}
    n = 0
    while f"r{n}" in taken:
        n += 1
    src = jvm.org.apache.hadoop.fs.Path(f"{scratch}/_b=base")
    dst = jvm.org.apache.hadoop.fs.Path(f"{path}/_b=r{n}")
    if not fs.rename(src, dst):
        raise IOError(f"rename {src} -> {dst} failed")
    if sq8:
        # the grid sidecar must match the swapped-in codes: overwrite it
        # from the rebuild's sidecar before the old generations go
        spark.read.parquet(f"{scratch}__grid").write.mode(
            "overwrite"
        ).parquet(f"{path}__grid")
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{scratch}__grid"), True)
    fs.delete(jvm.org.apache.hadoop.fs.Path(scratch), True)
    for g in old_gens:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{g}"), True)
    # the journal described appends to the REPLACED generations
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}__viol"), True)
    if not sq8:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}__grid"), True)
    return cents


def ivf_index_staleness(
    spark,
    path: str,
    size_skew_factor: float = 4.0,
    out_of_grid_frac: float = 0.01,
) -> DataFrame:
    """Staleness report for a persisted IVF / IVF-SQ8 index — the signal
    that tells the operator when append-only refresh has drifted far
    enough that a rebuild (centroid refit, grid refit) pays for itself.

    Per cluster: ``n_rows`` (a partition-column-only count — column
    pruning reads no vector data), ``bytes`` (filesystem metadata via
    ``list_data_files``), cumulative ``n_appended`` / ``n_out_of_grid``
    from the append journal (``{path}__viol``, zero if the index has
    never been appended to), and two flags — ``size_skew`` (cluster holds
    > ``size_skew_factor`` × the median cluster's rows: the centroid no
    longer splits the data well, probes of that cluster scan far more
    than 1/n_centroids of the corpus) and ``grid_stale`` (more than
    ``out_of_grid_frac`` of appended vectors clamped outside the fitted
    quantization box). ``rebuild_hint`` = either flag.
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    from security_data_pipeline_spark.operators.layout import list_data_files

    rows = (
        spark.read.parquet(path)
        .groupBy("ivf_cluster")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    by_dir: dict[int, int] = {}
    for fname, size in list_data_files(spark, path):
        seg = [s for s in fname.split("/") if s.startswith("ivf_cluster=")]
        if seg:
            cid = int(seg[-1].split("=", 1)[1])
            by_dir[cid] = by_dir.get(cid, 0) + size
    bytes_df = spark.createDataFrame(
        [(k, v) for k, v in by_dir.items()] or [(None, None)],
        "ivf_cluster int, bytes long",
    )
    try:
        viol = (
            _read_viol_journal(spark, f"{path}__viol")
            .groupBy("ivf_cluster")
            .agg(
                F.sum("n_appended").alias("n_appended"),
                F.sum("n_out_of_grid").alias("n_out_of_grid"),
            )
        )
    except AnalysisException:
        viol = spark.createDataFrame(
            [],
            "ivf_cluster int, n_appended long, n_out_of_grid long",
        )
    report = (
        rows.join(bytes_df, "ivf_cluster", "left")
        .join(viol, "ivf_cluster", "left")
        .na.fill({"n_appended": 0, "n_out_of_grid": 0})
    )
    med = report.agg(
        F.expr("percentile_approx(n_rows, 0.5)").alias("_med")
    )
    return (
        report.crossJoin(F.broadcast(med))
        .select(
            "ivf_cluster",
            "n_rows",
            "bytes",
            "n_appended",
            "n_out_of_grid",
            (F.col("n_rows") > F.lit(size_skew_factor) * F.col("_med")).alias(
                "size_skew"
            ),
            (
                (F.col("n_appended") > 0)
                & (
                    F.col("n_out_of_grid")
                    > F.lit(out_of_grid_frac) * F.col("n_appended")
                )
            ).alias("grid_stale"),
        )
        .withColumn(
            "rebuild_hint", F.col("size_skew") | F.col("grid_stale")
        )
    )


def sq8_dequant_codes(
    codes_col: str, mins_col: str, maxs_col: str
) -> F.Column:
    """Reconstruct ``mn + code * (mx - mn) / 255`` per component from
    stored SQ8 codes and per-row grid arrays — token-identical float
    operand order to :func:`_sq8_dequant`'s fused form and to the DuckDB
    oracle, so a quantize→persist→dequantize roundtrip scores
    bit-identically to the in-memory encode."""
    mn = F.col(mins_col)
    mx = F.col(maxs_col)
    return F.transform(
        F.col(codes_col),
        lambda c, i: F.when(
            F.element_at(mx, i + 1) == F.element_at(mn, i + 1),
            F.element_at(mn, i + 1),
        ).otherwise(
            F.element_at(mn, i + 1)
            + c.cast("double")
            * (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
            / F.lit(255.0)
        ),
    )


def search_ivf_sq8_index(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probed search over a :func:`build_ivf_sq8_index` layout:
    partition-pruned directory reads (same literal ``isin`` mechanism as
    :func:`search_ivf_index`, plan-asserted), per-cluster dequantization
    of the scanned codes, and the standard asymmetric re-rank — exact
    float queries against reconstructed corpus vectors, round-6 cosine,
    neighbor-id tie-break. Output: (query_id, neighbor_id, cosine_sim),
    where cosine_sim is the SQ8-reconstructed score (recall@k vs the
    float index is asserted in tests — the compressed index must change
    scan BYTES, not the neighbor sets)."""
    q = queries.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    probe_ids = sorted(
        r["_probe"]
        for r in _ivf_probe_queries(q, centroids, n_probe)
        .select("_probe")
        .distinct()
        .collect()
    )
    grid = spark.read.parquet(f"{path}__grid")
    corpus = spark.read.parquet(path).filter(
        F.col("ivf_cluster").isin(probe_ids)
    )
    recon = (
        corpus.join(F.broadcast(grid), "ivf_cluster")
        .select(
            F.col("vec_id").alias("neighbor_id"),
            sq8_dequant_codes("sq8_codes", "mins", "maxs").alias("_v_c"),
            "ivf_cluster",
        )
        .withColumn(
            "_nrm_c",
            F.sqrt(
                F.aggregate(
                    F.col("_v_c"), F.lit(0.0), lambda a, x: a + x * x
                )
            ),
        )
    )
    return _ivf_probe_and_rerank(recon, q, centroids, k, n_probe)


def semantic_dedup_drops(
    corpus: DataFrame,
    threshold: float = 0.4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster embeddings, then find
    near-duplicate pairs ONLY within each cluster, and mark the higher-id
    member of every duplicate relation for removal (keep-lowest-id policy).
    Returns the dropped rows as ``(vec_id, ivf_cluster, dup_of,
    cosine_sim)`` where ``dup_of`` is the strongest lower-id duplicate
    (ties → lowest id) — anti-join this against the corpus to dedup it.

    This is the standard recipe for semantic dedup at corpus scale
    (cluster-then-compare, cf. SemDeDup, arXiv:2303.09540): the quadratic
    pair search is confined to cluster-local blocks, so total work is
    Σ|cluster|² instead of N². Assignment is map-side (`ivf_assign` — no
    shuffle); the pair join shuffles each row once on its cluster id. At
    100 TB you size ``n_centroids`` ≈ √N (keeping E[|cluster|] ≈ √N, total
    pair work ≈ N^1.5) and pass a `ivf_fit_codebook`-fitted ``centroids``;
    the default deterministic lowest-id codebook keeps the registered query
    oracle-checkable end to end (same trade as `ann_ivf_topk`).
    """
    from security_data_pipeline_spark.functions.vectors import dot_product, l2_norm
    from security_data_pipeline_spark.operators.skew import fan_out

    cents = centroids if centroids is not None else ivf_centroid_vectors(
        corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
    )
    base = ivf_assign(
        fan_out(corpus, id_col).select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ),
        cents,
        vec_col="embedding",
    ).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("_v"),
        l2_norm("embedding").alias("_nrm"),
        "ivf_cluster",
    )
    lo = base.select(
        F.col("vec_id").alias("dup_of"),
        F.col("_v").alias("_v_lo"),
        F.col("_nrm").alias("_nrm_lo"),
        "ivf_cluster",
    )
    hi = base.select(
        "vec_id",
        F.col("_v").alias("_v_hi"),
        F.col("_nrm").alias("_nrm_hi"),
        "ivf_cluster",
    )
    sim = F.round(
        dot_product(F.col("_v_lo"), F.col("_v_hi"))
        / (F.col("_nrm_lo") * F.col("_nrm_hi")),
        6,
    )
    pairs = (
        hi.join(lo, on="ivf_cluster")
        .filter(F.col("dup_of") < F.col("vec_id"))
        .select("vec_id", "ivf_cluster", "dup_of", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= F.lit(threshold))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine_sim").desc(), F.col("dup_of")
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def sq8_minmax(
    corpus: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus — the SQ8 quantization
    grid. ONE aggregation job with ``dim`` min/max expressions (no explode,
    no shuffle of vector rows; the partial aggregates are 2·dim doubles per
    partition); min/max are order-free, so the grid is deterministic under
    any partitioning."""
    if dim is None:
        row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
        if row is None:
            raise ValueError("corpus is empty")
        dim = row["d"]
    v = F.col(vec_col).cast("array<double>")
    agg = corpus.select(
        *[F.min(v[i]).alias(f"_mn{i}") for i in range(dim)],
        *[F.max(v[i]).alias(f"_mx{i}") for i in range(dim)],
    ).collect()[0]
    mins = [float(agg[f"_mn{i}"]) for i in range(dim)]
    maxs = [float(agg[f"_mx{i}"]) for i in range(dim)]
    return mins, maxs


def _sq8_dequant(
    vec_col: str,
    mins: list[float],
    maxs: list[float],
    levels: float = 255.0,
) -> F.Column:
    """Quantize-then-dequantize each component on the SQ grid:
    ``code = floor((x - mn) / (mx - mn) * levels + 0.5)`` (0..levels),
    ``dq = mn + code * (mx - mn) / levels``. Fusing encode+decode into one
    expression keeps the float-operation ORDER token-identical to the SQL
    oracle; constant-range dimensions pass ``mn`` through. ``levels`` is
    ``2^bits - 1`` (255 = the SQ8 default; the recall sweep measures the
    coarser grids)."""
    v = F.col(vec_col).cast("array<double>")
    mn = F.lit([float(x) for x in mins])
    mx = F.lit([float(x) for x in maxs])
    lv = F.lit(float(levels))
    return F.transform(
        v,
        lambda x, i: F.when(
            F.element_at(mx, i + 1) == F.element_at(mn, i + 1),
            F.element_at(mn, i + 1),
        ).otherwise(
            F.element_at(mn, i + 1)
            + F.floor(
                (x - F.element_at(mn, i + 1))
                / (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
                * lv
                + F.lit(0.5)
            )
            * (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
            / lv
        ),
    )


def sq8_encode(
    df: DataFrame,
    mins: list[float],
    maxs: list[float],
    vec_col: str = "embedding",
    out_col: str = "sq8_codes",
) -> DataFrame:
    """Encode vectors to int8-range codes (array<int>, values 0..255) on a
    fixed SQ8 grid — the storage/index-side half of scalar quantization:
    the persisted corpus shrinks ~4-8x vs float32/float64 arrays (codes
    plus one shared (mins, maxs) pair), which at 100 TB is the difference
    between an index that fits the page cache and one that doesn't.
    Map-only Column math; pair with :func:`ann_sq8_topk` for search."""
    v = F.col(vec_col).cast("array<double>")
    mn = F.lit([float(x) for x in mins])
    mx = F.lit([float(x) for x in maxs])
    codes = F.transform(
        v,
        lambda x, i: F.when(
            F.element_at(mx, i + 1) == F.element_at(mn, i + 1), F.lit(0)
        )
        .otherwise(
            F.floor(
                (x - F.element_at(mn, i + 1))
                / (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
                * F.lit(255.0)
                + F.lit(0.5)
            )
        )
        .cast("int"),
    )
    return df.withColumn(out_col, codes)


def ann_sq8_scored(
    corpus: DataFrame,
    query_pred: F.Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    minmax: tuple[list[float], list[float]] | None = None,
    allow_quadratic: bool = False,
    levels: float = 255.0,
) -> DataFrame:
    """:func:`ann_sq8_topk`'s dequant-scored pair frame before the
    per-query top-k window — ``query_id, neighbor_id, cosine_sim``.
    Exposed for the fused recall-sweep scaffold (one window exchange
    across all arms)."""
    from security_data_pipeline_spark.functions.vectors import dot_product, l2_norm

    if query_pred is None and not allow_quadratic:
        # same guard as cosine_dup_pairs: an unbounded query side makes
        # this an O(n²) broadcast-NLJ over the whole corpus
        raise ValueError(
            "ann_sq8_topk without query_pred scores every corpus vector "
            "against every other (O(n²)); pass a bounded query_pred, or "
            "allow_quadratic=True for a small oracle corpus"
        )
    from security_data_pipeline_spark.functions.vectors import directional

    corpus = directional(corpus, vec_col)
    if minmax is None:
        minmax = sq8_minmax(corpus, vec_col=vec_col)
    mins, maxs = minmax

    from security_data_pipeline_spark.operators.skew import fan_out

    c = fan_out(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        _sq8_dequant(vec_col, mins, maxs, levels).alias("_cvec"),
    ).withColumn(
        "_cnrm",
        F.sqrt(
            F.aggregate(
                F.col("_cvec"), F.lit(0.0), lambda a, x: a + x * x
            )
        ),
    )
    queries = corpus
    if query_pred is not None:
        queries = queries.filter(query_pred)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
        l2_norm(vec_col).alias("_qnrm"),
    )
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(
        dot_product(F.col("_qvec"), F.col("_cvec"))
        / (F.col("_qnrm") * F.col("_cnrm")),
        6,
    )
    return pairs.select("query_id", "neighbor_id", sim.alias("cosine_sim"))


def ann_sq8_topk(
    corpus: DataFrame,
    k: int = 5,
    query_pred: F.Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    minmax: tuple[list[float], list[float]] | None = None,
    allow_quadratic: bool = False,
    levels: float = 255.0,
) -> DataFrame:
    """Approximate cosine top-k over an SQ8 scalar-quantized corpus — the
    production tier between full-precision brute force (4-8x the scan
    bytes) and PQ-ADC (coarser, needs codebook training). The corpus side
    scores on its quantize-dequantize reconstruction (8 bits per
    dimension on a per-dimension min/max grid — no training, just one
    min/max pass); the query side stays exact, as in asymmetric distance
    computation. Same output contract and determinism discipline as
    :func:`knn_bruteforce`: round(sim, 6) DESC, neighbor-id ASC.

    Scale shape: queries broadcast, the corpus never shuffles, and the
    quantized representation is what a persisted SQ8 index scans
    (:func:`sq8_encode` writes it); work per corpus row is one fused
    dequant+dot fold, map-side, followed by the per-query top-k
    TakeOrdered.
    """
    scored = ann_sq8_scored(
        corpus, query_pred=query_pred, id_col=id_col, vec_col=vec_col,
        minmax=minmax, allow_quadratic=allow_quadratic, levels=levels,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Exact covariance matrix of an embedding column — the redundancy /
    whitening diagnostic over the vector space (near-zero-variance or
    highly-correlated dimensions mean the ANN distance is paying for
    dimensions that carry nothing).

    Shape: each row GENERATES its dim·(dim+1)/2 upper-triangle products
    plus dim mean carriers as narrow (i, j, v) structs; ONE hash
    aggregation with map-side combine reduces them — the shuffle carries
    ≤ (dim²/2 + dim) rows PER PARTITION regardless of corpus size, and
    nothing self-joins (a pair-join formulation would amplify the corpus
    ×dim²/2 through a shuffle). At dim ≫ ~1k the per-row Generate cost
    dominates and a blocked matrix-multiply (mapInPandas over Arrow
    batches) becomes the right tool; for classic embedding widths this
    stays pure Column algebra.

    Determinism: products are cast to DECIMAL(28,12) per term and summed
    exactly; ``cov = Sxy/N − (Sx/N)(Sy/N)`` is evaluated in that token
    order, so the matrix is bit-identical cross-engine. Output: one row
    per (dim_i ≤ dim_j): ``dim_i, dim_j, cov`` (6 dp).
    """
    return _cov_from_sums(_exact_cov_sums(df, vec_col, dim))


def _exact_cov_sums(
    df: DataFrame, vec_col: str, dim: int
) -> DataFrame:
    """The exact (i, j, s, _n) sufficient-statistic frame behind
    :func:`embedding_covariance` (j = 0 rows carry the per-dimension
    DECIMAL sums for the means) — exposed so :func:`pca_project` can
    collect means AND covariance from ONE corpus aggregation."""
    v = F.col(vec_col)
    idx = F.sequence(F.lit(1), F.lit(dim))
    pair_terms = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.sequence(i, F.lit(dim)),
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    (
                        F.element_at(v, i).cast("double")
                        * F.element_at(v, j).cast("double")
                    )
                    .cast("decimal(28,12)")
                    .alias("v"),
                ),
            ),
        )
    )
    mean_terms = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("i"),
            F.lit(0).alias("j"),  # j=0 marks a mean carrier
            F.element_at(v, i)
            .cast("double")
            .cast("decimal(28,12)")
            .alias("v"),
        ),
    )
    terms = (
        df.filter(F.size(v) == dim)
        .select(
            F.explode(F.concat(pair_terms, mean_terms)).alias("t"),
        )
        .select("t.i", "t.j", "t.v")
    )
    return terms.groupBy("i", "j").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("_n")
    )


def _cov_from_sums(sums: DataFrame) -> DataFrame:
    """Covariance tail shared by the exact and Arrow-blocked forms:
    ``cov = s/n − mean_i·mean_j`` over the bounded (i, j, s, n) frame
    (j = 0 rows carry the mean sums). The frame feeds THREE consumers
    (means twice via both join sides, pairs once), so it is pinned —
    unpinned, Catalyst re-inlines the corpus-sized aggregation into
    every branch and the corpus aggregates three times (caught by the
    plan test; the exact form measured ~2× slower before the pin)."""
    sums = sums.transform(pin_lazy)
    means = sums.filter(F.col("j") == 0).select(
        F.col("i").alias("_mi"),
        (F.col("s").cast("double") / F.col("_n").cast("double")).alias(
            "_mean"
        ),
    )
    mi = means.select(
        F.col("_mi").alias("i"), F.col("_mean").alias("_mean_i")
    )
    mj = means.select(
        F.col("_mi").alias("j"), F.col("_mean").alias("_mean_j")
    )
    return (
        sums.filter(F.col("j") >= 1)
        .join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            F.col("i").alias("dim_i"),
            F.col("j").alias("dim_j"),
            # fround, not F.round: cov cells CAN be tiny negatives that
            # round to zero, and the round-10 driver red slot was exactly
            # one such cell hashing as -0.0 (oracle) vs +0.0 (Spark) —
            # both sides now canonicalize (functions/rounding.py).
            fround(
                F.col("s").cast("double") / F.col("_n").cast("double")
                - F.col("_mean_i") * F.col("_mean_j"),
                6,
            ).alias("cov"),
        )
    )


def embedding_covariance_fast(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """The throughput tier of :func:`embedding_covariance` — Arrow-
    blocked float64 partials: each pandas batch computes its X^T·X
    upper triangle and column sums with ONE BLAS matrix multiply, so
    per-batch work is a dense matmul instead of 2,144 generated rows
    per vector. The shuffle carries ≤ (dim²/2 + dim) rows PER BATCH
    (hundreds of rows total), and the tail is the exact form's shared
    bounded-frame math.

    Trade-off, stated precisely: float64 partial sums merge in
    partition/batch order, so the last bits are NOT reproducible across
    layouts (the exact DECIMAL form is the oracle-checked one; this one
    is held to it within 1e-6 in tests). Use this tier when covariance
    is a recurring job at corpus scale; use the exact form when the
    number must be bit-stable across engines and runs. At sf0.1 both
    are sub-second (0.25 s vs 0.55 s cold single-pass); the gap is
    asymptotic — the exact form generates 2,144 aggregation rows per
    vector where this one amortizes a BLAS matmul over each Arrow
    batch, so the ratio widens with corpus size (SCALE.md).
    """
    import numpy as np
    import pandas as pd

    iu0, iu1 = np.triu_indices(dim)

    def _partials(batches):
        for pdf in batches:
            vs = [
                np.asarray(v, dtype=np.float64)
                for v in pdf[vec_col]
                if v is not None and len(v) == dim
            ]
            if not vs:
                continue
            X = np.stack(vs)
            xx = (X.T @ X)[iu0, iu1]
            sx = X.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu0 + 1, np.arange(1, dim + 1)]
                    ).astype("int32"),
                    "j": np.concatenate(
                        [iu1 + 1, np.zeros(dim)]
                    ).astype("int32"),
                    "v": np.concatenate([xx, sx]),
                    "k": np.int64(len(vs)),
                }
            )

    parts = df.select(vec_col).mapInPandas(
        _partials, "i int, j int, v double, k long"
    )
    sums = parts.groupBy("i", "j").agg(
        F.sum("v").alias("s"), F.sum("k").alias("_n")
    )
    return _cov_from_sums(sums)


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_components: int = 8,
    out_col: str = "pca",
) -> DataFrame:
    """Project embeddings onto their top principal components.

    The covariance matrix is a BOUNDED artifact (dim² doubles — 32 KiB
    at dim=64), so the eigendecomposition runs driver-side on the
    collected sufficient statistics (numpy ``eigh`` — the same
    bounded-collect pattern as the ANN codebooks), and the mean +
    projection matrices return to the executors as plain literals fused
    into the scan: the corpus pays ONE statistics aggregation plus ONE
    map-only projection pass, no UDF. Vectors are CENTERED (per-
    dimension mean subtracted) before the dot product — textbook PCA
    scores, so ``{out_col}_explained`` (centered-variance fraction)
    describes exactly the coordinates emitted. The driver-side matrix
    reproduces the oracle-checked ``embedding_covariance`` output
    bit-for-bit (same DECIMAL sums, same token order, same HALF_UP 6 dp
    rounding). Component signs are canonicalized (largest-|loading|
    entry positive) so output is deterministic under numpy's sign
    ambiguity; components are eigenvalue-descending. Adds ``out_col``
    (array<double>, length ``n_components``) plus
    ``{out_col}_explained``.
    """
    import numpy as np

    means, comps, explained = pca_fit(df, vec_col, dim, n_components)
    v = F.col(vec_col)
    mean_arr = F.array(*[F.lit(float(m)) for m in means])
    centered = F.zip_with(
        v, mean_arr, lambda a, b: a.cast("double") - b
    )
    proj = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    centered,
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in comps
        ]
    )
    return df.withColumn(out_col, proj).withColumn(
        f"{out_col}_explained", F.lit(explained)
    )


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_components: int = 8,
):
    """Fit step of :func:`pca_project`: ONE exact-DECIMAL statistics
    aggregation (the :func:`embedding_covariance` frame — means ride in
    its j = 0 rows, so centering costs no second corpus pass), then the
    driver-side eigendecomposition. Returns ``(means, components,
    explained)`` — means as a length-``dim`` list, components as
    ``n_components`` eigenvalue-descending sign-canonicalized numpy
    vectors. The covariance entries are reconstructed with the same
    token order and HALF_UP 6 dp rounding as the distributed operator,
    so the matrix eigendecomposed here IS the oracle-checked one."""
    means, comps, curve = pca_fit_curve(df, vec_col, dim, n_components)
    return means, comps, curve[n_components - 1]


def pca_fit_curve(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_components: int = 8,
):
    """:func:`pca_fit` plus the explained-variance CURVE: returns
    ``(means, components, explained_by_k)`` where ``explained_by_k[k-1]``
    is the centered-variance fraction the top-k components carry —
    eigenvectors are prefix-stable (the top-4 of a 32-component fit ARE
    the 4-component fit), so ONE fit serves every prefix consumer (the
    projection query, the recall sweep's component grid). Same single
    corpus aggregation as :func:`pca_fit`."""
    import numpy as np

    means, mat = _fitted_cov_matrix(df, vec_col, dim)
    vals, vecs = np.linalg.eigh(mat)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = []
    for k in order:
        c = vecs[:, k]
        if c[np.argmax(np.abs(c))] < 0:
            c = -c
        comps.append(c)
    total = float(np.sum(np.clip(vals, 0, None)))
    top = vals[order]
    curve = [
        float(np.sum(top[:k]) / total) for k in range(1, n_components + 1)
    ]
    return means, comps, curve


def _fitted_cov_matrix(df: DataFrame, vec_col: str, dim: int):
    """Collect the bounded covariance statistic frame ONCE and
    reconstruct ``(means, matrix)`` driver-side with the exact DECIMAL
    sums, token order, and shortest-repr HALF_UP 6 dp rounding of the
    distributed operator — the matrix returned here is bit-identical to
    the oracle-checked :func:`embedding_covariance` output
    (tests/test_evaluation.py pins it)."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    stat_rows = _exact_cov_sums(df, vec_col, dim).collect()
    s = {(r["i"], r["j"]): r for r in stat_rows}
    means = [
        float(s[(i, 0)]["s"]) / float(s[(i, 0)]["_n"])
        for i in range(1, dim + 1)
    ]
    q6 = Decimal("0.000001")
    mat = np.zeros((dim, dim))
    for i in range(1, dim + 1):
        for j in range(i, dim + 1):
            r = s[(i, j)]
            raw = (
                float(r["s"]) / float(r["_n"])
                - means[i - 1] * means[j - 1]
            )
            # Decimal(repr(x)) = shortest round-trip decimal, the same
            # string Java's Double.toString feeds Spark's ROUND — the
            # exact binary expansion (Decimal(x)) rounds halfway cases
            # differently
            cov = float(
                Decimal(repr(raw)).quantize(q6, rounding=ROUND_HALF_UP)
            )
            mat[i - 1, j - 1] = cov
            mat[j - 1, i - 1] = cov
    return means, mat

