"""Graph diagnostics over pipeline-derived edge lists: exact triangle
counting and local clustering coefficients via degree-ordered edge
orientation (Suri & Vassilvitskii, WWW'11; Cohen's MapReduce triangle
enumeration — public algorithms).

Why this lives in a data-curation engine: the near-dup candidate graph
(MinHash bands, shingle pairs) and the token co-occurrence graph are both
graphs whose LOCAL density is a quality signal — a near-dup cluster whose
members form triangles is a true duplicate clique; a bridge node with
many edges but no triangles is a false merge (the star-contraction
failure mode of connected components). Clustering coefficients are the
standard diagnostic. No counterpart in the reference (463-LoC pandas ETL,
``/root/reference/src/pipeline.py``) — extension surface.

Scale shape — the naive wedge join explodes on hubs (a degree-d node
emits d² wedges; a web-graph hub with d = 10⁶ emits 10¹² rows from ONE
key). Degree ordering kills this: direct every edge from its (degree,
node)-smaller endpoint to its larger one, and every triangle is counted
exactly once from its lowest-ordered corner. Each node's OUT-degree in
the oriented graph is O(√m) regardless of its raw degree (a node with
out-degree k has k neighbors of degree ≥ k, so m ≥ k²/2), bounding the
wedge join's per-key fan-out at √m instead of max-degree — the difference
between a shuffle that finishes and one key that never does. The closure
check is an equi-join of wedges against oriented edges on the composite
(lo, hi) key: candidates shuffle on real keys, nothing rides a theta
join. Total: two hash aggregations (degrees, per-node triangle credits)
plus equi-joins, all map-side combinable. The canonical edge frame and
its oriented form feed multiple consumers, so both are pinned
(:mod:`...pin` discipline) — the upstream edge derivation (often a
corpus-sized aggregation) runs once, not once per branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from security_data_pipeline_spark.pin import pin_lazy


def undirected_edges(
    df: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Canonicalize an edge list: drop self-loops and NULL endpoints,
    fold both directions onto ``(u, v) = (least, greatest)``, distinct.
    One hash aggregation on the canonical pair."""
    a, b = F.col(src), F.col(dst)
    return (
        df.filter(a.isNotNull() & b.isNotNull() & (a != b))
        .select(
            F.least(a, b).alias("u"),
            F.greatest(a, b).alias("v"),
        )
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree of a canonical undirected edge list: explode both
    endpoints, one hash count. Output: ``node, degree``."""
    return (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def _oriented(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient canonical edges by the (degree ASC, node ASC) total order:
    ``lo → hi`` where ``(deg_lo, lo) < (deg_hi, hi)``. The node-id
    tie-break makes the order total, so orientation is deterministic even
    on regular (all-degrees-equal) graphs."""
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("_dv"))
    with_deg = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    return with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(u_first, F.col("_dv")).otherwise(F.col("_du")).alias("_dhi"),
    )


def _prepare(
    df: DataFrame, src: str, dst: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(edges, degrees, oriented) with the multi-consumer frames pinned:
    ``edges`` feeds degrees + orientation (+ the caller's edge count),
    ``oriented`` feeds the wedge self-join twice plus the closure side."""
    edges = undirected_edges(df, src, dst).transform(pin_lazy)
    deg = degrees(edges).transform(pin_lazy)
    return edges, deg, _oriented(edges, deg).transform(pin_lazy)


def _triangles_from_oriented(o: DataFrame) -> DataFrame:
    """Sorted vertex triples (x < y < z, node order) of every triangle,
    each enumerated exactly once from its (degree, node)-lowest corner.

    A wedge pairs two out-neighbors ``a, b`` of the same ``lo``, ordered
    by the SAME total order that oriented the edges — so if the closing
    edge exists it is necessarily oriented ``a → b``, and one equi-join
    on (a, b) decides closure."""
    left = o.select("lo", F.col("hi").alias("_a"), F.col("_dhi").alias("_da"))
    right = o.select("lo", F.col("hi").alias("_b"), F.col("_dhi").alias("_db"))
    wedges = left.join(right, "lo").filter(
        (F.col("_da") < F.col("_db"))
        | ((F.col("_da") == F.col("_db")) & (F.col("_a") < F.col("_b")))
    )
    closing = o.select(F.col("lo").alias("_a"), F.col("hi").alias("_b"))
    tri = wedges.join(closing, ["_a", "_b"], "left_semi")
    xs = F.array_sort(F.array("lo", "_a", "_b"))
    return tri.select(
        xs.getItem(0).alias("x"),
        xs.getItem(1).alias("y"),
        xs.getItem(2).alias("z"),
    )


def triangle_vertices(
    df: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Enumerate every triangle once as its sorted vertex triple
    ``(x, y, z)``; see :func:`_triangles_from_oriented` for the closure
    argument and the module docstring for the hub bound."""
    _, _, o = _prepare(df, src, dst)
    return _triangles_from_oriented(o)


def clustering_coefficients(
    df: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient.

    ``coeff = 2·T(v) / (deg(v)·(deg(v)−1))`` — the fraction of a node's
    neighbor pairs that are themselves adjacent; NULL for degree < 2
    (undefined, not 0 — a leaf has no neighbor pair to close). Each
    enumerated triangle credits its three corners via one narrow explode;
    triangle-free nodes keep ``triangles = 0`` through the left join.
    Output: ``node, degree, triangles, coeff`` (coeff 6 dp).
    """
    _, deg, o = _prepare(df, src, dst)
    tri = (
        _triangles_from_oriented(o)
        .select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    pairs = F.col("degree") * (F.col("degree") - F.lit(1))
    return deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
        F.round(
            (2 * F.coalesce(F.col("triangles"), F.lit(0))).cast("double")
            / F.nullif(pairs, F.lit(0)).cast("double"),
            6,
        ).alias("coeff"),
    )


def triangle_count(
    df: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count and graph-level summary: one row of
    ``n_nodes, n_edges, n_triangles, global_coeff`` where
    ``global_coeff = 3·triangles / wedges`` (transitivity; NULL on
    wedge-free graphs). Every operand folds to a broadcast scalar."""
    edges, deg, o = _prepare(df, src, dst)
    tri_n = _triangles_from_oriented(o).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    wedge_total = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(
            (F.col("degree") * (F.col("degree") - 1) / F.lit(2)).cast("long")
        ).alias("_wedges"),
    )
    edge_n = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        wedge_total.crossJoin(F.broadcast(edge_n))
        .crossJoin(F.broadcast(tri_n))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.round(
                (3 * F.col("n_triangles")).cast("double")
                / F.nullif(F.col("_wedges"), F.lit(0)).cast("double"),
                6,
            ).alias("global_coeff"),
        )
    )


def pagerank(
    df: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 5,
) -> DataFrame:
    """PageRank on the undirected graph (Page et al. 1999 — public
    algorithm), fixed ``n_iter`` power iterations: the importance prior
    over dedup clusters / token graphs where degree alone over-credits
    hubs with unimportant neighbors.

    ``pr_{i+1}(v) = (1-d)/N + d · Σ_{u∈adj(v)} pr_i(u)/deg(u)`` — on an
    undirected graph every node has degree ≥ 1, so there are no dangling
    nodes and Σ pr stays 1 exactly.

    Scale shape: each iteration is ONE equi-join of the adjacency list
    against the |V|-sized rank frame plus ONE hash aggregation — both
    map-side combinable, both shuffling on real keys; the rank frame is
    pinned per iteration so lineage stays O(1) deep instead of O(n_iter)
    (the iterative-loop discipline). Adjacency and degrees are computed
    once and pinned for the loop's 2·n_iter consumers.

    Cross-engine determinism: contributions ``pr(u)/deg(u)`` are cast to
    DECIMAL(28,12) per term and summed exactly (accumulation-order-free,
    the PSI/ECE discipline), then one IEEE multiply-add per node — so a
    fixed iteration count yields bit-identical ranks in any engine that
    mirrors the expression (the DuckDB oracle unrolls the loop). Output:
    ``node, degree, pr`` (pr rounded 6 dp at the END only).
    """
    edges, deg, _o = _prepare(df, src, dst)
    adj = edges.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionByName(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    adj = adj.transform(pin_lazy)
    n = deg.count()
    if n == 0:
        return deg.select(
            "node", "degree", F.lit(None).cast("double").alias("pr")
        )
    base = (1.0 - float(damping)) / float(n)
    ranks = deg.select(
        "node", (F.lit(1.0) / F.lit(float(n))).alias("pr")
    ).transform(pin_lazy)
    contrib_deg = deg.select(
        F.col("node").alias("nbr"), F.col("degree").alias("_nd")
    )
    for _ in range(int(n_iter)):
        contribs = (
            adj.join(
                ranks.select(F.col("node").alias("nbr"), "pr"), "nbr"
            )
            .join(contrib_deg, "nbr")
            .select(
                "node",
                (F.col("pr") / F.col("_nd").cast("double")).cast(
                    "decimal(28,12)"
                ).alias("_c"),
            )
        )
        ranks = (
            contribs.groupBy("node")
            .agg(F.sum("_c").alias("_s"))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(float(damping))
                    * F.col("_s").cast("double")
                ).alias("pr"),
            )
            .transform(pin_lazy)
        )
    return deg.join(ranks, "node").select(
        "node", "degree", F.round(F.col("pr"), 6).alias("pr")
    )


def link_prediction_ra(
    df: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_center_degree: int = 64,
    top_k: int | None = None,
) -> DataFrame:
    """Link prediction by the resource-allocation index (Zhou, Lü &
    Zhang 2009 — public algorithm): score every NON-edge pair (a, b) by
    ``RA(a,b) = Σ_{w ∈ N(a)∩N(b)} 1/deg(w)`` — the missing-edge ranking
    behind "these two near-dup clusters should probably merge" and
    "these two tokens collocate with everything the other does".

    Scale shape — common-neighbor enumeration is the ONE graph pattern
    where degree orientation cannot help (a pair's common neighbors
    include centers ordered below either endpoint), so the d² wedge
    explosion is bounded the other way: centers with ``deg >
    max_center_degree`` are DROPPED. This is principled for RA
    specifically, not just convenient — a dropped center contributes
    < 1/max_center_degree per pair, so the truncation error per pair is
    bounded by (its high-degree common-neighbor count)/max_center_degree,
    and RA's own 1/deg weighting says those hubs carry negligible signal
    (a stop-word co-occurring with everything tells you nothing about a
    pair). The cap turns the worst key from max-degree² into cap².

    Per-term weights ``1/deg(w)`` are exact IEEE divisions summed as
    DECIMAL(28,12) (accumulation-order-free); existing edges are removed
    with one anti-join on the canonical pair. Output: ``id_a < id_b,
    n_common, ra_score`` (6 dp), optionally global top-k with a total
    (score DESC, id_a, id_b) order.
    """
    edges, deg, _o = _prepare(df, src, dst)
    adj = edges.select(
        F.col("u").alias("ctr"), F.col("v").alias("nbr")
    ).unionByName(
        edges.select(F.col("v").alias("ctr"), F.col("u").alias("nbr"))
    )
    capped = (
        adj.join(
            deg.select(
                F.col("node").alias("ctr"), F.col("degree").alias("_cd")
            ),
            "ctr",
        )
        .filter(F.col("_cd") <= max_center_degree)
        .transform(pin_lazy)
    )
    left = capped.select("ctr", F.col("nbr").alias("id_a"), "_cd")
    right = capped.select("ctr", F.col("nbr").alias("id_b"))
    pairs = (
        left.join(right, "ctr")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (F.lit(1.0) / F.col("_cd").cast("double"))
            .cast("decimal(28,12)")
            .alias("_w"),
        )
    )
    scored = pairs.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum("_w").alias("_ra"),
    )
    non_edges = scored.join(
        edges.select(
            F.col("u").alias("id_a"), F.col("v").alias("id_b")
        ),
        ["id_a", "id_b"],
        "left_anti",
    )
    out = non_edges.select(
        "id_a",
        "id_b",
        "n_common",
        F.round(F.col("_ra").cast("double"), 6).alias("ra_score"),
    )
    if top_k is not None:
        out = out.orderBy(
            F.desc("ra_score"), "id_a", "id_b"
        ).limit(top_k)
    return out
