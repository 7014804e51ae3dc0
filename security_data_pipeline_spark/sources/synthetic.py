"""Deterministic planted-structure embedding fixture.

The `/root/testdata` embeddings are near-isotropic (documented in
SCALE.md), so the ANN parameter sweeps measured over them sit on a flat
recall floor (0.03–0.19 for PQ) — honest curves, but weakly
discriminating surfaces for an operating-point picker to choose from.
This module plants a corpus with REAL structure — a seeded Gaussian-
mixture-style construction over a rank-8 subspace (public construction:
planted clusters are the standard benchmark shape for quantization /
LSH recall studies, e.g. the clustered synthetic sets in Jégou et al.'s
PQ evaluations) — so the same sweeps show the S-shapes a deployment is
actually sized from.

Portability is the design constraint: the SAME vectors must come out of
Spark Column algebra and DuckDB SQL bit-for-bit, because every recall
sweep downstream is oracle-checked by value hash. So the construction
uses only exact-dyadic float64 arithmetic seeded by an integer LCG
(Knuth/glibc constants a=1103515245, c=12345, m=2^31 — public), never a
transcendental:

- cluster(vec_id) = vec_id % 8;
- centroid[c][j]  = ((lcg2(10^9 + c*64 + j) % 9) - 4) / 2 for j <= 8,
  else 0  — halves in [-2, 2], exact; the 10^9 offset keeps the
  centroid LCG domain disjoint from the noise domain;
- noise[i][j]     = (lcg2(i*64 + j) / 2^31 - 0.5) / 2 — dyadic with 33
  fractional bits, magnitude <= 0.25, exact;
- v[i][j]         = centroid[cluster(i)][j] + noise[i][j] — every term
  and sum is an exact dyadic float64 (< 2^53 significand bits), so both
  engines materialize identical bit patterns, and downstream
  IEEE-correctly-rounded ops (dot, sqrt, divide) stay bit-identical.

Measured contrast at sf0.01 (SCALE.md round-12): within-cluster mean
cosine 0.90 vs cross-cluster 0.40; exact top-3 neighbors are 100%
same-cluster. vec_ids come from the real embeddings table so the
fixture scales with the corpus (500 rows at sf0.01, 2000 at sf0.1) and
the lowest-16-id deterministic codebooks cover all 8 clusters twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# glibc LCG constants (public); two rounds break the single-round lattice
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2147483648  # 2^31

PLANTED_DIM = 64
PLANTED_CLUSTERS = 8
PLANTED_RANK = 8  # centroids live on the first 8 coordinate axes
_CENT_DOMAIN = 1_000_000_000  # disjoint from the noise domain (< n*64+64)


def _lcg2(x: Column) -> Column:
    """Two LCG rounds over a non-negative integer column (exact BIGINT
    arithmetic: |a*x| < 2^63 for every domain value used here)."""
    h1 = (F.lit(LCG_A) * x + F.lit(LCG_C)) % F.lit(LCG_M)
    return (F.lit(LCG_A) * h1 + F.lit(LCG_C)) % F.lit(LCG_M)


def planted_embeddings(emb: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """The planted corpus as a DataFrame: ``vec_id, embedding
    (array<double>), label`` (label = the planted cluster, replacing the
    real table's label column so cluster-consumers stay meaningful).
    Pure Column algebra over the id column — one map-side projection, no
    shuffle, no Python rows; scales to any corpus size."""
    vid = F.col(id_col)

    def component(j: Column) -> Column:
        noise = (
            _lcg2(vid * PLANTED_DIM + j).cast("double") / F.lit(float(LCG_M))
            - F.lit(0.5)
        ) * F.lit(0.5)
        cent = (
            (
                _lcg2(
                    F.lit(_CENT_DOMAIN)
                    + (vid % PLANTED_CLUSTERS) * PLANTED_DIM
                    + j
                )
                % 9
            )
            - 4
        ).cast("double") / F.lit(2.0)
        return F.when(j <= PLANTED_RANK, cent + noise).otherwise(noise)

    return emb.select(
        vid.alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(PLANTED_DIM)), component
        ).alias("embedding"),
        (vid % PLANTED_CLUSTERS).cast("int").alias("label"),
    )


def planted_embeddings_sql(source: str = "embeddings") -> str:
    """The identical construction as a DuckDB subquery string (used as
    the `FROM` source of the planted sweep oracles). Operand-for-operand
    the Spark formula above — bit-parity is pinned by test."""

    def lcg2(x: str) -> str:
        h1 = f"(({LCG_A}*({x}) + {LCG_C}) % {LCG_M})"
        return f"(({LCG_A}*{h1} + {LCG_C}) % {LCG_M})"

    noise = (
        f"(CAST({lcg2(f'vec_id*{PLANTED_DIM} + j')} AS DOUBLE)"
        f" / {LCG_M}.0 - 0.5) * 0.5"
    )
    cent = (
        f"CAST(({lcg2(f'{_CENT_DOMAIN} + (vec_id % {PLANTED_CLUSTERS})*{PLANTED_DIM} + j')}"
        f" % 9) - 4 AS DOUBLE) / 2.0"
    )
    return f"""(
  SELECT vec_id,
         list_transform(generate_series(1, {PLANTED_DIM}),
           j -> CASE WHEN j <= {PLANTED_RANK} THEN {cent} + {noise}
                ELSE {noise} END) AS embedding,
         CAST(vec_id % {PLANTED_CLUSTERS} AS INT) AS label
  FROM {source}
)"""
