"""Work-scaling witnesses: the blocked dedup designs must generate candidate
sets that grow ~linearly with corpus size, never quadratically.

Wall-clock is too noisy to assert on this box; CANDIDATE COUNTS are
deterministic for the fixed testdata and directly measure the property the
designs claim — a blocked pair generator whose candidates scale with n², not
with duplicate density, would be a scale-killer at 100 TB regardless of how
fast it runs locally.
"""

from __future__ import annotations

from security_data_pipeline_spark.operators import dedup
from security_data_pipeline_spark.sources.catalog import load_table

SMALL = "/root/testdata/sf0.01"  # 500 docs
LARGE = "/root/testdata/sf0.1"  # 5000 docs (10x)


def test_minhash_candidates_scale_linearly(spark):
    small = dedup.minhash_lsh_pairs(
        load_table(spark, SMALL, "documents"), verify_threshold=None
    ).count()
    large = dedup.minhash_lsh_pairs(
        load_table(spark, LARGE, "documents"), verify_threshold=None
    ).count()
    # 10x docs -> quadratic blow-up would be 100x candidates; banding keeps
    # collisions proportional to true near-dups (~linear). Measured 25->256.
    assert large <= small * 20, (small, large)


def test_jaccard_candidates_stay_far_from_quadratic(spark):
    docs = load_table(spark, LARGE, "documents")
    n = docs.count()
    cands = dedup.ngram_jaccard_pairs(docs, threshold=0.0).count()
    all_pairs = n * (n - 1) / 2
    # shingle-bucket pairing explores < 0.1% of the quadratic pair space
    # at sf0.1 (measured 1460 of 12.5M)
    assert cands < all_pairs * 0.001, (cands, all_pairs)

    small_cands = dedup.ngram_jaccard_pairs(
        load_table(spark, SMALL, "documents"), threshold=0.0
    ).count()
    # growth bounded well under the 100x quadratic ratio (measured ~39x:
    # planted duplicates share shingles more densely at larger sf)
    assert cands <= small_cands * 60, (small_cands, cands)


def test_winnow_candidates_stay_far_from_quadratic(spark):
    docs = load_table(spark, LARGE, "documents")
    n = docs.count()
    cands = dedup.winnow_dup_pairs(docs, min_shared=1).count()
    assert cands < (n * (n - 1) / 2) * 0.001, cands
