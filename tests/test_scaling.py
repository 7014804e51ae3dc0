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


def test_winnow_df_cap_bounds_boilerplate_buckets(spark):
    # a ubiquitous boilerplate run (license header) shared by every doc:
    # uncapped winnowing emits ~n^2/2 pairs from that one fingerprint
    # bucket; df_cap drops the hot bucket, keeping candidates bounded by
    # the genuine (per-pair) overlaps only
    header = " ".join(f"lic{i}" for i in range(12))  # 12 tokens > k+window-1
    n = 80
    rows = [(i, f"{header} body{i} filler{i} tail{i}") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = dedup.winnow_dup_pairs(docs, min_shared=1).count()
    capped = dedup.winnow_dup_pairs(docs, min_shared=1, df_cap=16).count()
    # every doc shares the header fingerprints -> quadratic pair space
    assert uncapped >= n * (n - 1) / 2, uncapped
    # the hot buckets (shared by all 80 docs) are dropped; unique bodies
    # share nothing else
    assert capped == 0, capped

    # cap leaves genuinely-shared small groups intact: 3 docs sharing a
    # distinct quote survive a df_cap above the group size
    quote = " ".join(f"qt{i}" for i in range(12))
    rows2 = [(100 + i, f"{quote} uniq{i} x{i} y{i}") for i in range(3)]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    pairs2 = dedup.winnow_dup_pairs(docs2, min_shared=1, df_cap=16).count()
    assert pairs2 == 3, pairs2


def test_cross_corpus_bucket_cap_bounds_boilerplate_buckets(spark):
    """A degenerate corpus (identical boilerplate docs on both sides)
    puts everything in one band bucket: uncapped candidates are
    |new| x |ref|; bucket_cap drops the pathological bucket before the
    join, keeping candidate work linear on template-heavy corpora."""
    from pyspark.sql import functions as F

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    new = docs.filter(F.col("doc_id") % 2 == 0)
    ref = docs.filter(F.col("doc_id") % 2 == 1)
    uncapped = dedup.cross_corpus_neardups(
        new, ref, verify_threshold=None
    ).count()
    assert uncapped == 100 * 100  # the quadratic blow-up is real
    capped = dedup.cross_corpus_neardups(
        new, ref, verify_threshold=None, bucket_cap=10
    ).count()
    assert capped == 0  # the one pathological bucket is dropped entirely


def test_minhash_and_simhash_bucket_caps(spark):
    """Identical boilerplate docs collapse into one band/block bucket in
    the SELF-join forms too — the cap removes the |bucket|^2 explosion
    (recall traded only inside the pathological bucket)."""
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(100)], "doc_id long, text string"
    )
    mh = dedup.minhash_lsh_pairs(docs, verify_threshold=None).count()
    assert mh == 100 * 99 // 2
    assert (
        dedup.minhash_lsh_pairs(
            docs, verify_threshold=None, bucket_cap=10
        ).count()
        == 0
    )
    sh = dedup.simhash_dup_pairs(docs).count()
    assert sh == 100 * 99 // 2
    assert dedup.simhash_dup_pairs(docs, bucket_cap=10).count() == 0
