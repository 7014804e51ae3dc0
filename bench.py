"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop sink (full computation, no driver collect
bottleneck, no disk write skew). Every query gets one untimed warm-up
execution first: the timed number is steady-state throughput (plan codegen
compiled, JIT warm, parquet footers cached) — the figure that scales to a
long-running cluster, not the one-off JVM warm-up cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES: tuple[str, ...] = (
    # flagship: full reference ETL chain (clean→parse→normalize→features)
    "secevents_etl",
    # security-event surface
    "sessionize_sessions",
    "sessionize_bucketed",
    "user_daily_avg",
    "keep_last_dedup",
    "time_since_last_error",
    "props_k_stats",
    # relational suite
    "pricing_summary",
    "top_revenue_orders",
    "regional_revenue",
    "top_orders_per_customer",
    # temporal joins
    "asof_click_before_purchase",
    "click_purchase_bursts",
    # text / dedup / similarity extensions
    "doc_quality_scores",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "knn_cosine",
    "cosine_dup_pairs",  # LSH-blocked scale form (the only registered one)
    "knn_cosine_lsh",
    "knn_cosine_ivf",
    "corpus_curation",
    # temporal/network + corpus-scoring additions
    "events_ip_lpm",
    "events_ip6_lpm",
    "events_time_bucket_rollup",
    "doc_winnow_pairs",
    "doc_lm_scores",
)

# Pinned result sizes per scale factor: a bench run also smoke-checks that
# every plan still computes the right THING, not just quickly (a silently
# empty result would otherwise look like a speedup). Unlisted sfs skip the
# assert but still run.
EXPECTED_ROWS: dict[str, dict[str, int]] = {
    "0.1": {
        "secevents_etl": 100000, "sessionize_sessions": 95465,
        "sessionize_bucketed": 95465, "user_daily_avg": 1500,
        "keep_last_dedup": 7500, "time_since_last_error": 100000,
        "props_k_stats": 5, "pricing_summary": 6, "top_revenue_orders": 10,
        "regional_revenue": 25, "top_orders_per_customer": 44953,
        "asof_click_before_purchase": 20084, "click_purchase_bursts": 46,
        "doc_quality_scores": 5000, "ngram_jaccard_pairs": 256,
        "minhash_lsh_pairs": 256, "knn_cosine": 50, "cosine_dup_pairs": 479,
        "knn_cosine_lsh": 600, "knn_cosine_ivf": 600, "corpus_curation": 20,
        "events_ip_lpm": 4, "events_ip6_lpm": 4,
        "events_time_bucket_rollup": 14385, "doc_winnow_pairs": 251,
        "doc_lm_scores": 5000,
    },
    "0.01": {
        "secevents_etl": 10000, "sessionize_sessions": 9549,
        "sessionize_bucketed": 9549, "user_daily_avg": 150,
        "keep_last_dedup": 750, "time_since_last_error": 10000,
        "props_k_stats": 5, "pricing_summary": 6, "top_revenue_orders": 10,
        "regional_revenue": 25, "top_orders_per_customer": 4492,
        "asof_click_before_purchase": 1981, "click_purchase_bursts": 8,
        "doc_quality_scores": 500, "ngram_jaccard_pairs": 25,
        "minhash_lsh_pairs": 25, "knn_cosine": 50, "cosine_dup_pairs": 30,
        "knn_cosine_lsh": 600, "knn_cosine_ivf": 600, "corpus_curation": 20,
        "events_ip_lpm": 4, "events_ip6_lpm": 4,
        "events_time_bucket_rollup": 7206, "doc_winnow_pairs": 25,
        "doc_lm_scores": 500,
    },
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from security_data_pipeline_spark.plans.queries import REGISTRY
    from security_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM / parquet footer caches so per-query times measure the
    # plans, not session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    expected = EXPECTED_ROWS.get(sf, {})
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        spec = REGISTRY[name]
        df = spec.fn(spark, sf_dir)
        if name in expected:  # untimed smoke-check of the result size
            n = df.count()
            assert n == expected[name], (
                f"{name}: {n} rows, expected {expected[name]}"
            )
        # settle the JVM between queries: 20+ distinct plans in one session
        # accumulate garbage; an explicit GC here keeps collection pauses
        # out of the timed region. (The code-cache side of this problem is
        # solved at the root: session.py reserves 1g of JIT code cache —
        # with the default 240m the C2 compiler shut off mid-benchmark and
        # later queries ran interpreted, 2-6x slower, nondeterministically.)
        spark.sparkContext._jvm.System.gc()
        # two untimed warm-ups: the first compiles codegen, the second lets
        # C2 JIT the hot loops — deep plans (the ETL chain) measured ~2x
        # slower on their first post-compile execution. Timed runs stay
        # CONSECUTIVE: interleaving other plans between runs evicts this
        # plan's JIT state and re-measures the cold path (~2x, measured).
        df.write.mode("overwrite").format("noop").save()
        df.write.mode("overwrite").format("noop").save()
        # best-of-5 CONSECUTIVE runs: sub-second queries on this box are
        # hostage to host-level stalls and JIT compilation timing (round 3
        # saw 2.4x swings on byte-identical plans); five samples make the
        # minimum a stable steady-state estimate where three did not. The
        # spread is logged so a noisy window is visible in the record.
        samples = []
        for _ in range(5):
            start = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - start)
        timings[name] = round(min(samples), 3)
        print(
            f"[bench] {name}: {timings[name]:.3f}s "
            f"(max {max(samples):.3f}s over {len(samples)} runs)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
