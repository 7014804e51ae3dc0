"""A/B pq_recall_sweep: {fan_out, no fan_out} x {fused, per-arm} at sf0.1."""
import time
from functools import reduce

from pyspark.sql import functions as F
from pyspark.sql import Window

from security_data_pipeline_spark.functions.vectors import directional
from security_data_pipeline_spark.operators import similarity
from security_data_pipeline_spark.operators.skew import fan_out
from security_data_pipeline_spark.pin import pin_lazy
from security_data_pipeline_spark.session import get_spark
from security_data_pipeline_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"
spark = get_spark(app_name="pq_variants")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

k = 3
pred = F.col("vec_id") < 200
emb = load_table(spark, SF_DIR, "embeddings")
exact = (
    similarity.knn_bruteforce(corpus=emb, queries=emb.filter(pred), k=k)
    .select("query_id", "neighbor_id")
    .transform(pin_lazy)
)
exact.count()
SUBS = (2, 4, 8, 16)


def pq_encode_staged(df, cbs, vec_col="embedding", code_col="pq_codes"):
    # distance arrays in their OWN projection: HOF lambdas are excluded
    # from codegen subexpression elimination, so the one-projection form
    # array_position(d, array_min(d)) evaluates each subspace fold TWICE
    n_sub = len(cbs)
    vn = similarity._normalized_vec(vec_col)
    df = df.withColumn("_vn", vn)
    df = df.select(
        "*",
        *[
            similarity._pq_sub_dists(F.col("_vn"), cbs, m).alias(f"_d_{m}")
            for m in range(n_sub)
        ],
    )
    codes = [
        F.array_position(
            F.col(f"_d_{m}"), F.array_min(F.col(f"_d_{m}"))
        ).cast("int")
        for m in range(n_sub)
    ]
    return df.withColumn(code_col, F.array(*codes)).drop(
        "_vn", *[f"_d_{m}" for m in range(n_sub)]
    )


def scored_arm(m, use_fanout, staged=False, q_unfanned=False):
    corpus = directional(emb, "embedding")
    cbs = similarity.pq_codebooks_lowest_ids(corpus, n_codewords=16, n_sub=m)
    corpus0 = corpus
    if use_fanout:
        corpus = fan_out(corpus, "vec_id")
    enc = pq_encode_staged if staged else similarity.pq_encode
    coded = enc(
        corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding"), cbs
    ).select("neighbor_id", "pq_codes")
    qsrc = corpus0 if q_unfanned else corpus
    q = qsrc.select(F.col("vec_id").alias("query_id"), "embedding").filter(
        pred
    )
    vn = similarity._normalized_vec("embedding")
    q = q.withColumn("_vn", vn)
    q = q.select(
        "query_id",
        F.array(
            *[
                F.transform(
                    similarity._pq_sub_dists(F.col("_vn"), cbs, mm),
                    lambda d: F.round(
                        F.round(d, 9) * F.lit(1e9), 0
                    ).cast("long"),
                )
                for mm in range(m)
            ]
        ).alias("_lut"),
    )
    pairs = coded.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    )
    term = lambda mm: F.element_at(  # noqa: E731
        F.element_at(F.col("_lut"), mm + 1),
        F.element_at(F.col("pq_codes"), mm + 1),
    )
    adc = term(0)
    for mm in range(1, m):
        adc = adc + term(mm)
    return pairs.select(
        "query_id",
        "neighbor_id",
        (adc.cast("double") / F.lit(1e9)).alias("adc_dist"),
    )


def fused(use_fanout):
    tagged = reduce(
        lambda a, b: a.unionByName(b),
        [
            scored_arm(m, use_fanout).select(
                F.lit(m).cast("int").alias("_param"),
                "query_id",
                "neighbor_id",
                F.col("adc_dist").alias("_score"),
            )
            for m in SUBS
        ],
    )
    w = Window.partitionBy("_param", "query_id").orderBy(
        F.col("_score").asc(), F.col("neighbor_id")
    )
    topk = (
        tagged.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .select("_param", "query_id", "neighbor_id")
    )
    matched = topk.join(exact, ["query_id", "neighbor_id"]).groupBy(
        "_param"
    ).agg(F.count(F.lit(1)).alias("n_matched"))
    return matched


def per_arm(use_fanout, staged=False, q_unfanned=False):
    parts = []
    for m in SUBS:
        sc = scored_arm(m, use_fanout, staged, q_unfanned)
        w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
        topk = (
            sc.withColumn("_rank", F.row_number().over(w))
            .filter(F.col("_rank") <= k)
            .select("query_id", "neighbor_id")
        )
        parts.append(
            topk.join(exact, ["query_id", "neighbor_id"]).agg(
                F.count(F.lit(1)).alias("n_matched")
            ).select(F.lit(m).alias("_param"), "n_matched")
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def timeit(label, df, n=3):
    df.write.mode("overwrite").format("noop").save()
    df.write.mode("overwrite").format("noop").save()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    print(f"[v] {label}: {min(ts):.3f}s", flush=True)


timeit("per-arm, no fanout (r11 shape)", per_arm(False))
timeit("per-arm, no fanout, staged enc", per_arm(False, staged=True))
timeit("per-arm, fanout, staged, qunf ", per_arm(True, staged=True, q_unfanned=True))
timeit("per-arm, fanout, staged       ", per_arm(True, staged=True))
spark.stop()
