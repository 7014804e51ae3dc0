"""Attribute the PQ arm's cost: encode / LUT / pairs+ADC / window."""
import time

from pyspark.sql import functions as F
from pyspark.sql import Window

from security_data_pipeline_spark.operators import similarity
from security_data_pipeline_spark.operators.similarity import (
    _normalized_vec,
    _pq_sub_dists,
    pq_codebooks_lowest_ids,
    pq_encode,
)
from security_data_pipeline_spark.operators.skew import fan_out
from security_data_pipeline_spark.plans.queries import _load_planted
from security_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile_pq_parts")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

emb = _load_planted(spark, SF_DIR)
pred = F.col("vec_id") < 200
n_sub, n_codewords, k = 16, 16, 3

from security_data_pipeline_spark.functions.vectors import directional

corpus = directional(emb, "embedding")
cbs = pq_codebooks_lowest_ids(
    corpus, n_codewords=n_codewords, n_sub=n_sub
)
corpus = fan_out(corpus, "vec_id")
coded = pq_encode(
    corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding"), cbs
).select("neighbor_id", "pq_codes")

q = corpus.select(F.col("vec_id").alias("query_id"), "embedding").filter(pred)
vn = _normalized_vec("embedding")
q = q.withColumn("_vn", vn)
q = q.select(
    "query_id",
    F.array(
        *[
            F.transform(
                _pq_sub_dists(F.col("_vn"), cbs, m),
                lambda d: F.round(F.round(d, 9) * F.lit(1e9), 0).cast("long"),
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
scored = pairs.select(
    "query_id",
    "neighbor_id",
    (adc.cast("double") / F.lit(1e9)).alias("adc_dist"),
)
w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
full = (
    scored.withColumn("_rank", F.row_number().over(w))
    .filter(F.col("_rank") <= k)
    .drop("_rank")
)


def timeit(label, df, n=3):
    df.write.mode("overwrite").format("noop").save()
    df.write.mode("overwrite").format("noop").save()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts):.3f}s")


timeit("encode only        ", coded)
timeit("lut only           ", q)
timeit("pairs+ADC scored   ", scored)
timeit("pairs count (join) ", pairs.select("query_id", "neighbor_id"))
timeit("full arm w/ window ", full)
spark.stop()
