"""Per-family profiling of ann_operating_point (guide §1): build exactly
the picker's parts, pin the shared ground truth (materialized in warm-up
like the bench), then time each family's sweep union and each arm
separately with the noop sink.
"""
import sys
import time

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import similarity
from security_data_pipeline_spark.pin import pin_lazy
from security_data_pipeline_spark.plans.queries import (
    _ANN_FAMILIES,
    _load_planted,
    _recall_sweep_union,
)
from security_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"

spark = get_spark(app_name="profile_annop")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

k = 3
pred = F.col("vec_id") < 200
emb = _load_planted(spark, SF_DIR)
exact = (
    similarity.knn_bruteforce(corpus=emb, queries=emb.filter(pred), k=k)
    .select("query_id", "neighbor_id")
    .transform(pin_lazy)
)

t0 = time.perf_counter()
exact.count()
print(f"exact ground truth materialize: {time.perf_counter()-t0:.3f}s",
      file=sys.stderr)


def timeit(label, df, n=3):
    df.write.mode("overwrite").format("noop").save()
    df.write.mode("overwrite").format("noop").save()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts):.3f}s", file=sys.stderr)
    return min(ts)


total = 0.0
for fam, pname, arms_fn, _ in _ANN_FAMILIES:
    arms = arms_fn(emb, pred, k)
    sw = _recall_sweep_union(emb, exact, arms, "param_value", k)
    t = timeit(f"family {fam:8s} ({len(arms)} arms) sweep union", sw)
    total += t
    # per-arm raw top-k timing (no union scaffold)
    for val, adf in arms:
        timeit(f"  arm {fam} {pname}={val} topk", adf, n=2)
print(f"sum of family sweeps: {total:.3f}s", file=sys.stderr)
spark.stop()
