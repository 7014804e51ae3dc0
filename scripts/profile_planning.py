"""Is the per-action cost of the ANN arms driver-side planning or executor
compute? Time (a) a noop save, (b) pure re-planning of the same logical
plan (analysis cached, optimizer+physical planning re-run — what every
write action pays), (c) executor-only time via the Spark status tracker.
"""
import time

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import similarity
from security_data_pipeline_spark.plans.queries import _load_planted
from security_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"

spark = get_spark(app_name="profile_planning")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

emb = _load_planted(spark, SF_DIR)
pred = F.col("vec_id") < 200

cases = {
    "ivf n_probe=4": similarity.ann_ivf_topk(
        emb, k=3, n_centroids=16, n_probe=4, query_pred=pred
    ),
    "pq n_sub=16": similarity.ann_pq_adc_topk(
        emb, k=3, n_codewords=16, n_sub=16, query_pred=pred
    ),
    "lsh n_planes=8": similarity.ann_lsh_topk(
        emb, k=3, n_planes=8, n_bands=4, seed=42, query_pred=pred, dim=64
    ),
}

builders = {
    "ivf n_probe=4": lambda: similarity.ann_ivf_topk(
        emb, k=3, n_centroids=16, n_probe=4, query_pred=pred
    ),
    "pq n_sub=16": lambda: similarity.ann_pq_adc_topk(
        emb, k=3, n_codewords=16, n_sub=16, query_pred=pred
    ),
    "lsh n_planes=8": lambda: similarity.ann_lsh_topk(
        emb, k=3, n_planes=8, n_bands=4, seed=42, query_pred=pred, dim=64
    ),
}
for label, build in builders.items():
    df = cases[label]
    # warm
    df.write.mode("overwrite").format("noop").save()
    df.write.mode("overwrite").format("noop").save()
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    # pure planning on a freshly built identical plan: analysis +
    # optimization + physical planning, no execution
    plans = []
    for _ in range(3):
        d2 = build()
        t0 = time.perf_counter()
        d2._jdf.queryExecution().executedPlan()
        plans.append(time.perf_counter() - t0)
    print(f"{label}: noop wall {wall:.3f}s, plan-only {min(plans):.3f}s")
spark.stop()
