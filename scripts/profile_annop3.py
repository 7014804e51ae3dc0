"""Per-family wall attribution inside ann_operating_point (round 13):
build each family's sweep frame exactly as the picker does (shared pinned
ground truth over the planted corpus), noop-save it with bench discipline.
"""
import time

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import similarity
from security_data_pipeline_spark.plans.queries import (
    _ANN_FAMILIES,
    _SWEEP_SCORE,
    _load_planted,
    _recall_sweep_union,
)
from security_data_pipeline_spark.pin import pin_lazy
from security_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile_annop3")
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
# materialize the pins up front so family timings are steady-state
exact.write.mode("overwrite").format("noop").save()

for fam, pname, arms_fn, _ in _ANN_FAMILIES:
    score_col, score_desc, fuse = _SWEEP_SCORE[fam]
    sw = _recall_sweep_union(
        emb, exact, arms_fn(emb, pred, k), "param_value", k,
        score_col=score_col, score_desc=score_desc, fuse=fuse,
    )
    sw.write.mode("overwrite").format("noop").save()
    sw.write.mode("overwrite").format("noop").save()
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        sw.write.mode("overwrite").format("noop").save()
        samples.append(time.perf_counter() - t0)
    print(f"[fam] {fam}: {min(samples):.3f}s (max {max(samples):.3f}s)", flush=True)
spark.stop()
