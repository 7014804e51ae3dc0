"""Per-stage attribution for the slow ANN arms via the Spark UI REST API."""
import json
import time
import urllib.request

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import similarity
from security_data_pipeline_spark.plans.queries import _load_planted
from security_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"

spark = get_spark(
    app_name="profile_stages", extra_conf={"spark.ui.enabled": "true"}
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

emb = _load_planted(spark, SF_DIR)
pred = F.col("vec_id") < 200

ui = spark.sparkContext.uiWebUrl
app_id = spark.sparkContext.applicationId


def stages_after(mark_stage: int):
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        data = json.load(r)
    rows = [s for s in data if s["stageId"] > mark_stage]
    rows.sort(key=lambda s: -s["executorRunTime"])
    return rows


def last_stage_id():
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages"
    ) as r:
        data = json.load(r)
    return max((s["stageId"] for s in data), default=-1)


for label, df in {
    "pq n_sub=16": similarity.ann_pq_adc_topk(
        emb, k=3, n_codewords=16, n_sub=16, query_pred=pred
    ),
    "ivf n_probe=4": similarity.ann_ivf_topk(
        emb, k=3, n_centroids=16, n_probe=4, query_pred=pred
    ),
}.items():
    df.write.mode("overwrite").format("noop").save()
    df.write.mode("overwrite").format("noop").save()
    mark = last_stage_id()
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    print(f"=== {label}: wall {wall:.3f}s")
    for s in stages_after(mark):
        print(
            f"  stage {s['stageId']:4d} tasks={s['numCompleteTasks']:3d} "
            f"runTime={s['executorRunTime']/1000:7.3f}s "
            f"cpuTime={s.get('executorCpuTime',0)/1e9:7.3f}s "
            f"name={s['name'][:70]}"
        )
spark.stop()
