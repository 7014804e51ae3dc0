"""Stage attribution for the FUSED ann_operating_point at sf0.1."""
import json
import time
import urllib.request

from security_data_pipeline_spark.plans.queries import REGISTRY
from security_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
spark = get_spark(
    app_name="profile_annop2", extra_conf={"spark.ui.enabled": "true"}
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

ui = spark.sparkContext.uiWebUrl
app_id = spark.sparkContext.applicationId

df = REGISTRY["ann_operating_point"].fn(spark, SF_DIR)
df.write.mode("overwrite").format("noop").save()
df.write.mode("overwrite").format("noop").save()

with urllib.request.urlopen(
    f"{ui}/api/v1/applications/{app_id}/stages"
) as r:
    mark = max(s["stageId"] for s in json.load(r))

t0 = time.perf_counter()
df.write.mode("overwrite").format("noop").save()
wall = time.perf_counter() - t0
print(f"wall {wall:.2f}s", flush=True)

with urllib.request.urlopen(
    f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
) as r:
    stages = [s for s in json.load(r) if s["stageId"] > mark]
stages.sort(key=lambda s: -s["executorRunTime"])
tot_run = sum(s["executorRunTime"] for s in stages) / 1000
tot_cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
print(f"n_stages={len(stages)} total runTime={tot_run:.1f}s cpu={tot_cpu:.1f}s")
for s in stages[:15]:
    print(
        f"  stage {s['stageId']:4d} tasks={s['numCompleteTasks']:3d} "
        f"run={s['executorRunTime']/1000:7.2f}s "
        f"cpu={s.get('executorCpuTime',0)/1e9:7.2f}s "
        f"submit={s.get('submissionTime','')[-12:]} "
        f"done={s.get('completionTime','')[-12:]}"
    )
spark.stop()
