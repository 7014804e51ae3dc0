"""Mini-bench: time named registered queries at $SPARK_GRAFT_SF_DIR with
bench.py's discipline (GC, 2 warm-ups, best-of-5 noop saves)."""
import sys
import time

from security_data_pipeline_spark.plans.queries import REGISTRY
from security_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
names = sys.argv[1:]

spark = get_spark(app_name="minibench")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

total = 0.0
for name in names:
    df = REGISTRY[name].fn(spark, SF_DIR)
    spark.sparkContext._jvm.System.gc()
    df.write.mode("overwrite").format("noop").save()
    df.write.mode("overwrite").format("noop").save()
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        samples.append(time.perf_counter() - t0)
    print(
        f"[mini] {name}: {min(samples):.3f}s (max {max(samples):.3f}s)",
        flush=True,
    )
    total += min(samples)
print(f"[mini] TOTAL {total:.3f}s", flush=True)
spark.stop()
