"""Quantify AQE + shuffle-partition overhead on the tiny-data ANN arms."""
import time

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import similarity
from security_data_pipeline_spark.plans.queries import (
    _load_planted,
    ann_operating_point,
)
from security_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"

spark = get_spark(app_name="profile_aqe")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
print("shuffle.partitions =", spark.conf.get("spark.sql.shuffle.partitions"))
print("aqe =", spark.conf.get("spark.sql.adaptive.enabled"))

emb = _load_planted(spark, SF_DIR)
pred = F.col("vec_id") < 200


def mk():
    return similarity.ann_pq_adc_topk(
        emb, k=3, n_codewords=16, n_sub=16, query_pred=pred
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


timeit("pq arm, AQE on ", mk())
spark.conf.set("spark.sql.adaptive.enabled", "false")
timeit("pq arm, AQE off", mk())
spark.conf.set("spark.sql.adaptive.enabled", "true")

full = ann_operating_point(spark, SF_DIR)
timeit("ann_operating_point, AQE on ", full, n=3)
spark.conf.set("spark.sql.adaptive.enabled", "false")
timeit("ann_operating_point, AQE off", ann_operating_point(spark, SF_DIR), n=3)
spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.stop()
