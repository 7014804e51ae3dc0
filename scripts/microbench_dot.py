"""Kernel microbench: bit-identical dot-product formulations, 400k x 64."""
import time

from pyspark.sql import functions as F

from security_data_pipeline_spark.session import get_spark

spark = get_spark(app_name="microbench_dot")
spark.sparkContext.setLogLevel("ERROR")

DIM = 64
N = 400_000

base = spark.range(N).select(
    F.col("id"),
    F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (F.col("id") % 97 + j).cast("double") / 7.0,
    ).alias("a"),
    F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (F.col("id") % 89 + j * 2).cast("double") / 11.0,
    ).alias("b"),
)
base.write.mode("overwrite").parquet("/tmp/mb_dot")
df = spark.read.parquet("/tmp/mb_dot")
A, B = F.col("a"), F.col("b")

variants = {
    "zipagg (current)": F.aggregate(
        F.zip_with(A, B, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ),
    "agg-over-a-index": F.aggregate(
        F.sequence(F.lit(1), F.lit(DIM)),
        F.lit(0.0),
        lambda acc, i: acc + F.element_at(A, i) * F.element_at(B, i),
    ),
    "reduce-zip": F.reduce(
        F.zip_with(A, B, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ),
}


def timeit(label, out):
    out.write.mode("overwrite").format("noop").save()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out.write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    print(f"[k] {label}: {min(ts):.3f}s", flush=True)


ref = variants["zipagg (current)"]
for lbl, e in variants.items():
    timeit(lbl, df.select(e.alias("d")))
    n_diff = df.agg(
        F.sum(F.when(e == ref, 0).otherwise(1)).alias("n")
    ).collect()[0]["n"]
    print(f"[k] {lbl} n_diff={n_diff}", flush=True)
    assert n_diff == 0, lbl
spark.stop()
