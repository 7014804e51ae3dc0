"""Microbenchmark: interpreted HOF fold vs statically expanded element_at
arithmetic for dot products over 64-dim arrays (guide §1: measure first).

Also asserts bit-identical results (same left-to-right IEEE fold order).
"""
import time

from pyspark.sql import functions as F

from security_data_pipeline_spark.session import get_spark

spark = get_spark(app_name="microbench_hof")
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
base.write.mode("overwrite").parquet("/tmp/mb_hof")
df = spark.read.parquet("/tmp/mb_hof")


def hof_dot(a, b):
    prods = F.zip_with(F.col(a), F.col(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def exp_dot(a, b, dim):
    acc = F.lit(0.0)
    for j in range(1, dim + 1):
        acc = acc + F.element_at(F.col(a), j) * F.element_at(F.col(b), j)
    return acc


def timeit(label, out):
    out.write.mode("overwrite").format("noop").save()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out.write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts):.3f}s")


timeit("hof_dot      ", df.select(hof_dot("a", "b").alias("d")))
timeit("expanded_dot ", df.select(exp_dot("a", "b", DIM).alias("d")))

# bit-parity check
cmp = df.select(
    (hof_dot("a", "b") == exp_dot("a", "b", DIM)).alias("eq"),
    hof_dot("a", "b").alias("h"),
    exp_dot("a", "b", DIM).alias("e"),
).agg(
    F.sum(F.when(F.col("eq"), 0).otherwise(1)).alias("n_diff"),
    F.sum(
        F.when(
            F.abs(F.col("h") - F.col("e")) > 0, 1
        ).otherwise(0)
    ).alias("n_numdiff"),
)
r = cmp.collect()[0]
print("n_diff:", r["n_diff"], "n_numdiff:", r["n_numdiff"])
assert r["n_diff"] == 0

# also: l2 norm shapes
def hof_norm(a):
    return F.sqrt(
        F.aggregate(F.col(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def exp_norm(a, dim):
    acc = F.lit(0.0)
    for j in range(1, dim + 1):
        e = F.element_at(F.col(a), j)
        acc = acc + e * e
    return F.sqrt(acc)


timeit("hof_norm     ", df.select(hof_norm("a").alias("n")))
timeit("expanded_norm", df.select(exp_norm("a", DIM).alias("n")))
r2 = df.agg(
    F.sum(
        F.when(hof_norm("a") == exp_norm("a", DIM), 0).otherwise(1)
    ).alias("n_diff")
).collect()[0]
print("norm n_diff:", r2["n_diff"])
assert r2["n_diff"] == 0
print("OK")
spark.stop()
