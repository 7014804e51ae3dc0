"""Quick oracle-parity spot check for named queries at sf0.01 (same
comparator discipline as tests/test_oracle_parity.py)."""
import sys

import duckdb
import numpy as np
import pandas as pd

from security_data_pipeline_spark.plans.queries import REGISTRY
from security_data_pipeline_spark.session import get_spark
from security_data_pipeline_spark.sources.catalog import TESTDATA_TABLES

SF_DIR = sys.argv[1] if sys.argv[1].startswith("/") else "/root/testdata/sf0.01"
names = sys.argv[2:]

spark = get_spark(app_name="quick_parity")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in TESTDATA_TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            ser = df[c]
            if getattr(ser.dt, "tz", None) is not None:
                ser = ser.dt.tz_localize(None)
            df[c] = ser.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


fails = 0
for name in names:
    spec = REGISTRY[name]
    got = norm(spec.fn(spark, SF_DIR).toPandas())
    exp = norm(con.sql(spec.sql).df())
    ok = list(got.columns) == list(exp.columns) and len(got) == len(exp)
    detail = ""
    if ok:
        for c in got.columns:
            g, e = got[c], exp[c]
            if pd.api.types.is_float_dtype(g):
                ga = g.to_numpy(dtype="float64")
                ea = e.to_numpy(dtype="float64")
                both_nan = np.isnan(ga) & np.isnan(ea)
                col_ok = bool(
                    ((ga.view("int64") == ea.view("int64")) | both_nan).all()
                )
            else:
                col_ok = bool((g.astype(str) == e.astype(str)).all())
            if not col_ok:
                ok = False
                detail = f" col={c}"
                break
    else:
        detail = f" shape {got.shape} vs {exp.shape} cols {list(got.columns)[:5]} vs {list(exp.columns)[:5]}"
    print(f"{name}: {'PASS' if ok else 'FAIL'}{detail}", flush=True)
    fails += 0 if ok else 1
spark.stop()
sys.exit(1 if fails else 0)
