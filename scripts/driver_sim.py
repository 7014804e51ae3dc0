"""Driver simulator: run the EXACT correctness gate the round driver runs —
the first 50 ``queries()`` entries from ``__spark_entry__.py`` against their
``oracle_sql()`` DuckDB statements at sf0.01, comparing row count, sorted
column names, and order-insensitive values.

Complements tests/test_oracle_parity.py (which sweeps ALL of REGISTRY):
this script exercises the exported driver contract itself, in window order,
and prints one status line per slot plus a JSON summary — a fast preflight
for "will CORRECTNESS_r{N} be green".

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
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


def frames_bit_equal(got: pd.DataFrame, exp: pd.DataFrame) -> bool:
    """Bit-exact like the driver's value hash (pandas ``.equals`` treats
    -0.0 == 0.0, the exact blind spot that shipped the round-10 red
    slot): float columns compare by raw float64 bit pattern with NaN
    normalized; everything else by string."""
    import numpy as np

    for c in got.columns:
        g, e = got[c], exp[c]
        # dtype-kind gate BEFORE any value compare: the string fallback
        # below would otherwise pass an int64-vs-string or bool-vs-string
        # drift between engine and oracle (ADVICE r11 — the old .equals
        # required dtype match; the bit-exact rewrite must not loosen it)
        if g.dtype.kind != e.dtype.kind:
            return False
        if pd.api.types.is_float_dtype(g):
            ga = g.to_numpy(dtype="float64")
            ea = e.to_numpy(dtype="float64")
            both_nan = np.isnan(ga) & np.isnan(ea)
            if not ((ga.view("int64") == ea.view("int64")) | both_nan).all():
                return False
        elif not (g.astype(str) == e.astype(str)).all():
            return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from security_data_pipeline_spark.session import get_spark
    from security_data_pipeline_spark.sources.catalog import TESTDATA_TABLES

    spark = get_spark(app_name="driver_sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    t0 = time.perf_counter()
    n_green = 0
    failures: dict[str, str] = {}
    for i, (name, fn) in enumerate(queries.items()):
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
            if name not in oracles:
                failures[name] = "no_oracle"
                print(f"[{i:2d}] {name}: NO ORACLE")
                continue
            exp = normalize(con.sql(oracles[name]).df())
            if list(got.columns) != list(exp.columns):
                failures[name] = f"schema {list(got.columns)} vs {list(exp.columns)}"
            elif len(got) != len(exp):
                failures[name] = f"rows {len(got)} vs {len(exp)}"
            elif not frames_bit_equal(got, exp):
                failures[name] = "values differ"
            else:
                n_green += 1
                print(f"[{i:2d}] {name}: ok ({len(got)} rows)")
                continue
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            failures[name] = f"err: {type(e).__name__}: {e}"
        print(f"[{i:2d}] {name}: FAIL — {failures[name]}")
    total = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "green": n_green,
                "total": len(queries),
                "seconds": round(total, 1),
                "failures": failures,
            }
        )
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
