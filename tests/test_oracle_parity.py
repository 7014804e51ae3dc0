"""Driver-mimic: run every registered query on Spark AND its DuckDB oracle,
compare row count, column names, and values (order-insensitive, exact) at
sf0.01 — the same gate the driver applies (BASELINE.md t2)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from security_data_pipeline_spark.plans.queries import REGISTRY
from security_data_pipeline_spark.sources.catalog import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
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


ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.sql)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.sql)


def _column_eq(g: pd.Series, e: pd.Series) -> pd.Series:
    """Per-cell equality, bit-exact for floats like the driver's value
    hash: float ``==`` treats ``-0.0 == 0.0`` and would pass
    representation-level splits the driver's order-insensitive bit hash
    rejects (the round-10 corpus_stats_suite red slot shipped through
    exactly that blind spot — VERDICT.md r10 "What's wrong" #1/#2).
    Floats compare by raw float64 bit pattern, normalizing only NaN (any
    NaN payload counts as the one canonical NaN)."""
    if pd.api.types.is_float_dtype(g):
        ga = g.to_numpy(dtype="float64")
        ea = e.to_numpy(dtype="float64")
        both_nan = np.isnan(ga) & np.isnan(ea)
        return pd.Series(
            (ga.view("int64") == ea.view("int64")) | both_nan,
            index=g.index,
        )
    return g.astype(str) == e.astype(str)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    got = _normalize(spec.fn(spark, SF_DIR).toPandas())
    exp = _normalize(duck.sql(spec.sql).df())
    assert list(got.columns) == list(exp.columns), (
        f"columns differ: {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"row count {len(got)} vs {len(exp)}"
    # bench.py pins result sizes per sf; keep its static copy from drifting
    # when a query's semantics change
    from bench import EXPECTED_ROWS

    pinned = EXPECTED_ROWS.get("0.01", {}).get(name)
    if pinned is not None:
        assert len(got) == pinned, (
            f"bench.EXPECTED_ROWS['0.01'][{name!r}] = {pinned} but query "
            f"returns {len(got)} rows — update bench.py"
        )
    for c in got.columns:
        g, e = got[c], exp[c]
        eq = _column_eq(g, e)
        if not eq.all():
            bad = (~eq).idxmax()
            raise AssertionError(
                f"column {c!r} differs at row {bad}: "
                f"spark={g[bad]!r} duckdb={e[bad]!r} "
                f"({int((~eq).sum())}/{len(g)} rows differ)"
            )


def test_comparator_is_bit_exact_on_signed_zero():
    """Seeded fixture for the exact blind spot that shipped round 10's one
    red slot: a Spark-side +0.0 against an oracle-side -0.0 compares True
    under float == but MUST fail here, because the driver hashes bit
    patterns. Also pins the NaN normalization (equal regardless of
    payload) and ordinary value equality."""
    got = pd.Series([0.0, 1.5, float("nan")])
    exp = pd.Series([-0.0, 1.5, float("nan")])
    eq = _column_eq(got, exp)
    assert not eq[0], "-0.0 vs +0.0 must be a mismatch (driver hashes bits)"
    assert eq[1] and eq[2], "plain values and NaN==NaN must still pass"
    # same-signed zeros are equal — the canonicalization target state
    assert _column_eq(pd.Series([0.0]), pd.Series([0.0])).all()


def test_no_rows_only_queries_remain():
    """Every registered query carries a DuckDB oracle: the driver records a
    missing oracle as err:no_oracle (a FAIL), so rows-only registrations are
    banned outright."""
    assert ROWS_ONLY_QUERIES == [], ROWS_ONLY_QUERIES


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # full-ETL flagship: the reference pipeline's 13-column output contract
    from security_data_pipeline_spark.plans.pipeline import OUTPUT_COLUMNS

    assert list(df.columns) == list(OUTPUT_COLUMNS)


# The self-checking sketch queries (emit rows ONLY when a bound breaks)
# are tuned against sf0.1 headroom; a second scale factor catches a bound
# that only holds at one data size (tighter distributions, smaller N).
SELF_CHECKING = ("events_countmin_check", "events_quantile_check",
                 "events_heavy_hitters")


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.1"])
@pytest.mark.parametrize("name", SELF_CHECKING)
def test_self_checking_sketches_hold_at_other_scales(spark, name, sf_dir):
    """Zero violation rows at BOTH the smaller and larger scale factor —
    sf0.01 is already covered by the registry-wide parity sweep."""
    got = REGISTRY[name].fn(spark, sf_dir)
    rows = got.collect()
    assert rows == [], f"{name}@{sf_dir}: {rows[:5]}"


# The gram-construction operators have length-dependent edge cases (docs
# shorter than n, empty token arrays) that a single scale factor can miss:
# sf0.001 documents are the shortest the generator produces. A second-SF
# parity leg for the gram-heavy document family codifies the one-off
# all-145-query sf0.001 sweep that came back clean.
GRAM_EDGE = (
    "doc_repetition_stats",
    "doc_curation_audit",
    "corpus_curation",
    "doc_dup_spans",
    "doc_dup_span_stats",
    "doc_bloom_decontaminate",
    "corpus_overlap_kmv",
    "ngram_jaccard_pairs",
)


@pytest.fixture(scope="module")
def duck_sf0001():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", GRAM_EDGE)
def test_gram_family_matches_oracle_at_sf0001(spark, duck_sf0001, name):
    spec = REGISTRY[name]
    got = _normalize(spec.fn(spark, "/root/testdata/sf0.001").toPandas())
    exp = _normalize(duck_sf0001.sql(spec.sql).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), f"row count {len(got)} vs {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_exact=False, rtol=0, atol=1e-9)
