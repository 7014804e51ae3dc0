"""Pins the three empirical facts the repo's signed-zero convention
rests on (functions/rounding.py), plus the convention's repo-wide
application: every oracle-SQL ROUND site is wrapped ``(ROUND(...) + 0.0)``
so a tiny negative rounding to zero can never split the engines' bit
patterns again (the round-10 ``corpus_stats_suite`` red slot)."""

from __future__ import annotations

import math
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from security_data_pipeline_spark.functions.rounding import fround, sql_round


def _is_neg_zero(x: float) -> bool:
    return x == 0.0 and math.copysign(1.0, x) < 0


def test_duckdb_round_preserves_sign_and_plus_zero_fixes_it():
    con = duckdb.connect()
    raw, fixed = con.sql(
        "SELECT ROUND(-1e-10, 6), (ROUND(-1e-10, 6) + 0.0)"
    ).fetchone()
    # the hazard the convention exists for:
    assert _is_neg_zero(raw), "DuckDB changed ROUND sign semantics"
    assert not _is_neg_zero(fixed) and fixed == 0.0
    # decimal sites are a type-safe no-op (DECIMAL has no signed zero
    # and DECIMAL + 0.0 stays DECIMAL in DuckDB)
    (dec,) = con.sql(
        "SELECT typeof(ROUND(CAST(-1e-7 AS DECIMAL(18,8)), 6) + 0.0)"
    ).fetchone()
    assert dec.startswith("DECIMAL"), dec
    con.close()


def test_spark_round_is_already_zero_canonical(spark):
    """Spark's F.round goes through BigDecimal, which has no signed zero
    — the reason only the SQL side needed the mechanical rewrite. If a
    Spark upgrade ever changes this, the convention breaks silently at
    every unwrapped Spark site; this test makes it loud."""
    row = (
        spark.range(1)
        .select(
            F.round(F.lit(-1e-10), 6).alias("raw"),
            fround(F.lit(-1e-10), 6).alias("helper"),
            fround(F.lit(None).cast("double"), 6).alias("null_in"),
        )
        .collect()[0]
    )
    assert row.raw == 0.0 and not _is_neg_zero(row.raw)
    assert row.helper == 0.0 and not _is_neg_zero(row.helper)
    assert row.null_in is None, "fround must preserve NULL"


def test_fround_matches_sql_round_bitwise(spark):
    """The helper pair is token-equivalent: same inputs, same 64 bits
    out of both engines, including the values that straddle zero."""
    vals = [-1e-10, 1e-10, -0.0000005, 0.1234565, -3.75, 0.0, 2.5e-7]
    got = dict(
        spark.createDataFrame(list(enumerate(vals)), "i long, x double")
        .select("i", fround(F.col("x"), 6).alias("r"))
        .collect()
    )
    con = duckdb.connect()
    exp = [
        con.sql(f"SELECT {sql_round(repr(v), 6)}").fetchone()[0]
        for v in vals
    ]
    con.close()
    gb = [struct.pack("<d", got[i]) for i in range(len(vals))]
    eb = [struct.pack("<d", v) for v in exp]
    assert gb == eb, list(zip(vals, [got[i] for i in range(len(vals))], exp))


@pytest.mark.parametrize(
    "module",
    [
        "security_data_pipeline_spark/plans/queries.py",
        "security_data_pipeline_spark/plans/composites.py",
    ],
)
def test_every_oracle_round_site_is_wrapped(module):
    """Structural audit: no bare ROUND( may reappear in the oracle SQL.
    Every occurrence must be the FULL canonical '(ROUND(...) + 0.0)'
    form — preceded by '(' AND followed, after the balanced closing
    paren of the call, by ' + 0.0)' (checking only the preceding '('
    let e.g. 'exp((ROUND(x, 6)))' pass un-canonicalized — ADVICE r11).
    Quote-adjacent Python string-splice keys (e.g. the
    doc_quality_ensemble header replace) are exempt."""

    def match_paren(text: str, open_idx: int) -> int:
        # the canonicalize_round_zero.py balanced-paren walk (the oracle
        # SQL never embeds unbalanced parens inside quoted strings)
        depth = 0
        for i in range(open_idx, len(text)):
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
                if depth == 0:
                    return i
        raise ValueError(f"unbalanced parens from {open_idx}")

    text = open(module).read()
    pos, bad = 0, []
    while True:
        hit = text.find("ROUND(", pos)
        if hit == -1:
            break
        before = text[hit - 1] if hit else ""
        after = text[hit + len("ROUND(")]
        if before in "\"'" or after in "\"'":
            pos = hit + len("ROUND(")
            continue
        close = match_paren(text, hit + len("ROUND"))
        # the tail may wrap across a line break inside the SQL string —
        # whitespace-insensitive there, exact otherwise
        import re

        ok = before == "(" and re.match(
            r"\s+\+ 0\.0\)", text[close + 1 : close + 24]
        )
        if not ok:
            line = text.count("\n", 0, hit) + 1
            bad.append(f"{module}:{line}")
        pos = hit + len("ROUND(")
    assert bad == [], (
        "bare ROUND( sites (wrap as '(ROUND(x, n) + 0.0)' — see "
        f"functions/rounding.py): {bad}"
    )
