#!/usr/bin/env python
"""One-shot mechanical rewrite: wrap every oracle-SQL ``ROUND(...)`` call
as ``(ROUND(...) + 0.0)`` so a tiny negative rounding to zero can never
produce a ``-0.0`` that splits the engines' bit patterns again.

Why this is the whole fix (verified empirically in this container):

- DuckDB ``ROUND`` on DOUBLE *preserves* the zero's sign
  (``ROUND(-1e-10, 6) -> -0.0``); ``+ 0.0`` canonicalizes it to ``+0.0``
  (IEEE 754: ``-0.0 + 0.0 = +0.0`` under round-to-nearest).
- DuckDB ``ROUND`` on DECIMAL returns DECIMAL, and ``DECIMAL + 0.0``
  stays DECIMAL in DuckDB — the wrap is a no-op there (DECIMAL has no
  signed zero), so blanket application cannot change decimal semantics.
- Spark ``F.round`` goes through BigDecimal, which has no signed zero —
  the Spark side is *already* canonical (pinned by
  tests/test_rounding_convention.py), so only the SQL side needs the wrap.

Idempotent: a ROUND call already followed by `` + 0.0`` is left alone.
Run from the repo root; edits files in place and prints a site count.
"""

from __future__ import annotations

import pathlib
import sys

TARGETS = [
    "security_data_pipeline_spark/plans/queries.py",
    "security_data_pipeline_spark/plans/composites.py",
]


def _match_paren(text: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at open_idx (no string-literal
    awareness needed: the oracle SQL never embeds parens inside quoted
    SQL strings that would unbalance a call — verified by the rewrite
    round-tripping every registered query through the parity sweep)."""
    depth = 0
    for i in range(open_idx, len(text)):
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError(f"unbalanced parens from {open_idx}")


def rewrite(text: str) -> tuple[str, int]:
    out = []
    pos = 0
    n = 0
    while True:
        hit = text.find("ROUND(", pos)
        if hit == -1:
            out.append(text[pos:])
            break
        # Skip occurrences that are Python string-splice keys, not SQL
        # calls (e.g. `.replace("SELECT ROUND(", ...)`): those sit
        # directly against a quote character on either side.
        before = text[hit - 1] if hit else ""
        after = text[hit + len("ROUND(")]
        if before in "\"'" or after in "\"'":
            out.append(text[pos : hit + len("ROUND(")])
            pos = hit + len("ROUND(")
            continue
        close = _match_paren(text, hit + len("ROUND"))
        call = text[hit : close + 1]
        tail = text[close + 1 : close + 8]
        if tail.startswith(" + 0.0"):  # already canonicalized
            out.append(text[pos : close + 1])
            pos = close + 1
            continue
        out.append(text[pos:hit])
        out.append(f"({call} + 0.0)")
        n += 1
        pos = close + 1
    return "".join(out), n


def main() -> int:
    root = pathlib.Path(__file__).resolve().parents[1]
    total = 0
    for rel in TARGETS:
        p = root / rel
        text = p.read_text()
        new, n = rewrite(text)
        if n:
            p.write_text(new)
        print(f"{rel}: {n} ROUND sites wrapped")
        total += n
    print(f"total: {total}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
