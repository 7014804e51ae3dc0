"""Regenerate QUERIES.md from plans/queries.py:REGISTRY.

Run from the repo root: ``python scripts/gen_queries_md.py``. The count in
the header is ``len(REGISTRY)`` — it cannot drift from the registry the way
a hand-written number can.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from security_data_pipeline_spark.plans.queries import (  # noqa: E402
    DRIVER_WINDOW,
    REGISTRY,
)


def main() -> None:
    lines = [
        "# QUERIES — registered query manifest",
        "",
        f"**{len(REGISTRY)} registered queries** (count generated from "
        "`len(REGISTRY)` by `scripts/gen_queries_md.py` — rerun it after "
        "adding a query). Every query has a DuckDB oracle unless noted; "
        f"WINDOW = one of the {len(DRIVER_WINDOW)} driver-window slots, "
        "extra = oracle-checked locally by tests/test_oracle_parity.py.",
        "",
        "| # | query | scope | oracle | what it witnesses |",
        "|---|---|---|---|---|",
    ]
    for i, name in enumerate(sorted(REGISTRY), 1):
        spec = REGISTRY[name]
        scope = "WINDOW" if name in DRIVER_WINDOW else "extra"
        oracle = "sql" if spec.sql else "rows-only"
        desc = " ".join(spec.description.split())
        if len(desc) > 300:
            desc = desc[:297] + "..."
        # a literal '|' in a description (e.g. a concat expression) would
        # split the markdown table cell
        desc = desc.replace("|", "\\|")
        lines.append(f"| {i} | `{name}` | {scope} | {oracle} | {desc} |")
    lines.append("")
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(lines))
    print(f"QUERIES.md: {len(REGISTRY)} queries, {len(DRIVER_WINDOW)} window")


if __name__ == "__main__":
    main()
