"""Regenerate QUERIES.md from the live query registry.

Usage: python tools/gen_queries_md.py   (from the repo root)

Summary rule (keep stable so regeneration leaves old rows untouched):
first sentence of the first docstring paragraph, whitespace-collapsed,
truncated to 117 chars + "..." when over 120.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    rows = []
    for name in sorted(qs):
        para = re.sub(r"\s+", " ", (qs[name].__doc__ or "").strip().split("\n\n")[0])
        i = para.find(". ")
        summary = (
            para[: i + 1] if i != -1 else (para if para.endswith(".") else para + ".")
        )
        if len(summary) > 120:
            summary = summary[:117] + "..."
        check = "oracle" if name in osql else "rows-only"
        rows.append(f"| `{name}` | {check} | {summary} |")
    n = len(qs)
    hdr = (
        f"# Query index (auto-generated)\n\n**{n} queries; {len(osql)} "
        f"DuckDB-oracle-paired; {n - len(osql)} rows-only "
        "(each with a twin/golden/bounds test).**\n\n"
        "| query | check | summary |\n|---|---|---|\n"
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "QUERIES.md")
    with open(out, "w") as f:
        f.write(hdr + "\n".join(rows) + "\n")
    print(f"QUERIES.md: {n} queries, {len(osql)} oracle-paired")


if __name__ == "__main__":
    main()
