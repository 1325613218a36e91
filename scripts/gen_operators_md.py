#!/usr/bin/env python
"""Regenerate OPERATORS.md — the navigable index of every registered
driver query — from `__spark_entry__.py`'s docstrings."""

from __future__ import annotations

import inspect
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def first_sentence(doc: str) -> str:
    doc = re.sub(r"\s+", " ", doc or "").strip()
    if not doc:
        return "(see SURVEY.md §2 / §8 row)"
    # first period followed by whitespace/end — module paths like
    # "functions/corpus.py" must not cut the sentence
    m = re.search(r"\.(\s|$)", doc)
    s = doc[: m.start() + 1] if m else doc
    return (s[:237] + "...") if len(s) > 240 else s


def main() -> None:
    import __spark_entry__ as e

    qs = e.queries()
    oracles = set(e.oracle_sql().keys())
    lines = [
        "# OPERATORS — driver-registry index",
        "",
        f"Auto-generated from `__spark_entry__.py`: {len(qs)} registered",
        f"queries; the first {len(oracles)} carry DuckDB oracles inside the",
        "driver's 50-slot adjudication window (REGISTRY-ORDER CONTRACT in",
        "`queries()`), the rest are pytest-pinned as documented per entry",
        "and in SURVEY.md. Regenerate: `python scripts/gen_operators_md.py`.",
        "",
        "| # | query | adjudication | summary |",
        "|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(qs.items(), 1):
        adj = "driver oracle" if name in oracles else "pytest-pinned"
        s = first_sentence(inspect.getdoc(fn)).replace("|", "\\|")
        lines.append(f"| {i} | `{name}` | {adj} | {s} |")
    out = os.path.join(REPO, "OPERATORS.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(qs)} entries")


if __name__ == "__main__":
    main()
