"""Regenerate docs/QUERIES.md from the queries() docstrings.

Usage: python scripts/gen_query_catalog.py
"""

from __future__ import annotations

import inspect
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    lines = [
        "# Query catalog",
        "",
        f"All {len(q)} `queries()` entries. **oracle** = DuckDB value-hash",
        "twin exists (the driver's correctness gate compares rows, schema,",
        "and order-insensitive values at sf0.01); *rows-only* = documented",
        "approximate/iterative operator whose exact twin IS oracled.",
        "Generated from the query docstrings (scripts/gen_query_catalog.py).",
        "",
        "| query | oracle | what |",
        "|---|---|---|",
    ]
    for name in sorted(q):
        doc = inspect.getdoc(q[name]) or ""
        first = " ".join(doc.split("\n\n")[0].split())
        if len(first) > 220:
            first = first[:217] + "..."
        mark = "✅" if name in o else "rows-only"
        lines.append(f"| `{name}` | {mark} | {first} |")
    with open("/root/repo/docs/QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(q)} entries")


if __name__ == "__main__":
    main()
