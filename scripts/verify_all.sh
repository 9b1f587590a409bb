#!/usr/bin/env bash
# One-command verification: full test suite, full DuckDB oracle sweep,
# and the sf0.1 benchmark. Run each stage ALONE on the machine —
# concurrent Spark jobs skew walls 30-50% (see SCALING.md).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/3 pytest =="
python -m pytest tests/ -q

echo "== 2/3 oracle sweep (sf0.01) =="
python scripts/oracle_check.py /root/testdata/sf0.01

echo "== 3/3 bench (sf0.1) =="
python bench.py
