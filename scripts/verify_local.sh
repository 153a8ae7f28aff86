#!/bin/sh
# Local replica of the driver's three gates, in gate order.
# Usage: sh scripts/verify_local.sh
set -e
cd "$(dirname "$0")/.."
echo "== gate 1: pytest =="
python -m pytest tests/ -q
echo "== gate 2: duckdb-oracle parity, full registry at sf0.01 =="
python scripts/check_oracle_parity.py /root/testdata/sf0.01
echo "== gate 3: bench at sf0.1 (last line is the graded JSON) =="
python bench.py
