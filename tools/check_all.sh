#!/usr/bin/env bash
# Full local gate: tests, oracle differential (sf0.01), bench (sf0.1).
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -q
echo "== oracle differential (sf0.01) =="
python tools/check_oracle.py
echo "== bench (sf0.1) =="
python bench.py
