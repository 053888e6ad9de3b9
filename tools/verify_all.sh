#!/bin/sh
# Full verification: unit tests, both-scale oracle differentials, bench.
set -e
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -q
echo "== oracle sf0.01 (driver gate) =="
python tools/check_oracle.py /root/testdata/sf0.01
echo "== oracle sf0.1 (scale) =="
python tools/check_oracle.py /root/testdata/sf0.1
echo "== bench =="
python bench.py
