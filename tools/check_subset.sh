#!/bin/bash
# tools/check_subset.sh <names,comma,separated> [sfDir] — dump + oracle-check
# just the named queries (local iteration; the driver always runs the full map).
set -u
NAMES=$1
SF=${2:-/root/testdata/sf0.01}
OUT=${3:-/tmp/vq_subset}
rm -rf "$OUT"
SPARK_GRAFT_ONLY=$NAMES tools/run.sh graft.Verify "$SF" "$OUT" 2>/dev/null
python3 tools/check.py "$SF" "$OUT" 2>&1 | grep -v "MISSING-SPARK"
