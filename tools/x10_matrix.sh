#!/bin/bash
# ×10 oracle-matrix cells: build grow and hot worlds from sf0.01, run the
# FULL registered surface through Verify, compare in DuckDB with the
# driver-identical local gate. Both cells must read N/N at the current
# surface (BASELINE.md records each re-run). Runtime ~15-25 min total.
# pipefail: without it a crashed ScaleUp/Verify exits 0 through tail/grep
# and the duckdb compare runs against missing/stale dumps (r16 advice)
set -eo pipefail
cd /root/repo
for mode in grow hot; do
  W=/tmp/x10_${mode}
  OV=/tmp/gv10_${mode}
  rm -rf $W $OV
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.01 $W 10 $mode" 2>&1 | tail -1
  # grep exits 1 on no match (the healthy case) — mask exactly that
  SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify $W $OV" 2>&1 \
    | { grep -E "FAILED" || true; } | head -5
  echo "== $mode verify dumped; duckdb compare:"
  python3 tools/local_verify.py $W $OV 2>&1 | tail -2
done
