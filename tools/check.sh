#!/usr/bin/env bash
# Full local gate: compile, specs, oracle verify at sf0.01, bench at sf0.1.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile test
OUT=$(mktemp -d)
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
python3 tools/verify_local.py /root/testdata/sf0.01 "$OUT"
sbt -batch "runMain graft.ExplainAudit EXPLAIN_AUDIT.md"
# BENCH_LOCAL: the complete per-query line (the driver's tail capture
# truncates the head), committed per round for cross-round diffing
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
  SPARK_GRAFT_BENCH_OUT="${SPARK_GRAFT_BENCH_OUT:-BENCH_LOCAL.json}" \
  sbt -batch "runMain graft.Bench" | grep '"metric"' || true
