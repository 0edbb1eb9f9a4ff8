#!/usr/bin/env bash
# Full local gate: build, unit+integration tests, DuckDB-oracle correctness
# at sf0.01, and the steady-state bench at sf0.1. Mirrors the driver harness.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compile + test =="
sbt -batch test

echo "== correctness gate (sf0.01) =="
OUT=$(mktemp -d /tmp/graft_verify.XXXX)
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
python3 tools/oracle_check.py /root/testdata/sf0.01 "$OUT"

echo "== bench (sf0.1) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench" | grep -oE '\{"metric".*'

echo "== extensions + optimizer-rule demo =="
sbt -batch "runMain graft.tools.ExtensionsDemo" | grep -E "EXTENSIONS_OK|GRID_JOIN_RULE_OK|GEOMTYPE_FOLD_OK"
