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

# Optional deep gates (round-9 additions). Run with: tools/check.sh deep
if [[ "${1:-}" == "deep" ]]; then
  echo "== dtype-variant full gates (6 axes, sf0.001 scale) =="
  python3 tools/make_variants.py
  for v in narrow wide zoned decimal date32 required; do
    OUTV=$(mktemp -d /tmp/graft_variant_XXXX)
    SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch \
      "runMain graft.Verify src/test/resources/graft/variants/$v $OUTV"
    python3 tools/oracle_check.py "src/test/resources/graft/variants/$v" "$OUTV"
  done
  echo "== full-board oracle gate at sf0.1 (slow; q116 via python replay) =="
  OUT1=$(mktemp -d /tmp/graft_sf01_XXXX)
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} sbt -batch \
    "runMain graft.Verify /root/testdata/sf0.1 $OUT1"
  python3 tools/oracle_check.py /root/testdata/sf0.1 "$OUT1" --skip q116_dbscan
  python3 tools/q116_check.py /root/testdata/sf0.1 "$OUT1"
fi
