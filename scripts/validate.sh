#!/usr/bin/env bash
# Full local validation — the analogue of the reference's scripts/validate.sh
# (fmt/clippy/build/test there; compile/test/oracle-verify here).
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.01}"
OUT="$(mktemp -d)/verify"

echo "== compile =="
sbt -batch compile

echo "== unit + integration tests =="
sbt -batch test

echo "== oracle verification vs DuckDB ($SF) =="
sbt -batch "runMain graft.Verify $SF $OUT"
python3 tools/oracle_check.py "$SF" "$OUT"

echo "== bench (steady-state, $SF) =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch 'runMain graft.Bench' | grep '"metric"'

echo "ALL VALIDATION PASSED"
