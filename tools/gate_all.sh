#!/usr/bin/env bash
# The mechanized close-out gate: run the FULL SparkEntry registry at all
# three test scale factors and compare every query against its DuckDB
# oracle (tools/oracle_check.py — the same compare the driver runs).
# Prints the registry size and per-SF pass counts, and appends ONE
# machine-written log line to PLANS.md, so "the full set is green at
# 3 SFs" is a tooling fact instead of a discipline promise (the seam
# that drifted in r7 and r9: queries landing after the last manual
# full-set run were only individually gated).
#
# Usage: tools/gate_all.sh            # from the repo root, one command
# Exit 0 iff every query passes at every SF.
set -u
cd "$(dirname "$0")/.."

SFS=("sf0.001" "sf0.01" "sf0.1")
STAMP="$(date -u +%Y-%m-%dT%H:%MZ)"
SHA="$(git rev-parse --short HEAD 2>/dev/null || echo nogit)"

echo "[gate_all] compiling..."
sbt -batch compile >/tmp/gate_all_compile.log 2>&1 || {
  echo "[gate_all] COMPILE FAILED — see /tmp/gate_all_compile.log"; exit 2; }

declare -A PASS FAIL
REG=""
TOTAL_FAIL=0
for sf in "${SFS[@]}"; do
  out="/tmp/gate_all_$sf"
  rm -rf "$out"
  echo "[gate_all] Verify full registry at $sf ..."
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out" \
    >"/tmp/gate_all_verify_$sf.log" 2>&1
  # every [verify] <name> failed: line is a query that produced no parquet
  grep '\[verify\].*failed:' "/tmp/gate_all_verify_$sf.log" || true
  reg_sf=$(python3 -c "import json;print(len(json.load(open('$out/oracle_sql.json'))))")
  REG="${REG:-$reg_sf}"
  if [ "$reg_sf" != "$REG" ]; then
    echo "[gate_all] REGISTRY SIZE DRIFT: $sf dumped $reg_sf oracles vs $REG"
    TOTAL_FAIL=$((TOTAL_FAIL + 1))
  fi
  summary=$(python3 tools/oracle_check.py "/root/testdata/$sf" "$out" \
    | tee "/tmp/gate_all_oracle_$sf.log" | tail -1)
  # "== N pass, M fail =="
  PASS[$sf]=$(echo "$summary" | sed -E 's/== ([0-9]+) pass, ([0-9]+) fail ==/\1/')
  FAIL[$sf]=$(echo "$summary" | sed -E 's/== ([0-9]+) pass, ([0-9]+) fail ==/\2/')
  TOTAL_FAIL=$((TOTAL_FAIL + FAIL[$sf]))
  echo "[gate_all] $sf: ${PASS[$sf]}/$reg_sf pass, ${FAIL[$sf]} fail" \
    "(detail: /tmp/gate_all_oracle_$sf.log)"
done

LINE="- \`gate_all\` $STAMP @$SHA — registry=$REG;"
for sf in "${SFS[@]}"; do LINE="$LINE $sf=${PASS[$sf]}/$REG;"; done
if [ "$TOTAL_FAIL" -eq 0 ]; then LINE="$LINE ALL GREEN"; else
  LINE="$LINE FAILURES=$TOTAL_FAIL"; fi

echo "" >> PLANS.md
echo "$LINE" >> PLANS.md
echo "[gate_all] logged to PLANS.md: $LINE"
exit $([ "$TOTAL_FAIL" -eq 0 ] && echo 0 || echo 1)
