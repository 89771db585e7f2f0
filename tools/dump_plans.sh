#!/usr/bin/env bash
# Dump `explain("formatted")` for the given queries into one file per query:
#   tools/dump_plans.sh <outdir> <suffix> <query> [query ...]
# writes <outdir>/<query>_<suffix>.txt  (suffix = before|after)
# Uses graft.Plans (local[8]); SPARK_GRAFT_SF_DIR controls the data dir
# (default sf0.01 — plan SHAPE is SF-independent; exchanges/join strategy
# are what the dumps witness).
set -eu
cd "$(dirname "$0")/.."
out="$1"; suffix="$2"; shift 2
mkdir -p "$out"
sbt -batch "runMain graft.Plans $*" > /tmp/dump_plans_raw.txt 2>/tmp/dump_plans_err.txt || {
  echo "Plans run failed; see /tmp/dump_plans_err.txt"; exit 1; }
python3 - "$out" "$suffix" /tmp/dump_plans_raw.txt <<'EOF'
import sys, re
outdir, suffix, raw = sys.argv[1], sys.argv[2], sys.argv[3]
cur, buf = None, []
def flush():
    if cur and buf:
        with open(f"{outdir}/{cur}_{suffix}.txt", "w") as f:
            f.write("".join(buf))
        print(f"wrote {outdir}/{cur}_{suffix}.txt ({len(buf)} lines)")
for line in open(raw):
    m = re.match(r"^########## (\S+) ##########", line)
    if m:
        flush(); cur, buf = m.group(1), []
    elif cur is not None:
        buf.append(line)
flush()
EOF
