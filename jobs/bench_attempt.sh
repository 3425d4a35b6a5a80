#!/bin/bash
# One logged bench attempt: records 1m/5m loadavg before and after the
# run plus the attempt number and tree tag, appends to
# BENCH/bench_runs_r5.jsonl. Usage:
#   jobs/bench_attempt.sh <attempt-number> <tree-tag> [extra bench args]
set -u
cd "$(dirname "$0")/.."
ATT=${1:?attempt number}; TREE=${2:?tree tag}; shift 2
L1=$(cut -d' ' -f1 /proc/loadavg); L5=$(cut -d' ' -f2 /proc/loadavg)
OUT=$(python bench.py "$@" 2>/tmp/bench_attempt_err.log)
RC=$?
E1=$(cut -d' ' -f1 /proc/loadavg); E5=$(cut -d' ' -f2 /proc/loadavg)
LINE=$(printf '%s' "$OUT" | tail -1)
python - "$ATT" "$TREE" "$L1" "$L5" "$E1" "$E5" "$RC" "$LINE" <<'PYEOF'
import json, sys
att, tree, l1, l5, e1, e5, rc, line = sys.argv[1:9]
rec = {"attempt": int(att), "tree": tree, "rc": int(rc),
       "start_load": float(l1), "start_load_5m": float(l5),
       "end_load": float(e1), "end_load_5m": float(e5)}
try:
    rec.update(json.loads(line))
except Exception as ex:
    rec["error"] = str(ex)
with open("BENCH/bench_runs_r5.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
print(json.dumps(rec))
PYEOF
