#!/bin/bash
# Executor-loss recovery demo (see graft.KillRecoverySmoke): SIGKILL ALL
# executor JVMs mid-PageRank on local-cluster and assert
#   reliable checkpointDir -> job completes, rank mass conserved
#   localCheckpoint        -> the SAME kill fails the job with
#                             CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (teeth)
#
# Usage: tools/kill_smoke.sh [outJson]   (default /tmp/kill_smoke.json)
# Serialize with other sbt/Spark jobs.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/kill_smoke.json}
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13

run_mode() {
  local mode=$1
  sbt -batch "runMain graft.KillRecoverySmoke $mode" 2>/tmp/kill_smoke_$mode.err \
    | grep -E '^\{"mode"' | tail -1
  return "${PIPESTATUS[0]}"
}

echo "[kill-smoke] reliable mode (must survive the kill)..."
REL_JSON=$(run_mode reliable); REL_RC=$?
echo "$REL_JSON"
echo "[kill-smoke] local mode (must FAIL under the same kill)..."
LOC_JSON=$(run_mode local); LOC_RC=$?
echo "$LOC_JSON"

python3 - "$OUT" "$REL_RC" "$LOC_RC" "$REL_JSON" "$LOC_JSON" <<'EOF'
import json, sys
out, rel_rc, loc_rc, rel_raw, loc_raw = sys.argv[1:6]
rel = json.loads(rel_raw); loc = json.loads(loc_raw)
ok = True
def check(cond, msg):
    global ok
    print(("PASS  " if cond else "FAIL  ") + msg)
    ok = ok and cond
check(rel["killed_pid"] > 0 and loc["killed_pid"] > 0,
      "both modes: every executor JVM was SIGKILLed mid-loop")
check(rel["completed"] and int(rel_rc) == 0,
      "reliable: job completed after losing ALL executors")
check(abs(rel.get("rank_sum", 0) - 1.0) < 1e-9,
      f"reliable: rank mass conserved (sum={rel.get('rank_sum')})")
check((not loc["completed"]) and int(loc_rc) != 0,
      "local: the SAME kill failed the localCheckpoint variant (teeth)")
check("CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND" in loc.get("error", ""),
      "local: failure names the lost checkpoint block (the exact designed "
      "failure mode, not an unrelated crash)")
json.dump({"reliable": rel, "local": loc, "pass": ok}, open(out, "w"), indent=1)
print(("OK" if ok else "FAILED") + f" -> {out}")
sys.exit(0 if ok else 1)
EOF
