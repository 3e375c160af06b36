#!/bin/bash
# Local closing bench with load-average evidence (VERDICT r14 #7):
# runs graft.Bench at sf0.1 (reps=3 medians, local[32]) and writes
# BENCH_LOCAL_r<N>.json carrying BOTH bench JSON lines plus loadavg
# snapshots and timestamps, so the judge can adjudicate driver-box
# smear without a re-run.
#   usage: scripts/bench_local.sh <round> [sf-dir]
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: bench_local.sh <round> [sf-dir]}"
SF="${2:-/root/testdata/sf0.1}"
OUT="BENCH_LOCAL_r${ROUND}.json"
LOAD0=$(cut -d' ' -f1-3 /proc/loadavg)
T0=$(date -u +%Y-%m-%dT%H:%M:%SZ)
LOG=$(mktemp)
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 sbt "runMain graft.Bench" \
  2>/dev/null | sed 's/^\[info\] //' | grep '"metric"' > "$LOG"
LOAD1=$(cut -d' ' -f1-3 /proc/loadavg)
T1=$(date -u +%Y-%m-%dT%H:%M:%SZ)
python3 - "$LOG" "$OUT" "$LOAD0" "$LOAD1" "$T0" "$T1" <<'EOF'
import json, sys
log, out, l0, l1, t0, t1 = sys.argv[1:7]
lines = [json.loads(l) for l in open(log) if l.strip()]
full = next(l for l in lines if l.get("metric") == "full")
total = next(l for l in lines if l.get("metric") == "total")
json.dump({
    "round": out.split("_r")[1].split(".")[0],
    "started_utc": t0, "finished_utc": t1,
    "loadavg_before": l0, "loadavg_after": l1,
    "total": total, "full": full,
}, open(out, "w"), indent=1)
print(f"wrote {out}: total={total['value']}s over {total['nQueries']} "
      f"queries, {total['nErrors']} errors; load {l0} -> {l1}")
EOF
rm -f "$LOG"
