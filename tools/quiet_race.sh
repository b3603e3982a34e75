#!/bin/bash
# Gate an ab_paragraphs race on a quiet host window and validate the
# window stayed quiet (no run > 1.8x its lane median). Retries.
set -u
SFDIR="${1:-/root/repo/.localdata/sf1}"
LANES="${2:-old,hint}"
RUNS="${3:-6}"
OUT="${4:-/tmp/quiet_race_out.log}"
for attempt in $(seq 1 6); do
  # wait for quiet (1-min load < 0.5), up to 20 min
  for i in $(seq 1 80); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $l<0.5 else 0)")
    [ "$ok" = 1 ] && break
    sleep 15
  done
  echo "=== attempt $attempt load $(cut -d' ' -f1-3 /proc/loadavg) $(date +%T) ===" >> "$OUT"
  SPARK_GRAFT_CPUS=32 python tools/ab_paragraphs.py --lanes "$LANES" \
    --runs "$RUNS" --skip-eq --sf-dir "$SFDIR" 2>/dev/null \
    | grep -E "^(old|new|hint):" >> "$OUT"
  clean=$(python3 - "$OUT" <<'EOF'
import re, statistics, sys
txt = open(sys.argv[1]).read().split("=== attempt")[-1]
ok = True
found = False
for m in re.finditer(r"^(old|new|hint): .*all \[([^\]]+)\]", txt, re.M):
    ts = [float(x) for x in m.group(2).split(",")]
    found = True
    med = statistics.median(ts)
    if max(ts) > 1.8 * med:
        ok = False
print(1 if (ok and found) else 0)
EOF
)
  if [ "$clean" = 1 ]; then
    echo "CLEAN attempt $attempt" >> "$OUT"
    exit 0
  fi
  echo "dirty, retrying" >> "$OUT"
done
echo "EXHAUSTED" >> "$OUT"
exit 1
