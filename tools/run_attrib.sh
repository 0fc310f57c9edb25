#!/bin/bash
# Run all attribution variants with retries; append JSON lines to the log.
LOG=${1:-/tmp/attrib.jsonl}
for v in copy entry s1 s1tw s1twT nos2 full; do
  for attempt in 1 2 3; do
    out=$(timeout 400 python tools/attrib_axis_mid.py "$v" ${N:-1024} ${B:-16} ${TILE:-256} 2>/dev/null | tail -1)
    if [ -n "$out" ]; then echo "$out" >> "$LOG"; echo "$out"; break; fi
    sleep 20
  done
done
