#!/bin/bash
# one-off round-4 evidence runner (two-scale seen-filter geometry); not
# part of the library — removed after BASELINE.md records the rows
cd /root/repo
echo "=== RUN A: 1e9 keys / 410 shards (2.44M keys/shard) ==="
SEEN_KEYS=1e9 SHARDS=410 TASK_STATS=1 RUNS=2 python scripts/seen_scale.py 2>/dev/null
echo "=== RUN B: 2e9 keys / 820 shards (2.44M keys/shard) ==="
SEEN_KEYS=2e9 SHARDS=820 TASK_STATS=1 RUNS=2 python scripts/seen_scale.py 2>/dev/null
rm -rf /tmp/spark-seen-scale
echo "=== DONE ==="
