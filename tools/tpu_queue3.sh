#!/bin/bash
# Follow-on 2: wait for tpu_queue2.sh (pid $1), then record our own
# headline bench run (backup for the driver's round-end bench).
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
if grep -q "tunnel UP" /tmp/tpu_queue.log; then
  echo "=== bench.py $(date +%H:%M:%S)" >> /tmp/tpu_queue.log
  timeout 3600 python bench.py > /tmp/bench_r2_local.json 2>/tmp/bench_r2_local.log
  echo "bench exit=$? $(date +%H:%M:%S)" >> /tmp/tpu_queue.log
  cp /tmp/bench_r2_local.json /root/repo/BENCH_local_r2.json 2>/dev/null || true
fi
