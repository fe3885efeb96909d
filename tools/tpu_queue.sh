#!/bin/bash
# Retry-probe the axon tunnel; when it answers, run the queued measurements.
# All child runs under timeout (never kill TPU clients by signal mid-claim).
cd /root/repo
for i in $(seq 1 40); do
  echo "=== probe attempt $i $(date +%H:%M:%S)" >> /tmp/tpu_queue.log
  if timeout 1500 python tools/probe_tpu.py >> /tmp/tpu_queue.log 2>&1; then
    echo "=== tunnel UP $(date +%H:%M:%S)" >> /tmp/tpu_queue.log
    echo "=== exp_r2 matrix" >> /tmp/tpu_queue.log
    timeout 7200 python tools/exp_r2.py > /tmp/exp_r2.log 2>&1
    echo "exp_r2 exit=$? $(date +%H:%M:%S)" >> /tmp/tpu_queue.log
    echo "=== bench_bake 50k x 64" >> /tmp/tpu_queue.log
    timeout 3600 python tools/bench_bake.py > /tmp/bench_bake.log 2>&1
    echo "bench_bake exit=$? $(date +%H:%M:%S)" >> /tmp/tpu_queue.log
    exit 0
  fi
  sleep 120
done
echo "=== gave up $(date +%H:%M:%S)" >> /tmp/tpu_queue.log
exit 1
