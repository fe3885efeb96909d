#!/bin/bash
# Follow-on: wait for tpu_queue.sh (pid $1) to finish, then run the at-scale
# stand-in parity harness on the TPU.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
if grep -q "tunnel UP" /tmp/tpu_queue.log; then
  echo "=== e2e_parity --big $(date +%H:%M:%S)" >> /tmp/tpu_queue.log
  timeout 7200 python tools/e2e_parity.py --big > /tmp/e2e_big.log 2>&1
  echo "e2e_big exit=$? $(date +%H:%M:%S)" >> /tmp/tpu_queue.log
fi
