#!/bin/bash
# r5 TPU measurement window: runs the queued benches when the chip is free.
# STRICTLY one TPU client at a time (memory: tpu-relay-flakiness).
cd /root/repo
MDIR=docs/measurements
mkdir -p "$MDIR"
STAMP=$(date +%Y%m%d_%H%M)

probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

echo "=== waiting for a free/healthy tunnel"
for i in $(seq 1 20); do probe && break; sleep 60; done
probe || { echo "tunnel never came up"; exit 1; }

echo "=== A. bench_bake 50k x 64, march kernel ON ($(date +%H:%M))"
SVGIR_MARCH_PALLAS=1 timeout 3000 python tools/bench_bake.py --n 50000 \
    --samples 64 > "$MDIR/bake_r5_kernel_$STAMP.log" 2>&1
rcA=$?
echo "bench_bake kernel exit=$rcA"
tail -5 "$MDIR/bake_r5_kernel_$STAMP.log"

if [ "$rcA" -ne 0 ]; then
  echo "=== A2. kernel failed - rerun with kernel OFF for a clean r5 number"
  sleep 30
  SVGIR_MARCH_PALLAS=0 timeout 3000 python tools/bench_bake.py --n 50000 \
      --samples 64 > "$MDIR/bake_r5_nokernel_$STAMP.log" 2>&1
  echo "bench_bake nokernel exit=$?"
fi

sleep 20
echo "=== B. stage-2 attribution ($(date +%H:%M))"
timeout 3600 python tools/profile_stage2.py \
    > "$MDIR/stage2_profile_$STAMP.log" 2>&1
echo "profile_stage2 exit=$?"
grep -E "ms/step|ms$|attribution" "$MDIR/stage2_profile_$STAMP.log" | tail -12

sleep 20
echo "=== C. 384-sample relight eval (measured, not projected) ($(date +%H:%M))"
SVGIR_MARCH_PALLAS=${RELIGHT_KERNEL:-1} timeout 3600 \
    python tools/bench_relight_eval.py \
    > "$MDIR/relight_eval_r5_$STAMP.log" 2>&1
echo "bench_relight_eval exit=$?"
tail -5 "$MDIR/relight_eval_r5_$STAMP.log"

sleep 20
echo "=== D. 1M x 64 bake, real run ($(date +%H:%M))"
SVGIR_MARCH_PALLAS=${RELIGHT_KERNEL:-1} SVGIR_BLOCKGEO_LIMIT=$((9 << 30)) \
    timeout 3600 python tools/bench_bake.py --n 1000000 --samples 64 \
    > "$MDIR/bake_r5_1m_$STAMP.log" 2>&1
echo "bake 1M exit=$?"
tail -5 "$MDIR/bake_r5_1m_$STAMP.log"

echo "=== window done ($(date +%H:%M))"
