#!/bin/bash
# VERDICT r5 item 1: complete the full reference schedule (30k stage-1 +
# 20k stage-2 at 800x800, 100 views, densification ON) through the REAL
# trainer on the TPU.  Mirrors script/run_tensoir.sh:6-42.
#
# Resumable by design: each phase runs in a timeout-bounded attempt loop
# and train.py resumes from the newest checkpoint (checkpoint_interval
# 2500), so a relay INTERNAL mid-run costs at most 2500 iters.  Unlike the
# r4 script, stage 1 starts from a CLEAN output dir unless SVGIR_RESUME=1
# (advisor r4: a stale partial checkpoint must never silently seed
# stage 2), and stage 2 asserts the resumed checkpoint is the completed
# 30k one.
set -x
cd /root/repo
SCENE=/root/scenes/synth800
RUN=${RUN:-/root/out/full_r5}
OUT1=$RUN/gss
OUT2=$RUN/render_relight
S1_ITERS=${S1_ITERS:-30000}
S2_ITERS=${S2_ITERS:-50000}
ATTEMPT_TIMEOUT=${ATTEMPT_TIMEOUT:-3000}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-8}
# densification bound: the procedural GT densifies pathologically (approx
# 500k alive by iter 2300 and climbing to the 1M cap, ~2x step time per
# 2x points) where real TensoIR scenes equilibrate at ~100-350k; 250k
# keeps the schedule and densify dynamics (20k -> 250k = 12x growth)
# while bounding wall clock.  Documented in BASELINE.md.
MAX_POINTS=${MAX_POINTS:-250000}

if [ ! -f "$SCENE/transforms_train.json" ]; then
  timeout 900 python tools/make_synth_dataset.py --out "$SCENE" \
      --res 800 --views 100 --test-views 10 --n-gt 20000 || exit 1
fi

if [ "${SVGIR_RESUME:-0}" != "1" ]; then
  rm -rf "$OUT1" "$OUT2"
fi
mkdir -p "$OUT1" "$OUT2"

latest_ckpt() { ls -t "$1"/chkpnt*.npz 2>/dev/null | head -1; }
ckpt_iter() { basename "$1" | sed -E 's/chkpnt([0-9]+)\.npz/\1/'; }

# ---- stage 1: resume-from-latest attempt loop --------------------------
for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  CKPT=$(latest_ckpt "$OUT1")
  if [ -n "$CKPT" ] && [ "$(ckpt_iter "$CKPT")" -ge "$S1_ITERS" ]; then
    echo "stage1 complete at $CKPT"; break
  fi
  RESUME_ARGS=()
  [ -n "$CKPT" ] && RESUME_ARGS=(-c "$CKPT") && echo "resuming $CKPT"
  timeout "$ATTEMPT_TIMEOUT" python train.py --eval \
      -s "$SCENE" -m "$OUT1" "${RESUME_ARGS[@]}" \
      --iterations "$S1_ITERS" \
      --max_points "$MAX_POINTS" \
      --lambda_normal_render_depth 0.0 \
      --lambda_normal_smooth 0.02 \
      --lambda_mask_entropy 0.1 \
      --densify_grad_normal_threshold 1e-8 \
      --lambda_depth_var 1e-2 \
      --checkpoint_interval 2500 --test_interval 10000 --quiet
  echo "stage1 attempt $attempt exit=$?"
  sleep 30   # let a wedged relay recover before the next client attaches
done

CKPT=$(latest_ckpt "$OUT1")
[ -z "$CKPT" ] && { echo "no stage-1 checkpoint"; exit 1; }
if [ "$(ckpt_iter "$CKPT")" -lt "$S1_ITERS" ]; then
  echo "stage-1 INCOMPLETE (latest $CKPT) — refusing to start stage 2"
  exit 1
fi
echo "stage2 from $CKPT"

# operator hold point: lets a measurement window run between the stages
# (touch /tmp/HOLD_STAGE2 to pause; rm it to continue)
while [ -f /tmp/HOLD_STAGE2 ]; do
  echo "holding before stage 2 ($(date +%H:%M))"; sleep 30
done

# ---- stage 2: same attempt loop ---------------------------------------
for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  CK2=$(latest_ckpt "$OUT2")
  if [ -n "$CK2" ] && [ "$(ckpt_iter "$CK2")" -ge "$S2_ITERS" ]; then
    echo "stage2 complete at $CK2"; break
  fi
  RESUME=${CK2:-$CKPT}
  echo "stage2 resuming $RESUME"
  # march kernel stays off for the unattended run until it has a clean
  # on-TPU compile record (tools/bench_bake.py validates it separately)
  timeout "$ATTEMPT_TIMEOUT" env SVGIR_MARCH_PALLAS="${S2_MARCH_PALLAS:-0}" \
      python train.py --eval \
      -s "$SCENE" -m "$OUT2" \
      -c "$RESUME" \
      -t render_relight \
      --iterations "$S2_ITERS" \
      --position_lr_init 0.0 --position_lr_final 0.0 \
      --normal_lr 0.001 --sh_lr 0.00025 --opacity_lr 0.005 \
      --scaling_lr 0.0 --rotation_lr 0.0 \
      --lambda_base_color_smooth 0.1 --lambda_roughness_smooth 0.05 \
      --lambda_light_smooth 0.0 --lambda_light 0.0 \
      --lambda_env_smooth 0.02 \
      --sample_num 64 --env_resolution 32 \
      --checkpoint_interval 2500 --test_interval 10000 --quiet
  echo "stage2 attempt $attempt exit=$?"
  sleep 30
done

CK2=$(latest_ckpt "$OUT2")
echo "final stage2 checkpoint: $CK2"
[ -n "$CK2" ] && [ "$(ckpt_iter "$CK2")" -ge "$S2_ITERS" ] && exit 0
exit 1
