#!/bin/bash
# VERDICT r3 item 3: run the REAL trainer (train.py) at the reference's
# TensoIR shape (800x800, 100 train views, densification ON) on the TPU.
# Scene is procedural (tools/make_synth_dataset.py) because no datasets
# exist in this image; the schedule and flags mirror script/run_tensoir.sh.
# Each phase runs under timeout so nothing can hold the chip past the
# session; train_log.jsonl survives a timeout cut.
set -x
cd /root/repo
SCENE=/root/scenes/synth800
OUT1=/root/out/full_r4/gss
OUT2=/root/out/full_r4/render_relight
mkdir -p /root/out/full_r4

if [ ! -f "$SCENE/transforms_train.json" ]; then
  timeout 900 python tools/make_synth_dataset.py --out "$SCENE" \
      --res 800 --views 100 --test-views 10 --n-gt 20000 \
      || exit 1
fi

S1_ITERS=${S1_ITERS:-30000}
S2_ITERS=${S2_ITERS:-35000}
S1_TIMEOUT=${S1_TIMEOUT:-1500}
S2_TIMEOUT=${S2_TIMEOUT:-900}

# the axon tunnel occasionally throws INTERNAL right after a prior client
# exits; retry a fast failure once
for attempt in 1 2; do
  timeout "$S1_TIMEOUT" python train.py --eval \
      -s "$SCENE" -m "$OUT1" \
      --iterations "$S1_ITERS" \
      --lambda_normal_render_depth 0.0 \
      --lambda_normal_smooth 0.02 \
      --lambda_mask_entropy 0.1 \
      --densify_grad_normal_threshold 1e-8 \
      --lambda_depth_var 1e-2 \
      --checkpoint_interval 5000 --test_interval 10000 --quiet
  rc=$?
  echo "stage1 exit=$rc (attempt $attempt)"
  [ "$rc" -eq 0 ] && break
  ls "$OUT1"/chkpnt*.npz 2>/dev/null && break
  sleep 20
done

CKPT=$(ls -t "$OUT1"/chkpnt*.npz 2>/dev/null | head -1)
[ -z "$CKPT" ] && { echo "no stage-1 checkpoint"; exit 1; }
echo "stage2 from $CKPT"

timeout "$S2_TIMEOUT" python train.py --eval \
    -s "$SCENE" -m "$OUT2" \
    -c "$CKPT" \
    -t render_relight \
    --iterations "$S2_ITERS" \
    --position_lr_init 0.0 --position_lr_final 0.0 \
    --normal_lr 0.001 --sh_lr 0.00025 --opacity_lr 0.005 \
    --scaling_lr 0.0 --rotation_lr 0.0 \
    --lambda_base_color_smooth 0.1 --lambda_roughness_smooth 0.05 \
    --lambda_light_smooth 0.0 --lambda_light 0.0 \
    --lambda_env_smooth 0.02 \
    --sample_num 64 --env_resolution 32 \
    --checkpoint_interval 5000 --test_interval 10000 --quiet
echo "stage2 exit=$?"
