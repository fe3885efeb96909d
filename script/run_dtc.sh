#!/bin/bash
# DTC (rendered_data) recipe — svgir_tpu port of the reference schedule
# (/root/reference/script/run_dtc.sh): stage-1 with normal-densify prior
# and depth-var loss, stage-2 with fully frozen geometry, light smoothness
# off, 32 train samples, env 32, NVS + relight eval at 200 samples.
set -e

root_dir="${DTC_ROOT:-datasets/dtc/rendered_data/}"
list="${SCENES:-birdhouse bathroom Gargoyle Mallard airplane block}"

for i in $list
do
    python train.py --eval \
        -s ${root_dir}${i} \
        -m output/dtc/${i}/gss \
        --lambda_normal_render_depth 0.0 \
        --lambda_normal_smooth 0.02 \
        --lambda_mask_entropy 0.1 \
        --save_training_vis \
        --densify_grad_normal_threshold 1e-8 \
        --lambda_depth_var 1e-2

    python train.py --eval \
        -s ${root_dir}${i} \
        -m output/dtc/${i}/render_relight \
        -c output/dtc/${i}/gss/chkpnt30000.npz \
        --save_training_vis \
        --position_lr_init 0.0 \
        --position_lr_final 0.0 \
        --normal_lr 0.001 \
        --sh_lr 0.00025 \
        --opacity_lr 0.005 \
        --scaling_lr 0.0 \
        --rotation_lr 0.0 \
        --iterations 50000 \
        --lambda_base_color_smooth 0.005 \
        --lambda_roughness_smooth 0.005 \
        --lambda_light_smooth 0.0 \
        --lambda_light 0.0 \
        -t render_relight --sample_num 32 \
        --save_training_vis_iteration 200 \
        --lambda_env_smooth 0.02 \
        --env_resolution 32

    python eval_nvs.py --eval \
        -m "output/dtc/${i}/render_relight" \
        -c "output/dtc/${i}/render_relight/chkpnt50000.npz" \
        -t render_relight

    python eval_relighting.py \
        -s ${root_dir}${i} \
        -m "output/dtc/${i}/render_relight" \
        -c "output/dtc/${i}/render_relight/chkpnt50000.npz" \
        --sample_num 200
done
