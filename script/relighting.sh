#!/bin/bash
# Composition / trajectory relighting — svgir_tpu port of
# /root/reference/script/relighting.sh.  The config JSON lists the PLYs
# and per-scene 4x4 transforms (see relighting.py --help).
set -e

python relighting.py --config configs/teaser.json \
    --output output/relighting/teaser --hdr env_map/teaser.hdr \
    --sample_num 384

python relighting.py --config configs/nerf_syn.json \
    --output output/relighting/nerf_syn --hdr env_map/composition.hdr \
    --sample_num 384 --rotate_light
