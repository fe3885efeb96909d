#!/usr/bin/env python
"""Write a procedural blender-format dataset at TensoIR scale so the REAL
trainer (train.py) can run the full reference schedule on-chip
(script/run_tensoir.sh:6-42 shape: 800x800, 100 train views) without the
actual datasets, which don't exist in this image.

GT comes from eval/standin.py's known PBR surfel model rendered in eval
mode under a fixed synthetic HDR env — the same stand-in the e2e parity
tests train against, so final PSNRs are comparable across scales.

  python tools/make_synth_dataset.py --out /root/scenes/synth800 \
      --res 800 --views 100 --test-views 10 --n-gt 20000
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--views", type=int, default=100)
    ap.add_argument("--test-views", type=int, default=10)
    ap.add_argument("--n-gt", type=int, default=20000)
    ap.add_argument("--sample-num", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from svgir_tpu.config import RasterConfig
    from svgir_tpu.eval.standin import (make_env, make_gt_model,
                                        render_gt_views, ring_cameras)

    key = jax.random.PRNGKey(args.seed)
    k_model, k_env, k_bake = jax.random.split(key, 3)
    state = make_gt_model(k_model, n=args.n_gt)
    env_state = make_env(k_env, h=16)
    cfg = RasterConfig(max_instances=1 << 20)

    cams = ring_cameras(args.views + args.test_views, args.res)
    fovx = float(cams[0].fovx)
    print(f"rendering {len(cams)} GT views at {args.res}px "
          f"({args.n_gt} surfels, S={args.sample_num})", flush=True)
    rendered = render_gt_views(state, env_state, cams,
                               sample_num=args.sample_num, cfg=cfg,
                               key=k_bake)

    splits = {"train": rendered[:args.views],
              "test": rendered[args.views:]}
    for split, scams in splits.items():
        os.makedirs(os.path.join(args.out, split), exist_ok=True)
        frames = []
        for i, cam in enumerate(scams):
            img = np.asarray(cam.image).transpose(1, 2, 0)     # [H, W, 3]
            alpha = np.asarray(cam.image_mask)[0]
            rgba = np.concatenate([np.clip(img, 0, 1),
                                   alpha[..., None]], axis=-1)
            name = f"./{split}/r_{i}"
            imageio.imwrite(os.path.join(args.out, f"{name[2:]}.png"),
                            (rgba * 255).round().astype(np.uint8))
            # reader flips OpenGL->COLMAP axes (readers.py:122); emit the
            # inverse so load_scene round-trips to these exact cameras
            c2w = np.linalg.inv(np.asarray(cam.world_view, np.float64))
            c2w[:3, 1:3] *= -1
            frames.append({"file_path": name,
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(args.out, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)
    print(f"wrote {args.views}+{args.test_views} views to {args.out}",
          flush=True)


if __name__ == "__main__":
    main()
