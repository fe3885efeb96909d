#!/usr/bin/env python
"""Relighting / composition trajectory renderer — ``relighting.py`` equivalent.

Composes one or more trained PLY models (optional per-scene 4x4 transforms),
renders an orbit trajectory under a fixed HDR environment with per-frame
light rotation (relighting.py:28-196), and writes frames (+ mp4 when
imageio-ffmpeg is available).

Config JSON (per scene entry): {"path": "model.ply", "transform": 16 floats}
"""

import argparse
import json
import math
import os

import numpy as np


def orbit_cameras(n_frames, radius, height, fov, res):
    from svgir_tpu.cameras import look_at_camera
    cams = []
    for i in range(n_frames):
        a = 2 * math.pi * i / n_frames
        eye = [radius * math.sin(a), height, -radius * math.cos(a)]
        cams.append(look_at_camera(eye=eye, target=[0, 0, 0], up=[0, -1, 0],
                                   fovx=fov, fovy=fov, width=res, height=res))
    return cams


def rotation_z(angle: float) -> np.ndarray:
    c, s = math.cos(angle), math.sin(angle)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True,
                        help="JSON list of {path, transform?} scene entries, "
                             "or a single .ply path")
    parser.add_argument("--hdr", required=True)
    parser.add_argument("--output", default="relight_out")
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--radius", type=float, default=3.0)
    parser.add_argument("--height", type=float, default=0.5)
    parser.add_argument("--sample_num", type=int, default=64)
    parser.add_argument("--rotate_light", action="store_true",
                        help="rotate the env light one full turn over the "
                             "trajectory (relighting.py:166-167)")
    parser.add_argument("--max_instances", type=int, default=1 << 20)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from svgir_tpu.config import OptimizationConfig, RasterConfig
    from svgir_tpu.eval.nvs import save_image
    from svgir_tpu.eval.relighting import rebake_radiance_for_light
    from svgir_tpu.models import gaussians as G
    from svgir_tpu.models import lights as LT
    from svgir_tpu.render.svgss import render_svgss
    from svgir_tpu.train.checkpoint import load_model_ply
    from svgir_tpu.train.trainer import strip_meta

    # ---- scene composition (relighting.py scene_composition :28-54) ------
    if args.config.endswith(".ply"):
        entries = [{"path": args.config}]
    else:
        entries = json.load(open(args.config))
    states = []
    for e in entries:
        st = load_model_ply(e["path"])
        if "transform" in e:
            tf = jnp.asarray(np.array(e["transform"],
                                      np.float32).reshape(4, 4))
            st = {**st, "params": G.apply_transform(st["params"], tf)}
        states.append(st)
    state = states[0] if len(states) == 1 else G.concatenate_models(states)
    params, alive = state["params"], state["alive"]
    if "base_color" not in params:
        raise SystemExit("relighting requires a stage-2 (PBR) model PLY")

    hdr = LT.load_hdr(args.hdr)
    cfg = RasterConfig(max_instances=args.max_instances)
    os.makedirs(args.output, exist_ok=True)

    cams = [strip_meta(c) for c in orbit_cameras(
        args.frames, args.radius, args.height, math.pi / 3, args.resolution)]
    bg = jnp.zeros(3)

    env0 = LT.env_light_init(hdr)
    bake, radiances = rebake_radiance_for_light(
        params, alive, env0, sample_num=args.sample_num)
    params = dict(params)
    params["radiances"] = radiances
    params["radiance_ratio"] = jnp.ones(())
    bake_s = {k: v for k, v in bake.items() if k != "exhausted_frac"}

    frames = []
    for i, cam in enumerate(cams):
        if args.rotate_light:
            rot = rotation_z(2 * math.pi * i / args.frames)
            env = LT.env_light_init(hdr, transform=rot)
        else:
            env = env0
        res = render_svgss(cam, params, bg, bake=bake_s, env_params=None,
                           env_fn=lambda d, e=env: LT.env_light_direct(e, d),
                           opt=OptimizationConfig(), is_training=False,
                           alive=alive, cfg=cfg)
        img = np.clip(np.asarray(res["pbr_env"]), 0, 1)
        save_image(os.path.join(args.output, f"{i:05d}.png"), img)
        frames.append((img.transpose(1, 2, 0) * 255).astype(np.uint8))
        print(f"frame {i+1}/{args.frames}", flush=True)

    try:
        import imageio.v2 as imageio
        imageio.mimwrite(os.path.join(args.output, "trajectory.mp4"),
                         frames, fps=24)
        print("wrote trajectory.mp4")
    except Exception as exc:
        print(f"video export skipped ({exc}); frames written")


if __name__ == "__main__":
    main()
