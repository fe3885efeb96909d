#!/usr/bin/env python
"""Relighting / composition trajectory renderer — ``relighting.py`` equivalent.

Composes one or more trained PLY models (optional per-scene 4x4 transforms),
renders a camera trajectory under a fixed HDR environment with per-frame
light rotation (reference relighting.py:28-196), saves the requested capture
buffers per frame, and writes one mp4 per capture type.

``--config`` accepts three forms:

* a reference-style config DIRECTORY (the repo's ``configs/<name>/``) holding
  ``transform.json`` ({name: {path, transform[16]}}), optional
  ``trajectory.json`` ({"camera": {width,height,fov}, "trajectory":
  {idx: w2c[16]}}) and optional ``light_transform.json``
  ({"transform": {idx: rot3x3[9]}}) — reference relighting.py:106-112;
* a JSON file with a list of {path, transform?} scene entries;
* a single ``.ply`` path.

Without a trajectory config an orbit trajectory is generated from the
``--frames/--radius/--height/--resolution`` flags.
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


def trajectory_cameras(traject: dict):
    """Cameras from a reference trajectory.json: entries are w2c 4x4
    row-major, R = w2c[:3,:3].T, T = w2c[:3,3] (relighting.py:158-165);
    fovx is the reference's hardcoded 0.6911112070083618 (:151)."""
    from svgir_tpu.cameras import make_camera
    from svgir_tpu.utils.graphics import focal2fov, fov2focal

    H = int(traject["camera"]["height"])
    W = int(traject["camera"]["width"])
    fovx = 0.6911112070083618
    fovy = focal2fov(fov2focal(fovx, W), H)
    cams, ids = [], []
    for idx, vals in traject["trajectory"].items():
        w2c = np.array(vals, np.float32).reshape(4, 4)
        cams.append(make_camera(w2c[:3, :3].T, w2c[:3, 3], fovx, fovy, W, H))
        ids.append(str(idx))
    return cams, ids


def rotation_z(angle: float) -> np.ndarray:
    c, s = math.cos(angle), math.sin(angle)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def load_config(cfg: str):
    """-> (scene entries, trajectory dict | None, light dict | None)."""
    if cfg.endswith(".ply"):
        return [{"path": cfg}], None, None
    if os.path.isdir(cfg):                   # reference config directory
        scene_dict = json.load(open(os.path.join(cfg, "transform.json")))
        entries = list(scene_dict.values())

        def opt(name):
            p = os.path.join(cfg, f"{name}.json")
            return json.load(open(p)) if os.path.exists(p) else None

        return entries, opt("trajectory"), opt("light_transform")
    return json.load(open(cfg)), None, None


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True,
                        help="reference config dir (transform/trajectory/"
                             "light_transform.json), a JSON list of "
                             "{path, transform?} entries, or a .ply path")
    parser.add_argument("--hdr", required=True)
    parser.add_argument("--output", default="relight_out")
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--radius", type=float, default=3.0)
    parser.add_argument("--height", type=float, default=0.5)
    parser.add_argument("--sample_num", type=int, default=64)
    parser.add_argument("--capture_list", default="pbr_env",
                        help="comma-separated buffers to save "
                             "(relighting.py:101: pbr_env, render, normal, "
                             "base_color, roughness, visibility, ...)")
    parser.add_argument("-bg", "--background_color", type=float, default=0.0)
    parser.add_argument("--video", action="store_true", default=True)
    parser.add_argument("--rotate_light", action="store_true",
                        help="rotate the env light one full turn over the "
                             "trajectory (used when no light_transform.json)")
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
    entries, traject, light_dict = load_config(args.config)
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
    capture_list = [s.strip() for s in args.capture_list.split(",")]
    for ct in capture_list:
        os.makedirs(os.path.join(args.output, ct), exist_ok=True)

    if traject is not None:
        cams, frame_ids = trajectory_cameras(traject)
    else:
        cams = orbit_cameras(args.frames, args.radius, args.height,
                             math.pi / 3, args.resolution)
        frame_ids = [str(i) for i in range(len(cams))]
    cams = [strip_meta(c) for c in cams]
    bgv = float(args.background_color)
    bg = jnp.full((3,), bgv)

    env0 = LT.env_light_init(hdr, transform=np.eye(3, dtype=np.float32))
    bake, radiances = rebake_radiance_for_light(
        params, alive, env0, sample_num=args.sample_num)
    params = dict(params)
    params["radiances"] = radiances
    params["radiance_ratio"] = jnp.ones(())
    bake_s = {k: v for k, v in bake.items() if k != "exhausted_frac"}

    @jax.jit
    def render_frame(params, env_state, cam):
        return render_svgss(cam, params, bg, bake=bake_s, env_params=None,
                            env_fn=lambda d: LT.env_light_direct(env_state,
                                                                 d),
                            opt=OptimizationConfig(), is_training=False,
                            alive=alive, cfg=cfg)

    frames = {ct: [] for ct in capture_list}
    n = len(cams)
    for i, (fid, cam) in enumerate(zip(frame_ids, cams)):
        if light_dict is not None:     # per-frame 3x3 (relighting.py:166-167)
            rot = np.array(light_dict["transform"][fid],
                           np.float32).reshape(3, 3)
            env = LT.env_light_init(hdr, transform=rot)
        elif args.rotate_light:
            env = LT.env_light_init(hdr,
                                    transform=rotation_z(2 * math.pi * i / n))
        else:
            env = env0
        res = render_frame(params, env, cam)
        # capture compositing (relighting.py:174-183)
        opacity = np.asarray(res["opacity"])
        for ct in capture_list:
            if ct not in res:
                raise SystemExit(f"unknown capture type {ct!r}; available: "
                                 f"{sorted(res)}")
            img = np.asarray(res[ct])
            if ct == "normal":
                img = img * 0.5 + 0.5 + (1 - opacity) * bgv
            elif ct in ("base_color", "roughness", "visibility"):
                img = img + (1 - opacity) * bgv
            img = np.clip(img, 0, 1)
            save_image(os.path.join(args.output, ct, f"frame_{fid}.png"), img)
            if img.shape[0] == 1:
                img = np.repeat(img, 3, 0)
            frames[ct].append((img[:3].transpose(1, 2, 0)
                               * 255).astype(np.uint8))
        print(f"frame {i+1}/{n}", flush=True)

    if args.video:
        try:
            import imageio.v2 as imageio
            for ct in capture_list:
                path = os.path.join(args.output, f"{ct}.mp4")
                imageio.mimwrite(path, frames[ct], fps=60)
                print(f"wrote {path}")
        except Exception as exc:
            print(f"video export skipped ({exc}); frames written")


if __name__ == "__main__":
    main()
