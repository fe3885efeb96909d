#!/usr/bin/env python
"""Relighting evaluation CLI — ``eval_relighting_tensoIR.py`` equivalent.

Evaluates a stage-2 checkpoint under novel HDR environment maps
(TensoIR-style layout: <scene>/test_xxx with per-frame relit GT under
light names, or explicit --hdr paths).
"""

import argparse
import json
import os

import jax.numpy as jnp
import numpy as np

from svgir_tpu.config import ModelConfig, RasterConfig, add_to_parser, \
    from_args


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_to_parser(ModelConfig, parser, "Loading Parameters")
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("--hdr", nargs="+", required=True,
                        help="paths to HDR environment maps")
    parser.add_argument("--sample_num", type=int, default=384)
    parser.add_argument("--max_instances", type=int, default=1 << 20)
    parser.add_argument("--max_cameras", type=int, default=None)
    args = parser.parse_args(argv)

    model_cfg = from_args(ModelConfig, args)
    raster_cfg = RasterConfig(max_instances=args.max_instances)

    from svgir_tpu.data.readers import load_scene
    from svgir_tpu.eval.relighting import eval_relighting
    from svgir_tpu.models import lights as LT
    from svgir_tpu.train import checkpoint as CK
    from svgir_tpu.train.trainer import strip_meta

    scene = load_scene(model_cfg.source_path,
                       white_background=model_cfg.white_background,
                       eval_split=True, resolution=model_cfg.resolution,
                       max_cameras=args.max_cameras)
    cams = [strip_meta(c) for c in (scene.test_cameras
                                    or scene.train_cameras)]
    it, tree = CK.load_checkpoint(args.checkpoint)
    state = tree["state"]
    out_dir = os.path.join(model_cfg.model_path or ".", "eval_relight")

    # Hemisphere trace is light-independent: bake once, re-shade per env
    # (the reference builds its hemi hit table once per proxy,
    # pbgi/renderer.py:470-489).
    from svgir_tpu.models import gaussians as G
    from svgir_tpu.models import radiance as RAD
    params = state["params"]
    bake = RAD.bake_radiance(
        params["xyz"], G.get_scaling(params), G.get_rotation(params),
        G.get_opacity(params)[:, 0], G.get_shs(params),
        sample_num=args.sample_num, valid=state["alive"])

    all_results = {}
    for hdr_path in args.hdr:
        name = os.path.splitext(os.path.basename(hdr_path))[0]
        env = LT.env_light_init(LT.load_hdr(hdr_path))
        all_results[name] = eval_relighting(
            out_dir, state["params"], state["alive"], env, cams,
            sample_num=args.sample_num, raster_cfg=raster_cfg,
            light_name=name, bake=bake,
            bg=(1.0, 1, 1) if model_cfg.white_background else (0.0, 0, 0))
    print(json.dumps(all_results, indent=2))


if __name__ == "__main__":
    main()
