#!/usr/bin/env python
"""NVS evaluation CLI — the reference ``eval_nvs.py`` equivalent."""

import argparse
import json
import os

import jax.numpy as jnp

from svgir_tpu.config import ModelConfig, RasterConfig, OptimizationConfig, \
    add_to_parser, from_args


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_to_parser(ModelConfig, parser, "Loading Parameters")
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("-t", "--type", default="render",
                        choices=["render", "render_relight"])
    parser.add_argument("--sample_num", type=int, default=64)
    parser.add_argument("--max_instances", type=int, default=1 << 20)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--max_cameras", type=int, default=None)
    # reference eval_nvs renders the scale-4 camera set (eval_nvs.py:133-136)
    parser.add_argument("--eval_scale", type=float, default=4.0)
    args = parser.parse_args(argv)

    model_cfg = from_args(ModelConfig, args)
    raster_cfg = RasterConfig(max_instances=args.max_instances)

    from svgir_tpu.data.readers import load_scene
    from svgir_tpu.eval.nvs import render_set
    from svgir_tpu.models import gaussians as G
    from svgir_tpu.train import checkpoint as CK
    from svgir_tpu.train.trainer import strip_meta

    scene = load_scene(model_cfg.source_path,
                       white_background=model_cfg.white_background,
                       eval_split=True, resolution=model_cfg.resolution,
                       max_cameras=args.max_cameras)
    it, tree = CK.load_checkpoint(args.checkpoint)
    state = tree["state"]
    params, alive = state["params"], state["alive"]
    bg = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)
    out_dir = os.path.join(model_cfg.model_path or ".", "eval")

    import jax

    if args.type == "render":
        from svgir_tpu.render.stage1 import render_stage1

        # one jitted render shared across views (strip_meta collapses the
        # per-camera static metadata to a single jit cache entry); eager
        # per-frame dispatch otherwise pays full retrace cost on TPU
        @jax.jit
        def _render(params, alive, cam):
            return render_stage1(cam, params, bg, opt=OptimizationConfig(),
                                 is_training=False, alive=alive,
                                 cfg=raster_cfg)

        def render_one(cam):
            return _render(params, alive, strip_meta(cam))
    else:
        from svgir_tpu.models import radiance as RAD
        from svgir_tpu.render.svgss import render_svgss

        bake = tree.get("extra")
        if bake is None:
            bake = RAD.bake_radiance(
                params["xyz"], G.get_scaling(params),
                G.get_rotation(params), G.get_opacity(params)[:, 0],
                G.get_shs(params), sample_num=args.sample_num, valid=alive)
            bake = {k: v for k, v in bake.items() if k != "exhausted_frac"}
        env = tree["env"]

        @jax.jit
        def _render(params, alive, bake, env_params, cam):
            return render_svgss(cam, params, bg, bake=bake,
                                env_params=env_params,
                                opt=OptimizationConfig(), is_training=False,
                                alive=alive, cfg=raster_cfg)

        def render_one(cam):
            return _render(params, alive, bake, env["params"],
                           strip_meta(cam))

    results = {}
    s = args.eval_scale
    if not args.skip_train and scene.train_cameras:
        results["train"] = render_set(out_dir, "train",
                                      scene.train_cameras_at(s), render_one)
    if not args.skip_test and scene.test_cameras:
        results["test"] = render_set(out_dir, "test",
                                     scene.test_cameras_at(s), render_one)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
