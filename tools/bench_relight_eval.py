"""Relight-eval wall-clock at the reference TensoIR recipe scale
(VERDICT r4 item 8 'Done' bar): sample_num=384 rebake + per-view renders
on a synthetic 50k-surfel scene.

  python tools/bench_relight_eval.py [--n 50000] [--samples 384] [--views 4]

Prints per-phase seconds: bake (trace), irradiance_full (one-bounce
re-lighting of every sample), per-view render, total.
"""

import argparse
import math
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--samples", type=int, default=384)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--res", type=int, default=800)
    args = ap.parse_args()

    from svgir_tpu.cameras import look_at_camera
    from svgir_tpu.config import RasterConfig
    from svgir_tpu.eval.relighting import (eval_relighting,
                                           rebake_radiance_for_light)
    from svgir_tpu.eval.standin import make_env
    from svgir_tpu.models import gaussians as G
    from svgir_tpu.utils.transforms import normalize

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    n = args.n
    dirs = normalize(jax.random.normal(k[0], (n, 3)))
    pts = dirs * (0.7 + 0.3 * jax.random.uniform(k[1], (n, 1)))
    state = G.init_from_points(pts, jnp.full((n, 3), 0.5), normals=dirs,
                               capacity=n, rotation_init="normal")
    state = G.upgrade_to_pbr(state)
    params, alive = state["params"], state["alive"]
    env_state = make_env(k[2], h=16)

    cams = []
    for i in range(args.views):
        a = 2 * math.pi * i / args.views
        cams.append(look_at_camera(
            eye=[3 * math.sin(a), 0.3, -3 * math.cos(a)], target=[0, 0, 0],
            up=[0, -1, 0], fovx=math.pi / 3, fovy=math.pi / 3,
            width=args.res, height=args.res))

    # phase 1+2: rebake (trace) + irradiance_full, timed separately by
    # calling rebake with bake=None then reusing the bake
    t0 = time.time()
    bake, radiances = rebake_radiance_for_light(
        params, alive, env_state, sample_num=args.samples)
    jax.block_until_ready(radiances)
    t_bake_total = time.time() - t0

    t0 = time.time()
    _, radiances2 = rebake_radiance_for_light(
        params, alive, env_state, sample_num=args.samples, bake=bake)
    jax.block_until_ready(radiances2)
    t_irr = time.time() - t0          # irradiance_full only (bake reused)
    t_trace = t_bake_total - t_irr

    cfg = RasterConfig(max_instances=1 << 20)
    out_dir = tempfile.mkdtemp(prefix="relight_bench_")
    t0 = time.time()
    eval_relighting(out_dir, params, alive, env_state, cams,
                    sample_num=args.samples, raster_cfg=cfg, bake=bake)
    t_eval = time.time() - t0

    total = t_bake_total + t_eval
    print(f"relight eval {n} surfels x S={args.samples}, {args.views} views "
          f"at {args.res}px:", file=sys.stderr)
    print(f"  trace bake       {t_trace:8.1f}s", file=sys.stderr)
    print(f"  irradiance_full  {t_irr:8.1f}s", file=sys.stderr)
    print(f"  render+metrics   {t_eval:8.1f}s ({t_eval/args.views:.1f}s/view"
          f", incl. compile + rebake inside eval)", file=sys.stderr)
    print({"relight_eval_s": round(total, 1),
           "trace_s": round(t_trace, 1), "irr_s": round(t_irr, 1),
           "render_s": round(t_eval, 1)})


if __name__ == "__main__":
    main()
