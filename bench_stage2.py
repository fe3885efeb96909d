"""Stage-2 benchmark: deferred per-vertex PBR train step, fwd+bwd.

Mirrors bench.py (800x800, ~50k Gaussians) for the stage-2
(render_relight) path: render_svgss S=24/VS=52 packing, joint
gaussian + env-map Adam step (make_svgss_train_step).  The radiance
bake buffers are synthesized randomly — the step's compute cost is
independent of their values, so this measures the training step
without the one-off bake.

Prints ONE JSON line like bench.py; the stage-2 number is tracked in
BASELINE.md (the driver's headline metric remains bench.py).
"""

import json
import math
import sys
import time

import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)
import jax.numpy as jnp

REF_PIX_S = 20e6  # same provisional reference estimate as bench.py
RES = 800
N_GAUSS = 50_000
SAMPLE_NUM = 24


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    import dataclasses

    from svgir_tpu.config import OptimizationConfig, RasterConfig
    from svgir_tpu.models import gaussians as G
    from svgir_tpu.models import lights as LT
    from svgir_tpu.train import optim
    from svgir_tpu.train.trainer import make_svgss_train_step
    from svgir_tpu.cameras import look_at_camera
    from svgir_tpu.utils.graphics import fibonacci_sphere_sampling
    from svgir_tpu.utils.transforms import normalize

    # identical scene + camera to bench.py, whose overflow probe measures
    # 345600 instances: the same snug cap applies (every instance-space
    # gather/scatter/kernel pass scales with the static cap, not the count)
    import os
    # shared RasterConfig defaults (tile=32/strip=8): since r4 the VS=52
    # backward fits the raised 64 MB scoped-VMEM budget at tile=32 and
    # measured 55.2 vs 63.1 ms (tile=16) on-chip — one config for
    # stage-1, stage-2, bench and train (tests/test_config_unification.py)
    cfg = RasterConfig(
        max_instances=int(os.environ.get("SVGIR_BENCH_CAP", 7 << 16)),
        chunk=int(os.environ.get("SVGIR_BENCH_CHUNK", RasterConfig.chunk)),
        tile=int(os.environ.get("SVGIR_BENCH_TILE", RasterConfig.tile)),
        strip=int(os.environ.get("SVGIR_BENCH_STRIP", RasterConfig.strip)))
    auto_snug = "SVGIR_BENCH_CAP" not in os.environ
    opt = OptimizationConfig()

    k = jax.random.split(jax.random.PRNGKey(0), 10)
    dirs = normalize(jax.random.normal(k[0], (N_GAUSS, 3)))
    r = 0.7 + 0.3 * jax.random.uniform(k[1], (N_GAUSS, 1))
    pts = dirs * r
    cols = jax.random.uniform(k[2], (N_GAUSS, 3))
    state = G.init_from_points(pts, cols, normals=dirs, capacity=N_GAUSS,
                               rotation_init="normal")
    state = G.upgrade_to_pbr(state)
    params = dict(state["params"])

    # synthetic bake buffers (values don't affect step cost)
    inc_dirs, inc_areas = fibonacci_sphere_sampling(
        normalize(jax.random.normal(k[3], (N_GAUSS, 3))), SAMPLE_NUM)
    bake = {
        "radiance": jax.random.uniform(k[4], (N_GAUSS, SAMPLE_NUM, 3)),
        "visibility": (jax.random.uniform(k[5], (N_GAUSS, SAMPLE_NUM, 1))
                       > 0.3).astype(jnp.float32),
        "incident_dirs": inc_dirs,
        "incident_areas": inc_areas,
        "hit_idx": jax.random.randint(k[6], (N_GAUSS, SAMPLE_NUM), -1,
                                      N_GAUSS),
        "uv": jax.random.uniform(k[7], (N_GAUSS, SAMPLE_NUM, 2)),
    }
    qx, qy = LT.equirect_grid_coords(inc_dirs)
    bake["incident_qxy"] = jnp.stack([qx, qy], axis=-1)
    params["radiances"] = bake["radiance"]
    params["radiance_ratio"] = jnp.ones(())
    state = {**state, "params": params}

    env_state = LT.direct_light_map_init(k[8], h=32,
                                         light_init=opt.light_init)

    cam = look_at_camera(eye=[0.5, 0.4, -2.6], target=[0, 0, 0],
                         up=[0, -1, 0], fovx=math.pi / 3, fovy=math.pi / 3,
                         width=RES, height=RES)
    gt = jax.random.uniform(k[9], (3, RES, RES))
    cam = dataclasses.replace(cam, image=gt,
                              image_mask=jnp.ones((1, RES, RES)))

    if auto_snug:
        from svgir_tpu.models.gaussians import get_rotation, get_scaling
        from svgir_tpu.ops.binning import bin_instances_counting
        from svgir_tpu.ops.preprocess import preprocess

        def probe(params, pcfg):
            prep = preprocess(
                params["xyz"], get_scaling(params), get_rotation(params),
                cam.world_view, cam.full_proj, cam.camera_center,
                width=RES, height=RES, tanfovx=cam.tanfovx,
                tanfovy=cam.tanfovy, focal_x=cam.focal_x,
                focal_y=cam.focal_y, cfg=pcfg)
            b = bin_instances_counting(prep, width=RES, height=RES, cfg=pcfg,
                                       rect_cap=pcfg.rect_cap)
            return b.num_instances, b.overflow

        total, overflow = jax.device_get(jax.jit(probe, static_argnums=1)(
            params, dataclasses.replace(cfg, max_instances=1 << 21)))
        assert not bool(overflow)
        snug = -(-int(total) * 21 // (20 * 2048)) * 2048   # x1.05, 2048-mult
        cfg = dataclasses.replace(cfg, max_instances=snug)
        log(f"instances: {int(total)} / cap {cfg.max_instances}")

    lrs = optim.group_lrs(opt, 1.0, use_pbr=True)
    opt_state = optim.adam_init(state["params"])
    step_fn = make_svgss_train_step(opt, cfg, jnp.zeros(3), lrs=lrs)
    args = (state, opt_state, env_state, bake, cam, jnp.float32(100.0),
            jnp.float32(1e-5), jnp.float32(opt.radiance_lr))
    return step_fn, args


def main():
    log("devices:", jax.devices())
    step, args = build()

    t0 = time.time()
    out = step(*args)
    jax.block_until_ready(out[-1]["loss"])
    log(f"compile+first step: {time.time()-t0:.1f}s "
        f"loss={float(out[-1]['loss']):.4f}")

    for _ in range(2):
        out = step(*args)
    jax.block_until_ready(out[-1]["loss"])

    batch = 10
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(batch):
            out = step(*args)
        jax.block_until_ready(out[-1]["loss"])
        times.append((time.perf_counter() - t0) / batch)
    times.sort()
    med = times[len(times) // 2]
    pix_s = RES * RES / med
    log(f"stage-2 median step: {med*1e3:.2f} ms  ({pix_s/1e6:.2f} Mpix/s)")

    print(json.dumps({
        "metric": "pixels/s/chip stage-2 train step 800x800 ~50k gaussians",
        "value": round(pix_s),
        "unit": "pixels/s/chip",
        "vs_baseline": round(pix_s / REF_PIX_S, 3),
    }))


if __name__ == "__main__":
    main()
