"""Benchmark: pixels/s/chip, forward+backward, 800x800, ~50k Gaussians.

Matches BASELINE.json config 1 ("TensoIR lego stage-1, single image fwd+bwd,
~50k Gaussians, 800x800").  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pixels/s/chip", "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
computed against REF_PIX_S below — an engineering estimate of the CUDA
reference on its RTX 3090 (a 3DGS-family fwd+bwd at 800x800 runs ~20-35 ms
on that card => ~20M px/s) — and should be replaced by a measured value
when one exists.
"""

import json
import math
import sys
import time

import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)
import jax.numpy as jnp

REF_PIX_S = 20e6  # provisional reference estimate (see module docstring)
RES = 800
N_GAUSS = 50_000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    from svgir_tpu.config import OptimizationConfig, RasterConfig
    from svgir_tpu.models import gaussians as G
    from svgir_tpu.render.stage1 import render_stage1
    from svgir_tpu.cameras import look_at_camera
    from svgir_tpu.utils.transforms import normalize

    # Instance buffers are static-shaped; every gather/scatter/zero-fill in
    # the step scales with this cap, so size it to the scene like the CUDA
    # reference sizes its dynamic buffers (rasterizer_impl.cu:70-111).  The
    # cap is auto-probed SNUG below (measured instance count x1.05, the r2
    # exp matrix's best configuration: 18.6 vs 17.1 Mpix/s at the old fixed
    # 458752) unless SVGIR_BENCH_CAP pins it.  The v3 counting binner
    # duplicates unboundedly (exact CUDA semantics) — no per-splat tile cap.
    # tile/strip/chunk come from the RasterConfig DEFAULTS — the single
    # configuration bench.py and train.py share (the benched config IS the
    # trained config; tests/test_config_unification.py pins this).  Env
    # knobs exist for A/B experiments only.
    import os
    cfg = RasterConfig(
        max_instances=int(os.environ.get("SVGIR_BENCH_CAP", 7 << 16)),
        chunk=int(os.environ.get("SVGIR_BENCH_CHUNK", RasterConfig.chunk)),
        tile=int(os.environ.get("SVGIR_BENCH_TILE", RasterConfig.tile)),
        strip=int(os.environ.get("SVGIR_BENCH_STRIP", RasterConfig.strip)))
    auto_snug = "SVGIR_BENCH_CAP" not in os.environ
    opt = OptimizationConfig()

    k = jax.random.split(jax.random.PRNGKey(0), 4)
    # lego-ish object: points in a unit ball shell, outward normals
    dirs = normalize(jax.random.normal(k[0], (N_GAUSS, 3)))
    r = 0.7 + 0.3 * jax.random.uniform(k[1], (N_GAUSS, 1))
    pts = dirs * r
    cols = jax.random.uniform(k[2], (N_GAUSS, 3))
    state = G.init_from_points(pts, cols, normals=dirs, capacity=N_GAUSS,
                               rotation_init="normal")

    cam = look_at_camera(eye=[0.5, 0.4, -2.6], target=[0, 0, 0],
                         up=[0, -1, 0], fovx=math.pi / 3, fovy=math.pi / 3,
                         width=RES, height=RES)
    import dataclasses
    gt = jax.random.uniform(k[3], (3, RES, RES))
    cam = dataclasses.replace(cam, image=gt,
                              image_mask=jnp.ones((1, RES, RES)))
    bg = jnp.zeros(3)

    # instance-count probe: sizes the snug cap AND overflow-checks it
    from svgir_tpu.models.gaussians import get_rotation, get_scaling
    from svgir_tpu.ops.binning import bin_instances_counting
    from svgir_tpu.ops.preprocess import preprocess
    import dataclasses as _dc

    def probe(params, pcfg):
        prep = preprocess(
            params["xyz"], get_scaling(params), get_rotation(params),
            cam.world_view, cam.full_proj, cam.camera_center,
            width=RES, height=RES, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            focal_x=cam.focal_x, focal_y=cam.focal_y, cfg=pcfg)
        binned = bin_instances_counting(prep, width=RES, height=RES, cfg=pcfg,
                                        rect_cap=pcfg.rect_cap)
        return binned.num_instances, binned.overflow

    # probe at a deliberately huge cap so the count is exact for ANY
    # tile/chunk (padding inflates with both); the snug cap derives from it
    total, overflow = jax.device_get(jax.jit(probe, static_argnums=1)(
        state["params"], _dc.replace(cfg, max_instances=1 << 21)))
    assert not bool(overflow), "probe cap too small for bench scene"
    if auto_snug:
        snug = -(-int(total) * 21 // (20 * 2048)) * 2048   # x1.05, 2048-mult
        cfg = _dc.replace(cfg, max_instances=snug)
    log(f"instances: {int(total)} / cap {cfg.max_instances}")
    assert int(total) <= cfg.max_instances, \
        "max_instances too small for bench scene"

    def loss_fn(params, need_weights=True):
        res = render_stage1(cam, params, bg, opt=opt, iteration=1000.0,
                            is_training=True, alive=state["alive"], cfg=cfg,
                            need_weights=need_weights)
        return res["loss"]

    step = jax.jit(jax.value_and_grad(loss_fn))
    # post-densification step (iter >= 15k trains without stats — trainer
    # switches automatically; reported as an extra bench key)
    step_nostats = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, need_weights=False)))
    build.step_nostats = step_nostats
    return step, state["params"]


def main():
    import os

    log("devices:", jax.devices())
    step, params = build()

    t0 = time.time()
    loss, grads = step(params)
    jax.block_until_ready(loss)
    log(f"compile+first step: {time.time()-t0:.1f}s loss={float(loss):.4f}")

    # warmup
    for _ in range(2):
        loss, grads = step(params)
    jax.block_until_ready(loss)

    # time batches of pipelined steps (block once per batch): training never
    # synchronizes per step, so per-dispatch tunnel latency (~30 ms here)
    # overlaps compute exactly as it would in a real training loop
    batch = 10
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(batch):
            loss, grads = step(params)
        jax.block_until_ready((loss, grads))
        times.append((time.perf_counter() - t0) / batch)
    times.sort()
    med = times[len(times) // 2]
    pix_s = RES * RES / med
    log(f"median fwd+bwd: {med*1e3:.2f} ms  ({pix_s/1e6:.2f} Mpix/s)")

    record = {
        "metric": "pixels/s/chip fwd+bwd 800x800 ~50k gaussians stage-1",
        "value": round(pix_s),
        "unit": "pixels/s/chip",
        "vs_baseline": round(pix_s / REF_PIX_S, 3),
    }

    # post-densification step (stats-free; the trainer switches to this
    # variant after densify_until_iter — half of stage-1 training)
    try:
        sn = build.step_nostats
        loss, grads = sn(params)
        jax.block_until_ready(loss)
        times_n = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(batch):
                loss, grads = sn(params)
            jax.block_until_ready((loss, grads))
            times_n.append((time.perf_counter() - t0) / batch)
        times_n.sort()
        medn = times_n[len(times_n) // 2]
        record["stage1_nostats_pixels_s"] = round(RES * RES / medn)
        record["stage1_nostats_ms_per_step"] = round(medn * 1e3, 2)
        log(f"stage-1 no-stats step: {medn*1e3:.2f} ms "
            f"({RES*RES/medn/1e6:.2f} Mpix/s)")
    except Exception as exc:
        log(f"no-stats bench failed: {exc}")

    # stage-2 (render_relight) train step as extra keys on the same line
    # (the driver consumes exactly one JSON line)
    if not os.environ.get("SVGIR_BENCH_SKIP_STAGE2"):
        try:
            import bench_stage2
            s2_step, s2_args = bench_stage2.build()
            out = s2_step(*s2_args)
            jax.block_until_ready(out[-1]["loss"])
            for _ in range(2):
                out = s2_step(*s2_args)
            jax.block_until_ready(out[-1]["loss"])
            times2 = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(batch):
                    out = s2_step(*s2_args)
                jax.block_until_ready(out[-1]["loss"])
                times2.append((time.perf_counter() - t0) / batch)
            times2.sort()
            med2 = times2[len(times2) // 2]
            record["stage2_pixels_s"] = round(RES * RES / med2)
            record["stage2_ms_per_step"] = round(med2 * 1e3, 2)
            log(f"stage-2 median step: {med2*1e3:.2f} ms "
                f"({RES*RES/med2/1e6:.2f} Mpix/s)")
        except Exception as exc:   # keep the headline line intact
            log(f"stage-2 bench failed: {exc}")

    print(json.dumps(record))


if __name__ == "__main__":
    main()
