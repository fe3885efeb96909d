"""Round-2 perf experiment matrix — one process, one axon handshake.

Runs, printing results incrementally (so partial progress survives a
tunnel drop):
  0. on-TPU correctness smoke (tiled Pallas vs dense oracle + grads)
  1. stage-1 bench baseline (captures the committed residual-slab win)
  2. stage-1 A/B: blend MXU precision HIGH (bf16_3x)
  3. stage-1 A/B: chunk 256 / 64
  8. stage-1 A/B: tile=32 (chunk 128 / 64)
  a. stage-1 A/B: max_instances cap 1<<18 / 3<<17
  e. stage-1 A/B: SSIM blur MXU precision (HIGHEST / DEFAULT)
  c. stage-1 A/B: strip=8 image-layout blend I/O (no assembly transposes)
  d. stage-2 A/B: strip=8
  4. stage-2 bench (captures the fused vertex matmuls + snug cap)
  6. env-lookup microbench (patch-gather bilinear, fwd+bwd)
  7. consistency-loss microbench (fused hit gather, fwd+bwd)
  9. binner v3 microbench (preprocess+bin, fwd only)
  5. stage-1 + stage-2 trace profiles (top ops by self time)

Usage: python tools/exp_r2.py [steps...]   e.g. `python tools/exp_r2.py 1 2 5`
"""

import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)

sys.path.insert(0, '/root/repo')


def log(*a):
    print(*a, flush=True)


def time_step(step, args, batch=10, rounds=5, ready=None):
    if ready is None:
        ready = lambda out: out
    t0 = time.time()
    out = step(*args)
    jax.block_until_ready(ready(out))
    log(f"  compile+first: {time.time()-t0:.1f}s")
    for _ in range(2):
        out = step(*args)
    jax.block_until_ready(ready(out))
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(batch):
            out = step(*args)
        jax.block_until_ready(ready(out))
        times.append((time.perf_counter() - t0) / batch)
    times.sort()
    med = times[len(times) // 2]
    log(f"  median {med*1e3:.2f} ms  ({800*800/med/1e6:.2f} Mpix/s)")
    return med


def stage1_step():
    import bench
    step, params = bench.build()
    return step, (params,), (lambda out: out[0])


def main():
    steps = set(sys.argv[1:]) or {"0", "1", "2", "3", "8", "a", "c", "4",
                                  "d", "e", "6", "7", "9", "b", "5"}
    log("devices:", jax.devices())
    import svgir_tpu.ops.blend_pallas as bp

    if "0" in steps:
        log("== 0. on-TPU correctness smoke: tiled Pallas vs dense oracle")
        import math
        import numpy as np
        import jax.numpy as jnp
        from svgir_tpu.cameras import look_at_camera
        from svgir_tpu.config import RasterConfig
        from svgir_tpu.ops.dense_ref import render_dense
        from svgir_tpu.ops.preprocess import preprocess
        from svgir_tpu.ops.rasterizer import rasterize

        H = W = 64
        cam = look_at_camera(eye=[0, 0, -3], target=[0, 0, 0], up=[0, -1, 0],
                             fovx=math.pi / 3, fovy=math.pi / 3,
                             width=W, height=H)
        k = jax.random.split(jax.random.PRNGKey(3), 6)
        n = 40
        means = jax.random.uniform(k[0], (n, 3), minval=-0.8,
                                   maxval=0.8).at[:, 2].mul(0.3)
        quats = jax.random.normal(k[1], (n, 4))
        quats /= jnp.linalg.norm(quats, axis=1, keepdims=True)
        scales = jnp.concatenate(
            [0.05 + 0.25 * jax.random.uniform(k[2], (n, 2)),
             jnp.zeros((n, 1))], 1)
        op = 0.4 + 0.55 * jax.random.uniform(k[3], (n,))
        cols = jax.random.uniform(k[4], (n, 3))
        vf = jax.random.uniform(k[5], (n, 8))
        cfg = RasterConfig(max_instances=1 << 12, chunk=128)
        bufs = rasterize(means, scales, quats, op, cam, jnp.zeros(3),
                         colors=cols, vfeatures=vf, cfg=cfg, interpret=False)
        prep = preprocess(means, scales, quats, cam.world_view,
                          cam.full_proj, cam.camera_center, width=W,
                          height=H, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
                          focal_x=cam.focal_x, focal_y=cam.focal_y,
                          colors=cols)
        dref = render_dense(prep, op, None, vf, jnp.zeros(3),
                            width=W, height=H)
        for name in ("color", "vfeature", "opacity", "depth"):
            d = np.abs(np.array(getattr(bufs, name))
                       - np.array(getattr(dref, name))).max()
            log(f"  {name}: maxdiff {d:.2e}")
            assert d < 5e-4, (name, d)

        g = jax.grad(lambda o: jnp.sum(rasterize(
            means, scales, quats, o, cam, jnp.zeros(3), colors=cols,
            vfeatures=vf, cfg=cfg, interpret=False).color ** 2))(op)
        assert bool(jnp.all(jnp.isfinite(g)))
        log(f"  grad norm {float(jnp.linalg.norm(g)):.3f}  SMOKE PASS")

    if "1" in steps:
        log("== 1. stage-1 baseline (chunk=128, HIGHEST)")
        step, args, ready = stage1_step()
        time_step(step, args, ready=ready)

    if "2" in steps:
        # Mosaic's in-kernel dot lowering rejects Precision.HIGH
        # ("Unsupported dot precision: HIGH", measured 2026-08-18) — the
        # bf16_3x tier is unavailable inside Pallas until upstream adds it.
        log("== 2. stage-1 precision HIGH: SKIPPED (unsupported by Mosaic)")

    if "3" in steps:
        # chunk trades per-tile padding (VPU work scales with padded total)
        # against loop iterations (padded/chunk) — resolve empirically.
        # num_instances counts the CHUNK-PADDED per-tile runs, so bigger
        # chunks need a bigger cap (625 tiles x up-to-chunk/2 extra pad).
        import os
        for ch, cap in (("256", str(1 << 19)), ("64", str(7 << 16))):
            log(f"== 3. stage-1 chunk={ch} cap={cap} (HIGHEST)")
            os.environ["SVGIR_BENCH_CHUNK"] = ch
            os.environ["SVGIR_BENCH_CAP"] = cap
            try:
                step, args, ready = stage1_step()
                time_step(step, args, ready=ready)
            except Exception as exc:
                log(f"  failed: {exc}")
            del os.environ["SVGIR_BENCH_CHUNK"]
            del os.environ["SVGIR_BENCH_CAP"]

    if "8" in steps:
        # bigger tiles cut instance counts (rect area shrinks) but grow
        # per-instance pixel work (pix = tile^2) and weaken early exit
        import os
        for tl, ch in (("32", "128"), ("32", "64")):
            log(f"== 8. stage-1 tile={tl} chunk={ch}")
            os.environ["SVGIR_BENCH_TILE"] = tl
            os.environ["SVGIR_BENCH_CHUNK"] = ch
            step, args, ready = stage1_step()
            try:
                time_step(step, args, ready=ready)
            except Exception as exc:
                log(f"  failed: {exc}")
            del os.environ["SVGIR_BENCH_TILE"]
            del os.environ["SVGIR_BENCH_CHUNK"]

    if "c" in steps:
        # strip-layout blend: image-layout kernel I/O (no assembly
        # transposes, 8x fewer grid steps, (8,128)-aligned writebacks)
        import os
        log("== c. stage-1 strip=8 (image-layout blend I/O)")
        os.environ["SVGIR_BENCH_STRIP"] = "8"
        step, args, ready = stage1_step()
        try:
            time_step(step, args, ready=ready)
        except Exception as exc:
            log(f"  failed: {exc}")
        del os.environ["SVGIR_BENCH_STRIP"]

    if "4" in steps:
        log("== 4. stage-2 (fused vertex matmuls)")
        import bench_stage2
        s2, a2 = bench_stage2.build()
        time_step(s2, a2, rounds=3, ready=lambda out: out[-1]["loss"])

    if "d" in steps:
        # stage-2 has CO=29 output channels -> the assembly transposes the
        # strip layout deletes are ~1.7x bigger than stage-1's
        import os
        log("== d. stage-2 strip=8 (image-layout blend I/O)")
        os.environ["SVGIR_BENCH_STRIP"] = "8"
        import bench_stage2
        s2, a2 = bench_stage2.build()
        try:
            time_step(s2, a2, rounds=3, ready=lambda out: out[-1]["loss"])
        except Exception as exc:
            log(f"  failed: {exc}")
        del os.environ["SVGIR_BENCH_STRIP"]

    if "6" in steps:
        log("== 6. env-lookup microbench (1.2M queries, fwd+bwd)")
        import jax.numpy as jnp
        from svgir_tpu.models import lights as LT
        k = jax.random.split(jax.random.PRNGKey(0), 2)
        env_state = LT.direct_light_map_init(k[0], h=32, light_init=3.0)
        dirs = jax.random.normal(k[1], (50_000, 24, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        def f(p):
            return jnp.sum(LT.direct_light(p, dirs) ** 2)

        stepe = jax.jit(jax.value_and_grad(f))
        time_step(stepe, (env_state["params"],),
                  ready=lambda out: out[0])

    if "7" in steps:
        log("== 7. consistency-loss microbench (50k x 24, fwd+bwd)")
        import jax.numpy as jnp
        import bench_stage2
        from svgir_tpu.models import lights as LT
        from svgir_tpu.models import radiance as RADm
        _, a2 = bench_stage2.build()
        state2, _, env_state2, bake2, cam2 = a2[0], a2[1], a2[2], a2[3], a2[4]

        def g(p, env_p):
            return RADm.radiance_consistency_loss(
                p, bake2, cam2.camera_center,
                lambda d: LT.direct_light(env_p, d),
                alive=state2["alive"])

        stepc = jax.jit(jax.value_and_grad(g, argnums=(0, 1)))
        time_step(stepc, (state2["params"], env_state2["params"]),
                  ready=lambda out: out[0])

    if "a" in steps:
        # every instance-space gather/scatter/zero-fill scales with the
        # static cap; the v3 exact binner changed the instance count, so
        # re-resolve the snuggest safe cap empirically
        import os
        for cap in (str(360448), str(3 << 17)):  # padded need is 345600
            log(f"== a. stage-1 cap={cap}")
            os.environ["SVGIR_BENCH_CAP"] = cap
            step, args, ready = stage1_step()
            try:
                time_step(step, args, ready=ready)
            except Exception as exc:
                log(f"  failed: {exc}")
            del os.environ["SVGIR_BENCH_CAP"]

    if "b" in steps:
        # tile->image assembly transpose (+ inverse for bwd) costs ~3-4 ms
        # of the step (copy.202/213 + reshapes in the r2 profile); A/B
        # alternative formulations on-device
        log("== b. assembly transpose microbench [2500,17,256] <-> [17,800,800]")
        import jax.numpy as jnp
        gy = gx = 50
        co, tl = 17, 16
        x = jax.random.normal(jax.random.PRNGKey(0), (gy * gx, co, tl * tl))

        def v_current(x):
            img = x.reshape(gy, gx, co, tl, tl)
            return img.transpose(2, 0, 3, 1, 4).reshape(co, gy * tl, gx * tl)

        def v_twostep(x):
            y = jnp.swapaxes(x, 0, 1)                  # [co, T, P]
            y = y.reshape(co, gy, gx, tl, tl)
            return y.transpose(0, 1, 3, 2, 4).reshape(co, gy * tl, gx * tl)

        def v_rowmajor(x):
            # row-of-tiles at a time: [gy, gx, co, ty, tx] -> per-gy
            # [co, ty, gx*tx] then stack rows
            img = x.reshape(gy, gx, co, tl, tl)
            rows = img.transpose(0, 2, 3, 1, 4).reshape(gy, co, tl,
                                                        gx * tl)
            return rows.transpose(1, 0, 2, 3).reshape(co, gy * tl, gx * tl)

        ref = None
        for name, fn in (("current", v_current), ("twostep", v_twostep),
                         ("rowmajor", v_rowmajor)):
            f = jax.jit(fn)
            out = f(x)
            if ref is None:
                ref = out
            else:
                assert bool(jnp.all(out == ref)), name
            log(f"  fwd {name}:")
            time_step(f, (x,))
            inv = jax.jit(jax.linear_transpose(fn, x))
            log(f"  inv {name}:")
            time_step(lambda im, inv=inv: inv(im)[0], (ref,))

    if "e" in steps:
        # SSIM blur precision: HIGHEST = bf16_6x, DEFAULT = 1 bf16 pass at
        # 6x the MXU rate.  Measure the microbench both ways AND the
        # value/grad delta, then the full stage-1 step at DEFAULT.
        log("== e. SSIM precision A/B (800x800 x3ch, fwd+bwd)")
        import os
        import jax.numpy as jnp
        from svgir_tpu.utils import losses as L
        k = jax.random.split(jax.random.PRNGKey(1), 2)
        a = jax.random.uniform(k[0], (3, 800, 800))
        b = jnp.clip(a + 0.05 * jax.random.normal(k[1], (3, 800, 800)), 0, 1)

        def make(prec):
            return jax.jit(jax.value_and_grad(
                lambda x: L.ssim(x, b, precision=prec)))

        f_hi = make(jax.lax.Precision.HIGHEST)
        f_lo = make(jax.lax.Precision.DEFAULT)
        v_hi, g_hi = f_hi(a)
        v_lo, g_lo = f_lo(a)
        gn = float(jnp.linalg.norm(g_hi))
        log(f"  value: hi={float(v_hi):.6f} lo={float(v_lo):.6f} "
            f"dv={abs(float(v_hi)-float(v_lo)):.2e}")
        log(f"  grad: |g_hi|={gn:.4f} "
            f"rel_dg={float(jnp.linalg.norm(g_lo-g_hi))/max(gn,1e-9):.2e}")
        log("  micro HIGHEST:")
        time_step(f_hi, (a,), ready=lambda o: o[0])
        log("  micro DEFAULT:")
        time_step(f_lo, (a,), ready=lambda o: o[0])
        log("  stage-1 step with SVGIR_SSIM_PRECISION=default:")
        os.environ["SVGIR_SSIM_PRECISION"] = "default"
        try:
            step, args, ready = stage1_step()
            time_step(step, args, ready=ready)
        except Exception as exc:
            log(f"  failed: {exc}")
        finally:
            del os.environ["SVGIR_SSIM_PRECISION"]

    if "9" in steps:
        log("== 9. binner v3 microbench (preprocess+bin, fwd only)")
        import os
        import jax.numpy as jnp
        import bench
        from svgir_tpu.config import RasterConfig
        from svgir_tpu.models.gaussians import get_rotation, get_scaling
        from svgir_tpu.models import gaussians as G
        from svgir_tpu.ops.binning import bin_instances_counting
        from svgir_tpu.ops.preprocess import preprocess
        from svgir_tpu.cameras import look_at_camera
        from svgir_tpu.utils.transforms import normalize
        import math as _m
        k = jax.random.split(jax.random.PRNGKey(0), 4)
        dirs = normalize(jax.random.normal(k[0], (bench.N_GAUSS, 3)))
        r = 0.7 + 0.3 * jax.random.uniform(k[1], (bench.N_GAUSS, 1))
        pts = dirs * r
        cols = jax.random.uniform(k[2], (bench.N_GAUSS, 3))
        state = G.init_from_points(pts, cols, normals=dirs,
                                   capacity=bench.N_GAUSS,
                                   rotation_init="normal")
        cam = look_at_camera(eye=[0.5, 0.4, -2.6], target=[0, 0, 0],
                             up=[0, -1, 0], fovx=_m.pi / 3, fovy=_m.pi / 3,
                             width=bench.RES, height=bench.RES)
        cfgb = RasterConfig(
            max_instances=int(os.environ.get("SVGIR_BENCH_CAP", 7 << 16)))

        @jax.jit
        def binner(params):
            prep = preprocess(
                params["xyz"], get_scaling(params), get_rotation(params),
                cam.world_view, cam.full_proj, cam.camera_center,
                width=bench.RES, height=bench.RES, tanfovx=cam.tanfovx,
                tanfovy=cam.tanfovy, focal_x=cam.focal_x,
                focal_y=cam.focal_y, cfg=cfgb)
            b = bin_instances_counting(prep, width=bench.RES,
                                       height=bench.RES, cfg=cfgb)
            return b.gaussian_id, b.num_instances

        time_step(binner, (state["params"],), ready=lambda out: out[0])

    if "5" in steps:
        log("== 5. trace profiles")
        import subprocess
        # profiles need their own process for a clean trace; reuse of this
        # process's compile cache makes them cheap
        for extra in ([], ["--stage2"]):
            log("  profile", extra or ["stage1"])
            r = subprocess.run(
                [sys.executable, "/root/repo/tools/profile_step.py"] + extra,
                capture_output=True, text=True, timeout=2400)
            log(r.stdout[-4000:])
            if r.returncode:
                log("  profile failed:", r.stderr[-1500:])


if __name__ == "__main__":
    main()
