"""Attribute the r4 bake cost: block-geo march vs fallback, plus the
probe/sort phases of bake_radiance, on the bench bake scene.

Usage: python tools/bench_bake_parts.py [--n 50000] [--rays 8192]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5, ready=lambda o: o):
    out = fn(*args)
    jax.block_until_ready(ready(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(ready(out))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--rays", type=int, default=8192)
    args = ap.parse_args()

    from svgir_tpu.ops import grid_tracer, tracing
    from svgir_tpu.utils.graphics import fibonacci_sphere_sampling
    from svgir_tpu.utils.transforms import normalize

    n, r = args.n, args.rays
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    dirs = normalize(jax.random.normal(k[0], (n, 3)))
    means = dirs * (0.7 + 0.3 * jax.random.uniform(k[1], (n, 1)))
    scales = jnp.concatenate(
        [0.01 + 0.02 * jax.random.uniform(k[2], (n, 2)),
         jnp.zeros((n, 1))], axis=-1)
    quats = normalize(jax.random.normal(k[3], (n, 4)))
    opacity = jnp.full((n,), 0.9)
    geo = tracing.build_surfel_geometry(means, scales, quats, opacity)
    res = grid_tracer.auto_res(geo)
    t0 = time.time()
    grid = grid_tracer.build_grid_auto(geo, res=res, cell_cap=64,
                                      max_cells_per_gauss=64)
    print(f"grid build: {time.time()-t0:.1f}s  res={res} "
          f"cap={grid.cell_cap} "
          f"blocks={None if grid.block_geo is None else grid.block_geo.shape}",
          file=sys.stderr)
    m_np = np.asarray(means)
    t_max = float(np.linalg.norm(m_np.max(0) - m_np.min(0))) \
        + 6.0 * float(np.asarray(scales).max())
    n_steps = grid_tracer._concrete_n_steps(grid, t_max)
    print(f"devices: {jax.devices()}  n_steps={n_steps}", file=sys.stderr)

    sdirs, _ = fibonacci_sphere_sampling(geo.normal[:r], 1)
    rays_o, rays_d = means[:r], sdirs[:, 0]

    # visit budget for this chunk (what bake_radiance probes)
    nb = grid_tracer.count_visit_blocks(grid, rays_o, rays_d, t_max=t_max,
                                        n_steps=n_steps)
    vmax = int(jax.device_get(nb.max()))
    vmean = float(jax.device_get(nb.astype(jnp.float32).mean()))
    mv = -(-vmax // 32) * 32
    print(f"visit blocks: mean {vmean:.1f} max {vmax} -> budget {mv}")

    f = jax.jit(lambda g, gr, o, d: grid_tracer._nearest_hits_grid(
        g, gr, o, d, t_max=t_max, k=16, n_steps=n_steps, max_visits=mv))
    t = timeit(f, geo, grid, rays_o, rays_d, ready=lambda o: o["t"])
    nch = args.n * 64 / r
    print(f"march (block-geo) {r} rays, V={mv}: {t*1e3:.1f} ms "
          f"-> x{nch:.0f} chunks = {t*nch:.0f}s")

    grid_nb = grid._replace(block_geo=None, block_start=None)
    t = timeit(f, geo, grid_nb, rays_o, rays_d, ready=lambda o: o["t"])
    print(f"march (fallback packed-gather): {t*1e3:.1f} ms")

    # probe phase at bake batch size
    P = 131072
    po = jnp.tile(rays_o, (P // r + 1, 1))[:P]
    pd = jnp.tile(rays_d, (P // r + 1, 1))[:P]
    t = timeit(lambda: grid_tracer.count_visit_blocks(
        grid, po, pd, t_max=t_max, n_steps=n_steps), ready=lambda o: o)
    tot = args.n * 64 / P
    print(f"probe 131072 rays: {t*1e3:.1f} ms -> x{tot:.0f} = {t*tot:.1f}s")

    # isolate per-visit pieces at [r, 128]
    zrow = grid.block_geo.shape[0] - 1
    rows = jnp.clip(jnp.arange(r) * 7 % zrow, 0, zrow - 1)

    def blk_gather(bg, rw):
        return bg[rw]
    t = timeit(jax.jit(blk_gather), grid.block_geo, rows)
    print(f"block_geo [R]-row gather once: {t*1e3:.2f} ms -> x{mv} = "
          f"{t*mv*1e3:.0f} ms")

    carry_t = jax.random.uniform(k[1], (r, 16))
    cand_t = jax.random.uniform(k[0], (r, 128))
    cidx = jnp.zeros((r, 128), jnp.int32)
    calpha = jnp.zeros((r, 128))
    cuv = jnp.zeros((r, 128, 2))
    kidx = jnp.zeros((r, 16), jnp.int32)
    kalpha = jnp.zeros((r, 16))
    kuv = jnp.zeros((r, 16, 2))

    def merge(kt, ct):
        at = jnp.concatenate([kt, ct], axis=1)
        ai = jnp.concatenate([kidx, cidx], axis=1)
        aa = jnp.concatenate([kalpha, calpha], axis=1)
        au = jnp.concatenate([kuv, cuv], axis=1)
        neg, sel = jax.lax.top_k(-at, 16)
        take = jnp.take_along_axis
        return (-neg, take(ai, sel, 1), take(aa, sel, 1),
                take(au, sel[..., None], 1))
    t = timeit(jax.jit(merge), carry_t, cand_t, ready=lambda o: o[0])
    print(f"top-k merge once: {t*1e3:.2f} ms -> x{mv} = {t*mv*1e3:.0f} ms")


if __name__ == "__main__":
    main()
