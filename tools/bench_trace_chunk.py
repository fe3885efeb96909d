"""Attribute the grid-tracer chunk cost on-chip (bake perf work).

Times, on one 8192-ray chunk of the bench bake scene (50k surfels):
  a. nearest_hits_grid end-to-end (the scan)
  b. candidate-id gathers alone ([R,L] rows of the cell table, all steps)
  c. _test_candidates once (7 narrow geo gathers) vs a packed single
     [N,32]-row gather variant
  d. the top-k merge (sort) alone at the same shapes

Usage: python tools/bench_trace_chunk.py [--n 50000] [--rays 8192]
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


def timeit(fn, *args, reps=10, ready=lambda o: o):
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
    grid = grid_tracer.build_grid_auto(geo, res=res, cell_cap=64,
                                       max_cells_per_gauss=64)
    m_np = np.asarray(means)
    t_max = float(np.linalg.norm(m_np.max(0) - m_np.min(0))) \
        + 6.0 * float(np.asarray(scales).max())
    n_steps = grid_tracer._concrete_n_steps(grid, t_max)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"res={res} cap={grid.cell_cap} n_steps={n_steps} "
          f"t_max={t_max:.2f}", file=sys.stderr)

    sdirs, _ = fibonacci_sphere_sampling(geo.normal[:r], 1)
    rays_o, rays_d = means[:r], sdirs[:, 0]

    # a. full chunk
    f_full = jax.jit(lambda g, gr, o, d: grid_tracer.nearest_hits_grid(
        g, gr, o, d, t_max=t_max, k=16, n_steps=n_steps))
    t = timeit(f_full, geo, grid, rays_o, rays_d,
               ready=lambda o: o["t"])
    print(f"a. nearest_hits_grid chunk ({r} rays): {t*1e3:.1f} ms "
          f"-> full bake ({args.n*64/r:.0f} chunks) {t*args.n*64/r:.0f}s")

    # a2. cond-free variant: every step does gather+test+merge
    packed_tbl = grid_tracer.pack_geometry(geo)
    dt_c = float(np.min(cell)) * 0.5 if False else None  # set below

    cellsz = 1.0 / np.asarray(grid.inv_cell)
    dtv = float(cellsz.min()) * 0.5

    def nocond(g, gr, pk, o, d):
        init = {
            "t": jnp.full((r, 16), jnp.inf),
            "idx": jnp.full((r, 16), -1, jnp.int32),
            "alpha": jnp.zeros((r, 16)),
            "uv": jnp.zeros((r, 16, 2)),
        }

        def body(carry, j):
            t_lo = j * dtv
            t_hi = jnp.minimum((j + 1) * dtv, t_max)
            mid = o + (t_lo + 0.5 * dtv) * d
            cidx = grid_tracer._cell_index(gr, mid)
            ids = gr.cell_ids[cidx]
            cand = grid_tracer._test_candidates(
                g, ids, o, d, jnp.full((r,), t_lo), jnp.full((r,), t_hi),
                packed=pk)
            all_t = jnp.concatenate([carry["t"], cand["t"]], axis=1)
            all_idx = jnp.concatenate([carry["idx"], cand["idx"]], axis=1)
            all_alpha = jnp.concatenate([carry["alpha"], cand["alpha"]], 1)
            all_uv = jnp.concatenate([carry["uv"], cand["uv"]], axis=1)
            neg_top, sel = jax.lax.top_k(-all_t, 16)
            take = jnp.take_along_axis
            return {
                "t": -neg_top,
                "idx": take(all_idx, sel, axis=1),
                "alpha": take(all_alpha, sel, axis=1),
                "uv": take(all_uv, sel[..., None], axis=1),
            }, None

        out, _ = jax.lax.scan(body, init, jnp.arange(n_steps))
        return out
    t = timeit(jax.jit(nocond), geo, grid, packed_tbl, rays_o, rays_d,
               ready=lambda o: o["t"])
    print(f"a2. cond-free scan: {t*1e3:.1f} ms")

    # a3. two-phase visit compaction: phase-1 finds each ray's occupied
    # steps (cheap), phase-2 scans only V visit slots
    V = 40

    def twophase(g, gr, pk, o, d):
        # phase 1: occupied-step discovery
        def occ_body(_, j):
            mid = o + (j * dtv + 0.5 * dtv) * d
            cidx = grid_tracer._cell_index(gr, mid)
            return None, gr.cell_count[cidx] > 0
        _, occ = jax.lax.scan(occ_body, None, jnp.arange(n_steps))
        occ = occ.T                                       # [R, n_steps]
        steps = jnp.where(occ, jnp.arange(n_steps)[None, :], n_steps + 9)
        neg, _ = jax.lax.top_k(-steps, V)                 # first V occupied
        visit_step = -neg                                 # [R, V] ascending
        exhausted = occ.sum(1) > V

        init = {
            "t": jnp.full((r, 16), jnp.inf),
            "idx": jnp.full((r, 16), -1, jnp.int32),
            "alpha": jnp.zeros((r, 16)),
            "uv": jnp.zeros((r, 16, 2)),
        }

        def body(carry, v):
            j = visit_step[:, v]                          # [R] per-ray step
            live = j <= n_steps
            jj = jnp.minimum(j, n_steps - 1).astype(jnp.float32)
            t_lo = jj * dtv
            t_hi = jnp.minimum((jj + 1) * dtv, t_max)
            mid = o + (t_lo + 0.5 * dtv)[:, None] * d
            cidx = grid_tracer._cell_index(gr, mid)
            ids = jnp.where(live[:, None], gr.cell_ids[cidx], -1)
            cand = grid_tracer._test_candidates(g, ids, o, d, t_lo, t_hi,
                                                packed=pk)
            all_t = jnp.concatenate([carry["t"], cand["t"]], axis=1)
            all_idx = jnp.concatenate([carry["idx"], cand["idx"]], axis=1)
            all_alpha = jnp.concatenate([carry["alpha"], cand["alpha"]], 1)
            all_uv = jnp.concatenate([carry["uv"], cand["uv"]], axis=1)
            neg_top, sel = jax.lax.top_k(-all_t, 16)
            take = jnp.take_along_axis
            return {
                "t": -neg_top,
                "idx": take(all_idx, sel, axis=1),
                "alpha": take(all_alpha, sel, axis=1),
                "uv": take(all_uv, sel[..., None], axis=1),
            }, None

        out, _ = jax.lax.scan(body, init, jnp.arange(V))
        out["exhausted_v"] = exhausted
        return out
    t = timeit(jax.jit(twophase), geo, grid, packed_tbl, rays_o, rays_d,
               ready=lambda o: o["t"])
    print(f"a3. two-phase visit compaction (V={V}): {t*1e3:.1f} ms")

    # cross-check a3 == a (hit t/idx parity on this scene)
    ha = f_full(geo, grid, rays_o, rays_d)
    h3 = jax.jit(twophase)(geo, grid, packed_tbl, rays_o, rays_d)
    same = np.mean(np.asarray(ha["idx"]) == np.asarray(h3["idx"]))
    print(f"a3 vs a: idx match {same:.5f}, exhausted_v "
          f"{float(np.mean(np.asarray(h3['exhausted_v']))):.4f}")

    # b. candidate-id gathers for all steps
    cell = 1.0 / np.asarray(grid.inv_cell)
    dt = float(cell.min()) * 0.5

    def gathers(gr, o, d):
        acc = jnp.zeros((r,), jnp.int32)
        def body(acc, j):
            mid = o + (j * dt + 0.5 * dt) * d
            ids = grid_tracer._gather_candidates(gr, mid)
            return acc + ids.max(1), None
        acc, _ = jax.lax.scan(body, acc, jnp.arange(n_steps))
        return acc
    t = timeit(jax.jit(gathers), grid, rays_o, rays_d)
    print(f"b. cell-id gathers x{n_steps}: {t*1e3:.1f} ms")

    # c. _test_candidates once: current (7 gathers) vs packed single gather
    ids0 = grid_tracer._gather_candidates(grid, rays_o + 0.5 * dt * rays_d)
    tl = jnp.zeros((r,))
    th = jnp.full((r,), t_max)

    def test_now(g, i, o, d):
        return grid_tracer._test_candidates(g, i, o, d, tl, th)["t"]
    t = timeit(jax.jit(test_now), geo, ids0, rays_o, rays_d)
    print(f"c1. _test_candidates (7-field gather) once: {t*1e3:.2f} ms "
          f"-> x{n_steps} = {t*n_steps*1e3:.0f} ms")

    # packed variant: one [N+1, 32] table, rows [R, L, 32]
    packed = jnp.concatenate([
        geo.means, geo.scales, geo.rot.reshape(n, 9), geo.inv_cov,
        geo.normal, geo.opacity[:, None],
        geo.valid.astype(jnp.float32)[:, None],
        jnp.zeros((n, 32 - 26))], axis=1)
    packed = jnp.concatenate([packed, jnp.zeros((1, 32))], 0)

    def test_packed(p, i, o, d):
        idx = jnp.where(i >= 0, i, n)
        g = p[idx]                                   # [R, L, 32] row gather
        sub = tracing.SurfelGeometry(
            means=g[..., 0:3], scales=g[..., 3:6],
            rot=g[..., 6:15].reshape(g.shape[:-1] + (3, 3)),
            inv_cov=g[..., 15:21], normal=g[..., 21:24],
            opacity=g[..., 24], valid=g[..., 25] > 0)
        nrm = sub.normal
        denom = jnp.sum(nrm * d[:, None], -1)
        denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        t_plane = jnp.sum((sub.means - o[:, None]) * nrm, -1) / denom
        return t_plane
    t = timeit(jax.jit(test_packed), packed, ids0, rays_o, rays_d)
    print(f"c2. packed [N,32] single row gather + plane test: {t*1e3:.2f} ms")

    # d. top-k merge at scan shapes
    cand_t = jax.random.uniform(k[0], (r, grid.cell_cap))
    carry_t = jax.random.uniform(k[1], (r, 16))

    def merge(ct, kt):
        at = jnp.concatenate([kt, ct], axis=1)
        top = jax.lax.top_k(-at, 16)[0]
        return -top
    t = timeit(jax.jit(merge), cand_t, carry_t)
    print(f"d. top-k merge once: {t*1e3:.2f} ms -> x{n_steps} = "
          f"{t*n_steps*1e3:.0f} ms")


if __name__ == "__main__":
    main()
