"""Radiance baking + one-bounce consistency loss (the PBGI subsystem).

Replaces the Slang/slangtorch PBGI renderer (pbgi/renderer.py +
pbgi/bvhworkers/*.slang) with vectorized JAX over the tracing ops:

* ``bake_radiance``   == GaussianModel.update_radiace (gaussian_model.py:
  466-522): hemisphere-sample each surfel, march rays, store radiance /
  visibility / first-hit index / uv buffers.
* ``radiance_consistency_loss`` == get_radiance_loss (:544-575) +
  render_irradiance_sample (intersect_test.slang:1143-1378): fully
  differentiable gather + shading over the precomputed hit buffers
  (gradients reach albedo, roughness and the env map — normals and hit
  geometry are stopped, matching the Slang no_diff annotations).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from svgir_tpu.ops import tracing
from svgir_tpu.utils.graphics import fibonacci_sphere_sampling
from svgir_tpu.utils.transforms import normalize


# MODULE-LEVEL jits: bake_radiance is called repeatedly (stage-2 start,
# once per relight env, tests) — closures jitted inside its body rebuilt
# a fresh jit cache every call, so every "warm" bake re-traced and
# re-lowered the full march graph (~45 s of the r4 81 s warm bake).
# Scalars that shape the trace ride as hashable static kwargs instead.

@partial(jax.jit, static_argnames=("grid_t_max", "n_steps"))
def _probe_blocks(grid, po, pd, *, grid_t_max, n_steps):
    """[P, C] visit-block counts — the whole probe in ONE dispatch."""
    from svgir_tpu.ops import grid_tracer
    return jax.lax.map(
        lambda od: grid_tracer.count_visit_blocks(
            grid, od[0], od[1], t_max=grid_t_max, n_steps=n_steps),
        (po, pd))


@partial(jax.jit, static_argnames=("grid_t_max", "k_hits", "n_steps",
                                   "merge_every", "max_visits",
                                   "use_kernel"))
def _march_group(geo, grid, shs, means, o, d, si, *, grid_t_max, k_hits,
                 n_steps, merge_every, max_visits, use_kernel=False):
    """lax.map of the compacted march over a group of same-budget ray
    chunks — one dispatch per budget group."""
    from svgir_tpu.ops import grid_tracer

    def one(x):
        o1, d1, s1 = x
        hits = grid_tracer._nearest_hits_grid(
            geo, grid, o1, d1, t_max=grid_t_max, k=k_hits,
            n_steps=n_steps, max_visits=max_visits,
            merge_every=merge_every,
            kmax=grid_tracer._run_kmax(grid), use_kernel=use_kernel)
        out = tracing.radiance_march(hits, s1, shs, means, o1)
        # a clipped visit budget (never at the probed V, but callers may
        # pass their own) surfaces as exhaustion, like a full K-hit list
        out["exhausted"] = out["exhausted"] | hits["trunc"]
        return out

    return jax.lax.map(one, (o, d, si))


@partial(jax.jit, static_argnames=("gauss_chunk", "k_hits"))
def _march_brute(geo, shs, means, o, d, si, *, gauss_chunk, k_hits):
    hits = tracing.nearest_hits(geo, o, d, chunk=gauss_chunk, k=k_hits)
    return tracing.radiance_march(hits, si, shs, means, o)


def bake_radiance(means: jax.Array, scales: jax.Array, quats: jax.Array,
                  opacity: jax.Array, shs: jax.Array, *,
                  sample_num: int = 64, key: Optional[jax.Array] = None,
                  valid: Optional[jax.Array] = None, k_hits: int = 16,
                  ray_chunk: int = 16384, gauss_chunk: int = 512,
                  use_grid: Optional[bool] = None,
                  grid_t_max: Optional[float] = None,
                  merge_every: Optional[int] = None) -> Dict:
    """Trace hemisphere samples for every surfel.

    Returns dict: radiance [N,S,3], visibility [N,S,1], incident_dirs
    [N,S,3], incident_areas [N,S,1], hit_idx [N,S], uv [N,S,2],
    exhausted_frac [] (diagnostic).
    """
    n = means.shape[0]
    s = sample_num
    geo = tracing.build_surfel_geometry(means, scales, quats, opacity,
                                        valid=valid)
    dirs, areas = fibonacci_sphere_sampling(geo.normal, s, key=key)

    rays_o = jnp.repeat(means, s, axis=0)
    rays_d = dirs.reshape(-1, 3)
    self_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), s)

    outs = []
    r_total = n * s
    nchunks = -(-r_total // ray_chunk)

    # brute force is exact but O(N * rays); the uniform-grid tracer
    # (identical outputs, see ops/grid_tracer.py) is the default at any
    # real bake scale — brute force stays for tiny scenes and as the
    # parity oracle in tests
    if use_grid is None:
        use_grid = n >= 4096
    if grid_t_max is None:
        # march far enough to cross the whole scene: AABB diagonal of the
        # (alive) surfels + 3-sigma margin.  A fixed range silently stops
        # rays early on large scenes (the Slang march is unbounded,
        # intersect_test.slang:1928-1978).
        import numpy as np
        m_np = np.asarray(jax.device_get(means))
        if valid is not None:
            v_np = np.asarray(jax.device_get(valid)).astype(bool)
            m_np = m_np[v_np] if v_np.any() else m_np
        margin = 3.0 * float(np.asarray(jax.device_get(scales)).max())
        diag = float(np.linalg.norm(m_np.max(0) - m_np.min(0))) \
            if m_np.size else 1.0
        grid_t_max = max(diag + 2.0 * margin, 1e-3)
    grid = None
    if use_grid:
        from svgir_tpu.ops import grid_tracer
        import os as _os
        _res_env = _os.environ.get("SVGIR_BAKE_RES")
        res = int(_res_env) if _res_env else grid_tracer.auto_res(geo)
        grid = grid_tracer.build_grid_auto(geo, res=res, cell_cap=64,
                                           max_cells_per_gauss=64)
        # 8192-ray chunks measured fastest (r4: 32k chunks coarsen the
        # per-chunk visit budgets more than they amortize fixed overhead)
        ray_chunk = min(ray_chunk, 8192)
        nchunks = -(-r_total // ray_chunk)

    # geo / grid / shs / means are jit ARGUMENTS, not closure captures: a
    # closed-over jax.Array is inlined into the HLO as a literal constant,
    # and at real scale (1M surfels, 64-cap grid tables) the serialized
    # program blows past the remote-compile request limit (HTTP 413).
    if use_grid:
        from svgir_tpu.ops import grid_tracer
        # n_steps needs the CONCRETE grid (host-side); inside run the grid
        # is a traced argument
        n_steps = grid_tracer._concrete_n_steps(grid, grid_t_max)

        # exact visit budgets for the compacted march: probe each ray's
        # candidate-BLOCK count (cheap [R]-count scan), then SORT the rays
        # by it — each chunk then runs at its own snug bucketed budget
        # instead of every chunk paying the global worst ray (~3x on
        # typical scenes).  Outputs are unsorted at the end; the march
        # provably never truncates.  The probe is ONE dispatch
        # (lax.map over probe blocks): the r4 trace showed the warm bake
        # ~95% host/dispatch-bound (device ~6 s of an 81 s bake), so every
        # per-chunk python dispatch through the axon relay matters.
        probe_chunk = 131072
        npc = -(-r_total // probe_chunk)
        ppad = npc * probe_chunk - r_total
        po_all = jnp.pad(rays_o, ((0, ppad), (0, 0)))
        pd_all = jnp.pad(rays_d, ((0, ppad), (0, 0)), constant_values=1.0)
        counts = _probe_blocks(
            grid, po_all.reshape(npc, probe_chunk, 3),
            pd_all.reshape(npc, probe_chunk, 3),
            grid_t_max=grid_t_max, n_steps=n_steps).reshape(-1)[:r_total]
        order = jnp.argsort(counts)
        counts_sorted = jax.device_get(counts[order])
        rays_o = rays_o[order]
        rays_d = rays_d[order]
        self_idx = self_idx[order]

        def chunk_visits(i):
            # snug budget for chunk i, bucketed to the next power of two
            # (>=32): few distinct budgets -> few trace/compile variants
            # AND few dispatch groups (chunks sharing a budget dispatch as
            # ONE lax.map call below)
            hi = int(counts_sorted[min((i + 1) * ray_chunk, r_total) - 1])
            b = 32
            while b < hi:
                b *= 2
            return b

        if merge_every is None:
            import os
            merge_every = int(os.environ.get("SVGIR_BAKE_MERGE_EVERY", "1"))

    if use_grid:
        # group chunks sharing a (pow2-bucketed) budget and dispatch each
        # group as ONE jitted lax.map: ~4-6 dispatches total instead of
        # nchunks (391 at bench shapes — at ~150 ms host+relay overhead
        # per dispatch that WAS the bake wall-clock, not the device work)
        tail = nchunks * ray_chunk - r_total
        o_p = jnp.pad(rays_o, ((0, tail), (0, 0)))
        d_p = jnp.pad(rays_d, ((0, tail), (0, 0)), constant_values=1.0)
        si_p = jnp.pad(self_idx, (0, tail))
        budgets = [chunk_visits(i) for i in range(nchunks)]
        i = 0
        while i < nchunks:
            jx = i
            while jx < nchunks and budgets[jx] == budgets[i]:
                jx += 1
            g = jx - i
            sl = slice(i * ray_chunk, jx * ray_chunk)
            res = _march_group(geo, grid, shs, means,
                               o_p[sl].reshape(g, ray_chunk, 3),
                               d_p[sl].reshape(g, ray_chunk, 3),
                               si_p[sl].reshape(g, ray_chunk),
                               grid_t_max=grid_t_max, k_hits=k_hits,
                               n_steps=n_steps, merge_every=merge_every,
                               max_visits=budgets[i],
                               use_kernel=bool(grid.field_major))
            outs.append(jax.tree.map(
                lambda x: x.reshape((g * ray_chunk,) + x.shape[2:]), res))
            i = jx
        cat = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, 0)[:r_total], *outs)
    else:
        for i in range(nchunks):
            sl = slice(i * ray_chunk, min((i + 1) * ray_chunk, r_total))
            pad = ray_chunk - (sl.stop - sl.start)
            o = jnp.pad(rays_o[sl], ((0, pad), (0, 0)))
            d = jnp.pad(rays_d[sl], ((0, pad), (0, 0)), constant_values=1.0)
            si = jnp.pad(self_idx[sl], (0, pad))
            res = _march_brute(geo, shs, means, o, d, si,
                               gauss_chunk=gauss_chunk, k_hits=k_hits)
            outs.append(jax.tree.map(lambda x: x[:sl.stop - sl.start], res))
            if i % 16 == 15:
                # cap the async dispatch queue: hundreds of multi-second
                # chunk programs enqueued at once can wedge the transport
                jax.block_until_ready(res["radiance"])
        cat = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)
    if use_grid:
        # undo the visit-count ray sort
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0]))
        cat = jax.tree.map(lambda x: x[inv], cat)
    # equirect grid coords of the (constant) incident dirs, precomputed
    # once so per-step env lookups skip the dirs->uv math entirely
    # (models/lights.equirect_grid_coords)
    from svgir_tpu.models.lights import equirect_grid_coords
    qx, qy = equirect_grid_coords(dirs)
    return {
        "radiance": cat["radiance"].reshape(n, s, 3),
        "visibility": cat["visibility"].reshape(n, s, 1),
        "incident_dirs": dirs,
        "incident_areas": areas,
        "incident_qxy": jnp.stack([qx, qy], axis=-1),
        "hit_idx": cat["first_hit"].reshape(n, s),
        "uv": cat["first_uv"].reshape(n, s, 2),
        "exhausted_frac": cat["exhausted"].mean(),
    }


def shading_brdf_simple(view_dir, light_dir, normal, albedo, roughness):
    """pbr.slang:282-328 — diffuse albedo/pi + GGX (fresnel 0.04).
    All args broadcastable [..., 3] / [...]."""
    N = normalize(normal)
    V = normalize(view_dir)
    L = normalize(light_dir)
    H = normalize(V + L)
    NoL = jnp.clip(jnp.sum(N * L, -1, keepdims=True), 1e-6, 1)
    NoV = jnp.clip(jnp.sum(N * V, -1, keepdims=True), 1e-6, 1)
    NoH = jnp.clip(jnp.sum(N * H, -1, keepdims=True), 1e-6, 1)
    VoH = jnp.clip(jnp.sum(V * H, -1, keepdims=True), 1e-6, 1)
    alpha = roughness * roughness
    alpha2 = alpha * alpha
    k = (alpha + 2.0 * roughness + 1.0) / 8.0
    fmi = (-5.55473 * VoH - 6.98316) * VoH
    frac0 = 0.04 + 0.96 * jnp.power(2.0, fmi)
    frac = frac0 * alpha2
    nom0 = NoH * NoH * (alpha2 - 1.0) + 1.0
    nom1 = NoV * (1.0 - k) + k
    nom2 = NoL * (1.0 - k) + k
    nom = jnp.clip(4 * math.pi * nom0 * nom0 * nom1 * nom2, 1e-6, 4 * math.pi)
    return frac / nom + albedo / math.pi


def _hit_table(bake: Dict, env_term: jax.Array, vertex_normals: jax.Array,
               vertex_albedo: jax.Array, roughness: jax.Array) -> jax.Array:
    """[N, 9S+25] per-surfel row table for the one-bounce shading: the
    surfel's own secondary-sample set (dirs/hits/uv/env term) plus its
    vertex normals/albedo and roughness.  ONE wide row gather by first-hit
    index instead of seven narrow ones: ~14 KB rows gather near memory
    bandwidth where 12-288 B rows pay up to 42x (8,128)-tile read
    amplification; the VJP likewise becomes a single scatter-add
    (gradients flow to albedo / env_term through it)."""
    n = bake["hit_idx"].shape[0]
    return jnp.concatenate([
        bake["incident_dirs"].reshape(n, -1),                # 3S
        bake["hit_idx"].astype(jnp.float32),                 # S (exact i32)
        bake["uv"].reshape(n, -1),                           # 2S
        env_term.reshape(n, -1),                             # 3S
        jax.lax.stop_gradient(vertex_normals).reshape(n, -1),  # 12
        vertex_albedo.reshape(n, -1),                        # 12
        roughness[:, None],                                  # 1
    ], axis=1)


def _irradiance_from_table(table: jax.Array, pri_dir: jax.Array,
                           hit: jax.Array, s: int) -> jax.Array:
    """One-bounce irradiance for hits [N] with primary dirs [N, 3],
    reading the hit surfels' rows from ``table``.  Returns [N, 3]."""
    n = hit.shape[0]
    no_hit = hit < 0
    h = jnp.clip(hit, 0, table.shape[0] - 1)
    g = table[h]
    o = 0

    def take(cols, shape):
        nonlocal o
        v = g[:, o:o + cols].reshape((n,) + shape)
        o += cols
        return v
    sec_dirs = normalize(take(3 * s, (s, 3)))                # [N,S,3]
    sec_hit = take(s, (s,))
    unoccluded = sec_hit < 0
    uv = take(2 * s, (s, 2))                                 # [N,S,2]
    env_term_h = take(3 * s, (s, 3))                         # [N,S,3]
    normals_h = take(12, (4, 3))                             # [N,4,3]
    albedo_h = take(12, (4, 3))                              # [N,4,3]
    rough_h = take(1, (1, 1, 1))                             # [N,1,1,1]

    w0 = (1 - uv[..., 0]) * (1 - uv[..., 1])
    w1 = uv[..., 0] * (1 - uv[..., 1])
    w2 = (1 - uv[..., 0]) * uv[..., 1]
    w3 = uv[..., 0] * uv[..., 1]
    wv = jnp.stack([w0, w1, w2, w3], -1)                     # [N,S,4]

    irr_v = shading_brdf_simple(
        -pri_dir[:, None, None], sec_dirs[:, :, None],
        normals_h[:, None], albedo_h[:, None], rough_h)      # [N,S,4,3]
    irr = jnp.sum(wv[..., None] * irr_v, axis=2)             # [N,S,3]

    contrib = irr * env_term_h / s                           # [N,S,3]
    contrib = jnp.where(unoccluded[..., None], contrib, 0.0)
    total = contrib.sum(axis=1)
    return jnp.where(no_hit[:, None], 0.0, total)


def irradiance_sample(sample_idx: jax.Array, bake: Dict, env_term: jax.Array,
                      vertex_normals: jax.Array, vertex_albedo: jax.Array,
                      roughness: jax.Array) -> jax.Array:
    """One-bounce irradiance at one chosen sample per surfel
    (render_irradiance_sample, intersect_test.slang:1143-1378).

    Args:
      sample_idx [N] int — chosen primary sample per gaussian.
      bake: buffers from bake_radiance.
      env_term [N,S,3] — env.direct_light(incident_dirs) * incident_areas.
      vertex_normals [N,4,3] (grad-stopped), vertex_albedo [N,4,3],
      roughness [N] (vertex-0 roughness, matching `roughnesses[hit, 0]`).

    Returns irradiance [N, 3].
    """
    n, s = bake["hit_idx"].shape
    gidx = jnp.arange(n)
    pri_dir = bake["incident_dirs"][gidx, sample_idx]        # [N,3]
    hit = bake["hit_idx"][gidx, sample_idx]                  # [N]
    table = _hit_table(bake, env_term, vertex_normals, vertex_albedo,
                       roughness)
    return _irradiance_from_table(table, pri_dir, hit, s)


def radiance_consistency_loss(params, bake: Dict, cam_center: jax.Array,
                              env_direct_light, *, alive=None,
                              env_radiance=None) -> jax.Array:
    """get_radiance_loss (gaussian_model.py:544-575): pick the sample
    maximizing (reflect(view) . dir) * (1 - visibility), trace the
    differentiable one-bounce there, L1 against the stored radiance.

    ``env_radiance``: optional pre-evaluated env_direct_light(incident_
    dirs), shared with rendering_equation4's lookup by the stage-2 step
    (one [N*S]-query evaluation per step instead of two)."""
    from svgir_tpu.models import gaussians as G

    xyz = params["xyz"]
    n = xyz.shape[0]
    if env_radiance is None:
        env_radiance = env_direct_light(bake["incident_dirs"])
    env_term = env_radiance * bake["incident_areas"]

    view_dirs = normalize(xyz - cam_center[None])
    geo_n = G.get_geo_normal(params)
    view_reflect = 2 * jnp.sum(geo_n * view_dirs, -1, keepdims=True) * geo_n \
        + view_dirs
    n_d_i = jnp.sum(bake["incident_dirs"] * view_reflect[:, None], -1)
    occ = 1 - bake["visibility"][..., 0]
    sample_idx = jnp.argmax(n_d_i * occ, axis=-1)

    vertex_normals = G.get_shading_normal(params)            # [N,4,3]
    # albedo [N,12] channel-major -> [N,4,3] vertex-major
    albedo = G.get_base_color(params).reshape(n, 3, 4).transpose(0, 2, 1)
    roughness = G.get_roughness(params)[:, 0]

    irr = irradiance_sample(sample_idx, bake, env_term, vertex_normals,
                            albedo, roughness)

    radiances = G.get_radiances(params)                      # [N,S,3]
    target = radiances[jnp.arange(n), sample_idx]
    err = jnp.abs(irr - target)
    if alive is not None:
        return jnp.where(alive[:, None], err, 0.0).sum() / (
            jnp.maximum(alive.sum(), 1) * 3)
    return err.mean()


def irradiance_full(bake: Dict, env_term: jax.Array,
                    vertex_normals: jax.Array, vertex_albedo: jax.Array,
                    roughness: jax.Array, *, chunk: int = 8) -> jax.Array:
    """One-bounce irradiance for EVERY primary sample — the Slang
    ``render_irradiance`` (intersect_test.slang:904+, full-S variant of
    irradiance_sample), used to re-bake ``_radiances`` under a new light at
    relighting eval (calculate_radiance, gaussian_model.py:530-542).

    The [N, 9S+25] hit table is built ONCE and the primary-sample loop
    runs on-device (``lax.map`` over sample blocks) — the r3 version
    rebuilt the full table per sample index, 384 concat+gather round trips
    at relight-eval scale (VERDICT r3 weakness 6).

    Returns [N, S, 3].
    """
    n, s = bake["hit_idx"].shape
    table = _hit_table(bake, env_term, vertex_normals, vertex_albedo,
                       roughness)
    pad = (-s) % chunk
    samples = jnp.arange(s + pad) % s                        # wrap padding

    def block(ps):
        def one(p):
            return _irradiance_from_table(
                table, bake["incident_dirs"][:, p], bake["hit_idx"][:, p], s)
        return jax.vmap(one, out_axes=1)(ps)                 # [N, chunk, 3]

    out = jax.lax.map(block, samples.reshape(-1, chunk))     # [B, N, c, 3]
    out = jnp.moveaxis(out, 0, 1).reshape(n, s + pad, 3)
    return out[:, :s]
