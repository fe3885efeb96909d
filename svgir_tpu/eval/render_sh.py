"""Debug ray-traced SH render — the reference's ``render_SH`` utility.

Renders the scene by RAY TRACING the surfel soup with the sampling-SH
march instead of rasterizing it (reference: the render_SH kernel in
``pbgi/bvhworkers/intersect_test.slang:1995+``, exposed through
``pbgi/renderer.py``'s debug path).  Per pixel: a primary camera ray,
k-nearest accepted ellipse hits, then the same sliding-window SH
composite the radiance bake uses (``ops/tracing.radiance_march``) — so
this image is a direct visualization of exactly what the PBGI bake
"sees", which is the point of the debug mode.

TPU-natively this is the grid tracer's compacted march over pixel-ray
chunks (no LBVH; ``ops/grid_tracer.py``), or the brute-force chunked
MXU sweep for tiny scenes — identical outputs, tested against each
other elsewhere (tests/test_grid_tracer.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from svgir_tpu.ops import grid_tracer, tracing

# the debug kernel marches UNBOUNDED windows from the camera (reference
# intersect_test.slang:2022-2024: t_min 0.01 after each hit, t_max 1e9),
# unlike the bake's sliding 0.2-window — primary hits sit at scene scale
_CAMERA_WINDOWS = dict(t_min_first=0.01, t_min_next=0.01, t_window=1e9)


def render_sh_image(means, scales, quats, opacity, shs, camera, *,
                    valid=None, k_hits: int = 16, ray_chunk: int = 16384,
                    gauss_chunk: int = 512,
                    use_grid: Optional[bool] = None,
                    bg: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Ray-trace the SH radiance field through ``camera``.

    Returns dict: ``render`` [3, H, W] (march radiance over background),
    ``visibility`` [1, H, W], ``hit`` [H, W] int32 (first surfel id, -1
    for miss), ``t`` [H, W] (first-hit distance, inf for miss).
    """
    h, w = camera.height, camera.width
    geo = tracing.build_surfel_geometry(means, scales, quats, opacity,
                                        valid=valid)
    rays_d = camera.world_directions().reshape(3, -1).T          # [R, 3]
    rays_o = jnp.broadcast_to(camera.camera_center[None], rays_d.shape)
    r_total = h * w
    # primary rays have no source surfel: self_index -1 never matches
    no_self = jnp.full((r_total,), -1, jnp.int32)

    n = means.shape[0]
    if use_grid is None:
        use_grid = n * r_total > (1 << 22)

    if use_grid:
        grid = grid_tracer.build_grid_auto(geo)
        # camera sits outside the scene AABB: the march must reach the far
        # side (empty cells before the grid cost only the occupancy probe)
        t_max = float(jnp.max(jnp.linalg.norm(
            means - camera.camera_center[None], axis=-1))) * 1.2

        def run(o, d, si):
            hits = grid_tracer.nearest_hits_grid(geo, grid, o, d,
                                                 t_max=t_max, k=k_hits)
            return tracing.radiance_march(hits, si, shs, means, o,
                                          **_CAMERA_WINDOWS)
    else:
        def run(o, d, si):
            hits = tracing.nearest_hits(geo, o, d, chunk=gauss_chunk,
                                        k=k_hits)
            return tracing.radiance_march(hits, si, shs, means, o,
                                          **_CAMERA_WINDOWS)

    run = jax.jit(run)
    outs = []
    nchunks = -(-r_total // ray_chunk)
    pad = nchunks * ray_chunk - r_total
    o_p = jnp.concatenate([rays_o, jnp.zeros((pad, 3))], 0)
    d_p = jnp.concatenate([rays_d, jnp.ones((pad, 3))], 0)
    s_p = jnp.concatenate([no_self, jnp.full((pad,), -1, jnp.int32)], 0)
    for i in range(nchunks):
        sl = slice(i * ray_chunk, (i + 1) * ray_chunk)
        outs.append(run(o_p[sl], d_p[sl], s_p[sl]))
    cat = {k: jnp.concatenate([o[k] for o in outs], 0)[:r_total]
           for k in outs[0]}

    radiance = cat["radiance"].T.reshape(3, h, w)              # [3, H, W]
    vis = cat["visibility"].T.reshape(1, h, w)
    first = cat["first_hit"].reshape(h, w)
    if bg is not None:
        miss = (first < 0)[None]
        radiance = jnp.where(miss, bg[:, None, None], radiance)
    # first-hit distance: re-derive from the march output is not stored;
    # report inf for misses, else distance to the first surfel's center
    hit_c = means[jnp.clip(first.reshape(-1), 0, n - 1)]
    t = jnp.where(first.reshape(-1) >= 0,
                  jnp.linalg.norm(hit_c - rays_o, axis=-1),
                  jnp.inf).reshape(h, w)
    return {"render": radiance, "visibility": vis, "hit": first, "t": t}
