"""Dense O(N * H * W) reference renderer — the correctness oracle.

Evaluates every Gaussian at every pixel in exact global depth order with the
same blend math as the tiled Pallas path (``ops/common.py``), including the
tile-rect containment test so tiled == dense exactly.  Differentiable by
plain autodiff (used to validate the hand-written Pallas VJP).

Corresponds to svgss ``renderCUDA`` (forward.cu:402-750) with the tile/sort
machinery replaced by a depth-ordered ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from svgir_tpu.config import RasterConfig
from svgir_tpu.ops import common
from svgir_tpu.ops.preprocess import Preprocessed


class RenderBuffers(NamedTuple):
    color: jax.Array      # [3, H, W]  (includes T*bg)
    normal: jax.Array     # [3, H, W] view-space
    depth: jax.Array      # [1, H, W]
    opacity: jax.Array    # [1, H, W] 1 - T
    feature: jax.Array    # [S, H, W]
    vfeature: jax.Array   # [VS/4, H, W]
    final_t: jax.Array    # [H, W]
    n_contrib: jax.Array  # [H, W] int32
    weights: jax.Array    # [N, 1] per-gaussian blended weight sums
    radii: jax.Array      # [N] int32 screen radii (0 = culled)
    # [] bool — true when the binner hit max_instances (or rect_cap overflow
    # truncated placement); splats were silently dropped this frame.  The
    # dense oracle never overflows (False).
    overflow: jax.Array = False


def render_dense(
    prep: Preprocessed,
    opacity: jax.Array,               # [N] activated opacity
    features: Optional[jax.Array],
    vfeatures: Optional[jax.Array],
    bg: jax.Array,
    *,
    width: int,
    height: int,
    cfg: RasterConfig = RasterConfig(),
) -> RenderBuffers:
    n = prep.mean2d.shape[0]
    S = 0 if features is None else features.shape[1]
    VS = 0 if vfeatures is None else vfeatures.shape[1]
    feats = jnp.zeros((n, 0)) if features is None else features
    vfeats = jnp.zeros((n, 0)) if vfeatures is None else vfeatures

    order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf),
                        stable=True)

    vv, uu = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    tile_x = (uu / cfg.tile).astype(jnp.int32)
    tile_y = (vv / cfg.tile).astype(jnp.int32)

    def step(carry, gid):
        logT, acc_c, acc_n, acc_d, acc_f, acc_vf, n_contrib = carry
        dx = prep.mean2d[gid, 0] - uu
        dy = prep.mean2d[gid, 1] - vv
        alpha, ok = common.splat_alpha(
            dx, dy, prep.conic[gid, 0], prep.conic[gid, 1], prep.conic[gid, 2],
            opacity[gid])
        in_rect = ((tile_x >= prep.rect_min[gid, 0]) &
                   (tile_x < prep.rect_max[gid, 0]) &
                   (tile_y >= prep.rect_min[gid, 1]) &
                   (tile_y < prep.rect_max[gid, 1]))
        ok = ok & in_rect & prep.valid[gid]

        t_before = jnp.exp(logT)
        contrib = ok & (logT >= common.LOG_T_EPS)
        w = jnp.where(contrib, alpha * t_before, 0.0)

        du0, du1 = common.tangent_offsets(
            dx, dy, prep.jinv[gid, 0], prep.jinv[gid, 1],
            prep.jinv[gid, 2], prep.jinv[gid, 3])
        if cfg.surface and cfg.per_pixel_depth:
            depth_px = prep.depth[gid] - common.depth_offset_z(
                du0, du1, prep.jinv[gid, 6], prep.jinv[gid, 9])
            w0, w1, w2, w3 = common.vertex_weights(
                du0, du1, prep.lam[gid, 0], prep.lam[gid, 1])
        else:
            depth_px = jnp.broadcast_to(prep.depth[gid], dx.shape)
            w0 = w1 = w2 = w3 = jnp.zeros_like(dx)

        acc_c = acc_c + w[None] * prep.rgb[gid][:, None, None]
        if cfg.surface:
            acc_n = acc_n + w[None] * prep.normal_view[gid][:, None, None]
        acc_d = acc_d + w * depth_px
        if S:
            acc_f = acc_f + w[None] * feats[gid][:, None, None]
        if VS:
            vf = vfeats[gid].reshape(VS // 4, 4)
            interp = (vf[:, 0][:, None, None] * w0 + vf[:, 1][:, None, None] * w1
                      + vf[:, 2][:, None, None] * w2 + vf[:, 3][:, None, None] * w3)
            acc_vf = acc_vf + w[None] * interp

        logT = logT + jnp.where(ok, jnp.log1p(-alpha), 0.0)
        n_contrib = n_contrib + contrib.astype(jnp.int32)
        return (logT, acc_c, acc_n, acc_d, acc_f, acc_vf, n_contrib), w.sum()

    init = (jnp.zeros((height, width)),
            jnp.zeros((3, height, width)),
            jnp.zeros((3, height, width)),
            jnp.zeros((height, width)),
            jnp.zeros((S, height, width)),
            jnp.zeros((VS // 4, height, width)),
            jnp.zeros((height, width), jnp.int32))
    (logT, acc_c, acc_n, acc_d, acc_f, acc_vf, n_contrib), w_sums = \
        jax.lax.scan(step, init, order)

    T = jnp.minimum(1.0 - 1e-6, jnp.exp(logT))
    color = acc_c + T[None] * bg[:, None, None]
    depth = common.finalize_depth(acc_d, T, cfg.normalize_depth)[None]
    # un-permute per-gaussian weight sums back to input order
    weights = jnp.zeros((n,)).at[order].set(w_sums)[:, None]
    return RenderBuffers(
        color=color, normal=acc_n, depth=depth, opacity=(1.0 - T)[None],
        feature=acc_f, vfeature=acc_vf, final_t=T, n_contrib=n_contrib,
        weights=weights, radii=prep.radius)
