"""Per-Gaussian rasterization preprocess (projection, EWA cov2D, local
homography) — pure vectorized JAX, differentiable end-to-end.

Reference: svgss ``forward.cu preprocessCUDA`` (:228-396) and ``auxiliary.h``
(``in_frustum`` :146, ``front_facing`` :173, ``local_homo`` :291-388,
``computeCov2D`` forward.cu:74-139).  The CUDA kernel early-returns to cull;
we carry a ``valid`` mask instead (XLA-friendly), with all math evaluated
defensively (guarded divisions) so masked lanes never produce NaN/Inf that
could leak through autodiff.

All functions operate on the full [N] batch at once.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from svgir_tpu.config import RasterConfig
from svgir_tpu.utils import sh as sh_utils
from svgir_tpu.utils.transforms import quat_to_rotmat


class Preprocessed(NamedTuple):
    """Per-Gaussian quantities consumed by binning + blending."""

    valid: jax.Array      # [N] bool — survives all culls
    mean2d: jax.Array     # [N, 2] pixel coords
    depth: jax.Array      # [N] view-space z
    conic: jax.Array      # [N, 3] inverse 2D covariance (xx, xy, yy)
    radius: jax.Array     # [N] int32 screen radius (0 if culled)
    rect_min: jax.Array   # [N, 2] int32 tile coords (x, y)
    rect_max: jax.Array   # [N, 2] int32 tile coords (exclusive)
    tiles_touched: jax.Array  # [N] int32
    normal_view: jax.Array    # [N, 3] view-space geometric normal
    jinv: jax.Array       # [N, 10] screen->tangent map + tangent axes
    lam: jax.Array        # [N, 2] scale.xy ("lambda", forward.cu:394)
    rgb: jax.Array        # [N, 3] SH-evaluated color (if shs given)
    view_cos: jax.Array   # [N] dot(p_view, n_view)


def _mat3(m44: jax.Array) -> jax.Array:
    return m44[:3, :3]


def preprocess(
    means3d: jax.Array,          # [N, 3]
    scales: jax.Array,           # [N, 3]
    quats: jax.Array,            # [N, 4] w-first (normalized inside)
    world_view: jax.Array,       # [4, 4] math convention
    full_proj: jax.Array,        # [4, 4]
    campos: jax.Array,           # [3]
    *,
    width: int,
    height: int,
    tanfovx: float,
    tanfovy: float,
    focal_x: float,
    focal_y: float,
    shs: Optional[jax.Array] = None,   # [N, K, 3]
    sh_degree: int = 3,
    active_sh_degree=None,             # traced scalar: SH-degree ramp mask
    colors: Optional[jax.Array] = None,  # [N, 3] precomputed (overrides shs)
    patch_bbox: Optional[jax.Array] = None,  # [4] (y0, x0, y1, x1) pixels
    scale_modifier: float = 1.0,
    cfg: RasterConfig = RasterConfig(),
) -> Preprocessed:
    n = means3d.shape[0]
    tile = cfg.tile
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile

    # ---- projection (forward.cu:277-285) ----------------------------------
    ones = jnp.ones((n, 1), means3d.dtype)
    p_hom = jnp.concatenate([means3d, ones], -1) @ full_proj.T   # [N, 4]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]
    p_view = jnp.concatenate([means3d, ones], -1) @ world_view.T
    p_view = p_view[:, :3]

    # ndc2Pix (auxiliary.h:42-46)
    px = ((p_proj[:, 0] + 1.0) * width - 1.0) * 0.5
    py = ((p_proj[:, 1] + 1.0) * height - 1.0) * 0.5
    mean2d = jnp.stack([px, py], -1)

    # ---- frustum cull (auxiliary.h:146-171) -------------------------------
    if patch_bbox is None:
        patch_bbox = jnp.array([0.0, 0.0, float(height), float(width)])
    y0, x0, y1, x1 = patch_bbox[0], patch_bbox[1], patch_bbox[2], patch_bbox[3]
    bw, bh = x1 - x0, y1 - y0
    expand = 0.2
    valid = (p_view[:, 2] >= 0) \
        & (px >= x0 - bw * expand) & (px < x1 + bw * expand) \
        & (py >= y0 - bh * expand) & (py < y1 + bh * expand)

    # ---- orientation (forward.cu:287-319) ---------------------------------
    R = quat_to_rotmat(quats)                       # [N, 3, 3]
    W = _mat3(world_view)                           # view rotation
    n_view = R[..., :, 2] @ W.T                     # W @ R[:,2] per gaussian
    ax0_view = R[..., :, 0] @ W.T
    ax1_view = R[..., :, 1] @ W.T

    view_cos = jnp.sum(p_view * n_view, -1)
    if cfg.surface:
        valid &= view_cos <= -0.01                  # front_facing: cull dot > -0.01

    # ---- local homography (auxiliary.h:291-388) ---------------------------
    jinv, grazing = _local_homo(p_view, n_view, focal_x, focal_y,
                                ax0_view, ax1_view)
    if cfg.surface and cfg.per_pixel_depth:
        valid &= ~grazing

    # ---- covariance (forward.cu:186-226, 74-139) --------------------------
    s = scales * scale_modifier
    if cfg.surface:
        s = s.at[:, 2].set(0.0)
    M = R * s[:, None, :]
    cov3d = M @ jnp.swapaxes(M, -1, -2)             # [N, 3, 3] world Sigma

    cov2d = _ewa_cov2d(p_view, cov3d, W, focal_x, focal_y, tanfovx, tanfovy)
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    valid &= det != 0.0
    det_safe = jnp.where(det == 0, 1.0, det)
    conic = jnp.stack([cov2d[:, 2], -cov2d[:, 1], cov2d[:, 0]], -1) / det_safe[:, None]

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # ---- tile rect (auxiliary.h:53-63) ------------------------------------
    rmin_x = jnp.clip(((px - radius) / tile).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((py - radius) / tile).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(((px + radius + tile - 1) / tile).astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(((py + radius + tile - 1) / tile).astype(jnp.int32), 0, grid_y)
    tiles_touched = (rmax_x - rmin_x) * (rmax_y - rmin_y)
    valid &= tiles_touched > 0

    radius = jnp.where(valid, radius, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid, tiles_touched, 0)

    # ---- color (forward.cu:20-71) -----------------------------------------
    if colors is not None:
        rgb = colors
    elif shs is not None:
        dirs = means3d - campos[None]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        rgb = sh_utils.sh_to_rgb_clamped(
            sh_degree, jnp.swapaxes(shs, -1, -2), dirs,
            active_degree=active_sh_degree)
    else:
        rgb = jnp.zeros((n, 3), means3d.dtype)

    return Preprocessed(
        valid=valid, mean2d=mean2d, depth=p_view[:, 2], conic=conic,
        radius=radius,
        rect_min=jnp.stack([rmin_x, rmin_y], -1),
        rect_max=jnp.stack([rmax_x, rmax_y], -1),
        tiles_touched=tiles_touched,
        normal_view=n_view, jinv=jinv, lam=s[:, :2],
        rgb=rgb, view_cos=view_cos)


def _ewa_cov2d(p_view: jax.Array, cov3d: jax.Array, W: jax.Array,
               fx: float, fy: float, tanx: float, tany: float) -> jax.Array:
    """EWA screen-space covariance (forward.cu computeCov2D :74-139).

    Returns [N, 3] = (xx, xy, yy) with the +0.3 low-pass dilation applied.
    """
    tz = p_view[:, 2]
    tz_safe = jnp.where(tz == 0, 1e-6, tz)
    lim_x, lim_y = 1.3 * tanx, 1.3 * tany
    tx = jnp.clip(p_view[:, 0] / tz_safe, -lim_x, lim_x) * tz
    ty = jnp.clip(p_view[:, 1] / tz_safe, -lim_y, lim_y) * tz
    tz2 = tz_safe * tz_safe

    # J: 2x3 Jacobian of (view -> pixel) at the mean
    zeros = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([fx / tz_safe, zeros, -fx * tx / tz2], -1),
        jnp.stack([zeros, fy / tz_safe, -fy * ty / tz2], -1),
    ], axis=-2)                                   # [N, 2, 3]
    T = J @ W[None]                               # [N, 2, 3]
    cov = T @ cov3d @ jnp.swapaxes(T, -1, -2)     # [N, 2, 2]
    return jnp.stack([cov[:, 0, 0] + 0.3, cov[:, 0, 1], cov[:, 1, 1] + 0.3], -1)


def _local_homo(p_view: jax.Array, n_view: jax.Array, fx: float, fy: float,
                ax0: jax.Array, ax1: jax.Array):
    """Screen-unit -> tangent-plane differential map (auxiliary.h local_homo
    :291-388).

    Returns (jinv [N, 10], grazing [N] bool).  Layout: [J0 J1 J2 J3,
    u0(3), u1(3)] where dif_u = Jinv_2x2 @ d_screen and
    pos_dif = dif_u[0]*u0 + dif_u[1]*u1 (auxiliary.h:390-403).
    """
    s_fix = 1000.0
    svp = (fx + fy) / 2.0
    pz = jnp.where(p_view[:, 2] == 0, 1e-6, p_view[:, 2])
    prj_xy = p_view[:, :2] / pz[:, None]

    def unit_dir(offset_axis):
        d = jnp.stack([prj_xy[:, 0], prj_xy[:, 1], jnp.ones_like(pz)], -1)
        d = d.at[:, offset_axis].add(1.0 / s_fix)
        mod = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-8)
        return d / mod[:, None], mod

    dir_x0, mod0 = unit_dir(0)
    dir_x1, mod1 = unit_dir(1)

    prj_x0 = jnp.sum(dir_x0 * n_view, -1)
    prj_x1 = jnp.sum(dir_x1 * n_view, -1)
    thrsh = 0.01
    grazing = (jnp.abs(prj_x0 / mod0) < thrsh) | (jnp.abs(prj_x1 / mod1) < thrsh)

    t_temp = jnp.sum(p_view * n_view, -1)
    prj_x0s = jnp.where(prj_x0 == 0, 1e-8, prj_x0)
    prj_x1s = jnp.where(prj_x1 == 0, 1e-8, prj_x1)
    xu0 = dir_x0 * (t_temp / prj_x0s)[:, None] - p_view
    xu1 = dir_x1 * (t_temp / prj_x1s)[:, None] - p_view

    # tangent basis = view-space surfel axes (auxiliary.h:357-363)
    scale_back = svp / s_fix
    j0 = jnp.sum(xu0 * ax0, -1) / scale_back
    j1 = jnp.sum(xu1 * ax0, -1) / scale_back
    j2 = jnp.sum(xu0 * ax1, -1) / scale_back
    j3 = jnp.sum(xu1 * ax1, -1) / scale_back
    jinv = jnp.concatenate(
        [jnp.stack([j0, j1, j2, j3], -1), ax0, ax1], axis=-1)
    return jinv, grazing
