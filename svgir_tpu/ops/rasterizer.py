"""Public rasterizer API: preprocess -> binning -> Pallas blend -> assembly.

This is the TPU-native equivalent of the reference's
``GaussianRasterizer.forward`` + ``_RasterizeGaussians`` autograd.Function
(``gaussian_renderer/svgss_rasterization.py:90-310``): a differentiable pure
function from per-Gaussian parameters to image-space buffers.  The
``jax.custom_vjp`` boundary wraps only the Pallas blend; projection,
covariance, shading-feature packing and final image assembly are plain JAX
and differentiate automatically (replacing the hand-derived cov2D/SH
backward chains of backward.cu:163-526 with autodiff).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from svgir_tpu.config import RasterConfig
from svgir_tpu.ops import blend_pallas, blend_pallas_strip, common
from svgir_tpu.ops.binning import (bin_instances,
    bin_instances_counting, pad_to_chunks)
from svgir_tpu.ops.dense_ref import RenderBuffers
from svgir_tpu.ops.preprocess import Preprocessed, preprocess


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
def _make_blend(ca, cv, num_tiles, grid_x, tile, chunk, interpret,
                wgrad=True):
    kw = dict(ca=ca, cv=cv, num_tiles=num_tiles, grid_x=grid_x, tile=tile,
              chunk=chunk, interpret=interpret)

    def _wsum_inst(wsum, slab):
        return blend_pallas.wsum_to_instances(wsum, slab.shape[0], chunk)

    @jax.custom_vjp
    def blend(slab, tile_start, tile_count, inst_valid):
        out, wsum = blend_pallas.blend_forward(slab, tile_start, tile_count,
                                               **kw)
        return out, jnp.where(inst_valid[None, :], _wsum_inst(wsum, slab),
                              0.0)

    def blend_fwd(slab, tile_start, tile_count, inst_valid):
        out, wsum = blend_pallas.blend_forward(slab, tile_start, tile_count,
                                               **kw)
        wsum = jnp.where(inst_valid[None, :], _wsum_inst(wsum, slab), 0.0)
        meta = out[:, ca + cv:ca + cv + 3, :]
        return (out, wsum), (slab, tile_start, tile_count, inst_valid, meta)

    def blend_bwd(res, cotangents):
        slab, tile_start, tile_count, inst_valid, meta = res
        g_out, g_wsum = cotangents
        if wgrad:
            g_wsum = jnp.where(inst_valid[None, :], g_wsum, 0.0)
            g_wsum = blend_pallas.wsum_from_instances(g_wsum, chunk)
        else:
            g_wsum = None
        d_slab = blend_pallas.blend_backward(
            slab, tile_start, tile_count, g_out, meta, g_wsum, **kw)
        d_slab = jnp.where(inst_valid[:, None], d_slab, 0.0)
        return d_slab, None, None, None

    blend.defvjp(blend_fwd, blend_bwd)
    return blend


def _strip_order(x: jax.Array, gy: int, gx: int, spt: int) -> jax.Array:
    """Reorder a [gy*gx] per-tile array into padded strip order: rows padded
    on x to ``strips_x*spt`` columns (fill 0 = empty tile), flattened so the
    strip kernels' linear subtile index walks it sequentially."""
    sx = -(-gx // spt)
    a = x.reshape(gy, gx)
    a = jnp.pad(a, ((0, 0), (0, sx * spt - gx)))
    return a.reshape(-1)


@functools.lru_cache(maxsize=None)
def _make_blend_gather_strip(ca, cv, gy, grid_x, tile, chunk, n, spt,
                             interpret, wgrad=True, need_weights=True):
    """Strip-layout twin of ``_make_blend_gather``: the Pallas kernels read/
    write IMAGE-layout blocks directly (see blend_pallas_strip), so the
    [T, CO, 256] <-> [CO, H, W] assembly transposes disappear on both sides
    of the custom-VJP boundary.  ``tile_start``/``tile_count`` must already
    be in padded strip order (``_strip_order``)."""
    kw = dict(ca=ca, cv=cv, gy=gy, grid_x=grid_x, tile=tile, chunk=chunk,
              spt=spt, interpret=interpret)

    def _safe_idx(gid):
        return jnp.where(gid >= 0, gid, n)

    def _scatter_reduce_ext(x_inst, gid):
        out = jnp.zeros((n + 1,) + x_inst.shape[1:], x_inst.dtype)
        return out.at[_safe_idx(gid)].add(x_inst)

    def _fwd_weights(wsum, gid):
        if not need_weights:
            return jnp.zeros((n,), jnp.float32)
        wsum = blend_pallas.wsum_to_instances(wsum, gid.shape[0], chunk)
        return _scatter_reduce_ext(wsum[0], gid)[:n]

    @jax.custom_vjp
    def blend(slab_rows, gid, tile_start, tile_count):
        slab = slab_rows[_safe_idx(gid)]
        img, _, wsum = blend_pallas_strip.blend_forward_strip(
            slab, tile_start, tile_count, emit_wsum=need_weights, **kw)
        return img, _fwd_weights(wsum, gid)

    def blend_fwd(slab_rows, gid, tile_start, tile_count):
        slab = slab_rows[_safe_idx(gid)]
        img, eff, wsum = blend_pallas_strip.blend_forward_strip(
            slab, tile_start, tile_count, emit_wsum=need_weights, **kw)
        logt_img = img[ca + cv:ca + cv + 1]
        res = (slab, gid, tile_start, tile_count, logt_img, eff)
        return (img, _fwd_weights(wsum, gid)), res

    def blend_bwd(res, cotangents):
        (slab, gid, tile_start, tile_count, logt_img, eff) = res
        g_img, g_weights = cotangents
        if wgrad:
            g_ext = jnp.concatenate([g_weights, jnp.zeros((1,))])
            g_wsum = blend_pallas.wsum_from_instances(
                g_ext[_safe_idx(gid)][None], chunk)
        else:
            g_wsum = None
        d_inst = blend_pallas_strip.blend_backward_strip(
            slab, tile_start, tile_count, g_img, logt_img, eff, g_wsum, **kw)
        kr_real = 12 + ca + 4 * cv
        w = min(d_inst.shape[1], -(-kr_real // 32) * 32)
        d_rows_w = _scatter_reduce_ext(d_inst[:, :w], gid)
        d_rows = jnp.pad(d_rows_w, ((0, 0), (0, d_inst.shape[1] - w)))
        return (d_rows, None, None, None)

    blend.defvjp(blend_fwd, blend_bwd)
    return blend


@functools.lru_cache(maxsize=None)
def _make_blend_gather(ca, cv, num_tiles, grid_x, tile, chunk, n, m, rc,
                       interpret, wgrad=True, need_weights=True):
    """Blend wrapper for the counting binner: the custom-VJP boundary covers
    instance gather + kernel, and the backward reduces per-instance
    gradients to per-gaussian rows with one scatter-add over the instances'
    gaussian ids (measured faster on TPU than gathering each gaussian's
    slot positions: XLA sorts the indices and streams the adds, ~7.4 ms vs
    ~20 ms for the gather+permute formulation at bench shapes).

    ``slab_rows`` arrives with one extra all-zero row (index ``n``); padding
    slots gather that row (opacity 0 -> kernel skip) and their gradients
    scatter back into it, so no [M, KR]-sized select passes are needed on
    either side.  ``wgrad=False`` drops the weights-cotangent path entirely
    (the CUDA out_weights buffer is likewise non-differentiable)."""
    kw = dict(ca=ca, cv=cv, num_tiles=num_tiles, grid_x=grid_x, tile=tile,
              chunk=chunk, interpret=interpret)

    def _safe_idx(gid):
        # padding slots carry gid == -1 -> route to the zero row n
        return jnp.where(gid >= 0, gid, n)

    def _instance_slab(slab_rows, gid):
        return slab_rows[_safe_idx(gid)]               # [M, KR] row gather

    def _scatter_reduce_ext(x_inst, gid):
        """Sum per-instance values into per-gaussian rows (original gaussian
        index space — gid carries original ids).  Tile-run padding slots
        land in the sacrificial row n (the kernel can emit nonzero
        opacity-row gradients for them: d alpha / d opacity = exp(-q) even
        at opacity 0); callers slice or keep that row as needed."""
        out = jnp.zeros((n + 1,) + x_inst.shape[1:], x_inst.dtype)
        return out.at[_safe_idx(gid)].add(x_inst)

    def _fwd_weights(wsum, gid):
        # per-gaussian blend-weight sums (out_weights, forward.cu:653) feed
        # densification stats only; callers that never densify skip the
        # in-kernel writebacks AND this [M]->[N] scatter
        if not need_weights:
            return jnp.zeros((n,), jnp.float32)
        wsum = blend_pallas.wsum_to_instances(wsum, gid.shape[0], chunk)
        return _scatter_reduce_ext(wsum[0], gid)[:n]

    @jax.custom_vjp
    def blend(slab_rows, gid, tile_start, tile_count):
        slab = _instance_slab(slab_rows, gid)
        out, wsum = blend_pallas.blend_forward(slab, tile_start, tile_count,
                                               emit_wsum=need_weights, **kw)
        return out, _fwd_weights(wsum, gid)

    def blend_fwd(slab_rows, gid, tile_start, tile_count):
        slab = _instance_slab(slab_rows, gid)
        out, wsum = blend_pallas.blend_forward(slab, tile_start, tile_count,
                                               emit_wsum=need_weights, **kw)
        meta = out[:, ca + cv:ca + cv + 3, :]
        # residual is the GATHERED slab, not (slab_rows, gid)-to-regather:
        # the [M, KR] row gather runs at ~64 GB/s (8x tile-read
        # amplification) and would cost a second ~4 ms pass in the backward
        res = (slab, gid, tile_start, tile_count, meta)
        return (out, _fwd_weights(wsum, gid)), res

    def blend_bwd(res, cotangents):
        (slab, gid, tile_start, tile_count, logt) = res
        g_out, g_weights = cotangents
        if wgrad:
            # per-instance wsum cotangent = its gaussian's weights cotangent
            g_ext = jnp.concatenate([g_weights, jnp.zeros((1,))])
            g_wsum = blend_pallas.wsum_from_instances(
                g_ext[_safe_idx(gid)][None], chunk)
        else:
            g_wsum = None
        d_inst = blend_pallas.blend_backward(
            slab, tile_start, tile_count, g_out, logt, g_wsum, **kw)
        # padding-slot gradients land in the sacrificial row n; the caller's
        # row-pad VJP slices it off, so no masking pass is needed.  Only the
        # first kr_real columns carry gradients — scatter those and re-pad.
        # (A gather-to-gaussian-major + sorted segment_sum formulation
        # measured WORSE, 49.7 vs 45.7 ms: XLA ignores indices_are_sorted
        # on TPU and the permute gather is pure overhead.)
        kr_real = 12 + ca + 4 * cv
        w = min(d_inst.shape[1], -(-kr_real // 32) * 32)
        d_rows_w = _scatter_reduce_ext(d_inst[:, :w], gid)
        d_rows = jnp.pad(d_rows_w, ((0, 0), (0, d_inst.shape[1] - w)))
        return (d_rows, None, None, None)

    blend.defvjp(blend_fwd, blend_bwd)
    return blend


def _pack_slab(prep: Preprocessed, opacity: jax.Array,
               features: Optional[jax.Array],
               vfeatures: Optional[jax.Array],
               cfg: RasterConfig) -> tuple[jax.Array, int, int]:
    """Per-Gaussian slab [KR, N]: geometry rows + plain channels + vertex
    channels (see blend_pallas module docstring for the row layout).

    The per-pixel depth correction (forward.cu:563-576 depth_differencing)
    is affine in the pixel: depth_px = adepth + px*c1 + py*c2 with
    c1 = j0*u0z + j2*u1z, c2 = j1*u0z + j3*u1z — folded into three plain
    channels so depth blending rides the same MXU matmul.
    """
    n = prep.mean2d.shape[0]
    x, y = prep.mean2d[:, 0], prep.mean2d[:, 1]
    j = prep.jinv
    if cfg.surface and cfg.per_pixel_depth:
        c1 = j[:, 0] * j[:, 6] + j[:, 2] * j[:, 9]
        c2 = j[:, 1] * j[:, 6] + j[:, 3] * j[:, 9]
    else:
        c1 = jnp.zeros_like(x)
        c2 = jnp.zeros_like(x)
    adepth = prep.depth - x * c1 - y * c2

    geom = jnp.stack([x, y, prep.conic[:, 0], prep.conic[:, 1],
                      prep.conic[:, 2], opacity,
                      j[:, 0], j[:, 1], j[:, 2], j[:, 3],
                      prep.lam[:, 0], prep.lam[:, 1]], axis=-1)    # [N, 12]

    plain = [prep.rgb, prep.normal_view,
             adepth[:, None], c1[:, None], c2[:, None]]
    if features is not None:
        plain.append(features)
    plain = jnp.concatenate(plain, axis=-1)                        # [N, CA]
    ca = plain.shape[1]

    if vfeatures is not None:
        vs = vfeatures.shape[1]
        cv = vs // 4
        # channel-major storage [c0v0 c0v1 c0v2 c0v3 c1v0 ...]
        # (gaussian_model.py:287-295) -> v-major columns [v*CV + c].
        vmat = vfeatures.reshape(n, cv, 4)                         # [N, CV, 4]
        vcols = jnp.swapaxes(vmat, 1, 2).reshape(n, 4 * cv)
    else:
        cv = 0
        vcols = jnp.zeros((n, 0))

    slab = jnp.concatenate([geom, plain, vcols], axis=-1)          # [N, KR]
    # pad columns to the 128-lane tiling: the kernel DMAs [chunk, KR]
    # row blocks whose lane dimension must be 128-aligned
    kr = slab.shape[1]
    pad = (-kr) % 128
    if pad:
        slab = jnp.concatenate([slab, jnp.zeros((n, pad), slab.dtype)],
                               axis=-1)
    return slab, ca, cv


def rasterize(
    means3d: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    opacity: jax.Array,            # [N] activated
    camera,
    bg: jax.Array,
    *,
    shs: Optional[jax.Array] = None,
    sh_degree: int = 3,
    active_sh_degree=None,
    colors: Optional[jax.Array] = None,
    features: Optional[jax.Array] = None,
    vfeatures: Optional[jax.Array] = None,
    mean2d_offset: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    scale_modifier: float = 1.0,
    cfg: RasterConfig = RasterConfig(),
    interpret: Optional[bool] = None,
    weights_grad: bool = True,
    need_weights: bool = True,
) -> RenderBuffers:
    """Differentiable surfel rasterization for one camera.

    ``mean2d_offset`` ([N, 2], zeros) exists so callers can take gradients
    w.r.t. screen-space positions for densification statistics — the JAX
    equivalent of the reference's ``screenspace_points`` dummy tensor
    (svgss.py:21-25).
    """
    if interpret is None:
        interpret = _auto_interpret()
    width, height = camera.width, camera.height
    tile = cfg.tile
    grid_x = -(-width // tile)
    grid_y = -(-height // tile)
    num_tiles = grid_x * grid_y

    prep = preprocess(
        means3d, scales, quats, camera.world_view, camera.full_proj,
        camera.camera_center, width=width, height=height,
        tanfovx=camera.tanfovx, tanfovy=camera.tanfovy,
        focal_x=camera.focal_x, focal_y=camera.focal_y,
        shs=shs, sh_degree=sh_degree, active_sh_degree=active_sh_degree,
        colors=colors, scale_modifier=scale_modifier, cfg=cfg)
    if mask is not None:
        valid = prep.valid & mask
        prep = prep._replace(
            valid=valid,
            radius=jnp.where(valid, prep.radius, 0),
            tiles_touched=jnp.where(valid, prep.tiles_touched, 0))
    if mean2d_offset is not None:
        prep = prep._replace(mean2d=prep.mean2d + mean2d_offset)

    if cfg.binner == "counting":
        padded = bin_instances_counting(prep, width=width, height=height,
                                        cfg=cfg, rect_cap=cfg.rect_cap,
                                        interpret=interpret)
    else:
        binned = bin_instances(prep, width=width, height=height, cfg=cfg)
        padded = pad_to_chunks(binned, chunk=cfg.chunk,
                               max_instances=cfg.max_instances)

    slab_g, ca, cv = _pack_slab(prep, opacity, features, vfeatures, cfg)
    n = means3d.shape[0]
    strip = cfg.strip if padded.order is not None else 0
    if strip:
        # image-layout kernel I/O: no tile->image assembly transposes
        slab_ext = jnp.pad(slab_g, ((0, 1), (0, 0)))
        ts = _strip_order(padded.tile_start, grid_y, grid_x, strip)
        tc = _strip_order(padded.tile_count, grid_y, grid_x, strip)
        blend = _make_blend_gather_strip(ca, cv, grid_y, grid_x, tile,
                                         cfg.chunk, n, strip, interpret,
                                         weights_grad, need_weights)
        img_p, weights = blend(slab_ext, padded.gaussian_id, ts, tc)
    elif padded.order is not None:
        # one extra all-zero row: padding slots (gid -1) gather it and their
        # gradients scatter back into it — no [M, KR] select passes
        slab_ext = jnp.pad(slab_g, ((0, 1), (0, 0)))
        blend = _make_blend_gather(ca, cv, num_tiles, grid_x, tile,
                                   cfg.chunk, n, cfg.max_instances,
                                   cfg.rect_cap, interpret, weights_grad,
                                   need_weights)
        out, weights = blend(slab_ext, padded.gaussian_id,
                             padded.tile_start, padded.tile_count)
    else:
        gid = jnp.clip(padded.gaussian_id, 0, n - 1)
        slab = jnp.where(padded.inst_valid[:, None], slab_g[gid], 0.0)
        blend = _make_blend(ca, cv, num_tiles, grid_x, tile, cfg.chunk,
                            interpret, weights_grad)
        out, wsum = blend(slab, padded.tile_start, padded.tile_count,
                          padded.inst_valid)
        # per-gaussian weight sums (out_weights, forward.cu:653)
        weights = jax.ops.segment_sum(wsum[0], gid, num_segments=n)

    # ---- assemble tile blocks into images --------------------------------
    if strip:
        img = img_p[:, :height, :width]
    else:
        co = ca + cv + 3
        img = out.reshape(grid_y, grid_x, co, tile, tile)
        img = img.transpose(2, 0, 3, 1, 4).reshape(co, grid_y * tile,
                                                   grid_x * tile)
        img = img[:, :height, :width]

    s = 0 if features is None else features.shape[1]
    color_raw = img[0:3]
    normal = img[3:6]
    adepth, c1img, c2img = img[6], img[7], img[8]
    feat = img[9:9 + s]
    vfeat = img[ca:ca + cv]
    logT = img[ca + cv]
    n_contrib = img[ca + cv + 1].astype(jnp.int32)

    vv, uu = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    D = adepth + uu * c1img + vv * c2img
    T = jnp.minimum(1.0 - 1e-6, jnp.exp(logT))
    color = color_raw + T[None] * bg[:, None, None]
    depth = common.finalize_depth(D, T, cfg.normalize_depth)[None]

    return RenderBuffers(
        color=color, normal=normal, depth=depth, opacity=(1.0 - T)[None],
        feature=feat, vfeature=vfeat, final_t=T, n_contrib=n_contrib,
        weights=weights[:, None], radii=prep.radius,
        overflow=padded.overflow)
