"""Strip-layout variant of the blend kernels: image-layout output blocks.

Same math as ``blend_pallas`` (forward.cu renderCUDA :402-750 / backward.cu
:530-934 contracts), different I/O shape: the grid is ``(strips, SPT)``
where a strip is ``SPT`` x-adjacent 16x16 tiles (SPT=8 -> a 16x128-pixel
row), and the forward writes a ``(CO, 16, 128)`` block of a
``[CO, Hp, Wp]`` IMAGE-layout output directly.  The backward reads the
cotangent image the same way.  This deletes the [T, CO, 256] <->
[CO, H, W] assembly transposes outside the kernel (the
layout-pathological {3,1,2,0,4} copies, ~3.3 ms of the r2 step profile)
at the cost of a 16-store lane relayout per subtile inside the kernel,
and cuts grid-step count 8x (one output writeback per strip, (8,128)-
aligned, vs 8 per-tile blocks).

The inner per-subtile pipeline (double-buffered slab DMA, cross-tile
first-chunk prefetch, early exit, weight-row writeback) is identical to
``blend_pallas`` — the grid's innermost dim iterates fastest, so the
linearized subtile index plays the role the tile index played there.

``tile_start``/``tile_count`` must arrive in PADDED STRIP ORDER (row-major
tiles padded on x to ``strips_x*SPT`` columns — see
``rasterizer._strip_order``); padded tiles have count 0 and write zeros
into the lanes the caller slices away.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svgir_tpu.ops.blend_pallas import (NG, _chunk_math, _compiler_params,
    _dot, _tri_lower_incl, _tri_strict_lower, _tri_strict_upper, _vfuse,
    wsum_slot)
from svgir_tpu.ops.common import ALPHA_MAX, LOG_T_EPS


def _subtile_coords(i, j, strips_x, spt, grid_x, tile):
    """Pixel coordinates of subtile ``j`` of strip ``i`` as [pix, 1] f32."""
    p = jax.lax.broadcasted_iota(jnp.int32, (tile * tile, 1), 0)
    tx = (i % strips_x) * spt + j
    ty = i // strips_x
    px = (tx * tile + p % tile).astype(jnp.float32)
    py = (ty * tile + p // tile).astype(jnp.float32)
    return px, py


def _fwd_kernel(starts_ref, counts_ref, slab_hbm, out_ref, eff_ref, wsum_hbm,
                acc_vmem, slab_vmem, wrow_vmem, va4_vmem, dma_sem, w_sem,
                *, chunk, ca, cv, kr, strips_x, spt, grid_x, tile,
                emit_wsum=True):
    i = pl.program_id(0)
    j = pl.program_id(1)
    t_lin = i * spt + j
    total = pl.num_programs(0) * spt
    pix = tile * tile
    start = pl.multiple_of(starts_ref[t_lin], chunk)
    nchunks = counts_ref[t_lin] // chunk
    px, py = _subtile_coords(i, j, strips_x, spt, grid_x, tile)
    su = _tri_strict_upper(chunk)

    acc_vmem[...] = jnp.zeros((ca + cv + 2, pix), jnp.float32)

    def slab_copy_at(s, slot):
        return pltpu.make_async_copy(
            slab_hbm.at[pl.ds(pl.multiple_of(s, chunk), chunk), :],
            slab_vmem.at[slot], dma_sem.at[slot])

    def slab_copy(c, slot):
        return slab_copy_at(start + c * chunk, slot)

    # wsum slot layout (see blend_pallas.wsum_slot): 128-lane aligned
    wslot = wsum_slot(chunk)

    def w_copy(c, slot):
        gi = start // chunk + c
        return pltpu.make_async_copy(
            wrow_vmem.at[slot],
            wsum_hbm.at[:, pl.ds(pl.multiple_of(gi * wslot, wslot), wslot)],
            w_sem.at[slot])

    first = 2 + t_lin % 2

    @pl.when((t_lin == 0) & (nchunks > 0))
    def _():
        slab_copy(0, first).start()

    # prefetch the NEXT subtile's first chunk (j+1 in this strip, or the
    # next strip's subtile 0 — t_lin is sequential because the inner grid
    # dim iterates fastest)
    @pl.when(t_lin + 1 < total)
    def _():
        @pl.when(counts_ref[t_lin + 1] > 0)
        def _():
            slab_copy_at(starts_ref[t_lin + 1], 2 + (t_lin + 1) % 2).start()

    def body(c, logT, nc):
        slot = jnp.where(c == 0, first, c % 2)

        @pl.when(c + 1 < nchunks)
        def _():
            slab_copy(c + 1, (c + 1) % 2).start()

        slab_copy(c, slot).wait()
        slab = slab_vmem[slot].T
        m = _chunk_math(slab, px, py, chunk)

        logT_excl = logT + _dot(m["loga"], su, ((1,), (0,)))
        gate = m["ok"] & (logT_excl >= LOG_T_EPS)
        w = jnp.where(gate, m["alpha"] * jnp.exp(logT_excl), 0.0)

        attrs = slab[NG:NG + ca, :]
        acc_vmem[0:ca, :] += _dot(attrs, w, ((1,), (1,)))

        if cv:
            wv = ((1 - m["u"]) * (1 - m["v"]), m["u"] * (1 - m["v"]),
                  (1 - m["u"]) * m["v"], m["u"] * m["v"])
            # stacked via VMEM scratch: a direct lane-concat of slab
            # slices is rejected by Mosaic (sublane-offset mismatch); slice
            # STORES relayout for free (see blend_pallas._fwd_kernel)
            if _vfuse():
                for vtx in range(4):
                    va4_vmem[:, vtx * chunk:(vtx + 1) * chunk] = \
                        slab[NG + ca + vtx * cv: NG + ca + (vtx + 1) * cv, :]
                va4 = va4_vmem[:, :]
                w4 = jnp.concatenate([w * wv[vtx] for vtx in range(4)],
                                     axis=1)
                acc_vmem[ca:ca + cv, :] += _dot(va4, w4, ((1,), (1,)))
            else:
                acc_v = jnp.zeros((cv, w.shape[0]), jnp.float32)
                for vtx in range(4):
                    va = slab[NG + ca + vtx * cv: NG + ca + (vtx + 1) * cv, :]
                    acc_v += _dot(va, w * wv[vtx], ((1,), (1,)))
                acc_vmem[ca:ca + cv, :] += acc_v

        if emit_wsum:
            @pl.when(c >= 2)
            def _():
                w_copy(c - 2, c % 2).wait()

            wr = jnp.sum(w, axis=0, keepdims=True)
            if wslot != chunk:
                wr = jnp.pad(wr, ((0, 0), (0, wslot - chunk)))
            wrow_vmem[c % 2] = wr
            w_copy(c, c % 2).start()

        return (logT + jnp.sum(m["loga"], axis=1, keepdims=True),
                nc + jnp.sum(gate.astype(jnp.float32), axis=1,
                             keepdims=True))

    def cond(state):
        c, logT, nc = state
        return (c < nchunks) & (jnp.max(logT) >= LOG_T_EPS)

    def wbody(state):
        c, logT, nc = state
        return (c + 1,) + body(c, logT, nc)

    c_stop, logT, nc = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), jnp.zeros((pix, 1), jnp.float32),
                      jnp.zeros((pix, 1), jnp.float32)))

    @pl.when(c_stop < nchunks)
    def _():
        slab_copy(c_stop, c_stop % 2).wait()

    if emit_wsum:
        def zbody(c, _):
            slot = c % 2

            @pl.when(c >= 2)
            def _():
                w_copy(c - 2, slot).wait()

            wrow_vmem[slot] = jnp.zeros((1, wslot), jnp.float32)
            w_copy(c, slot).start()
            return 0

        jax.lax.fori_loop(c_stop, nchunks, zbody, 0)

        @pl.when(nchunks >= 1)
        def _():
            w_copy(nchunks - 1, (nchunks - 1) % 2).wait()

        @pl.when(nchunks >= 2)
        def _():
            w_copy(nchunks - 2, (nchunks - 2) % 2).wait()

    acc_vmem[ca + cv:ca + cv + 1, :] = logT.T
    acc_vmem[ca + cv + 1:ca + cv + 2, :] = nc.T

    # per-(padded-)tile processed-chunk count for the backward's prefetch
    eff_ref[pl.ds(j, 1), pl.ds(0, 1)] = \
        c_stop.astype(jnp.float32).reshape(1, 1)

    # lane relayout into the image block: pixel p = y*tile+x of subtile j
    # lands at block position (y, j*tile + x).  Static pl.when branches on
    # j keep every lane offset static (Mosaic rejects dynamic lane slices).
    for jj in range(spt):
        @pl.when(j == jj)
        def _(jj=jj):
            for y in range(tile):
                out_ref[:, y, jj * tile:(jj + 1) * tile] = \
                    acc_vmem[:, y * tile:(y + 1) * tile]


def blend_forward_strip(slab: jax.Array, tile_start: jax.Array,
                        tile_count: jax.Array, *, ca: int, cv: int,
                        gy: int, grid_x: int, spt: int = 8, tile: int = 16,
                        chunk: int = 128, interpret: bool = False,
                        emit_wsum: bool = True):
    """Forward blend writing image-layout output.

    ``tile_start``/``tile_count`` are padded strip-order [gy*strips_x*spt]
    arrays.  Returns (img [CO, gy*tile, strips_x*spt*tile], eff
    [gy*strips_x*spt, 1] f32, wsum [1, M]).  CO = ca+cv+2: plain accums,
    vertex accums, final logT, n_contrib (chunks-processed moves to the
    ``eff`` output).
    """
    m, kr = slab.shape
    strips_x = -(-grid_x // spt)
    nstrips = gy * strips_x
    co = ca + cv + 2
    kernel = functools.partial(_fwd_kernel, chunk=chunk, ca=ca, cv=cv, kr=kr,
                               strips_x=strips_x, spt=spt, grid_x=grid_x,
                               tile=tile, emit_wsum=emit_wsum)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nstrips, spt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((co, tile, spt * tile),
                         lambda i, j, *_: (0, i // strips_x, i % strips_x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spt, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((co, tile * tile), jnp.float32),
            pltpu.VMEM((4, chunk, kr), jnp.float32),
            pltpu.VMEM((2, 1, wsum_slot(chunk)), jnp.float32),
            pltpu.VMEM((max(cv, 1), 4 * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    img, eff, wsum = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((co, gy * tile, strips_x * spt * tile),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nstrips * spt, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, (m // chunk) * wsum_slot(chunk)),
                                 jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(tile_start, tile_count, slab)
    return img, eff, wsum


def _bwd_kernel(starts_ref, counts_ref, eff_ref, slab_hbm, gimg_ref,
                meta_ref, gwsum_hbm, dslab_hbm,
                gsub_vmem, slab_vmem, grow_vmem, dslab_vmem, dslab_rows,
                va4_vmem, dma_sem, g_sem, d_sem,
                *, chunk, ca, cv, kr, strips_x, spt, grid_x, tile,
                has_gwsum=True):
    i = pl.program_id(0)
    j = pl.program_id(1)
    t_lin = i * spt + j
    total = pl.num_programs(0) * spt
    pix = tile * tile
    start = pl.multiple_of(starts_ref[t_lin], chunk)
    nchunks = counts_ref[t_lin] // chunk
    nchunks_eff = eff_ref[t_lin]
    px, py = _subtile_coords(i, j, strips_x, spt, grid_x, tile)
    sl = _tri_strict_lower(chunk)
    li = _tri_lower_incl(chunk)

    # inverse lane relayout: gather this subtile's cotangent / logT columns
    # out of the image blocks into flat [*, pix] rows
    ncg = ca + cv + 1           # channels with cotangents (plain+vertex+logT)
    for jj in range(spt):
        @pl.when(j == jj)
        def _(jj=jj):
            for y in range(tile):
                gsub_vmem[0:ncg, y * tile:(y + 1) * tile] = \
                    gimg_ref[0:ncg, y, jj * tile:(jj + 1) * tile]
                gsub_vmem[ncg:ncg + 1, y * tile:(y + 1) * tile] = \
                    meta_ref[:, y, jj * tile:(jj + 1) * tile]

    g_plain = gsub_vmem[0:ca, :]
    g_vf = gsub_vmem[ca:ca + cv, :] if cv else None
    g_logt = gsub_vmem[ca + cv:ca + cv + 1, :].T
    logT_final = gsub_vmem[ncg:ncg + 1, :].T

    def slab_copy_at(s, slot):
        return pltpu.make_async_copy(
            slab_hbm.at[pl.ds(pl.multiple_of(s, chunk), chunk), :],
            slab_vmem.at[slot], dma_sem.at[slot])

    def slab_copy(c, slot):
        return slab_copy_at(start + c * chunk, slot)

    wslot = wsum_slot(chunk)   # g_wsum slot layout (blend_pallas.wsum_slot)

    def g_copy(c, slot):
        gi = start // chunk + c
        return pltpu.make_async_copy(
            gwsum_hbm.at[:, pl.ds(pl.multiple_of(gi * wslot, wslot), wslot)],
            grow_vmem.at[slot], g_sem.at[slot])

    def d_copy(c, slot):
        return pltpu.make_async_copy(
            dslab_rows.at[slot],
            dslab_hbm.at[pl.ds(pl.multiple_of(start + c * chunk, chunk),
                               chunk), :],
            d_sem.at[slot])

    first = 2 + t_lin % 2

    @pl.when((t_lin == 0) & (nchunks_eff > 0))
    def _():
        slab_copy(nchunks_eff - 1, first).start()

    @pl.when(t_lin + 1 < total)
    def _():
        @pl.when(eff_ref[t_lin + 1] > 0)
        def _():
            slab_copy_at(starts_ref[t_lin + 1] + (eff_ref[t_lin + 1] - 1)
                         * chunk, 2 + (t_lin + 1) % 2).start()

    @pl.when(nchunks_eff > 0)
    def _():
        if has_gwsum:
            g_copy(nchunks_eff - 1, 0).start()

    def body(i_it, carry):
        logT_after, suf = carry
        c = nchunks_eff - 1 - i_it
        slot = jnp.where(i_it == 0, first, i_it % 2)

        @pl.when(i_it + 1 < nchunks_eff)
        def _():
            slab_copy(c - 1, (i_it + 1) % 2).start()
            if has_gwsum:
                g_copy(c - 1, (i_it + 1) % 2).start()

        slab_copy(c, slot).wait()
        if has_gwsum:
            g_copy(c, i_it % 2).wait()

        slab = slab_vmem[slot].T
        m = _chunk_math(slab, px, py, chunk)

        suffix_incl = _dot(m["loga"], li, ((1,), (0,)))
        logT_excl = logT_after - suffix_incl
        gate = m["ok"] & (logT_excl >= LOG_T_EPS)
        expT = jnp.exp(logT_excl)
        w = jnp.where(gate, m["alpha"] * expT, 0.0)

        attrs = slab[NG:NG + ca, :]
        dw = _dot(g_plain, attrs, ((0,), (0,)))
        if has_gwsum:
            # first chunk lanes of the wslot row
            dw += grow_vmem[i_it % 2][:, :chunk]

        d_du0 = jnp.zeros_like(w)
        d_du1 = jnp.zeros_like(w)
        d_lamx_row = jnp.zeros((1, chunk), jnp.float32)
        d_lamy_row = jnp.zeros((1, chunk), jnp.float32)
        if cv:
            u, v = m["u"], m["v"]
            # stacked via VMEM scratch: a direct lane-concat of slab
            # slices is rejected by Mosaic (sublane-offset mismatch); slice
            # STORES relayout for free (see blend_pallas._fwd_kernel)
            if _vfuse():
                for vtx in range(4):
                    va4_vmem[:, vtx * chunk:(vtx + 1) * chunk] = \
                        slab[NG + ca + vtx * cv: NG + ca + (vtx + 1) * cv, :]
                va4 = va4_vmem[:, :]
                mv4 = _dot(g_vf, va4, ((0,), (0,)))
                mv = [mv4[:, vtx * chunk:(vtx + 1) * chunk]
                      for vtx in range(4)]
            else:
                mv = [_dot(g_vf,
                           slab[NG + ca + vtx * cv: NG + ca + (vtx + 1) * cv,
                                :], ((0,), (0,)))
                      for vtx in range(4)]
            wv = ((1 - u) * (1 - v), u * (1 - v), (1 - u) * v, u * v)
            dw += sum(wv[k] * mv[k] for k in range(4))
            d_u = w * ((1 - v) * (mv[1] - mv[0]) + v * (mv[3] - mv[2]))
            d_v = w * ((1 - u) * (mv[2] - mv[0]) + u * (mv[3] - mv[1]))
            int_u = ((m["u_raw"] > 0.001) & (m["u_raw"] < 0.999)).astype(
                jnp.float32)
            int_v = ((m["v_raw"] > 0.001) & (m["v_raw"] < 0.999)).astype(
                jnp.float32)
            d_u *= int_u
            d_v *= int_v
            d_du0 = d_u * 0.5 / m["uv_max_x"]
            d_du1 = d_v * 0.5 / m["uv_max_y"]
            d_uvmx = d_u * (-m["du0"] / (m["uv_max_x"] * m["uv_max_x"])) * 0.5
            d_uvmy = d_v * (-m["du1"] / (m["uv_max_y"] * m["uv_max_y"])) * 0.5
            d_lamx_row = 0.5 * jnp.sum(d_uvmx, axis=0, keepdims=True)
            d_lamy_row = 0.5 * jnp.sum(d_uvmy, axis=0, keepdims=True)

        s_term = dw * w
        d_loga = _dot(s_term, sl, ((1,), (0,))) + suf
        not_clamped = (m["alpha"] < ALPHA_MAX).astype(jnp.float32)
        okf = m["ok"].astype(jnp.float32)
        d_alpha = jnp.where(gate, dw * expT, 0.0)
        d_alpha += d_loga * (-1.0 / (1.0 - m["alpha"])) * okf
        d_opac_row = jnp.sum(d_alpha * jnp.exp(m["power"]) * not_clamped,
                             axis=0, keepdims=True)
        d_power = d_alpha * m["alpha"] * not_clamped

        dx, dy = m["dx"], m["dy"]
        d_cx_row = jnp.sum(d_power * (-0.5 * dx * dx), axis=0, keepdims=True)
        d_cy_row = jnp.sum(d_power * (-dx * dy), axis=0, keepdims=True)
        d_cz_row = jnp.sum(d_power * (-0.5 * dy * dy), axis=0, keepdims=True)

        cx, cy, cz = slab[2:3, :], slab[3:4, :], slab[4:5, :]
        d_dx = d_power * (-cx * dx - cy * dy) + d_du0 * slab[6:7, :] \
            + d_du1 * slab[8:9, :]
        d_dy = d_power * (-cz * dy - cy * dx) + d_du0 * slab[7:8, :] \
            + d_du1 * slab[9:10, :]

        d_j0 = jnp.sum(d_du0 * dx, axis=0, keepdims=True)
        d_j1 = jnp.sum(d_du0 * dy, axis=0, keepdims=True)
        d_j2 = jnp.sum(d_du1 * dx, axis=0, keepdims=True)
        d_j3 = jnp.sum(d_du1 * dy, axis=0, keepdims=True)

        dslab_vmem[0:1, :] = jnp.sum(d_dx, axis=0, keepdims=True)
        dslab_vmem[1:2, :] = jnp.sum(d_dy, axis=0, keepdims=True)
        dslab_vmem[2:3, :] = d_cx_row
        dslab_vmem[3:4, :] = d_cy_row
        dslab_vmem[4:5, :] = d_cz_row
        dslab_vmem[5:6, :] = d_opac_row
        dslab_vmem[6:7, :] = d_j0
        dslab_vmem[7:8, :] = d_j1
        dslab_vmem[8:9, :] = d_j2
        dslab_vmem[9:10, :] = d_j3
        dslab_vmem[10:11, :] = d_lamx_row
        dslab_vmem[11:12, :] = d_lamy_row
        dslab_vmem[NG:NG + ca, :] = _dot(g_plain, w, ((1,), (0,)))
        if cv:
            u, v = m["u"], m["v"]
            wv = ((1 - u) * (1 - v), u * (1 - v), (1 - u) * v, u * v)
            if _vfuse():
                wv4 = jnp.concatenate([w * wv[vtx] for vtx in range(4)],
                                      axis=1)
                dvf4 = _dot(g_vf, wv4, ((1,), (0,)))
                for vtx in range(4):
                    dslab_vmem[NG + ca + vtx * cv:
                               NG + ca + (vtx + 1) * cv, :] \
                        = dvf4[:, vtx * chunk:(vtx + 1) * chunk]
            else:
                for vtx in range(4):
                    dslab_vmem[NG + ca + vtx * cv:
                               NG + ca + (vtx + 1) * cv, :] \
                        = _dot(g_vf, w * wv[vtx], ((1,), (0,)))

        @pl.when(i_it >= 2)
        def _():
            d_copy(c, i_it % 2).wait()

        dslab_rows[i_it % 2] = dslab_vmem[:, :].T
        d_copy(c, i_it % 2).start()

        new_logT = logT_after - jnp.sum(m["loga"], axis=1, keepdims=True)
        new_suf = suf + jnp.sum(s_term, axis=1, keepdims=True)
        return (new_logT, new_suf)

    jax.lax.fori_loop(0, nchunks_eff, body, (logT_final, g_logt))

    def zbody(k, _):
        slot = k % 2

        @pl.when(k >= 2)
        def _():
            d_copy(0, slot).wait()

        dslab_rows[slot] = jnp.zeros((chunk, kr), jnp.float32)
        d_copy(k, slot).start()
        return 0

    jax.lax.fori_loop(nchunks_eff, nchunks, zbody, 0)

    @pl.when(nchunks >= 1)
    def _():
        d_copy(0, (nchunks - 1) % 2).wait()

    @pl.when(nchunks >= 2)
    def _():
        d_copy(0, (nchunks - 2) % 2).wait()


def blend_backward_strip(slab: jax.Array, tile_start: jax.Array,
                         tile_count: jax.Array, g_img: jax.Array,
                         logt_img: jax.Array, eff: jax.Array,
                         g_wsum, *, ca: int, cv: int, gy: int,
                         grid_x: int, spt: int = 8, tile: int = 16,
                         chunk: int = 128,
                         interpret: bool = False) -> jax.Array:
    """Backward blend reading image-layout cotangents.

    ``g_img`` [CO, Hp, Wp] (channels 0..ca+cv: plain+vertex+logT cotangents;
    trailing channels ignored), ``logt_img`` [1, Hp, Wp] (the forward's
    final-logT channel), ``eff`` [PT, 1] f32 (forward's per-padded-tile
    processed-chunk counts)."""
    m, kr = slab.shape
    strips_x = -(-grid_x // spt)
    nstrips = gy * strips_x
    co = g_img.shape[0]
    has_gwsum = g_wsum is not None
    if not has_gwsum:
        g_wsum = jnp.zeros((1, wsum_slot(chunk)), jnp.float32)
    kernel = functools.partial(_bwd_kernel, chunk=chunk, ca=ca, cv=cv, kr=kr,
                               strips_x=strips_x, spt=spt, grid_x=grid_x,
                               tile=tile, has_gwsum=has_gwsum)
    eff_i = eff[:, 0].astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nstrips, spt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # slab
            pl.BlockSpec((co, tile, spt * tile),
                         lambda i, j, *_: (0, i // strips_x, i % strips_x),
                         memory_space=pltpu.VMEM),                # g_img
            pl.BlockSpec((1, tile, spt * tile),
                         lambda i, j, *_: (0, i // strips_x, i % strips_x),
                         memory_space=pltpu.VMEM),                # logT img
            pl.BlockSpec(memory_space=pl.ANY),                 # g_wsum
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),           # d_slab
        scratch_shapes=[
            pltpu.VMEM((ca + cv + 2, tile * tile), jnp.float32),
            pltpu.VMEM((4, chunk, kr), jnp.float32),
            pltpu.VMEM((2, 1, wsum_slot(chunk)), jnp.float32),
            pltpu.VMEM((kr, chunk), jnp.float32),
            pltpu.VMEM((2, chunk, kr), jnp.float32),
            pltpu.VMEM((max(cv, 1), 4 * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    d_slab = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, kr), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(tile_start, tile_count, eff_i, slab, g_img, logt_img, g_wsum)
    return d_slab
