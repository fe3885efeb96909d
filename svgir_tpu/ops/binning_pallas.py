"""Pallas binning kernels: per-tile counts, carry tables, instance ranks.

Sort-free binning with EXACT CUDA-duplication semantics (no per-splat tile
cap — rasterizer_impl.cu:70-111 duplicates unboundedly).  Two kernels over
depth-sorted gaussians:

  counts:  carry[T] += column-sums of rect coverage per chunk; also emits
           the per-chunk carry SNAPSHOTS [nchunks, T] — the cross-chunk
           part of any instance's depth rank — so slot assignment needs no
           per-(gaussian, k) extraction pass at all;
  ranks:   for a compact gaussian-major instance list (built outside via a
           searchsorted expansion bounded by max_instances, never by
           Ns x rect_cap), the within-chunk rank of each instance: a
           [window, block] rect-coverage count against the instance's own
           gauss_chunk.

slot = chunk_aligned_tile_start[t] + carry_table[chunk(g), t] + rank; all
slots are distinct, so the instance buffer materializes with one
unique-index scatter of exactly max_instances entries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cov(slabx0, slaby0, slabx1, slaby1, grid_x, grid_y, num_tiles_pad):
    """Rect coverage [CH, T_pad] (f32 0/1) from rect columns [CH, 1]."""
    ch = slabx0.shape[0]
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (ch, num_tiles_pad), 1)
    ty = t_iota // grid_x
    tx = t_iota % grid_x
    in_grid = t_iota < grid_x * grid_y
    cov = ((tx >= slabx0) & (tx < slabx1) & (ty >= slaby0) & (ty < slaby1)
           & in_grid)
    return cov


def _counts_kernel(x0_ref, y0_ref, x1_ref, y1_ref, counts_ref, carrytab_ref,
                   carry, *, grid_x, grid_y, num_tiles_pad):
    """Per-tile instance counts + per-chunk carry snapshots.

    ``carrytab[c, t]`` = number of instances tile t receives from chunks
    before c — the cross-chunk part of every chunk-c instance's depth rank.
    """
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        carry[:, :] = jnp.zeros_like(carry)

    carrytab_ref[0, :, :] = carry[:, :]          # snapshot BEFORE this chunk

    cov = _cov(x0_ref[0, 0][:, None], y0_ref[0, 0][:, None],
               x1_ref[0, 0][:, None], y1_ref[0, 0][:, None],
               grid_x, grid_y, num_tiles_pad)
    carry[:, :] += jnp.sum(cov.astype(jnp.int32), axis=0, keepdims=True)

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        counts_ref[:, :] = carry[:, :]


@functools.partial(jax.jit, static_argnames=("grid_x", "grid_y", "chunk",
                                             "gauss_chunk", "interpret"))
def compute_counts(x0, y0, x1, y1, *, grid_x, grid_y, chunk,
                   gauss_chunk=256, interpret=False):
    """Depth-ordered rect columns [Ns] -> (tile_start [T] chunk-aligned,
    padded_counts [T], total padded, carry_table [nchunks, T_pad])."""
    ns = x0.shape[0]
    assert ns % gauss_chunk == 0
    nchunks = ns // gauss_chunk
    num_tiles = grid_x * grid_y
    t_pad = -(-num_tiles // 128) * 128

    def blk(i):
        return pl.BlockSpec((1, 1, gauss_chunk), lambda c: (c, 0, 0),
                            memory_space=pltpu.VMEM)

    shape2 = lambda a: a.reshape(nchunks, 1, gauss_chunk)

    counts, carry_tab = pl.pallas_call(
        functools.partial(_counts_kernel, grid_x=grid_x, grid_y=grid_y,
                          num_tiles_pad=t_pad),
        grid=(nchunks,),
        in_specs=[blk(0)] * 4,
        out_specs=[
            pl.BlockSpec((1, t_pad), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((1, t_pad), jnp.int32),
            jax.ShapeDtypeStruct((nchunks, 1, t_pad), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, t_pad), jnp.int32)],
        interpret=interpret,
    )(shape2(x0), shape2(y0), shape2(x1), shape2(y1))

    counts = counts[0, :num_tiles]
    padded_counts = ((counts + chunk - 1) // chunk) * chunk
    from svgir_tpu.ops.binning import prefix_sum
    tile_start = prefix_sum(padded_counts) - padded_counts
    total = tile_start[-1] + padded_counts[-1]
    return tile_start, padded_counts, total, carry_tab.reshape(nchunks, t_pad)


def _inst_kernel(wstart_ref, x0h, y0h, x1h, y1h, offh, ordh, tabh,
                 slot_ref, gid_ref, grow_ref,
                 x0w, y0w, x1w, y1w, offw, ordw, tabw, sems,
                 *, wg, gauss_chunk, grid_x, inst_block):
    """Per-instance expansion + depth-rank slot assignment, all in-VMEM.

    Block of IB instances on sublanes; a [1, WG] window of depth-sorted
    rects / offsets / original ids on lanes, DMA'd at the block's
    chunk-aligned window start (a multiple of gauss_chunk -> 128-aligned
    lane offset).  Per instance j (gaussian-major enumeration):
      g      = searchsorted(offsets, j, right) - 1  (window-local count —
               XLA's own searchsorted lowers to a 16-round while loop of
               [M] gathers, ~60 ms/step at bench shapes)
      k      = j - offsets[g];  tile = rect cell k in y-outer order
      rank   = table[chunk(ws), ty, tx]  (instances from chunks before the
               window — the block DMAs its ONE table plane [GYp, GXp] and
               looks (ty, tx) up with a two-stage one-hot: a row-select
               matmul then a masked lane reduce; a flat [IB, T_pad] one-hot
               builds T_pad/GXp times more VMEM traffic)
             + #{g' in [ws, g), rect covers tile}   (window pair test)
      slot   = rank  (the table plane already folds in the chunk-aligned
               tile starts)
    Emits slot and the original gaussian id per instance — no per-instance
    XLA gathers remain (they run ~0.6 GB/s on TPU).
    """
    b = pl.program_id(0)
    nprog = pl.num_programs(0)
    ws = pl.multiple_of(wstart_ref[b], gauss_chunk)

    # double-buffered cross-block staging: block b+1's seven window copies
    # are issued before block b's compute, so only block 0 exposes a DMA
    # round-trip (wstart is a prefetched scalar array, so b+1's window
    # start is known here)
    def window_copies(bi, slot):
        ws_i = pl.multiple_of(wstart_ref[bi], gauss_chunk)
        cps = [pltpu.make_async_copy(src.at[:, pl.ds(ws_i, wg)],
                                     dst.at[slot], sems.at[slot, i])
               for i, (src, dst) in enumerate(
                   ((x0h, x0w), (y0h, y0w), (x1h, x1w),
                    (y1h, y1w), (offh, offw), (ordh, ordw)))]
        cps.append(pltpu.make_async_copy(tabh.at[ws_i // gauss_chunk],
                                         tabw.at[slot], sems.at[slot, 6]))
        return cps

    slot = b % 2

    @pl.when(b == 0)
    def _():
        for cp in window_copies(0, 0):
            cp.start()

    @pl.when(b + 1 < nprog)
    def _():
        for cp in window_copies(b + 1, (b + 1) % 2):
            cp.start()

    for cp in window_copies(b, slot):
        cp.wait()

    ib = inst_block
    j = (jax.lax.broadcasted_iota(jnp.int32, (ib, 1), 0)
         + b * inst_block)                             # [IB, 1]
    w_io = jax.lax.broadcasted_iota(jnp.int32, (ib, wg), 1)

    x0v, y0v = x0w[slot], y0w[slot]                    # [1, WG] rows
    x1v, y1v = x1w[slot], y1w[slot]
    offv, ordv = offw[slot], ordw[slot]

    # window-local searchsorted: all gaussians before the window have
    # offsets <= j for every instance in this block
    cnt = jnp.sum((offv <= j).astype(jnp.int32), axis=1, keepdims=True)
    gl = cnt - 1                                       # [IB, 1] local row

    sel = (w_io == gl).astype(jnp.int32)

    def pick(v):
        return jnp.sum(sel * v, axis=1, keepdims=True)  # [IB, 1]

    x0i, y0i, x1i = pick(x0v), pick(y0v), pick(x1v)
    offi, gidi = pick(offv), pick(ordv)

    k = j - offi
    w_r = jnp.maximum(x1i - x0i, 1)
    # duplicateWithKeys order (y outer, x inner); f32 trick for the integer
    # div (k, w_r < 2^23: exact, and the +0.5 margin dominates f32 rounding)
    qy = jnp.floor((k.astype(jnp.float32) + 0.5)
                   / w_r.astype(jnp.float32)).astype(jnp.int32)
    tx = x0i + k - qy * w_r
    ty = y0i + qy

    cover = ((x0v <= tx) & (tx < x1v) & (y0v <= ty) & (ty < y1v))
    gate = w_io < gl
    rank = jnp.sum((cover & gate).astype(jnp.int32), axis=1, keepdims=True)

    # two-stage (ty, tx) lookup in the block's table plane [GYp, GXp]:
    # one-hot row select rides the MXU, the column pick is a masked
    # lane reduce (f32 values < 2^23: exact)
    gyp, gxp = tabw.shape[1], tabw.shape[2]
    ty_oh = (jax.lax.broadcasted_iota(jnp.int32, (ib, gyp), 1)
             == ty).astype(jnp.float32)                # [IB, GYp]
    rows = jax.lax.dot_general(
        ty_oh, tabw[slot], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)           # [IB, GXp]
    tx_oh = jax.lax.broadcasted_iota(jnp.int32, (ib, gxp), 1) == tx
    base = jnp.sum(jnp.where(tx_oh, rows, 0.0), axis=1, keepdims=True)
    slot_ref[0] = base.astype(jnp.int32) + rank
    gid_ref[0] = gidi
    grow_ref[0] = gl + ws


@functools.partial(jax.jit, static_argnames=("m", "grid_x", "gauss_chunk",
                                             "inst_block", "interpret"))
def compute_instances(x0, y0, x1, y1, offsets, order, wstart, table, *, m,
                      grid_x, gauss_chunk=256, inst_block=1024,
                      interpret=False):
    """Compact instance expansion (see _inst_kernel).

    x0..y1/order: depth-sorted rects + original ids [Ns]; offsets:
    exclusive prefix sum of touched counts [Ns]; wstart [nblocks]: each
    block's chunk-aligned window start; table [nchunks, GYp, GXp] f32:
    per-chunk carry snapshots laid out as padded (ty, tx) planes, with
    the chunk-aligned tile starts folded in.
    Returns per-instance (slot, gid, g_row) each [m] — g_row is the SORTED
    gaussian row, monotone over the gaussian-major enumeration, so callers
    can run sorted segment reductions over instance data.
    """
    nblocks = m // inst_block
    wg = inst_block + gauss_chunk
    gyp, gxp = table.shape[1], table.shape[2]

    def lanes(a, fill=0):
        return jnp.pad(a.astype(jnp.int32), (0, wg),
                       constant_values=fill)[None, :]

    out_spec = pl.BlockSpec((1, inst_block, 1), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_specs=[out_spec] * 3,
        scratch_shapes=[pltpu.VMEM((2, 1, wg), jnp.int32)] * 6 + [
            pltpu.VMEM((2, gyp, gxp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 7))],
    )
    shape = jax.ShapeDtypeStruct((nblocks, inst_block, 1), jnp.int32)
    slot, gid, g_row = pl.pallas_call(
        functools.partial(_inst_kernel, wg=wg, gauss_chunk=gauss_chunk,
                          grid_x=grid_x, inst_block=inst_block),
        grid_spec=grid_spec,
        out_shape=(shape,) * 3,
        interpret=interpret,
    )(wstart, lanes(x0), lanes(y0), lanes(x1), lanes(y1),
      # padding gaussians must never be counted by the searchsorted pass
      lanes(offsets, fill=2**31 - 1), lanes(order), table)
    return slot.reshape(m), gid.reshape(m), g_row.reshape(m)
