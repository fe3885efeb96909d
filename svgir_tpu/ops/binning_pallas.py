"""Pallas binning kernels: per-tile counts + depth-rank slot assignment.

The XLA ``lax.scan`` formulation of the counting binner spends ~50 ms/step
in HBM round-trips between scan iterations (coverage build, prefix matmul,
rank gather each materialize [chunk, T] arrays).  These kernels keep the
whole pipeline VMEM-resident:

  pass 1 (counts):  carry[T] += column-sums of rect coverage per chunk;
  pass 2 (slots):   exclusive prefix ranks via a strictly-lower-triangular
                    f32 MXU matmul (exact: 0/1 operands, f32 accumulation),
                    then per-rect-slot extraction of
                    ``tile_start[t] + rank[g, t]`` with one-hot masked row
                    sums (no in-kernel gather needed).

Gaussians arrive depth-sorted; both kernels walk chunks sequentially so the
VMEM carry implements the global prefix.
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


def _counts_kernel(x0_ref, y0_ref, x1_ref, y1_ref, counts_ref, carry,
                   *, grid_x, grid_y, num_tiles_pad):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        carry[:, :] = jnp.zeros_like(carry)

    cov = _cov(x0_ref[0, 0][:, None], y0_ref[0, 0][:, None],
               x1_ref[0, 0][:, None], y1_ref[0, 0][:, None],
               grid_x, grid_y, num_tiles_pad)
    carry[:, :] += jnp.sum(cov.astype(jnp.int32), axis=0, keepdims=True)

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        counts_ref[:, :] = carry[:, :]


def _slots_kernel(x0_ref, y0_ref, x1_ref, y1_ref, nslots_ref, start_ref,
                  pos_ref, carry, *, grid_x, grid_y, num_tiles_pad, rect_cap,
                  m):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        carry[:, :] = jnp.zeros_like(carry)

    ch = x0_ref.shape[2]
    x0 = x0_ref[0, 0][:, None]
    y0 = y0_ref[0, 0][:, None]
    x1 = x1_ref[0, 0][:, None]
    y1 = y1_ref[0, 0][:, None]
    cov = _cov(x0, y0, x1, y1, grid_x, grid_y, num_tiles_pad)
    # exclusive prefix of coverage down the chunk: a log-depth integer
    # prefix sum via sublane shifts on the VPU (the [CH, CH] triangular f32
    # matmul costs ~4 ms of MXU time at bench shapes; Mosaic has no cumsum
    # primitive, so build the Hillis-Steele ladder from pad-shifts)
    covi = cov.astype(jnp.int32)
    incl = covi
    d = 1
    while d < ch:
        zeros = jnp.zeros((d, num_tiles_pad), jnp.int32)
        incl = incl + jnp.concatenate([zeros, incl[:ch - d]], axis=0)
        d *= 2
    excl = incl - covi
    excl = excl + carry[:, :]            # broadcast [1, T] over rows

    # value to extract per rect slot: global slot index
    val = excl + start_ref[:, :]         # [CH, T] + [1, T]

    t_iota = jax.lax.broadcasted_iota(jnp.int32, (ch, num_tiles_pad), 1)
    w_r = jnp.maximum(x1 - x0, 1)
    nsl = nslots_ref[0, 0][:, None]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (ch, rect_cap), 1)

    def body(k, acc):
        tk = (y0 + k // w_r) * grid_x + (x0 + k % w_r)      # [CH, 1]
        sel = (t_iota == tk) & (k < nsl)
        pos_k = jnp.sum(jnp.where(sel, val, 0), axis=1)     # [CH]
        pos_k = jnp.where(nsl[:, 0] > k, pos_k, m)
        return jnp.where(k_iota == k, pos_k[:, None], acc)

    # dynamic trip count: slots beyond the chunk's max rect size are all
    # masked to m by the init value, so bounding the loop by max(nsl) is
    # exact and skips most of the 16 one-hot passes for small-splat chunks
    max_nsl = jnp.minimum(jnp.max(nslots_ref[0, 0]), rect_cap)
    pos_ref[0, 0] = jax.lax.fori_loop(
        0, max_nsl, body, jnp.full((ch, rect_cap), m, jnp.int32),
        unroll=False)

    carry[:, :] += jnp.sum(cov.astype(jnp.int32), axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("grid_x", "grid_y", "rect_cap",
                                             "chunk", "m", "gauss_chunk",
                                             "interpret"))
def compute_slots(x0, y0, x1, y1, nslots, *, grid_x, grid_y, rect_cap,
                  chunk, m, gauss_chunk=512, interpret=False):
    """Depth-ordered rect columns [Ns] -> (pos [Ns, rect_cap],
    tile_start [T], padded_counts [T], total)."""
    ns = x0.shape[0]
    assert ns % gauss_chunk == 0
    nchunks = ns // gauss_chunk
    num_tiles = grid_x * grid_y
    t_pad = -(-num_tiles // 128) * 128

    def blk(i):
        return pl.BlockSpec((1, 1, gauss_chunk), lambda c: (c, 0, 0),
                            memory_space=pltpu.VMEM)

    shape2 = lambda a: a.reshape(nchunks, 1, gauss_chunk)

    counts = pl.pallas_call(
        functools.partial(_counts_kernel, grid_x=grid_x, grid_y=grid_y,
                          num_tiles_pad=t_pad),
        grid=(nchunks,),
        in_specs=[blk(0)] * 4,
        out_specs=pl.BlockSpec((1, t_pad), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, t_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, t_pad), jnp.int32)],
        interpret=interpret,
    )(shape2(x0), shape2(y0), shape2(x1), shape2(y1))[0, :num_tiles]

    padded_counts = ((counts + chunk - 1) // chunk) * chunk
    tile_start = jnp.cumsum(padded_counts) - padded_counts
    total = tile_start[-1] + padded_counts[-1]
    start_pad = jnp.zeros((1, t_pad), jnp.int32).at[0, :num_tiles].set(
        tile_start)

    pos = pl.pallas_call(
        functools.partial(_slots_kernel, grid_x=grid_x, grid_y=grid_y,
                          num_tiles_pad=t_pad, rect_cap=rect_cap, m=m),
        grid=(nchunks,),
        in_specs=[blk(0)] * 5 + [
            pl.BlockSpec((1, t_pad), lambda c: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, gauss_chunk, rect_cap),
                               lambda c: (c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nchunks, 1, gauss_chunk, rect_cap),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, t_pad), jnp.int32)],
        interpret=interpret,
    )(shape2(x0), shape2(y0), shape2(x1), shape2(y1), shape2(nslots),
      start_pad)

    return pos.reshape(ns, rect_cap), tile_start, padded_counts, total
