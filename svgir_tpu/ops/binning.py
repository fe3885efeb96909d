"""Tile binning: expand Gaussians into (tile, depth)-sorted instances.

TPU-native replacement for the CUDA cub pipeline (rasterizer_impl.cu:209-384:
InclusiveSum -> duplicateWithKeys -> RadixSort -> identifyTileRanges):

* instance expansion is a closed-form gather (searchsorted over the offset
  prefix sum) into a **fixed-capacity padded buffer** — no dynamic shapes;
* the 64-bit (tileID << 32 | depth-bits) radix key becomes a lexicographic
  two-key ``jax.lax.sort`` (stable, so equal keys keep duplication order,
  matching cub's stable radix sort);
* tile ranges come from two vectorized ``searchsorted`` calls.

Everything here is integer bookkeeping — gradients flow only through the
instance *gather* of per-Gaussian payloads, which callers perform with the
returned ``gaussian_id`` (its transpose is the per-Gaussian segment-sum).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from svgir_tpu.config import RasterConfig
from svgir_tpu.ops.preprocess import Preprocessed


def prefix_sum(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum of a 1-D int32 array via one MXU triangular
    matmul over [n/128, 128] rows (XLA's 1-D cumsum runs at the ~0.6 GB/s
    1-D-op rate on TPU).  Exact for totals < 2^24 (f32 mantissa)."""
    n = x.shape[0]
    if n <= 512:
        return jnp.cumsum(x)
    npad = (-n) % 128
    rows = jnp.pad(x, (0, npad)).reshape(-1, 128).astype(jnp.float32)
    tril = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1))
    within = jax.lax.dot_general(
        rows, tril.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)           # [R, 128] inclusive
    totals = within[:, -1].astype(jnp.int32)
    offs = jnp.cumsum(totals) - totals                 # [R] — tiny 1-D
    out = within.astype(jnp.int32) + offs[:, None]
    return out.reshape(-1)[:n]


class BinnedInstances(NamedTuple):
    gaussian_id: jax.Array   # [M] int32 — source Gaussian per sorted instance
    tile_id: jax.Array       # [M] int32 — owning tile (sentinel T for padding)
    inst_valid: jax.Array    # [M] bool
    tile_start: jax.Array    # [T] int32 — range starts into the sorted list
    tile_end: jax.Array      # [T] int32
    num_instances: jax.Array  # [] int32 — true count (<= M)
    overflow: jax.Array      # [] bool — true count exceeded capacity


class PaddedInstances(NamedTuple):
    """Chunk-aligned instance layout for the Pallas blend kernel.

    Each tile's instance run starts at a multiple of ``chunk`` and is padded
    to a multiple of ``chunk`` with invalid slots, so per-tile DMA chunks
    never straddle two tiles and per-chunk stores never clobber a neighbor.
    """

    gaussian_id: jax.Array   # [M] int32 — -1 for padding slots
    inst_valid: jax.Array    # [M] bool
    tile_start: jax.Array    # [T] int32 — chunk-aligned starts
    tile_count: jax.Array    # [T] int32 — padded counts (multiples of chunk)
    num_instances: jax.Array  # [] int32 — total padded count
    overflow: jax.Array      # [] bool
    # counting-binner extra (None from the sort path)
    order: Optional[jax.Array] = None      # [N] depth-sorted gaussian ids


def bin_instances(prep: Preprocessed, *, width: int, height: int,
                  cfg: RasterConfig = RasterConfig()) -> BinnedInstances:
    tile = cfg.tile
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    num_tiles = grid_x * grid_y
    m = cfg.max_instances

    touched = prep.tiles_touched.astype(jnp.int32)
    offsets = prefix_sum(touched) - touched            # exclusive prefix sum
    total = offsets[-1] + touched[-1]
    overflow = total > m
    total = jnp.minimum(total, m)

    j = jnp.arange(m, dtype=jnp.int32)
    inst_valid = j < total
    # instance -> gaussian: last g with offsets[g] <= j
    gid = jnp.searchsorted(offsets, j, side="right").astype(jnp.int32) - 1
    gid = jnp.clip(gid, 0, prep.mean2d.shape[0] - 1)
    k = j - offsets[gid]

    # duplicateWithKeys order (rasterizer_impl.cu:70-111): y outer, x inner
    rect_w = jnp.maximum(prep.rect_max[gid, 0] - prep.rect_min[gid, 0], 1)
    tx = prep.rect_min[gid, 0] + k % rect_w
    ty = prep.rect_min[gid, 1] + k // rect_w
    tile_id = jnp.where(inst_valid, ty * grid_x + tx, num_tiles)

    depth_key = jnp.where(inst_valid, prep.depth[gid], jnp.inf)
    tile_s, _, gid_s = jax.lax.sort(
        (tile_id.astype(jnp.int32), depth_key.astype(jnp.float32), gid),
        num_keys=2, is_stable=True)

    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_s, tiles, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_s, tiles, side="right").astype(jnp.int32)

    return BinnedInstances(
        gaussian_id=gid_s, tile_id=tile_s,
        inst_valid=jnp.arange(m, dtype=jnp.int32) < total,
        tile_start=tile_start, tile_end=tile_end,
        num_instances=total, overflow=overflow)


def pad_to_chunks(binned: BinnedInstances, *, chunk: int,
                  max_instances: int) -> PaddedInstances:
    """Re-lay the sorted instance list so every tile's run is chunk-aligned.

    Output slot q belongs to tile ``tile(q)`` (via searchsorted over the
    padded starts) at in-tile offset ``q - padded_start``; slots past the
    tile's true count are padding (gaussian_id -1).
    """
    counts = binned.tile_end - binned.tile_start                    # [T]
    padded_counts = ((counts + chunk - 1) // chunk) * chunk
    padded_starts = prefix_sum(padded_counts) - padded_counts       # exclusive
    total = padded_starts[-1] + padded_counts[-1]
    overflow = binned.overflow | (total > max_instances)
    total = jnp.minimum(total, max_instances)

    q = jnp.arange(max_instances, dtype=jnp.int32)
    # owning tile: last tile whose padded_start <= q and padded_count > 0.
    # 'right' search over the exclusive starts skips zero-count tiles
    # (their start equals the next tile's start).
    tile = jnp.searchsorted(padded_starts, q, side="right").astype(jnp.int32) - 1
    tile = jnp.clip(tile, 0, counts.shape[0] - 1)
    off = q - padded_starts[tile]
    valid = (q < total) & (off < counts[tile])
    src = jnp.clip(binned.tile_start[tile] + off, 0,
                   binned.gaussian_id.shape[0] - 1)
    gid = jnp.where(valid, binned.gaussian_id[src], -1)

    return PaddedInstances(
        gaussian_id=gid, inst_valid=valid,
        tile_start=padded_starts.astype(jnp.int32),
        tile_count=padded_counts.astype(jnp.int32),
        num_instances=total, overflow=overflow)


def bin_instances_counting(prep: Preprocessed, *,
                           width: int, height: int,
                           cfg: RasterConfig = RasterConfig(),
                           rect_cap: int = 0,
                           gauss_chunk: int = 256,
                           interpret: Optional[bool] = None
                           ) -> PaddedInstances:
    """Sort-free binning: counting placement (TPU-native), with EXACT CUDA
    duplication semantics — no per-splat tile cap (``rect_cap`` is accepted
    for API compatibility and ignored).

    The generic two-key ``lax.sort`` over the padded instance buffer
    dominates the frame (measured 619 ms of a 723 ms step at 800x800/50k on
    v5e).  This replaces it with closed-form placement:

      1. sort *gaussians* by depth (N-sized sort, cheap);
      2. per-tile instance counts + per-chunk carry snapshots in one Pallas
         pass over rect coverage [chunk, T];
      3. a compact gaussian-major instance list (searchsorted over the
         touched-count prefix sum — sized by ``max_instances``, NOT by
         Ns x cap) with per-instance depth rank
         ``carry[chunk(g), tile] + within_chunk_rank`` (second Pallas pass);
      4. each instance's output slot is ``chunk_aligned_start[tile] + rank``
         — all slots distinct, so the instance buffer is materialized by a
         single unique-index scatter of max_instances entries.

    Produces the same (tile, depth)-ordered, chunk-aligned layout as
    ``bin_instances`` + ``pad_to_chunks`` (equal depths keep gaussian-index
    order, matching cub's stable radix sort).
    """
    tile = cfg.tile
    chunk = cfg.chunk
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    num_tiles = grid_x * grid_y
    m = cfg.max_instances
    n = prep.valid.shape[0]

    # one multi-operand sort carries the rects and ids with the depth key
    # (separate [N] post-sort gathers each ran at XLA's ~0.6 GB/s 1-D gather
    # rate, ~0.5 ms apiece at 50k); invalid gaussians get zero rects and
    # id -1 up front so no post-sort masking pass is needed either
    v = prep.valid
    key = jnp.where(v, prep.depth, jnp.inf).astype(jnp.float32)
    ids = jnp.where(v, jnp.arange(n, dtype=jnp.int32), -1)
    z = jnp.zeros((), jnp.int32)
    _, x0, y0, x1, y1, order_s = jax.lax.sort(
        (key,
         jnp.where(v, prep.rect_min[:, 0], z),
         jnp.where(v, prep.rect_min[:, 1], z),
         jnp.where(v, prep.rect_max[:, 0], z),
         jnp.where(v, prep.rect_max[:, 1], z),
         ids),
        num_keys=1, is_stable=True)
    touched = (x1 - x0) * (y1 - y0)

    npad = (-n) % gauss_chunk
    def pad(a):
        return jnp.concatenate([a, jnp.zeros((npad,), a.dtype)])
    x0p, y0p, x1p, y1p = pad(x0), pad(y0), pad(x1), pad(y1)

    from svgir_tpu.ops.binning_pallas import (compute_counts,
                                              compute_instances)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile_start, padded_counts, total_padded, carry_tab = compute_counts(
        x0p, y0p, x1p, y1p, grid_x=grid_x, grid_y=grid_y, chunk=chunk,
        gauss_chunk=gauss_chunk, interpret=interpret)

    # ---- compact instance enumeration (gaussian-major) -------------------
    # per-instance work happens inside compute_instances; here only the
    # prefix sum, the per-BLOCK window starts (a tiny searchsorted), one
    # fused carry+start gather, and the slot scatter remain
    touched_p = pad(touched)
    offsets = prefix_sum(touched_p) - touched_p          # exclusive [Ns_p]
    total_raw = offsets[-1] + touched_p[-1]
    overflow = (total_raw > m) | (total_padded > m)

    # 512: the rank kernel's pair-test cost is blocks x IB x window =
    # m x (IB + gauss_chunk); a smaller block shrinks the window term
    inst_block = 512
    while m % inst_block:
        inst_block //= 2
    firsts = jnp.clip(jnp.searchsorted(
        offsets, jnp.arange(0, m, inst_block, dtype=jnp.int32),
        side="right") - 1, 0, offsets.shape[0] - 1)
    wstart = ((firsts // gauss_chunk) * gauss_chunk).astype(jnp.int32)

    order_p = pad(order_s)
    # fold the chunk-aligned tile starts into the carry table and lay it
    # out as padded (ty, tx) planes for the kernel's two-stage lookup
    # (XLA per-instance gathers run ~0.6 GB/s here); f32 is exact for
    # slot values < 2^23
    gyp = -(-grid_y // 8) * 8
    gxp = -(-grid_x // 128) * 128
    tbl = (carry_tab[:, :num_tiles]
           + tile_start[None, :].astype(jnp.int32)).astype(jnp.float32)
    nct = tbl.shape[0]
    table = jnp.zeros((nct, gyp, gxp), jnp.float32).at[
        :, :grid_y, :grid_x].set(tbl.reshape(nct, grid_y, grid_x))
    slot, gid, _ = compute_instances(
        x0p, y0p, x1p, y1p, offsets, order_p, wstart, table, m=m,
        grid_x=grid_x, gauss_chunk=gauss_chunk, inst_block=inst_block,
        interpret=interpret)
    j = jnp.arange(m, dtype=jnp.int32)
    slot = jnp.where(j < total_raw, slot, m)            # padding -> dropped

    out_gid = jnp.full((m,), -1, jnp.int32)
    out_gid = out_gid.at[slot].set(gid, mode="drop", unique_indices=True)
    inst_valid = out_gid >= 0

    return PaddedInstances(
        gaussian_id=out_gid, inst_valid=inst_valid,
        tile_start=tile_start.astype(jnp.int32),
        tile_count=padded_counts.astype(jnp.int32),
        num_instances=jnp.minimum(total_padded, m), overflow=overflow,
        order=order_s)
