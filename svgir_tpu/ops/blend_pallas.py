"""Tiled alpha-compositing Pallas kernel (forward + hand-written backward).

TPU-native re-design of the svgss CUDA blend kernels (forward.cu renderCUDA
:402-750, backward.cu renderCUDA :530-934).  Key differences from the CUDA
design, chosen for the TPU execution model:

* **Chunked MXU formulation.**  Instead of one pixel per thread marching
  splats one-by-one, each grid step owns a 16x16 tile (256 pixels on
  sublanes) and processes ``CHUNK`` splats at a time (on lanes).  The
  front-to-back recurrence becomes an exclusive prefix sum of
  ``log(1-alpha)`` — computed as a [P,G]x[G,G] triangular matmul on the
  MXU — and attribute accumulation becomes [P,G]x[G,C] matmuls.
* **Log-space transmittance** (see ops/common.py): exact prefix structure,
  no underflow, numerically stable reverse reconstruction in the backward
  (the CUDA backward's divide-up-by-(1-alpha) trick, but additive).
* **No atomics.**  Per-splat weight sums are per-instance row reductions
  DMA'd to chunk-aligned slots (ops/binning.py pad_to_chunks), then
  segment-summed per Gaussian outside; deterministic by construction where
  the CUDA atomicAdd path is not.

Instance data layout: one f32 slab [KR, M] (rows = scalars, columns =
sorted+padded instances) so each chunk is a single 2-D DMA:

  rows 0..NG-1   "geometry" consumed nonlinearly by the kernel:
                  0 x, 1 y, 2 conic_xx, 3 conic_xy, 4 conic_yy, 5 opacity,
                  6 j0, 7 j1, 8 j2, 9 j3 (screen->tangent 2x2),
                  10 lam_x, 11 lam_y (surfel scale.xy)
  rows NG..      CA "plain" channels blended linearly with weight w
                  (color, view normal, affine depth triplet, S features)
  rows NG+CA..   4*CV vertex channels (v-major: v*CV + c), blended with
                  w * bilinear vertex weight.

Per-tile output block [CA+CV+3, P=tile**2], channel-major so the channel dim
rides sublanes (17 channels on lanes would pad to 128 — a 7.5x HBM
footprint for every downstream reshape/slice): plain accums, vertex
accums, final logT, n_contrib, chunks-processed.  Final image assembly
(bg composite, depth normalization) happens outside in plain JAX, so this
kernel's custom VJP boundary receives gradients for raw accumulators and
logT directly.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svgir_tpu.ops.common import ALPHA_MAX, ALPHA_MIN, LOG_T_EPS

NG = 12          # geometry rows in the slab


NEG_INF = -1e30


def _compiler_params() -> "pltpu.CompilerParams":
    """Shared Mosaic params for the blend kernels.  ``vmem_limit_bytes``
    raises XLA's default 16 MB *scoped*-vmem budget (a compiler default,
    not the hardware: v5e has 128 MB physical VMEM) so the VS=52 stage-2
    backward fits at tile=32 — its live [1024, 128] temporaries peak at
    ~19-22 MB.  64 MB leaves half the physical VMEM for the pipelined
    DMA buffers.  SVGIR_VMEM_LIMIT_MB overrides for experiments."""
    import os
    mb = int(os.environ.get("SVGIR_VMEM_LIMIT_MB", 64))
    return pltpu.CompilerParams(has_side_effects=True,
                                vmem_limit_bytes=mb << 20)

# Read ONCE at import: flipping the env var mid-process would silently keep
# already-jitted variants stale (each A/B configuration must run in a fresh
# process, as tools/exp_r2.py does).
_VFUSE = __import__("os").environ.get("SVGIR_BLEND_UNFUSED", "0") != "1"


def _vfuse() -> bool:
    """Whether to lane-concat the four per-vertex matmuls into one wide MXU
    contraction (default) or issue them separately (SVGIR_BLEND_UNFUSED=1,
    captured at import) so the two formulations can be A/B'd on-chip."""
    return _VFUSE


def wsum_slot(chunk: int) -> int:
    """Lanes per chunk in the wsum/g_wsum HBM layout.  Mosaic requires DMA
    slice shapes 128-lane aligned ("Slice shape along dimension 2 must be
    aligned to tiling (128)", exp_r2e log), so for chunk < 128 each chunk
    owns a 128-lane slot (first ``chunk`` lanes live, rest zero)."""
    return max(chunk, 128)


def wsum_to_instances(wsum: jax.Array, m: int, chunk: int) -> jax.Array:
    """[1, (m//chunk)*slot] slot layout -> [1, m] per-instance."""
    slot = wsum_slot(chunk)
    if slot == chunk:
        return wsum
    return wsum.reshape(m // chunk, slot)[:, :chunk].reshape(1, m)


def wsum_from_instances(g: jax.Array, chunk: int) -> jax.Array:
    """[1, m] per-instance -> [1, (m//chunk)*slot] slot layout (zero pad)."""
    slot = wsum_slot(chunk)
    if slot == chunk:
        return g
    m = g.shape[1]
    g2 = g.reshape(m // chunk, chunk)
    g2 = jnp.pad(g2, ((0, 0), (0, slot - chunk)))
    return g2.reshape(1, (m // chunk) * slot)


def _pixel_coords(t, grid_x, tile):
    """Tile-t pixel coordinates as [pix, 1] f32 columns (row-major in
    tile), pix = tile**2."""
    p = jax.lax.broadcasted_iota(jnp.int32, (tile * tile, 1), 0)
    tx = (t % grid_x) * tile
    ty = (t // grid_x) * tile
    px = (tx + p % tile).astype(jnp.float32)
    py = (ty + p // tile).astype(jnp.float32)
    return px, py


def _chunk_math(slab, px, py, chunk):
    """Shared forward recomputation for one chunk.

    slab: [KR, chunk] VMEM block.  Returns a dict of [PIX, chunk] arrays and
    helper rows.  Invalid (padding) instances carry opacity 0 -> ok=False.
    """
    def row(i):
        return slab[i:i + 1, :]  # [1, chunk]

    dx = row(0) - px        # broadcasts to [PIX, chunk]
    dy = row(1) - py
    cx, cy, cz = row(2), row(3), row(4)
    power = -0.5 * (cx * dx * dx + cz * dy * dy) - cy * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, row(5) * jnp.exp(power))
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN)
    loga = jnp.where(ok, jnp.log1p(-alpha), 0.0)

    du0 = dx * row(6) + dy * row(7)
    du1 = dx * row(8) + dy * row(9)
    uv_max_x = 0.5 * row(10) + 0.1
    uv_max_y = 0.5 * row(11) + 0.1
    u_raw = du0 / uv_max_x * 0.5 + 0.5
    v_raw = du1 / uv_max_y * 0.5 + 0.5
    u = jnp.clip(u_raw, 0.001, 0.999)
    v = jnp.clip(v_raw, 0.001, 0.999)
    return dict(dx=dx, dy=dy, power=power, alpha=alpha, ok=ok, loga=loga,
                du0=du0, du1=du1, u=u, v=v, u_raw=u_raw, v_raw=v_raw,
                uv_max_x=uv_max_x, uv_max_y=uv_max_y)


def _tri_strict_upper(g):
    i = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (i < j).astype(jnp.float32)


def _tri_strict_lower(g):
    i = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (i > j).astype(jnp.float32)


def _tri_lower_incl(g):
    i = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (i >= j).astype(jnp.float32)


_PRECISION = {
    # HIGHEST (bf16_6x) reproduces full f32.  A HIGH (bf16_3x) tier would
    # halve MXU time at ~1e-6 relative error, but Mosaic's in-kernel
    # dot_general lowering only accepts DEFAULT/HIGHEST ("Unsupported dot
    # precision: HIGH", measured on the remote compiler) — so "high" maps
    # to HIGHEST until Pallas grows the 3-pass tier.  DEFAULT (single bf16
    # pass, ~0.4% error) visibly corrupts the exponentiated transmittance
    # chain and stays unavailable on purpose.
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}[__import__("os").environ.get("SVGIR_MXU_PRECISION", "highest").lower()]


def _dot(a, b, dims):
    # never DEFAULT: a single bf16 pass (~0.4% error) visibly corrupts the
    # exponentiated transmittance chain.
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PRECISION)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(starts_ref, counts_ref, slab_hbm, out_ref, wsum_hbm,
                slab_vmem, wrow_vmem, va4_vmem, dma_sem, w_sem,
                *, chunk, ca, cv, kr, grid_x, tile, emit_wsum=True):
    """Double-buffered chunk pipeline: the slab DMA for chunk c+1 is issued
    before chunk c's compute (2-slot VMEM staging), and the per-chunk weight
    row writeback is drained two iterations later — the TPU analog of the
    CUDA kernel's cooperative shared-memory staging (forward.cu:503-519),
    hiding both directions' DMA latency behind the blend matmuls.

    Cross-tile pipelining: tile t+1's FIRST chunk is prefetched at the start
    of tile t's grid step into one of two alternating extra slots (2 + t%2),
    so no tile stalls on its opening DMA — without this every grid step
    exposes one full HBM round-trip."""
    t = pl.program_id(0)
    nprog = pl.num_programs(0)
    pix = tile * tile
    start = pl.multiple_of(starts_ref[t], chunk)
    nchunks = counts_ref[t] // chunk
    px, py = _pixel_coords(t, grid_x, tile)
    su = _tri_strict_upper(chunk)

    # channel-major output [co, PIX]: co rides sublanes (pads 17 -> 24)
    # instead of lanes (17 -> 128, a 7.5x HBM footprint that made every
    # downstream reshape/slice of the tile tensor pay 7.5x traffic)
    out_ref[0] = jnp.zeros((ca + cv + 3, pix), jnp.float32)

    def slab_copy_at(s, slot):
        return pltpu.make_async_copy(
            slab_hbm.at[pl.ds(pl.multiple_of(s, chunk), chunk), :],
            slab_vmem.at[slot], dma_sem.at[slot])

    def slab_copy(c, slot):
        return slab_copy_at(start + c * chunk, slot)

    # wsum slot layout: chunk gi owns lanes [gi*wslot, gi*wslot + wslot)
    # (wslot = max(chunk, 128)); offsets stay 128-lane aligned for any chunk
    wslot = wsum_slot(chunk)

    def w_copy(c, slot):
        gi = start // chunk + c
        return pltpu.make_async_copy(
            wrow_vmem.at[slot],
            wsum_hbm.at[:, pl.ds(pl.multiple_of(gi * wslot, wslot), wslot)],
            w_sem.at[slot])

    first = 2 + t % 2      # this tile's first-chunk slot

    @pl.when((t == 0) & (nchunks > 0))
    def _():
        slab_copy(0, first).start()

    # prefetch tile t+1's first chunk into the other extra slot; its grid
    # step will find the data already in flight (or landed)
    @pl.when(t + 1 < nprog)
    def _():
        @pl.when(counts_ref[t + 1] > 0)
        def _():
            slab_copy_at(starts_ref[t + 1], 2 + (t + 1) % 2).start()

    def body(c, logT, nc):
        slot = jnp.where(c == 0, first, c % 2)

        @pl.when(c + 1 < nchunks)
        def _():
            slab_copy(c + 1, (c + 1) % 2).start()

        slab_copy(c, slot).wait()
        slab = slab_vmem[slot].T      # [KR, chunk]; cheap VMEM relayout
        m = _chunk_math(slab, px, py, chunk)

        logT_excl = logT + _dot(m["loga"], su, ((1,), (0,)))
        gate = m["ok"] & (logT_excl >= LOG_T_EPS)
        w = jnp.where(gate, m["alpha"] * jnp.exp(logT_excl), 0.0)

        attrs = slab[NG:NG + ca, :]                       # [CA, chunk]
        acc_plain = _dot(attrs, w, ((1,), (1,)))          # [CA, PIX]
        out_ref[0, 0:ca, :] += acc_plain

        if cv:
            wv = ((1 - m["u"]) * (1 - m["v"]), m["u"] * (1 - m["v"]),
                  (1 - m["u"]) * m["v"], m["u"] * m["v"])
            # one [CV, 4*chunk] x [4*chunk, PIX] contraction instead of four
            # K=chunk matmuls: vertex blocks stacked on lanes, per-vertex
            # weights folded into the stacked weight matrix — the kernel is
            # issue-bound, not FLOP-bound, so fewer/larger MXU ops win.
            # The stacking goes through a VMEM scratch: a direct lane-concat
            # of the slab slices is rejected by Mosaic ("offset mismatch on
            # non-concat dimension" — cv=13 slices start at different
            # sublane offsets), while slice STORES relayout for free and the
            # lane windows are 128-aligned.
            if _vfuse():
                for vtx in range(4):
                    va4_vmem[:, vtx * chunk:(vtx + 1) * chunk] = \
                        slab[NG + ca + vtx * cv: NG + ca + (vtx + 1) * cv, :]
                va4 = va4_vmem[:, :]                      # [CV, 4*chunk]
                w4 = jnp.concatenate([w * wv[vtx] for vtx in range(4)],
                                     axis=1)              # [PIX, 4*chunk]
                out_ref[0, ca:ca + cv, :] += _dot(va4, w4, ((1,), (1,)))
            else:
                acc_v = jnp.zeros((cv, w.shape[0]), jnp.float32)
                for vtx in range(4):
                    va = slab[NG + ca + vtx * cv: NG + ca + (vtx + 1) * cv, :]
                    acc_v += _dot(va, w * wv[vtx], ((1,), (1,)))
                out_ref[0, ca:ca + cv, :] += acc_v

        # async weight-row writeback: drain the copy issued two chunks ago
        # on this slot before overwriting its staging buffer
        if emit_wsum:
            @pl.when(c >= 2)
            def _():
                w_copy(c - 2, c % 2).wait()

            wr = jnp.sum(w, axis=0, keepdims=True)                # [1,chunk]
            if wslot != chunk:
                wr = jnp.pad(wr, ((0, 0), (0, wslot - chunk)))
            wrow_vmem[c % 2] = wr
            w_copy(c, c % 2).start()

        return (logT + jnp.sum(m["loga"], axis=1, keepdims=True),
                nc + jnp.sum(gate.astype(jnp.float32), axis=1,
                             keepdims=True))

    # early exit once every pixel saturates (all logT < log 1e-4):
    # remaining instances can no longer contribute (forward.cu:550-554)
    def cond(state):
        c, logT, nc = state
        return (c < nchunks) & (jnp.max(logT) >= LOG_T_EPS)

    def wbody(state):
        c, logT, nc = state
        return (c + 1,) + body(c, logT, nc)

    c_stop, logT, nc = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), jnp.zeros((pix, 1), jnp.float32),
                      jnp.zeros((pix, 1), jnp.float32)))

    # drain the prefetch issued for the chunk the early exit skipped
    # (c_stop < nchunks implies iteration c_stop-1 ran and prefetched it)
    @pl.when(c_stop < nchunks)
    def _():
        slab_copy(c_stop, c_stop % 2).wait()

    if emit_wsum:
        # zero the weight rows of skipped chunks (their instances blended
        # nothing; the buffer is uninitialized memory otherwise), continuing
        # the same slot parity / drain-two-behind discipline
        def zbody(c, _):
            slot = c % 2

            @pl.when(c >= 2)
            def _():
                w_copy(c - 2, slot).wait()

            wrow_vmem[slot] = jnp.zeros((1, wslot), jnp.float32)
            w_copy(c, slot).start()
            return 0

        jax.lax.fori_loop(c_stop, nchunks, zbody, 0)

        # drain the last two in-flight weight-row copies
        @pl.when(nchunks >= 1)
        def _():
            w_copy(nchunks - 1, (nchunks - 1) % 2).wait()

        @pl.when(nchunks >= 2)
        def _():
            w_copy(nchunks - 2, (nchunks - 2) % 2).wait()

    out_ref[0, ca + cv:ca + cv + 1, :] = logT.T
    out_ref[0, ca + cv + 1:ca + cv + 2, :] = nc.T
    out_ref[0, ca + cv + 2:ca + cv + 3, :] = jnp.full(
        (1, pix), 1.0, jnp.float32) * c_stop.astype(jnp.float32)


def blend_forward(slab: jax.Array, tile_start: jax.Array,
                  tile_count: jax.Array, *, ca: int, cv: int,
                  num_tiles: int, grid_x: int, tile: int = 16,
                  chunk: int = 128, interpret: bool = False,
                  emit_wsum: bool = True):
    """Run the forward blend.  ``slab`` is ROW-major [M, KR] (instance rows)
    so the producing gather writes contiguously; chunks are transposed to
    [KR, chunk] inside the kernel.  Returns (out [T, CA+CV+3, 256] —
    channel-major: plain accums, vertex accums, final logT, n_contrib,
    chunks-processed — and wsum [1, (M//chunk)*wsum_slot(chunk)] in the
    slot layout; convert with ``wsum_to_instances``).

    ``emit_wsum=False`` skips the per-chunk weight-row writebacks entirely
    (the wsum buffer is returned uninitialized — callers that don't need
    per-gaussian weights also skip their reduce)."""
    m, kr = slab.shape
    kernel = functools.partial(_fwd_kernel, chunk=chunk, ca=ca, cv=cv, kr=kr,
                               grid_x=grid_x, tile=tile,
                               emit_wsum=emit_wsum)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, ca + cv + 3, tile * tile),
                         lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            # slots 0/1: steady-state double buffer; 2/3: alternating
            # cross-tile first-chunk prefetch slots
            pltpu.VMEM((4, chunk, kr), jnp.float32),
            pltpu.VMEM((2, 1, wsum_slot(chunk)), jnp.float32),
            pltpu.VMEM((max(cv, 1), 4 * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, wsum = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, ca + cv + 3, tile * tile),
                                 jnp.float32),
            jax.ShapeDtypeStruct((1, (m // chunk) * wsum_slot(chunk)),
                                 jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(tile_start, tile_count, slab)
    return out, wsum


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(starts_ref, counts_ref, eff_ref, slab_hbm, gout_ref,
                meta_ref, gwsum_hbm, dslab_hbm,
                slab_vmem, grow_vmem, dslab_vmem, dslab_rows, va4_vmem,
                dma_sem, g_sem, d_sem,
                *, chunk, ca, cv, kr, grid_x, tile, has_gwsum=True):
    """Reverse sweep: chunks from last to first, reconstructing logT.

    Emits per-instance gradients d_slab [KR, chunk] per chunk.  Carries
    (logT_after, suf) where suf = sum over later instances of
    dL/dw * w  +  g_logT (the chain of log-transmittance into everything
    downstream) — the accum_rec recurrence of backward.cu:735-860 in
    prefix-sum form.
    """
    t = pl.program_id(0)
    nprog = pl.num_programs(0)
    pix = tile * tile
    start = pl.multiple_of(starts_ref[t], chunk)
    nchunks = counts_ref[t] // chunk
    px, py = _pixel_coords(t, grid_x, tile)
    sl = _tri_strict_lower(chunk)
    li = _tri_lower_incl(chunk)

    g_plain = gout_ref[0, 0:ca, :]                       # [CA, PIX]
    g_vf = gout_ref[0, ca:ca + cv, :] if cv else None
    g_logt = gout_ref[0, ca + cv:ca + cv + 1, :].T       # [PIX, 1]
    # forward stopped after nchunks_eff chunks (early exit); only those
    # entered logT_final and produced weights.  Passed as a prefetched
    # scalar array so tile t+1's LAST processed chunk can be prefetched
    # during tile t (see _fwd_kernel's cross-tile pipelining).
    nchunks_eff = eff_ref[t]

    # double-buffered staging (see _fwd_kernel): slab + g_wsum loads for the
    # next (earlier) chunk are issued before this chunk's compute; d_slab
    # stores drain two iterations later.  ``.wait()`` only consumes the
    # slot's semaphore by the copy's byte count, so reconstructing the
    # descriptor with any same-shape chunk index is a valid drain.
    def slab_copy_at(s, slot):
        return pltpu.make_async_copy(
            slab_hbm.at[pl.ds(pl.multiple_of(s, chunk), chunk), :],
            slab_vmem.at[slot], dma_sem.at[slot])

    def slab_copy(c, slot):
        return slab_copy_at(start + c * chunk, slot)

    wslot = wsum_slot(chunk)   # g_wsum slot layout (see _fwd_kernel w_copy)

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

    first = 2 + t % 2      # this tile's first-processed-chunk slot

    @pl.when((t == 0) & (nchunks_eff > 0))
    def _():
        slab_copy(nchunks_eff - 1, first).start()

    # cross-tile prefetch: tile t+1's last processed chunk
    @pl.when(t + 1 < nprog)
    def _():
        @pl.when(eff_ref[t + 1] > 0)
        def _():
            slab_copy_at(starts_ref[t + 1] + (eff_ref[t + 1] - 1) * chunk,
                         2 + (t + 1) % 2).start()

    @pl.when(nchunks_eff > 0)
    def _():
        if has_gwsum:
            g_copy(nchunks_eff - 1, 0).start()

    def body(i, carry):
        logT_after, suf = carry
        c = nchunks_eff - 1 - i
        slot = jnp.where(i == 0, first, i % 2)

        @pl.when(i + 1 < nchunks_eff)
        def _():
            slab_copy(c - 1, (i + 1) % 2).start()
            if has_gwsum:
                g_copy(c - 1, (i + 1) % 2).start()

        slab_copy(c, slot).wait()
        if has_gwsum:
            g_copy(c, i % 2).wait()   # g rows stay on the 2-slot buffer

        slab = slab_vmem[slot].T      # [KR, chunk]
        m = _chunk_math(slab, px, py, chunk)

        suffix_incl = _dot(m["loga"], li, ((1,), (0,)))   # [PIX, chunk]
        logT_excl = logT_after - suffix_incl
        gate = m["ok"] & (logT_excl >= LOG_T_EPS)
        expT = jnp.exp(logT_excl)
        w = jnp.where(gate, m["alpha"] * expT, 0.0)

        attrs = slab[NG:NG + ca, :]
        # dL/dw: plain channels + per-instance wsum grads (+ vertex below)
        dw = _dot(g_plain, attrs, ((0,), (0,)))           # [PIX, chunk]
        if has_gwsum:
            # broadcast [1, chunk] (first chunk lanes of the wslot row)
            dw += grow_vmem[i % 2][:, :chunk]

        # ---- vertex path ----
        d_du0 = jnp.zeros_like(w)
        d_du1 = jnp.zeros_like(w)
        d_lamx_row = jnp.zeros((1, chunk), jnp.float32)
        d_lamy_row = jnp.zeros((1, chunk), jnp.float32)
        if cv:
            u, v = m["u"], m["v"]
            # fused [CV, PIX]^T x [CV, 4*chunk] -> [PIX, 4*chunk]: one MXU op
            # for all four per-vertex cotangent projections; stacked via the
            # VMEM scratch for the same Mosaic layout reason as _fwd_kernel
            if _vfuse():
                for vtx in range(4):
                    va4_vmem[:, vtx * chunk:(vtx + 1) * chunk] = \
                        slab[NG + ca + vtx * cv: NG + ca + (vtx + 1) * cv, :]
                va4 = va4_vmem[:, :]                      # [CV, 4*chunk]
                mv4 = _dot(g_vf, va4, ((0,), (0,)))       # [PIX, 4*chunk]
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

        # ---- alpha chain ----
        s_term = dw * w                                   # dL/dlogT_excl_j
        d_loga = _dot(s_term, sl, ((1,), (0,))) + suf     # [PIX, chunk]
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

        # ---- write d_slab chunk ----
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
                # fused: one [CV, PIX] x [PIX, 4*chunk] matmul, then four
                # lane-aligned slice writes into the v-major d_slab rows
                wv4 = jnp.concatenate([w * wv[vtx] for vtx in range(4)],
                                      axis=1)             # [PIX, 4*chunk]
                dvf4 = _dot(g_vf, wv4, ((1,), (0,)))      # [CV, 4*chunk]
                for vtx in range(4):
                    dslab_vmem[NG + ca + vtx * cv:
                               NG + ca + (vtx + 1) * cv, :] = \
                        dvf4[:, vtx * chunk:(vtx + 1) * chunk]
            else:
                for vtx in range(4):
                    dslab_vmem[NG + ca + vtx * cv:
                               NG + ca + (vtx + 1) * cv, :] = \
                        _dot(g_vf, w * wv[vtx], ((1,), (0,)))

        # drain the store issued two iterations ago on this slot before
        # overwriting its staging buffer (the d staging is its own 2-slot
        # buffer keyed by i%2 — NOT the 4-slot slab `slot`)
        @pl.when(i >= 2)
        def _():
            d_copy(c, i % 2).wait()

        dslab_rows[i % 2] = dslab_vmem[:, :].T     # [chunk, KR]
        d_copy(c, i % 2).start()

        new_logT = logT_after - jnp.sum(m["loga"], axis=1, keepdims=True)
        new_suf = suf + jnp.sum(s_term, axis=1, keepdims=True)
        return (new_logT, new_suf)

    logT_final = meta_ref[0, 0:1, :].T                   # [PIX, 1]
    jax.lax.fori_loop(0, nchunks_eff, body, (logT_final, g_logt))

    # chunks skipped by the forward early exit contributed nothing:
    # their instance gradients are zero (fill the uninitialized rows);
    # store index k continues the main loop's count for slot parity
    def zbody(k, _):
        slot = k % 2

        @pl.when(k >= 2)
        def _():
            d_copy(0, slot).wait()

        dslab_rows[slot] = jnp.zeros((chunk, kr), jnp.float32)
        d_copy(k, slot).start()
        return 0

    jax.lax.fori_loop(nchunks_eff, nchunks, zbody, 0)

    # drain the last two in-flight d_slab stores (total stores = nchunks)
    @pl.when(nchunks >= 1)
    def _():
        d_copy(0, (nchunks - 1) % 2).wait()

    @pl.when(nchunks >= 2)
    def _():
        d_copy(0, (nchunks - 2) % 2).wait()


def blend_backward(slab: jax.Array, tile_start: jax.Array,
                   tile_count: jax.Array, g_out: jax.Array,
                   logt_final: jax.Array, g_wsum: Optional[jax.Array], *,
                   ca: int, cv: int, num_tiles: int, grid_x: int,
                   tile: int = 16, chunk: int = 128,
                   interpret: bool = False) -> jax.Array:
    """slab/d_slab are ROW-major [M, KR].  d_slab rows for chunks whose
    tiles were processed are written; the tail past the last tile's range
    is NOT (mask with inst_valid / gauss_pos).

    ``g_wsum=None`` drops the per-instance weight-sum cotangent path (the
    CUDA reference's out_weights is non-differentiable; training losses
    never read weights, so the [1, M] gather + per-chunk loads are waste)."""
    m, kr = slab.shape
    has_gwsum = g_wsum is not None
    if not has_gwsum:
        g_wsum = jnp.zeros((1, wsum_slot(chunk)), jnp.float32)
    kernel = functools.partial(_bwd_kernel, chunk=chunk, ca=ca, cv=cv, kr=kr,
                               grid_x=grid_x, tile=tile,
                               has_gwsum=has_gwsum)
    # per-tile processed-chunk counts (forward early-exit results) as a
    # prefetched scalar array -> cross-tile first-DMA prefetch in-kernel
    eff = logt_final[:, 2, 0].astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # slab
            pl.BlockSpec((1, ca + cv + 3, tile * tile),
                         lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                # g_out
            pl.BlockSpec((1, 3, tile * tile), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                # logT/nc/cstop
            pl.BlockSpec(memory_space=pl.ANY),                 # g_wsum
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),           # d_slab
        scratch_shapes=[
            # slots 0/1: steady-state double buffer; 2/3: alternating
            # cross-tile first-chunk prefetch slots
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
    )(tile_start, tile_count, eff, slab, g_out, logt_final, g_wsum)
    return d_slab


# ---------------------------------------------------------------------------
# column pad / slice copies (layout-pinning helpers)
# ---------------------------------------------------------------------------
# The instance gathers run at XLA-gather speed (~31 GB/s measured), so row
# width matters: slabs are packed to a 32-multiple for the gathers and
# padded to the kernel's 128-lane DMA width by these copies (which run at
# memory bandwidth and pin standard layouts on both sides).

def _pad_cols_kernel(x_ref, o_ref, *, kin):
    blk = x_ref.shape[0]
    o_ref[:, :] = jnp.concatenate(
        [x_ref[:, :], jnp.zeros((blk, o_ref.shape[1] - kin), jnp.float32)],
        axis=1)


def pad_cols(x: jax.Array, kout: int, *, block: int = 1024,
             interpret: bool = False) -> jax.Array:
    """[M, kin] -> [M, kout] zero-padded (kin <= kout)."""
    m, kin = x.shape
    if kin == kout:
        return x
    assert m % block == 0
    return pl.pallas_call(
        functools.partial(_pad_cols_kernel, kin=kin),
        grid=(m // block,),
        in_specs=[pl.BlockSpec((block, kin), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, kout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, kout), jnp.float32),
        interpret=interpret,
    )(x)


def _slice_cols_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :o_ref.shape[1]]


def slice_cols(x: jax.Array, kout: int, *, block: int = 1024,
               interpret: bool = False) -> jax.Array:
    """[M, kin] -> [M, kout] column slice (kout <= kin)."""
    m, kin = x.shape
    if kin == kout:
        return x
    assert m % block == 0
    return pl.pallas_call(
        _slice_cols_kernel,
        grid=(m // block,),
        in_specs=[pl.BlockSpec((block, kin), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, kout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, kout), jnp.float32),
        interpret=interpret,
    )(x)
