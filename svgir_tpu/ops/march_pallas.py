"""Fused candidate-test + top-k merge kernel for the grid march.

The r4 march pays per visit: an XLA gather of pre-packed geometry rows
(bandwidth-optimal, keep it), then ~15 materialized [R, BLK] temporaries
for the surfel tests plus a bitonic top-k network — every one of them an
HBM round trip at [R, BLK] f32.  This kernel fuses test + merge into one
VMEM-resident pass per visit: the gathered rows stream in once, the
(t, idx) running top-k lives in VMEM, and nothing else touches HBM.
Math is the EXACT f32 test from grid_tracer._test_candidates
(intersect_test.slang:1879-1990 parity path); the merge keeps
``bitonic_topk_small``'s contract — finite-slot agreement, inf/-1 padding.

Layout contract: geometry rows arrive FIELD-MAJOR ([32, BLK] per row,
flattened) so the kernel extracts field ``f`` as the static lane slice
``[f*BLK:(f+1)*BLK]`` — no in-kernel relayout.  ``grid_tracer`` builds
``block_geo`` in this layout (see _build_geo_blocks).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svgir_tpu.ops import tracing

_RB = 256      # rays per grid step (sublane-aligned blocks of 8)


def _pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


def use_pallas_march() -> bool:
    """Default OFF — two open issues, both diagnosed 2026-08-21:

    1. NUMERICS (root-caused): the march's alpha gate evaluates the 3D
       inv_cov quadratic at the plane hit — for thin surfels
       (scale_z ~ 0, inv_cov ~ 1e10) that is catastrophic cancellation,
       and the result is REASSOCIATION NOISE of magnitude +-tens (one
       measured hit: XLA order -> power ~ -0.0, kernel order -> -16.0,
       mathematically exact value -3.3 = -0.5*(u^2+v^2)).  The XLA visit
       path agrees with the brute oracle only because both share one
       evaluation order (the reference CUDA has the same formula and the
       same property, intersect_test.slang:374-381); the kernel's order
       differs, so near-rim accept/reject decisions diverge (~25% of
       finite hits on the thin-surfel test scene).  The fix is a stable
       gate (power = -0.5*dis from the local-frame u,v that both paths
       already compute) applied to kernel AND XLA AND oracle together —
       a semantics change vs the reference's noise, left for follow-up.
    2. On the real chip the first bake run faulted the TPU worker
       ("kernel fault", 03:53, /tmp/stage2_r5.log) — possibly the same
       issue manifesting differently, not yet reproduced in isolation.

    Opt in with SVGIR_MARCH_PALLAS=1 for debugging."""
    env = os.environ.get("SVGIR_MARCH_PALLAS")
    if env is not None:
        return env not in ("0", "false")
    return False


def _march_kernel(g_ref, o_ref, d_ref, tlo_ref, thi_ref, ht_in, hi_in,
                  ht_out, hi_out, *, blk: int, k: int):
    """One visit for RB rays: test BLK candidates, merge into top-k.

    g_ref   [RB, 32*BLK] field-major packed rows
    o_ref   [RB, 3] ray origins;  d_ref [RB, 3] directions
    tlo/thi [RB, 1] visit t-span
    ht/hi   [RB, k] running hits (t f32, idx int32), in and out
    """
    f = lambda i: g_ref[:, i * blk:(i + 1) * blk]          # [RB, BLK]
    ox, oy, oz = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]
    dx, dy, dz = d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3]

    nx, ny, nz = f(21), f(22), f(23)
    denom = nx * dx + ny * dy + nz * dz
    denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    mx, my, mz = f(0), f(1), f(2)
    t_plane = ((mx - ox) * nx + (my - oy) * ny + (mz - oz) * nz) / denom

    # pos - mean (plane-projected)
    px = ox + t_plane * dx - mx
    py = oy + t_plane * dy - my
    pz = oz + t_plane * dz - mz

    # local tangent coords: local_j = sum_i rot[i, j] * p_i
    # rot row-major at lanes 6..14: rot[i, j] = lane 6 + 3*i + j
    lu = f(6) * px + f(9) * py + f(12) * pz
    lv = f(7) * px + f(10) * py + f(13) * pz
    sx = jnp.maximum(f(3), 1e-12)
    sy = jnp.maximum(f(4), 1e-12)
    u = lu / sx
    v = lv / sy
    dis = u * u + v * v

    # gaussian power with pd = mean - pos = -(p)
    ic0, ic1, ic2 = f(15), f(16), f(17)
    ic3, ic4, ic5 = f(18), f(19), f(20)
    power = -0.5 * (ic0 * px * px + ic3 * py * py + ic5 * pz * pz
                    + 2.0 * (ic1 * px * py + ic2 * px * pz + ic4 * py * pz))
    opacity = f(24)
    alpha = jnp.minimum(tracing.ALPHA_MAX, opacity * jnp.exp(power))
    facing = (nx * dx + ny * dy + nz * dz) < 0.0
    ids = f(26)
    ok = ((ids >= 0.0) & (f(25) > 0.5) & (dis <= 9.0) & (power <= 0.0)
          & (alpha >= tracing.ALPHA_MIN) & facing
          & (t_plane >= tlo_ref[:, 0:1]) & (t_plane < thi_ref[:, 0:1]))
    cand_t = jnp.where(ok, t_plane, jnp.inf)
    cand_i = jnp.where(ok, ids.astype(jnp.int32), -1)

    # merge: iterative min-extraction over [RB, P] (P = pow2(k + BLK));
    # finite-slot agreement with bitonic_topk_small (ties broken by lane)
    p = _pow2(k + blk)
    rb = cand_t.shape[0]
    pad = p - (k + blk)
    all_t = jnp.concatenate(
        [ht_in[...], cand_t,
         jnp.full((rb, pad), jnp.inf, cand_t.dtype)], axis=1)
    all_i = jnp.concatenate(
        [hi_in[...], cand_i,
         jnp.full((rb, pad), -1, jnp.int32)], axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, p), 1)
    BIG = jnp.int32(p + 7)
    for j in range(k):
        m = jnp.min(all_t, axis=1, keepdims=True)           # [RB, 1]
        at_min = all_t == m
        first = jnp.min(jnp.where(at_min, lane, BIG), axis=1,
                        keepdims=True)
        pick = lane == first
        picked_i = jnp.max(jnp.where(pick, all_i, -1), axis=1,
                           keepdims=True)
        finite = m < jnp.inf
        ht_out[:, j:j + 1] = m
        hi_out[:, j:j + 1] = jnp.where(finite, picked_i, -1)
        all_t = jnp.where(pick, jnp.inf, all_t)


@functools.partial(jax.jit, static_argnames=("blk", "k", "interpret"))
def march_test_merge(g, rays_o, rays_d, t_lo, t_hi, hits_t, hits_idx, *,
                     blk: int, k: int, interpret: bool = False):
    """Fused visit: (gathered field-major rows [R, 32*BLK]) + running hits
    -> merged hits.  Pads R to a multiple of _RB internally."""
    r = g.shape[0]
    rp = -(-r // _RB) * _RB
    if rp != r:
        padr = rp - r
        g = jnp.pad(g, ((0, padr), (0, 0)))
        rays_o = jnp.pad(rays_o, ((0, padr), (0, 0)))
        # pad direction z=1 to keep denom guards well-formed
        rays_d = jnp.pad(rays_d, ((0, padr), (0, 0)),
                         constant_values=1.0)
        t_lo = jnp.pad(t_lo, (0, padr))
        t_hi = jnp.pad(t_hi, (0, padr))
        hits_t = jnp.pad(hits_t, ((0, padr), (0, 0)),
                         constant_values=jnp.inf)
        hits_idx = jnp.pad(hits_idx, ((0, padr), (0, 0)),
                           constant_values=-1)

    grid = (rp // _RB,)
    rspec = lambda w: pl.BlockSpec((_RB, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    out_t, out_i = pl.pallas_call(
        functools.partial(_march_kernel, blk=blk, k=k),
        grid=grid,
        in_specs=[rspec(32 * blk), rspec(3), rspec(3), rspec(1), rspec(1),
                  rspec(k), rspec(k)],
        out_specs=(rspec(k), rspec(k)),
        out_shape=(jax.ShapeDtypeStruct((rp, k), jnp.float32),
                   jax.ShapeDtypeStruct((rp, k), jnp.int32)),
        interpret=interpret,
    )(g, rays_o, rays_d, t_lo[:, None], t_hi[:, None], hits_t, hits_idx)
    return out_t[:r], out_i[:r]
