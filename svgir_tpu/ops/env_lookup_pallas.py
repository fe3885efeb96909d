"""Pallas equirect bilinear env-map lookup (forward + env-gradient).

The stage-2 train step evaluates the learnable environment map at every
(gaussian, sample) incident direction — 1.2M queries at bench shapes
(50k x 24).  The XLA formulation (models/lights._bilinear_lookup: one-hot
MXU matmuls chunked through ``lax.map``) spends ~27 ms/step in loop
plumbing — dynamic-update-slices of [19, 65536, 64] stacked one-hot
buffers, layout copies between iterations — against <1 ms of actual
matmul (r3 profile, docs/PERF.md).  This kernel keeps the one-hot
factorization but builds the weight matrices **in VMEM per grid step**, so
HBM traffic is just queries in + samples out:

  forward  (per BQ-query block):
      wrowT[H, BQ], wcolT[W, BQ]   2-tap one-hot bilinear weights
      rows_c[W, BQ]  = envT_c[W, H] @ wrowT          (MXU, per channel)
      out_c [1, BQ]  = sum_w wcolT * rows_c          (VPU reduce)
  backward (same blocks, accumulated across the grid into one [H, W*C]
  VMEM block):
      d_env_c[H, W] += wrowT @ (wcolT * g_c)^T       (MXU, per channel)

No gradient w.r.t. the query directions is produced: every caller looks
up *constant* directions (baked fibonacci incident dirs, fixed camera ray
grids), matching the reference where ``grid_sample`` grads flow to the
env only (direct_light_map.py:70-83).

Edge semantics match lights._bilinear_lookup exactly (align_corners
floor-cell clamp to H-2/W-2 with the fractional weight collapsing onto
the second tap at the clamped edge).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQ = 16384         # queries per grid step
_BR = 8             # query sublane rows per block (Mosaic block-shape rule)


def _weights_T(q, size):
    """Transposed 2-tap one-hot bilinear weights [size, BQ] for pixel
    coords q [1, BQ] in [0, size-1] (align_corners clamp semantics)."""
    q0 = jnp.clip(jnp.floor(q), 0, size - 1)
    f = jnp.clip(q - q0, 0.0, 1.0)
    q0i = q0.astype(jnp.int32)
    s = jnp.minimum(q0i, size - 2)
    w1 = jnp.where(q0i > s, 1.0, f)                     # [1, BQ]
    ii = jax.lax.broadcasted_iota(jnp.int32, (size, q.shape[1]), 0)
    return ((ii == s) * (1.0 - w1) + (ii == s + 1) * w1)  # [size, BQ]


def _flat_q(q_ref):
    """[1, _BR, BQ/_BR] query block -> [1, BQ] lane-major row (lane concat
    of the sublane groups; static offsets, cheap)."""
    return jnp.concatenate([q_ref[0, r:r + 1, :] for r in range(_BR)],
                           axis=1)


def _fwd_kernel(envt_ref, u_ref, v_ref, out_ref, *, h, w, c):
    """envt [C, W, H] (transposed channels-out env), u/v [1, _BR, BQ/_BR]
    pixel coords, out [C, BQ]."""
    wrow = _weights_T(_flat_q(v_ref), h)                # [H, BQ]
    wcol = _weights_T(_flat_q(u_ref), w)                # [W, BQ]
    for ch in range(c):
        rows = jax.lax.dot_general(
            envt_ref[ch], wrow, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)        # [W, BQ]
        out_ref[ch:ch + 1, :] = jnp.sum(wcol * rows, axis=0, keepdims=True)


def _bwd_kernel(u_ref, v_ref, g_ref, denv_ref, *, h, w, c):
    """g [C, BQ] out-cotangents -> d_env [C, H, W] accumulated over the
    whole grid (constant output block index -> stays in VMEM)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        denv_ref[...] = jnp.zeros((c, h, w), jnp.float32)

    wrow = _weights_T(_flat_q(v_ref), h)                # [H, BQ]
    wcol = _weights_T(_flat_q(u_ref), w)                # [W, BQ]
    for ch in range(c):
        a = wcol * g_ref[ch:ch + 1, :]                  # [W, BQ]
        d = jax.lax.dot_general(
            wrow, a, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)        # [H, W]
        denv_ref[ch] += d


def _pad_queries(u, v):
    m = u.shape[0]
    nb = -(-m // _BQ)
    pad = nb * _BQ - m
    # [nb, _BR, BQ/_BR] blocks satisfy the Mosaic block-shape rule (last
    # two dims divisible by 8 / 128); the kernel re-flattens on lanes
    up = jnp.pad(u, (0, pad)).reshape(nb, _BR, _BQ // _BR)
    vp = jnp.pad(v, (0, pad)).reshape(nb, _BR, _BQ // _BR)
    return up, vp, nb


def _run_fwd(env, u, v, *, interpret):
    h, w, c = env.shape
    m = u.shape[0]
    up, vp, nb = _pad_queries(u, v)
    envt = jnp.transpose(env, (2, 1, 0))                # [C, W, H]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, c=c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((c, w, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BR, _BQ // _BR), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BR, _BQ // _BR), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, _BQ), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, nb * _BQ), jnp.float32),
        interpret=interpret,
    )(envt, up, vp)
    return out[:, :m].T                                 # [M, C]


def _run_bwd(env_shape, u, v, g, *, interpret):
    h, w, c = env_shape
    m = u.shape[0]
    up, vp, nb = _pad_queries(u, v)
    gt = jnp.pad(g.T, ((0, 0), (0, nb * _BQ - m)))      # [C, nb*BQ]
    denv = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w, c=c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, _BR, _BQ // _BR), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BR, _BQ // _BR), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, _BQ), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, h, w), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=interpret,
    )(up, vp, gt)
    return jnp.transpose(denv, (1, 2, 0))               # [H, W, C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bilinear_lookup_pallas(env, u, v, interpret=False):
    """align_corners bilinear sample of env [H, W, C] at pixel coords
    u, v [M] -> [M, C].  Differentiable w.r.t. ``env`` only (query coords
    are treated as constants — all callers pass baked/fixed directions)."""
    return _run_fwd(env, u, v, interpret=interpret)


def _lookup_fwd(env, u, v, interpret):
    return _run_fwd(env, u, v, interpret=interpret), (env.shape, u, v)


def _lookup_bwd(interpret, res, g):
    env_shape, u, v = res
    return (_run_bwd(env_shape, u, v, g, interpret=interpret), None, None)


bilinear_lookup_pallas.defvjp(_lookup_fwd, _lookup_bwd)
