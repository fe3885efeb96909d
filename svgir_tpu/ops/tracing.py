"""Ray-traced visibility and radiance over Gaussian surfels (TPU-native).

Replaces two CUDA/Slang subsystems with one vectorized JAX family
(SURVEY.md §7 P4):

* ``trace_visibility`` — the LBVH opacity tracer (submodules/bvh/trace.cu
  :196-280).  Key insight: the CUDA early-exit (`T < 0.9 -> 0`) is
  order-independent because T is a monotone product, so the whole query is a
  masked product over (ray, gaussian) pairs — no traversal order needed.
* ``trace_radiance_sh`` — the Slang sampling-SH march
  (intersect_test.slang:1879-1990): repeated nearest-hit queries in sliding
  t-windows, compositing SH radiance front-to-back.  We gather each ray's
  K nearest accepted hits by t (K static) and replay the march over that
  sorted list with ``lax.scan`` — identical output whenever the march
  terminates within K hits (tracked via an ``exhausted`` flag).

Both run in gaussian-chunked form: [R, Gc] pair tiles (MXU/VPU friendly).
Brute force is exact and is the oracle; ``grid`` module adds the
uniform-grid culled version for large scenes.

Deviation noted: the Slang leaf loop returns the (1 - alpha) of the LAST
traversal-order hit while compositing the closest-t hit
(intersect_test.slang:414-424); we use the closest hit's alpha (the sane
reading), which only differs under BVH-order artifacts.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from svgir_tpu.utils.transforms import normalize, quat_to_rotmat

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


class SurfelGeometry(NamedTuple):
    """Per-gaussian quantities used by all tracers (precompute once)."""

    means: jax.Array        # [N, 3]
    inv_cov: jax.Array      # [N, 6] inverse covariance (xx,xy,xz,yy,yz,zz)
    opacity: jax.Array      # [N]
    normal: jax.Array       # [N, 3] geometric normal (R[:,2])
    rot: jax.Array          # [N, 3, 3]
    scales: jax.Array       # [N, 3]
    valid: jax.Array        # [N] bool


def build_surfel_geometry(means, scales, quats, opacity, valid=None,
                          max_inv_scale: float = 1e6) -> SurfelGeometry:
    """Inverse covariance R diag(1/s^2) R^T (gaussian_model.py:379-382).

    1/s is clamped (flat surfels store z-scale ~0 / raw -1e10) so the
    intersection math stays finite — the clamp only moves the max-density
    point negligibly off the exact surfel plane.
    """
    R = quat_to_rotmat(quats)
    inv_s = jnp.minimum(1.0 / jnp.maximum(scales, 1e-12), max_inv_scale)
    M = R * inv_s[:, None, :]
    S = M @ jnp.swapaxes(M, -1, -2)
    inv_cov = jnp.stack([S[:, 0, 0], S[:, 0, 1], S[:, 0, 2],
                         S[:, 1, 1], S[:, 1, 2], S[:, 2, 2]], -1)
    n = means.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    return SurfelGeometry(means=means, inv_cov=inv_cov, opacity=opacity,
                          normal=R[:, :, 2], rot=R, scales=scales,
                          valid=valid)


def _pair_terms(geo: SurfelGeometry, rays_o, rays_d, sl):
    """Per (ray, gaussian-chunk) quantities.  rays [R,3]; chunk slice sl.

    Returns dict of [R, Gc] arrays: t (max-density point along ray),
    power (log density there), alpha.
    """
    mu = geo.means[sl]                       # [Gc, 3]
    ic = geo.inv_cov[sl]                     # [Gc, 6]
    d = rays_d                               # [R, 3]
    o = rays_o

    # q = Sigma^-1 (mu - o): expand symmetric 6-vector product
    mo = mu[None] - o[:, None]               # [R, Gc, 3]
    qx = ic[:, 0] * mo[..., 0] + ic[:, 1] * mo[..., 1] + ic[:, 2] * mo[..., 2]
    qy = ic[:, 1] * mo[..., 0] + ic[:, 3] * mo[..., 1] + ic[:, 4] * mo[..., 2]
    qz = ic[:, 2] * mo[..., 0] + ic[:, 4] * mo[..., 1] + ic[:, 5] * mo[..., 2]
    t1 = qx * d[:, None, 0] + qy * d[:, None, 1] + qz * d[:, None, 2]

    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    t2 = (ic[None, :, 0] * dx * dx + ic[None, :, 3] * dy * dy
          + ic[None, :, 5] * dz * dz
          + 2 * (ic[None, :, 1] * dx * dy + ic[None, :, 2] * dx * dz
                 + ic[None, :, 4] * dy * dz))
    t = t1 / jnp.where(t2 == 0, 1e-12, t2)   # [R, Gc]

    # power at the hit point: delta = mu - (o + t d) = mo - t d
    hx = mo[..., 0] - t * dx
    hy = mo[..., 1] - t * dy
    hz = mo[..., 2] - t * dz
    power = -0.5 * (ic[None, :, 0] * hx * hx + ic[None, :, 3] * hy * hy
                    + ic[None, :, 5] * hz * hz
                    + 2 * (ic[None, :, 1] * hx * hy + ic[None, :, 2] * hx * hz
                           + ic[None, :, 4] * hy * hz))
    alpha = geo.opacity[sl][None] * jnp.exp(power)
    return {"t": t, "power": power, "alpha": alpha}


# ---------------------------------------------------------------------------
# visibility (trace.cu:196-280 semantics)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("chunk",))
def trace_visibility(geo: SurfelGeometry, rays_o: jax.Array,
                     rays_d: jax.Array, *, chunk: int = 512) -> Dict:
    """Opacity along rays.  rays_o/d [R, 3] (callers pre-offset origins by
    0.05*d, bvh/__init__.py:59).  Returns visibility [R, 1], contribute
    [R, 1].
    """
    n = geo.means.shape[0]
    r = rays_o.shape[0]
    nchunks = -(-n // chunk)
    npad = nchunks * chunk

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((npad - n,) + x.shape[1:], x.dtype)], axis=0)
    geo_p = SurfelGeometry(*[pad(x) for x in geo])

    def body(carry, i):
        log_t, count = carry
        sl = jax.lax.dynamic_slice_in_dim
        sub = SurfelGeometry(*[sl(x, i * chunk, chunk) for x in geo_p])
        terms = _pair_terms(sub, rays_o, rays_d, slice(None))
        ok = (sub.valid[None]
              & (sub.opacity[None] >= ALPHA_MIN)
              & (jnp.sum(sub.normal[None] * rays_d[:, None], -1) <= 0)
              & (terms["t"] >= 0.01)
              & (terms["power"] <= 0))
        alpha = jnp.where(ok, terms["alpha"], 0.0)
        log_t = log_t + jnp.sum(jnp.log1p(-jnp.minimum(alpha, ALPHA_MAX)),
                                axis=1)
        count = count + ok.sum(axis=1)
        return (log_t, count), None

    (log_t, count), _ = jax.lax.scan(
        body, (jnp.zeros((r,)), jnp.zeros((r,), jnp.int32)),
        jnp.arange(nchunks))
    vis = jnp.exp(log_t)
    vis = jnp.where(vis < 0.9, 0.0, vis)
    return {"visibility": vis[:, None], "contribute": count[:, None]}


# ---------------------------------------------------------------------------
# nearest-K hits + radiance march (intersect_test.slang:1879-1990)
# ---------------------------------------------------------------------------

def _ellipse_uv(geo_sub: SurfelGeometry, rays_o, rays_d, t):
    """Local uv at the ray-plane intersection (ellipse_hit,
    intersect_test.slang:94-150) including the u<v swap quirk.  Returns
    (uv [R,Gc,2], dis [R,Gc] ellipse metric, t_plane [R,Gc])."""
    c = geo_sub.means
    n = geo_sub.normal                           # plane normal ~ R[:,2]
    denom = jnp.sum(n[None] * rays_d[:, None], -1)
    denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    t_plane = jnp.sum((c[None] - rays_o[:, None]) * n[None], -1) / denom
    pos = rays_o[:, None] + t_plane[..., None] * rays_d[:, None]
    local = jnp.einsum("gij,rgi->rgj", geo_sub.rot, pos - c[None])
    sx = jnp.maximum(geo_sub.scales[:, 0], 1e-12)
    sy = jnp.maximum(geo_sub.scales[:, 1], 1e-12)
    u = local[..., 0] / sx[None]
    v = local[..., 1] / sy[None]
    swap = u < v
    u2 = jnp.where(swap, v, u)
    v2 = jnp.where(swap, u, v)
    uv = jnp.stack([jnp.clip(u2 * 0.5 + 0.5, 0.001, 0.999),
                    jnp.clip(v2 * 0.5 + 0.5, 0.001, 0.999)], -1)
    dis = u * u + v * v
    return uv, dis, t_plane


@partial(jax.jit, static_argnames=("chunk", "k"))
def nearest_hits(geo: SurfelGeometry, rays_o: jax.Array, rays_d: jax.Array,
                 self_index: Optional[jax.Array] = None, *,
                 chunk: int = 512, k: int = 16) -> Dict:
    """K nearest accepted hits per ray, sorted by t.

    Acceptance mirrors the gs_bvh_hit leaf test
    (intersect_test.slang:356-412): plane hit inside the 3-sigma ellipse,
    power <= 0 at the plane hit, alpha in [1/255, ..], front-facing
    (dir . normal < 0).  t_min filtering is left to the march (windows
    move).  Returns dict of [R, k] arrays: t (inf = none), idx, alpha, uv.
    """
    n = geo.means.shape[0]
    r = rays_o.shape[0]
    nchunks = -(-n // chunk)
    npad = nchunks * chunk

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((npad - n,) + x.shape[1:], x.dtype)], axis=0)
    geo_p = SurfelGeometry(*[pad(x) for x in geo])

    init = {
        "t": jnp.full((r, k), jnp.inf),
        "idx": jnp.full((r, k), -1, jnp.int32),
        "alpha": jnp.zeros((r, k)),
        "uv": jnp.zeros((r, k, 2)),
    }

    def body(carry, i):
        sl = jax.lax.dynamic_slice_in_dim
        sub = SurfelGeometry(*[sl(x, i * chunk, chunk) for x in geo_p])
        uv, dis, t_plane = _ellipse_uv(sub, rays_o, rays_d, None)
        # gaussian_fn power at the plane-hit position
        ic = sub.inv_cov
        pos_delta = (sub.means[None] - rays_o[:, None]
                     - t_plane[..., None] * rays_d[:, None])
        px, py, pz = pos_delta[..., 0], pos_delta[..., 1], pos_delta[..., 2]
        power = -0.5 * (ic[None, :, 0] * px * px + ic[None, :, 3] * py * py
                        + ic[None, :, 5] * pz * pz
                        + 2 * (ic[None, :, 1] * px * py
                               + ic[None, :, 2] * px * pz
                               + ic[None, :, 4] * py * pz))
        alpha = jnp.minimum(ALPHA_MAX, sub.opacity[None] * jnp.exp(power))
        facing = jnp.sum(rays_d[:, None] * sub.normal[None], -1) < 0.0
        gidx = i * chunk + jnp.arange(chunk)
        ok = (sub.valid[None] & (dis <= 9.0) & (power <= 0)
              & (alpha >= ALPHA_MIN) & facing & (t_plane > 0))
        if self_index is not None:
            ok &= gidx[None] != self_index[:, None]
        t_cand = jnp.where(ok, t_plane, jnp.inf)

        # merge chunk candidates into the running top-k (smallest t)
        all_t = jnp.concatenate([carry["t"], t_cand], axis=1)
        all_idx = jnp.concatenate(
            [carry["idx"], jnp.broadcast_to(gidx[None], t_cand.shape)], axis=1)
        all_alpha = jnp.concatenate([carry["alpha"], alpha], axis=1)
        all_uv = jnp.concatenate([carry["uv"], uv], axis=1)
        neg_top, sel = jax.lax.top_k(-all_t, k)
        take = jnp.take_along_axis
        carry = {
            "t": -neg_top,
            "idx": take(all_idx, sel, axis=1),
            "alpha": take(all_alpha, sel, axis=1),
            "uv": take(all_uv, sel[..., None], axis=1),
        }
        return carry, None

    hits, _ = jax.lax.scan(body, init, jnp.arange(nchunks))
    return hits


def radiance_march(hits: Dict, self_index: jax.Array, shs: jax.Array,
                   means: jax.Array, rays_o: jax.Array, *,
                   t_min_first: float = 0.042, t_min_next: float = 0.01,
                   t_window: float = 0.2) -> Dict:
    """Replay the sampling-SH march over the sorted hit list.

    Matches intersect_test.slang:1928-1978: sliding window (first segment
    [0.042, 0.2], then [t+0.01, t+0.2] from each accepted hit), composite
    ``sh += eval_sh(hit, dir to hit center) * alpha * T``; stop at a window
    gap, when the nearest in-window hit is the source surfel, or T <= 0.001;
    visible = False once T < 0.2.  Returns radiance [R, 3] (clamped [0,10]),
    visibility [R, 1], first_hit [R], first_uv [R, 2], exhausted [R] (ran
    out of K hits while still marching — caller may raise K).
    """
    from svgir_tpu.utils import sh as sh_utils

    r, k = hits["t"].shape

    def step(carry, i):
        t_prev, T, sh_acc, first, first_uv, done, visible = carry
        t_i = hits["t"][:, i]
        idx_i = hits["idx"][:, i]
        # window start: absolute lower bound for the next accepted hit
        lo = jnp.where(first < 0, t_min_first, t_prev + t_min_next)
        hi = jnp.where(first < 0, t_window, t_prev + t_window)
        # skip hits below the window (march has passed them)
        skip = t_i < lo
        in_win = (t_i >= lo) & (t_i <= hi) & jnp.isfinite(t_i)
        gap = ~skip & ~in_win          # nearest remaining hit beyond window
        is_self = in_win & (idx_i == self_index)

        accept = in_win & ~is_self & ~done
        done = done | ((gap | is_self) & ~done)

        # composite
        hit_center = means[jnp.clip(idx_i, 0, means.shape[0] - 1)]
        sh_dir = normalize(hit_center - rays_o)
        # eval SH of the hit surfel toward sh_dir, +0.5 (sh_utils.slang)
        c = sh_utils.eval_sh(3, jnp.swapaxes(
            shs[jnp.clip(idx_i, 0, shs.shape[0] - 1)], -1, -2), sh_dir) + 0.5
        alpha_i = hits["alpha"][:, i]
        contrib = jnp.where(accept[:, None], c * (alpha_i * T)[:, None], 0.0)
        sh_acc = sh_acc + contrib

        new_T = jnp.where(accept, T * (1 - alpha_i), T)
        visible = visible & ~(accept & (new_T < 0.2))
        first_new = jnp.where(accept & (first < 0), idx_i, first)
        first_uv = jnp.where((accept & (first < 0))[:, None],
                             hits["uv"][:, i], first_uv)
        t_prev = jnp.where(accept, t_i, t_prev)
        done = done | (new_T <= 0.001)
        return (t_prev, new_T, sh_acc, first_new, first_uv, done, visible), None

    init = (jnp.zeros((r,)), jnp.ones((r,)), jnp.zeros((r, 3)),
            jnp.full((r,), -1, jnp.int32), jnp.zeros((r, 2)),
            jnp.zeros((r,), bool), jnp.ones((r,), bool))
    (t_prev, T, sh_acc, first, first_uv, done, visible), _ = jax.lax.scan(
        step, init, jnp.arange(k))

    # if we consumed all K finite hits without terminating, results are a
    # lower bound — flag it
    exhausted = ~done & jnp.isfinite(hits["t"][:, k - 1])
    radiance = jnp.clip(sh_acc, 0.0, 10.0)
    visibility = jnp.where(visible, T, 0.0)
    return {"radiance": radiance, "visibility": visibility[:, None],
            "first_hit": first, "first_uv": first_uv, "exhausted": exhausted}
