"""Single source of truth for the per-(Gaussian, pixel) blend math.

Shared by the dense reference renderer (``ops/dense_ref.py``) and the tiled
Pallas kernel (``ops/blend_pallas.py``) so both paths agree bit-for-bit.

Reference: svgss ``renderCUDA`` (forward.cu:402-750) and ``auxiliary.h``
(``depth_differencing`` :390-397, ``scr_to_tangent`` :399-403).

Transmittance semantics (documented deviation from CUDA): the CUDA kernel
latches a per-pixel ``done`` flag when ``T*(1-alpha) < 1e-4`` and stops
updating T.  We instead keep log-space transmittance that every passing
splat multiplies into, and gate contributions by ``T_before >= 1e-4``.
Differences are confined to contributions of weight < 1e-4 in already
saturated pixels (below the parity tolerance), and the log-space form is an
exact prefix-sum — which is what makes the MXU/chunked formulation and the
numerically-stable reverse reconstruction in the backward possible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
LOG_T_EPS = -9.210340371976182  # log(1e-4)


def splat_alpha(dx, dy, conic_x, conic_y, conic_z, opacity):
    """alpha and pass-mask for a splat at pixel offset d = mean2d - pix.

    forward.cu:530-547.  Returns (alpha, ok) — ``ok`` encodes the
    ``power > 0`` and ``alpha < 1/255`` skips.
    """
    power = -0.5 * (conic_x * dx * dx + conic_z * dy * dy) - conic_y * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opacity * jnp.exp(power))
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN)
    return alpha, ok


def tangent_offsets(dx, dy, j0, j1, j2, j3):
    """scr_to_tangent (auxiliary.h:399-403): dif_u = Jinv_2x2 @ d."""
    return dx * j0 + dy * j1, dx * j2 + dy * j3


def depth_offset_z(du0, du1, u0z, u1z):
    """z of depth_differencing's pos_dif (auxiliary.h:390-397)."""
    return du0 * u0z + du1 * u1z


def vertex_weights(du0, du1, lam_x, lam_y):
    """Bilinear vertex weights from tangent offsets (forward.cu:604-617).

    uv = clamp(d_tan / (0.5*scale + 0.1) * 0.5 + 0.5, 0.001, 0.999).
    Returns (w0, w1, w2, w3).
    """
    uv_max_x = 0.5 * lam_x + 0.1
    uv_max_y = 0.5 * lam_y + 0.1
    u = jnp.clip(du0 / uv_max_x * 0.5 + 0.5, 0.001, 0.999)
    v = jnp.clip(du1 / uv_max_y * 0.5 + 0.5, 0.001, 0.999)
    w0 = (1 - u) * (1 - v)
    w1 = u * (1 - v)
    w2 = (1 - u) * v
    w3 = u * v
    return w0, w1, w2, w3


def finalize_depth(D, T, normalize_depth: bool):
    """forward.cu:689: D/(1-T) when normalizing (guarded), else D + 10*T."""
    if normalize_depth:
        return D / jnp.maximum(1.0 - T, 1e-6)
    return D + T * 10.0
