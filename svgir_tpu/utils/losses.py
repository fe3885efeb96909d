"""Image losses (pure JAX): SSIM, edge-aware smoothness, TV, cosine.

Reference: ``utils/loss_utils.py``.  The edge-aware losses there call
kornia's ``spatial_gradient(mode='sobel', normalized=True)``; we reproduce
those kernels (3x3 sobel / 8 for order 1; 5x5 2nd-order sobel / 64 for xx,yy)
with replicate padding.  Sign/flip conventions are irrelevant downstream
(every consumer takes ``abs``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.abs(a - b).mean()


def mse_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.square(a - b).mean()


def psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """utils/image_utils.py:32-37 (peak 1.0): per-CHANNEL mse -> psnr,
    averaged (``mse.view(C, -1).mean(1)`` then ``psnr(...).mean()``) —
    log-of-mean differs from mean-of-logs by ~1e-3 dB, which the
    exec-oracle parity test resolves."""
    c = img1.shape[0]
    mse = jnp.square(img1 - img2).reshape(c, -1).mean(axis=1)
    return (20 * jnp.log10(1.0 / jnp.sqrt(mse))).mean()


# ---------------------------------------------------------------------------
# SSIM (loss_utils.py:21-64): 11x11 gaussian window, sigma 1.5, zero padding
# ---------------------------------------------------------------------------

def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def _band_matrix(n: int, g1d: np.ndarray) -> np.ndarray:
    """Banded Toeplitz matrix equivalent to a zero-padded 1-D convolution
    with kernel ``g1d``: row u holds g1d centered at column u."""
    k = g1d.shape[0]
    pad = k // 2
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    d = j - i + pad
    return np.where((d >= 0) & (d < k), g1d[np.clip(d, 0, k - 1)],
                    0.0).astype(np.float32)


def _ssim_train_precision():
    """MXU precision tier for the *training-loss* SSIM blur.

    HIGHEST (bf16_6x) is the f32-faithful tier; DEFAULT is one bf16 pass
    (~3e-3 relative error on the blurred moments, 1.8e-2 relative grad
    delta on the full loss) at 6x the MXU rate — measured +0.5 Mpix/s on
    the stage-1 step (tools/exp_r2.py step "e", 2026-08-18), shipped as
    the TRAINING default.  Controlled by SVGIR_SSIM_PRECISION ∈
    {default, highest}; eval metrics always use HIGHEST regardless
    (``precision=`` argument at the call site, eval/metrics.py).

    Read at TRACE time: flipping the env var affects only functions traced
    afterwards — an already-jitted step keeps its tier.  A/B harnesses must
    build a fresh step per configuration (tools/exp_r2.py step "e" does)."""
    import os
    name = os.environ.get("SVGIR_SSIM_PRECISION", "default").lower()
    return (jax.lax.Precision.DEFAULT if name == "default"
            else jax.lax.Precision.HIGHEST)


def _separable_blur(img: jax.Array, g1d: np.ndarray,
                    precision=None) -> jax.Array:
    """Depthwise separable gaussian blur of [C, H, W] as two banded-matrix
    contractions.  XLA lowers the equivalent grouped convolution at C=3 to
    ~0.33 ms/call plus layout copies on TPU; the MXU matmul form runs the
    whole 5-quantity SSIM blur in well under a millisecond."""
    h, w = img.shape[-2:]
    bh = jnp.asarray(_band_matrix(h, g1d))
    bw = jnp.asarray(_band_matrix(w, g1d))
    hp = precision if precision is not None else jax.lax.Precision.HIGHEST
    out = jnp.einsum("uh,chw->cuw", bh, img, precision=hp)
    return jnp.einsum("cuw,wv->cuv", out, bw, precision=hp)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         precision=None) -> jax.Array:
    """Mean SSIM over a [C, H, W] pair (loss_utils.py:33-64).

    ``precision=None`` resolves to the training tier (see
    ``_ssim_train_precision``); eval call sites pass HIGHEST explicitly."""
    if precision is None:
        precision = _ssim_train_precision()
    g1d = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
                 / (2 * 1.5 ** 2))
    g1d = (g1d / g1d.sum()).astype(np.float32)
    c = img1.shape[0]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0)
    blurred = _separable_blur(stacked, g1d, precision=precision)
    mu1, mu2 = blurred[0:c], blurred[c:2 * c]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blurred[2 * c:3 * c] - mu1_sq
    sigma2_sq = blurred[3 * c:4 * c] - mu2_sq
    sigma12 = blurred[4 * c:5 * c] - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map.mean()


def ssim_pair(img1: jax.Array, img2: jax.Array, ref: jax.Array,
              window_size: int = 11, precision=None):
    """(ssim(img1, ref), ssim(img2, ref)) sharing the reference image's
    window statistics: one stacked blur of 8 quantities instead of two
    independent 5-quantity blurs (stage-2 computes SSIM of both the
    radiance render AND the deferred-PBR image against the same GT,
    svgss.py:274,283).  Same contractions per quantity as ``ssim`` —
    numerically identical results."""
    if precision is None:
        precision = _ssim_train_precision()
    g1d = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
                 / (2 * 1.5 ** 2))
    g1d = (g1d / g1d.sum()).astype(np.float32)
    c = img1.shape[0]
    stacked = jnp.concatenate(
        [img1, img2, ref, img1 * img1, img2 * img2, ref * ref,
         img1 * ref, img2 * ref], axis=0)
    b = _separable_blur(stacked, g1d, precision=precision)
    mu1, mu2, mur = b[0:c], b[c:2 * c], b[2 * c:3 * c]
    e1, e2, er = b[3 * c:4 * c], b[4 * c:5 * c], b[5 * c:6 * c]
    e1r, e2r = b[6 * c:7 * c], b[7 * c:8 * c]
    c1, c2 = 0.01 ** 2, 0.03 ** 2

    def one(mu_a, e_a, e_ar):
        mu_ar = mu_a * mur
        sig_a = e_a - mu_a * mu_a
        sig_r = er - mur * mur
        sig_ar = e_ar - mu_ar
        return (((2 * mu_ar + c1) * (2 * sig_ar + c2)) /
                ((mu_a * mu_a + mur * mur + c1)
                 * (sig_a + sig_r + c2))).mean()

    return one(mu1, e1, e1r), one(mu2, e2, e2r)


# ---------------------------------------------------------------------------
# Sobel spatial gradients (kornia-compatible, normalized, replicate padding)
# ---------------------------------------------------------------------------

_SOBEL_X = np.array([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]],
                    np.float32) / 8.0
_SOBEL_XX = np.array([[-1., 0., 2., 0., -1.],
                      [-4., 0., 8., 0., -4.],
                      [-6., 0., 12., 0., -6.],
                      [-4., 0., 8., 0., -4.],
                      [-1., 0., 2., 0., -1.]], np.float32) / 64.0
_SOBEL_XY = np.array([[-1., -2., 0., 2., 1.],
                      [-2., -4., 0., 4., 2.],
                      [0., 0., 0., 0., 0.],
                      [2., 4., 0., -4., -2.],
                      [1., 2., 0., -2., -1.]], np.float32) / 36.0


def _replicate_pad(img: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(img, ((0, 0), (pad, pad), (pad, pad)), mode="edge")


def _shift_conv(padded: jax.Array, kern: np.ndarray, h: int,
                w: int) -> jax.Array:
    """Tiny-kernel depthwise conv as explicit shifted adds: XLA's grouped
    convolution costs ~8 ms per call at C=3, 800x800 on TPU; the shift form
    fuses into one elementwise pass (<1 ms)."""
    kh, kw = kern.shape
    out = jnp.zeros(padded.shape[:1] + (h, w), padded.dtype)
    for i in range(kh):
        for j in range(kw):
            c = float(kern[i, j])
            if c == 0.0:
                continue
            out = out + c * padded[:, i:i + h, j:j + w]
    return out


def spatial_gradient(img: jax.Array, order: int = 1) -> jax.Array:
    """[C, H, W] -> [C, G, H, W]; G=2 (dx, dy) for order 1,
    G=3 (dxx, dxy, dyy) for order 2.  Matches kornia's normalized sobel."""
    if order == 1:
        kerns = [_SOBEL_X, _SOBEL_X.T]
        pad = 1
    else:
        kerns = [_SOBEL_XX, _SOBEL_XY, _SOBEL_XX.T]
        pad = 2
    h, w = img.shape[-2:]
    padded = _replicate_pad(img, pad)
    outs = [_shift_conv(padded, k, h, w) for k in kerns]
    return jnp.stack(outs, axis=1)


def first_order_edge_aware_loss(data: jax.Array, img: jax.Array) -> jax.Array:
    """loss_utils.py:104-105."""
    g_data = jnp.abs(spatial_gradient(data, 1))
    g_img = jnp.abs(spatial_gradient(img, 1))
    return (g_data * jnp.exp(-g_img)).sum(1).mean()


def second_order_edge_aware_loss(data: jax.Array, img: jax.Array) -> jax.Array:
    """loss_utils.py:101-102: |dxx, dyy| of data weighted by exp(-10 |d img|)."""
    g2 = jnp.abs(spatial_gradient(data, 2))[:, (0, 2)]
    g1 = jnp.abs(spatial_gradient(img, 1))
    return (g2 * jnp.exp(-10 * g1)).sum(1).mean()


def first_order_loss(data: jax.Array) -> jax.Array:
    return jnp.abs(spatial_gradient(data, 1)).sum(1).mean()


def tv_loss(x: jax.Array) -> jax.Array:
    """loss_utils.py:113-117 (mean squared neighbor difference)."""
    h_tv = jnp.square(x[..., 1:, :] - x[..., :-1, :]).mean()
    w_tv = jnp.square(x[..., :, 1:] - x[..., :, :-1]).mean()
    return h_tv + w_tv


def cos_loss(output: jax.Array, gt: jax.Array, thrsh: float = 0.0,
             weight=1) -> jax.Array:
    """loss_utils.py:119-121: mean (1 - cos) over pixels with cos < cos(thrsh).

    The reference boolean-indexes; we mask (mean over selected pixels).
    """
    cos = jnp.sum(output * gt * weight, axis=0)
    sel = cos < math.cos(thrsh)
    cnt = jnp.maximum(sel.sum(), 1)
    return jnp.where(sel, 1 - cos, 0.0).sum() / cnt


def mask_entropy_loss(opacity: jax.Array, mask: jax.Array) -> jax.Array:
    """Binary cross-entropy of rendered opacity vs mask
    (render.py:184-188 / svgss.py:333-338)."""
    o = jnp.clip(opacity, 1e-6, 1 - 1e-6)
    return -(mask * jnp.log(o) + (1 - mask) * jnp.log(1 - o)).mean()
