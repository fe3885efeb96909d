"""Evaluation metrics: PSNR / SSIM / MSE / normal MAE / LPIPS.

Covers eval_nvs.py:77-90, eval_relighting_tensoIR.py:367-409 and
normal_eval.py:11-18.  LPIPS (lpipsPyTorch/) needs pretrained VGG weights;
this zero-egress image ships none, so ``lpips`` returns None unless a
weights file is supplied (the metric tables mark it "n/a").
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from svgir_tpu.utils import losses as L


def psnr(a, b) -> float:
    return float(L.psnr(jnp.asarray(a), jnp.asarray(b)))


def ssim(a, b) -> float:
    return float(L.ssim(jnp.asarray(a), jnp.asarray(b)))


def mse(a, b) -> float:
    return float(jnp.square(jnp.asarray(a) - jnp.asarray(b)).mean())


def normal_mae_deg(pred, gt, mask=None) -> float:
    """Mean angular error in degrees (normal_eval.py:11-18).
    pred/gt: [3, H, W] unit normals."""
    pred = jnp.asarray(pred)
    gt = jnp.asarray(gt)
    cos = jnp.clip(jnp.sum(pred * gt, axis=0), -1.0, 1.0)
    ang = jnp.arccos(cos) * 180.0 / math.pi
    if mask is not None:
        m = jnp.asarray(mask)[0] > 0.5
        return float(jnp.where(m, ang, 0.0).sum() / jnp.maximum(m.sum(), 1))
    return float(ang.mean())


_LPIPS_CACHE = {}


def lpips(a, b, weights_path: Optional[str] = None) -> Optional[float]:
    """LPIPS-vgg if torchvision weights are available; else None."""
    if weights_path is None:
        return None
    try:
        import torch
        if "net" not in _LPIPS_CACHE:
            _LPIPS_CACHE["net"] = torch.load(weights_path,
                                             map_location="cpu")
        # a full torchscript lpips module saved at weights_path
        net = _LPIPS_CACHE["net"]
        with torch.no_grad():
            ta = torch.from_numpy(np.asarray(a))[None] * 2 - 1
            tb = torch.from_numpy(np.asarray(b))[None] * 2 - 1
            return float(net(ta, tb).item())
    except Exception:
        return None


def image_metrics(pred, gt, mask=None) -> dict:
    out = {"psnr": psnr(pred, gt), "ssim": ssim(pred, gt),
           "mse": mse(pred, gt)}
    return out
