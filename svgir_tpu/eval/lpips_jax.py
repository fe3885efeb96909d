"""LPIPS (vgg) in JAX — reference ``lpipsPyTorch/modules/lpips.py:1-37``,
``networks.py:36-120``, ``utils.py:6-8``.

Pipeline (exactly the reference's): z-score the two inputs with the LPIPS
shift/scale buffers, run the VGG16 feature stack tapping the five ReLU
outputs relu1_2/2_2/3_3/4_3/5_3 (torchvision ``features`` 1-based indices
[4, 9, 16, 23, 30]), channel-unit-normalize each tap, square the
difference, apply the learned 1x1 linear head per tap, average over space
and sum over taps.

Weights are a plain ``.npz`` produced by ``tools/convert_lpips_weights.py``
from the torchvision VGG16 IMAGENET1K_V1 checkpoint + the richzhang
v0.1 linear weights; nothing is downloaded here (zero-egress image).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features layout: conv indices and the pools between the
# five tapped blocks
VGG16_BLOCKS: List[List[int]] = [
    [0, 2],            # conv3-64, conv64-64      -> tap relu1_2
    [5, 7],            # conv64-128, conv128-128  -> tap relu2_2
    [10, 12, 14],      # 3x conv...256            -> tap relu3_3
    [17, 19, 21],      # 3x conv...512            -> tap relu4_3
    [24, 26, 28],      # 3x conv512-512           -> tap relu5_3
]
N_CHANNELS = [64, 128, 256, 512, 512]

# BaseNet z-score buffers (networks.py:40-44)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def required_keys() -> List[str]:
    keys = []
    for blk in VGG16_BLOCKS:
        for idx in blk:
            keys += [f"conv{idx}/w", f"conv{idx}/b"]
    keys += [f"lin{k}" for k in range(5)]
    return keys


def _conv3x3(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None]


def _maxpool2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
        [(0, 0)] * 4)


def _features(x: jax.Array, params: Dict[str, jax.Array]) -> List[jax.Array]:
    """x: [N, 3, H, W] -> five channel-unit-normalized taps."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / \
        jnp.asarray(_SCALE)[None, :, None, None]
    taps = []
    for bi, blk in enumerate(VGG16_BLOCKS):
        if bi:
            x = _maxpool2(x)
        for idx in blk:
            x = jax.nn.relu(_conv3x3(x, params[f"conv{idx}/w"],
                                     params[f"conv{idx}/b"]))
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))
        taps.append(x / (norm + 1e-10))           # utils.py:6-8
    return taps


@functools.partial(jax.jit, static_argnames=())
def _lpips_pair(x: jax.Array, y: jax.Array,
                params: Dict[str, jax.Array]) -> jax.Array:
    fx = _features(x, params)
    fy = _features(y, params)
    total = 0.0
    for k, (a, b) in enumerate(zip(fx, fy)):
        d = jnp.square(a - b)                                  # [N,C,H,W]
        lin = params[f"lin{k}"]                                # [C]
        total = total + jnp.mean(
            jnp.sum(d * lin[None, :, None, None], axis=1), axis=(1, 2))
    return total                                               # [N]


class LPIPSJax:
    """Callable LPIPS-vgg distance over [C, H, W] or [N, C, H, W] images
    (same input convention as the reference: images passed as-is, no
    rescaling to [-1, 1] — eval_nvs.py:81 feeds [0,1] renders directly)."""

    def __init__(self, weights: Dict[str, np.ndarray]):
        missing = [k for k in required_keys() if k not in weights]
        if missing:
            raise ValueError(f"LPIPS weights missing keys: {missing[:4]}...")
        self.params = {k: jnp.asarray(np.asarray(weights[k]).astype(
            np.float32)) for k in required_keys()}
        # lin heads may arrive as [1, C, 1, 1] conv kernels
        for k in range(5):
            lin = self.params[f"lin{k}"]
            self.params[f"lin{k}"] = lin.reshape(-1)

    @classmethod
    def from_npz(cls, path: str) -> "LPIPSJax":
        with np.load(path) as data:
            return cls({k: data[k] for k in data.files})

    def __call__(self, x, y) -> jax.Array:
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        if x.ndim == 3:
            x, y = x[None], y[None]
        return _lpips_pair(x, y, self.params)
