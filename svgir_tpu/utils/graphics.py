"""Projection matrices, hemisphere sampling, sRGB transforms (pure JAX).

Reference: ``utils/graphics_utils.py``.  Matrices here use standard math
convention (column vectors, ``P @ W2C @ [p;1]``); the reference stores the
transposed versions for torch row-vector convention — conversion happens at
the Camera boundary, not inside the math.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from svgir_tpu.utils.sh import rotation_between_z
from svgir_tpu.utils.transforms import normalize


def world_to_view(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """W2C 4x4 from COLMAP-style (R: cam->world rotation, t: w2c translation).

    Reference ``getWorld2View2`` (graphics_utils.py:127-145) with zero
    translate / unit scale: Rt[:3,:3] = R^T, Rt[:3,3] = t.
    """
    Rt = np.zeros((4, 4), dtype=np.float32)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    return Rt


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """GL-style projection (graphics_utils.py:148-168), math convention."""
    tan_y = math.tan(fovy / 2)
    tan_x = math.tan(fovx / 2)
    top, right = tan_y * znear, tan_x * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def projection_matrix_center_shift(znear: float, zfar: float, cx: float, cy: float,
                                   fx: float, fy: float, w: int, h: int) -> np.ndarray:
    """Principal-point-shift projection (graphics_utils.py:171-189)."""
    top = cy / fy * znear
    bottom = -(h - cy) / fy * znear
    left = -(w - cx) / fx * znear
    right = cx / fx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def fibonacci_sphere_sampling(normals: jax.Array, sample_num: int,
                              key: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Hemisphere fibonacci-spiral sampling around per-point normals.

    Reference ``fibonacci_sphere_sampling`` (graphics_utils.py:9-37):
    z clamped to >= sin(10 deg), random azimuth offset when a PRNG ``key`` is
    given (training), area weight 2*pi.

    Args:
      normals: [N, 3] unit normals.
      sample_num: S.
      key: optional PRNG key -> random azimuth rotation per point.

    Returns:
      incident_dirs [N, S, 3], incident_areas [N, S, 1].
    """
    n = normals.shape[0]
    delta = math.pi * (3.0 - math.sqrt(5.0))
    idx = jnp.arange(sample_num, dtype=jnp.float32)[None]            # [1, S]
    z = jnp.clip(1 - 2 * idx / (2 * sample_num - 1),
                 min=math.sin(10 / 180 * math.pi))
    rad = jnp.sqrt(1 - z ** 2)
    theta = delta * idx
    if key is not None:
        theta = jax.random.uniform(key, (n, 1)) * 2 * math.pi + theta  # [N, S]
    y = jnp.cos(theta) * rad
    x = jnp.sin(theta) * rad
    z_samples = jnp.stack(jnp.broadcast_arrays(x, y, z), axis=-2)     # [N, 3, S]
    R = rotation_between_z(normals)                                   # [N, 3, 3]
    dirs = R @ z_samples                                              # [N, 3, S]
    dirs = jnp.swapaxes(normalize(dirs, axis=-2), -1, -2)             # [N, S, 3]
    areas = jnp.full(dirs.shape[:-1] + (1,), 2 * math.pi, dirs.dtype)
    return dirs, areas


def rgb_to_srgb(img: jax.Array, clip: bool = True) -> jax.Array:
    """Linear -> sRGB (graphics_utils.py:198-215), channel-layout agnostic."""
    out = jnp.where(img > 0.0031308,
                    jnp.power(jnp.maximum(img, 0.0031308), 1.0 / 2.4) * 1.055 - 0.055,
                    12.92 * img)
    return jnp.clip(out, 0.0, 1.0) if clip else out


def srgb_to_rgb(img: jax.Array) -> jax.Array:
    """sRGB -> linear (graphics_utils.py:218-231)."""
    return jnp.where(img <= 0.04045, img / 12.92,
                     jnp.power((jnp.maximum(img, 0.04045) + 0.055) / 1.055, 2.4))
