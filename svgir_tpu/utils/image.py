"""Image-space geometry helpers: depth->normal, normal->curvature.

Reference: ``utils/image_utils.py:61-141``.  ``depth2normal`` back-projects
the depth map to camera space and cross-products the 4 neighbor triangles;
``normal2curv`` sums masked neighbor differences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from svgir_tpu.utils.graphics import fov2focal
from svgir_tpu.utils.transforms import normalize


def depth_to_campos(depth: jax.Array, camera) -> jax.Array:
    """Depth [1, H, W] -> camera-space positions [H, W, 3]
    (image_utils.py:61-82)."""
    h = depth.shape[1]
    w = depth.shape[2]
    d = depth[0]  # [H, W]
    vv, uu = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    px = (uu - camera.prcppoint[0] * camera.width) * d
    py = (vv - camera.prcppoint[1] * camera.height) * d
    # NOTE(reference parity): image_utils.py:76-81 builds K = [[fy,0],[0,fx]]
    # (fovy with height for K00 applied to x) — i.e. x uses focal_y and y
    # uses focal_x.  For square images/fovs these coincide; we use the
    # conventional fx/fy pairing.
    fx = fov2focal(camera.fovx, camera.width)
    fy = fov2focal(camera.fovy, camera.height)
    return jnp.stack([px / fx, py / fy, d], axis=-1)


def depth2normal(depth: jax.Array, mask: jax.Array, camera) -> jax.Array:
    """Pseudo-normal from depth (image_utils.py:61-125).

    Args:
      depth: [1, H, W] camera-space z.
      mask:  [1, H, W] image mask.
    Returns: [3, H, W] unit camera-space normals (masked).
    """
    campos = depth_to_campos(depth, camera)       # [H, W, 3]
    m = mask[0].astype(bool)[..., None]           # [H, W, 1]

    p = jnp.pad(campos, ((1, 1), (1, 1), (0, 0)), mode="edge")
    mm = jnp.pad(m, ((1, 1), (1, 1), (0, 0)), mode="edge")

    p_c = p[1:-1, 1:-1] * mm[1:-1, 1:-1]
    p_u = (p[:-2, 1:-1] - p_c) * mm[:-2, 1:-1]
    p_l = (p[1:-1, :-2] - p_c) * mm[1:-1, :-2]
    p_b = (p[2:, 1:-1] - p_c) * mm[2:, 1:-1]
    p_r = (p[1:-1, 2:] - p_c) * mm[1:-1, 2:]

    n = (jnp.cross(p_u, p_l) + jnp.cross(p_r, p_u)
         + jnp.cross(p_b, p_r) + jnp.cross(p_l, p_b))
    n = normalize(n, axis=-1)
    n = n * m
    return jnp.moveaxis(n, -1, 0)


def normal2curv(normal: jax.Array, mask: jax.Array) -> jax.Array:
    """Curvature proxy (image_utils.py:127-141): L1 norm of masked neighbor
    normal differences.  normal [3, H, W], mask [1, H, W] -> [1, H, W]."""
    n = jnp.moveaxis(normal, 0, -1)               # [H, W, 3]
    m = mask[0].astype(bool)[..., None]
    p = jnp.pad(n, ((1, 1), (1, 1), (0, 0)), mode="edge")
    mm = jnp.pad(m, ((1, 1), (1, 1), (0, 0)), mode="edge")
    n_c = p[1:-1, 1:-1] * mm[1:-1, 1:-1]
    n_u = (p[:-2, 1:-1] - n_c) * mm[:-2, 1:-1]
    n_l = (p[1:-1, :-2] - n_c) * mm[1:-1, :-2]
    n_b = (p[2:, 1:-1] - n_c) * mm[2:, 1:-1]
    n_r = (p[1:-1, 2:] - n_c) * mm[1:-1, 2:]
    curv = (n_u + n_l + n_b + n_r) * m
    curv = jnp.abs(curv).sum(-1, keepdims=True)
    return jnp.moveaxis(curv, -1, 0)


def normal2rgb(normal: jax.Array, mask: jax.Array) -> jax.Array:
    """Visualization transform (image_utils.py:56-59)."""
    draw = jnp.concatenate([normal[:1], -normal[1:2], -normal[2:]], axis=0)
    return (draw * 0.5 + 0.5) * mask
