"""Camera model (jit-friendly pytree).

Mirrors the reference ``scene/cameras.py`` Camera, with matrices kept in
standard math convention (``p_view = W2C @ [p;1]``, ``clip = FULL @ [p;1]``);
the reference stores the transposes for torch row-vector matmuls
(cameras.py:69,78).  Image-space convention matches the rasterizer:
``pix = ((ndc + 1) * S - 1) / 2`` (svgss auxiliary.h:42-46).

Static geometry (H, W, fov) lives in metadata fields so cameras with the same
resolution share one jit compilation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from svgir_tpu.utils.graphics import (
    fov2focal,
    projection_matrix,
    projection_matrix_center_shift,
    world_to_view,
)


@partial(jax.tree_util.register_dataclass,
         data_fields=["world_view", "full_proj", "camera_center", "prcppoint",
                      "image", "image_mask", "depth", "normal", "mono"],
         meta_fields=["height", "width", "fovx", "fovy", "znear", "zfar",
                      "uid", "image_name"])
@dataclass(frozen=True)
class Camera:
    """One posed view.  Arrays are jnp; H/W/fov are python statics."""

    world_view: jax.Array       # [4, 4] W2C, math convention
    full_proj: jax.Array        # [4, 4] P @ W2C
    camera_center: jax.Array    # [3]
    prcppoint: jax.Array        # [2] principal point in [0,1] (default .5,.5)
    height: int
    width: int
    fovx: float
    fovy: float
    znear: float = 0.01
    zfar: float = 100.0
    uid: int = 0
    image_name: str = ""
    image: Optional[jax.Array] = None        # [3, H, W] in [0,1]
    image_mask: Optional[jax.Array] = None   # [1, H, W]
    depth: Optional[jax.Array] = None        # [1, H, W]
    normal: Optional[jax.Array] = None       # [3, H, W]
    mono: Optional[jax.Array] = None         # [4, H, W] monocular normal prior

    # -- derived statics ----------------------------------------------------
    @property
    def tanfovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.fovy * 0.5)

    @property
    def focal_x(self) -> float:
        return fov2focal(self.fovx, self.width)

    @property
    def focal_y(self) -> float:
        return fov2focal(self.fovy, self.height)

    def random_patch(self, key: jax.Array,
                     h_size: Optional[int] = None,
                     w_size: Optional[int] = None) -> jax.Array:
        """Random patch bbox [y0, x0, y1, x1] f32 for patch-restricted
        rasterization (reference cameras.py:144-153; consumed by
        ``preprocess(..., patch_bbox=...)`` which expands it 20% for
        frustum culling like auxiliary.h:158-161)."""
        h = self.height if h_size is None else min(h_size, self.height)
        w = self.width if w_size is None else min(w_size, self.width)
        ky, kx = jax.random.split(key)
        y0 = jax.random.randint(ky, (), 0, self.height - h + 1)
        x0 = jax.random.randint(kx, (), 0, self.width - w + 1)
        return jnp.stack([y0, x0, y0 + h, x0 + w]).astype(jnp.float32)

    def world_directions(self) -> jax.Array:
        """Unit world-space ray directions per pixel, [3, H, W]
        (cameras.py:96-108)."""
        v, u = jnp.meshgrid(jnp.arange(self.height, dtype=jnp.float32),
                            jnp.arange(self.width, dtype=jnp.float32),
                            indexing="ij")
        dirs = jnp.stack([(u - self.width / 2) / self.focal_x,
                          (v - self.height / 2) / self.focal_y,
                          jnp.ones_like(u)], axis=0)
        dirs = dirs / jnp.linalg.norm(dirs, axis=0, keepdims=True)
        c2w_rot = self.world_view[:3, :3].T
        return (c2w_rot @ dirs.reshape(3, -1)).reshape(3, self.height, self.width)


def make_camera(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
                width: int, height: int,
                fx: Optional[float] = None, fy: Optional[float] = None,
                cx: Optional[float] = None, cy: Optional[float] = None,
                image: Optional[np.ndarray] = None,
                image_mask: Optional[np.ndarray] = None,
                depth: Optional[np.ndarray] = None,
                normal: Optional[np.ndarray] = None,
                mono: Optional[np.ndarray] = None,
                znear: float = 0.01, zfar: float = 100.0,
                uid: int = 0, image_name: str = "") -> Camera:
    """Build a Camera from COLMAP-style extrinsics (scene/cameras.py:9-84)."""
    w2c = world_to_view(R, T)
    if fx is None:
        proj = projection_matrix(znear, zfar, fovx, fovy)
    else:
        proj = projection_matrix_center_shift(znear, zfar, cx, cy, fx, fy,
                                              width, height)
    full = proj @ w2c
    c2w = np.linalg.inv(w2c)
    center = c2w[:3, 3]

    def dev(x):
        # Image-plane tensors stay HOST-resident (numpy): they cross to the
        # device per step at the jit boundary (one ~10 MB async transfer
        # that pipelines behind compute) instead of eagerly at load.  A
        # 100-view 800px scene pushed >1 GB through the device transport
        # before the first train step otherwise, which the axon relay
        # aborts with INTERNAL (observed 2026-08-20; 40 views fit, 100
        # did not).  The CUDA reference keeps images GPU-resident
        # (scene/cameras.py:38-57) — on TPU the per-step transfer is the
        # right trade: no HBM residency, same step time once pipelined.
        return None if x is None else np.asarray(x, np.float32)

    if image is not None and image_mask is None:
        image_mask = np.ones((1, height, width), np.float32)
    return Camera(
        world_view=np.asarray(w2c, np.float32),
        full_proj=np.asarray(full, np.float32),
        camera_center=np.asarray(center, np.float32),
        prcppoint=np.array([0.5, 0.5], np.float32),
        height=height, width=width, fovx=fovx, fovy=fovy,
        znear=znear, zfar=zfar, uid=uid, image_name=image_name,
        image=dev(image), image_mask=dev(image_mask), depth=dev(depth),
        normal=dev(normal), mono=dev(mono))


def camera_at_scale(cam: Camera, scale: float) -> Camera:
    """Downscaled copy of ``cam`` (reference Scene resolution_scales
    [1, 4, 8], scene/__init__.py:29,90-95; eval_nvs renders at scale 4,
    eval_nvs.py:133-136).  FoV is unchanged; pixel dims divide by
    ``scale``; all image-plane tensors are area-resampled."""
    if scale in (1, 1.0):
        return cam
    import dataclasses

    import cv2

    w, h = int(cam.width / scale), int(cam.height / scale)

    def rs(img):
        if img is None:
            return None
        a = np.asarray(img)                       # [C, H, W]
        out = cv2.resize(a.transpose(1, 2, 0), (w, h),
                         interpolation=cv2.INTER_AREA)
        if out.ndim == 2:
            out = out[..., None]
        # host-resident like make_camera: transfer happens at the jit
        # boundary (or once, via train.staging), never eagerly at load
        return np.asarray(out.transpose(2, 0, 1), np.float32)

    return dataclasses.replace(
        cam, width=w, height=h, image=rs(cam.image),
        image_mask=rs(cam.image_mask), depth=rs(cam.depth),
        normal=rs(cam.normal), mono=rs(cam.mono))


def look_at_camera(eye, target, up, fovx: float, fovy: float,
                   width: int, height: int, **kw) -> Camera:
    """Convenience constructor for tests/GUI orbiting: camera looking at
    ``target`` from ``eye`` (OpenCV convention: +z forward, +y down)."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # R: camera-to-world rotation (columns = camera axes in world)
    R = np.stack([right, down, fwd], axis=1)
    T = -R.T @ eye  # w2c translation
    return make_camera(R.astype(np.float32), T.astype(np.float32),
                       fovx, fovy, width, height, **kw)
