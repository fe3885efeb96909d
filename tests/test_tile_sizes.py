"""Tile-size parameterization guard: the blend kernels work at any square
tile (pix = tile**2), matching the dense oracle built with the SAME tile's
rect culling (contributions beyond a splat's 3-sigma rect are dropped by
rect culling exactly as the CUDA reference does — auxiliary.h:53-63 — so
the oracle must share the rect grid)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svgir_tpu.cameras import look_at_camera
from svgir_tpu.config import RasterConfig
from svgir_tpu.ops.dense_ref import render_dense
from svgir_tpu.ops.preprocess import preprocess
from svgir_tpu.ops.rasterizer import rasterize


def _scene(n=80, seed=7):
    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    means = jax.random.uniform(k[0], (n, 3), minval=-0.9,
                               maxval=0.9).at[:, 2].mul(0.3)
    quats = jax.random.normal(k[1], (n, 4))
    quats /= jnp.linalg.norm(quats, axis=1, keepdims=True)
    scales = jnp.concatenate(
        [0.03 + 0.3 * jax.random.uniform(k[2], (n, 2)),
         jnp.zeros((n, 1))], 1)
    op = 0.3 + 0.65 * jax.random.uniform(k[3], (n,))
    cols = jax.random.uniform(k[4], (n, 3))
    vf = jax.random.uniform(k[5], (n, 8))
    return means, scales, quats, op, cols, vf


@pytest.mark.parametrize("tile,chunk", [(8, 64), (32, 64), (32, 128)])
def test_tile_size_matches_dense(tile, chunk):
    H = W = 64
    cam = look_at_camera(eye=[0, 0, -3], target=[0, 0, 0], up=[0, -1, 0],
                         fovx=math.pi / 3, fovy=math.pi / 3,
                         width=W, height=H)
    means, scales, quats, op, cols, vf = _scene()
    cfg = RasterConfig(max_instances=1 << 13, chunk=chunk, tile=tile)
    prep = preprocess(means, scales, quats, cam.world_view, cam.full_proj,
                      cam.camera_center, width=W, height=H,
                      tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
                      focal_x=cam.focal_x, focal_y=cam.focal_y,
                      colors=cols, cfg=cfg)
    dref = render_dense(prep, op, None, vf, jnp.zeros(3),
                        width=W, height=H, cfg=cfg)
    bufs = rasterize(means, scales, quats, op, cam, jnp.zeros(3),
                     colors=cols, vfeatures=vf, cfg=cfg, interpret=True)
    for name in ("color", "vfeature", "depth", "opacity"):
        d = np.abs(np.array(getattr(bufs, name))
                   - np.array(getattr(dref, name))).max()
        assert d < 1e-4, (name, tile, chunk, d)

    g = jax.grad(lambda o: jnp.sum(rasterize(
        means, scales, quats, o, cam, jnp.zeros(3), colors=cols,
        vfeatures=vf, cfg=cfg, interpret=True).color ** 2))(op)
    assert bool(jnp.all(jnp.isfinite(g)))
