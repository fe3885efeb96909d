"""Strip-layout blend guard: the image-layout kernel I/O variant
(``RasterConfig.strip`` > 0, blend_pallas_strip) is bit-identical to the
per-tile formulation — forward buffers AND custom-VJP gradients — including
ragged strips (grid_x not divisible by the strip width)."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svgir_tpu.cameras import look_at_camera
from svgir_tpu.config import RasterConfig
from svgir_tpu.ops.rasterizer import rasterize

from tests.test_tile_sizes import _scene


def _cam(H, W):
    return look_at_camera(eye=[0, 0, -3], target=[0, 0, 0], up=[0, -1, 0],
                          fovx=math.pi / 3, fovy=math.pi / 3,
                          width=W, height=H)


# 96px/16 = 6 tiles: spt=4 -> ragged (6 % 4 != 0); spt=2 -> exact; spt=3
# with tile 32 exercises a non-power-of-two strip on the 3-tile grid
@pytest.mark.parametrize("tile,spt", [(16, 4), (16, 2), (32, 3)])
def test_strip_matches_tiled(tile, spt):
    H = W = 96
    cam = _cam(H, W)
    means, scales, quats, op, cols, vf = _scene()
    feats = jax.random.uniform(jax.random.PRNGKey(3), (means.shape[0], 4))
    base = RasterConfig(max_instances=1 << 13, chunk=32, tile=tile)

    def run(cfg, o, v):
        return rasterize(means, scales, quats, o, cam, jnp.zeros(3),
                         colors=cols, features=feats, vfeatures=v,
                         cfg=cfg, interpret=True)

    a = run(base, op, vf)
    b = run(dataclasses.replace(base, strip=spt), op, vf)
    for name in ("color", "normal", "depth", "opacity", "feature",
                 "vfeature", "final_t", "weights"):
        va = np.asarray(getattr(a, name))
        vb = np.asarray(getattr(b, name))
        assert va.shape == vb.shape, name
        assert np.abs(va - vb).max() < 1e-5, name

    def loss(cfg, o, v):
        r = run(cfg, o, v)
        mod = jnp.cos(jnp.arange(r.color.size, dtype=jnp.float32)
                      ).reshape(r.color.shape)
        return (jnp.sum(r.color * mod) + jnp.sum(r.vfeature ** 2)
                + jnp.sum(r.depth) + 0.3 * jnp.sum(r.opacity)
                + jnp.sum(r.weights ** 2))

    ga = jax.grad(lambda o, v: loss(base, o, v), argnums=(0, 1))(op, vf)
    gb = jax.grad(lambda o, v: loss(
        dataclasses.replace(base, strip=spt), o, v), argnums=(0, 1))(op, vf)
    for x, y, nm in ((ga[0], gb[0], "d_opac"), (ga[1], gb[1], "d_vfeat")):
        d = np.abs(np.asarray(x) - np.asarray(y)).max()
        rel = d / (np.abs(np.asarray(x)).max() + 1e-12)
        assert rel < 1e-5, (nm, rel)
