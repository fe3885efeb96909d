"""render_SH debug ray-tracer (reference intersect_test.slang:1995+):
primary-ray SH march produces a sane image, brute == grid."""

import jax
import jax.numpy as jnp
import numpy as np

from svgir_tpu.eval.render_sh import render_sh_image
from svgir_tpu.utils.sh import rgb_to_sh

from tests.scenes import default_camera, sphere_scene


def _scene_and_shs(n=160):
    sc = sphere_scene(jax.random.PRNGKey(0), n=n, opacity_range=(0.85, 0.95))
    # degree-0 SH carrying the scene colors: eval_sh + 0.5 == colors
    shs = jnp.zeros((n, 16, 3)).at[:, 0].set(rgb_to_sh(sc["colors"]))
    return sc, shs


def test_render_sh_image_brute():
    sc, shs = _scene_and_shs()
    cam = default_camera(48, 48)
    bg = jnp.array([0.0, 0.0, 0.0])
    out = render_sh_image(sc["means"], sc["scales"], sc["quats"],
                          sc["opacity"], shs, cam, use_grid=False,
                          ray_chunk=1024, bg=bg)
    assert out["render"].shape == (3, 48, 48)
    hit = np.asarray(out["hit"])
    # the sphere covers the image center and misses the corners
    assert hit[24, 24] >= 0
    assert hit[0, 0] == -1 and hit[-1, -1] == -1
    # misses show the background and infinite depth
    np.testing.assert_allclose(np.asarray(out["render"])[:, 0, 0], 0.0)
    assert np.isinf(np.asarray(out["t"])[0, 0])
    # hits composite positive SH radiance and a finite hit distance
    c = np.asarray(out["render"])[:, 24, 24]
    assert (c > 1e-3).all() and (c <= 10.0).all()
    assert 1.0 < float(np.asarray(out["t"])[24, 24]) < 4.0
    # front of the sphere occludes: visibility low where opaque hits stack
    vis = np.asarray(out["visibility"])[0]
    assert vis[24, 24] <= vis[0, 0]


def test_render_sh_grid_matches_brute():
    sc, shs = _scene_and_shs(n=96)
    cam = default_camera(32, 32)
    brute = render_sh_image(sc["means"], sc["scales"], sc["quats"],
                            sc["opacity"], shs, cam, use_grid=False,
                            ray_chunk=512)
    grid = render_sh_image(sc["means"], sc["scales"], sc["quats"],
                           sc["opacity"], shs, cam, use_grid=True,
                           ray_chunk=512)
    np.testing.assert_array_equal(np.asarray(grid["hit"]),
                                  np.asarray(brute["hit"]))
    np.testing.assert_allclose(np.asarray(grid["render"]),
                               np.asarray(brute["render"]), atol=1e-5)
