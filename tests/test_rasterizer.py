"""Golden tests: tiled Pallas rasterizer vs dense reference (SURVEY.md §4
oracle b), and VJP checks vs autodiff of the dense path (oracle c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svgir_tpu.config import RasterConfig
from svgir_tpu.ops.dense_ref import render_dense
from svgir_tpu.ops.preprocess import preprocess
from svgir_tpu.ops.rasterizer import rasterize

from tests.scenes import default_camera, sphere_scene

CFG = RasterConfig(max_instances=1 << 14, chunk=128)


def _prep(scene, cam, cfg=CFG):
    return preprocess(
        scene["means"], scene["scales"], scene["quats"], cam.world_view,
        cam.full_proj, cam.camera_center, width=cam.width, height=cam.height,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy, focal_x=cam.focal_x,
        focal_y=cam.focal_y, colors=scene["colors"], cfg=cfg)


def _run_both(scene, cam, bg, cfg=CFG):
    prep = _prep(scene, cam, cfg)
    dense = render_dense(prep, scene["opacity"], scene["features"],
                         scene["vfeatures"], bg,
                         width=cam.width, height=cam.height, cfg=cfg)
    tiled = rasterize(scene["means"], scene["scales"], scene["quats"],
                      scene["opacity"], cam, bg, colors=scene["colors"],
                      features=scene["features"],
                      vfeatures=scene["vfeatures"], cfg=cfg, interpret=True)
    return dense, tiled


class TestTiledVsDense:
    def test_color_only(self):
        scene = sphere_scene(jax.random.PRNGKey(0), n=80)
        cam = default_camera(64, 64)
        bg = jnp.array([0.1, 0.2, 0.3])
        dense, tiled = _run_both(scene, cam, bg)
        np.testing.assert_allclose(tiled.color, dense.color, atol=2e-5)
        np.testing.assert_allclose(tiled.opacity, dense.opacity, atol=2e-5)
        np.testing.assert_allclose(tiled.normal, dense.normal, atol=2e-5)
        np.testing.assert_allclose(tiled.depth, dense.depth, atol=1e-3)
        np.testing.assert_allclose(tiled.weights, dense.weights, atol=1e-3)
        assert (np.asarray(tiled.n_contrib) == np.asarray(dense.n_contrib)).all()

    def test_features_and_vertex_features(self):
        scene = sphere_scene(jax.random.PRNGKey(1), n=60, s_feat=5, vs_feat=8)
        cam = default_camera(48, 48)
        bg = jnp.zeros(3)
        dense, tiled = _run_both(scene, cam, bg)
        np.testing.assert_allclose(tiled.feature, dense.feature, atol=2e-5)
        np.testing.assert_allclose(tiled.vfeature, dense.vfeature, atol=2e-5)

    def test_nonsquare_image(self):
        scene = sphere_scene(jax.random.PRNGKey(2), n=50)
        cam = default_camera(72, 40)   # not multiples of 16
        bg = jnp.ones(3)
        dense, tiled = _run_both(scene, cam, bg)
        np.testing.assert_allclose(tiled.color, dense.color, atol=2e-5)

    def test_opaque_saturation(self):
        """Many near-opaque overlapping splats: transmittance gating path."""
        scene = sphere_scene(jax.random.PRNGKey(3), n=120, scale=0.4,
                             opacity_range=(0.97, 0.99))
        cam = default_camera(32, 32)
        bg = jnp.array([0.5, 0.5, 0.5])
        dense, tiled = _run_both(scene, cam, bg)
        np.testing.assert_allclose(tiled.color, dense.color, atol=5e-5)

    def test_early_exit_multichunk(self):
        """>4 chunks of near-opaque splats per tile: the early exit fires
        mid-loop, exercising the skipped-chunk zero-fill + cross-tile
        prefetch drains (fwd) and the nchunks_eff-bounded reverse sweep
        (bwd) against the dense oracle."""
        scene = sphere_scene(jax.random.PRNGKey(9), n=600, scale=0.5,
                             opacity_range=(0.90, 0.99))
        cam = default_camera(32, 32)
        bg = jnp.array([0.2, 0.3, 0.4])
        cfg = RasterConfig(max_instances=1 << 13)
        dense = render_dense(
            _prep(scene, cam), scene["opacity"], None, None, bg,
            width=cam.width, height=cam.height)
        def loss(means):
            b = rasterize(means, scene["scales"], scene["quats"],
                          scene["opacity"], cam, bg, colors=scene["colors"],
                          cfg=cfg, interpret=True)
            return jnp.square(b.color).sum(), b
        (lv, tiled), g = jax.value_and_grad(loss, has_aux=True)(
            scene["means"])
        assert not bool(tiled.overflow)
        np.testing.assert_allclose(tiled.color, dense.color, atol=5e-5)
        assert bool(jnp.isfinite(g).all())

        def loss_dense(means):
            p = _prep({**scene, "means": means}, cam)
            return jnp.square(render_dense(
                p, scene["opacity"], None, None, bg,
                width=cam.width, height=cam.height).color).sum()
        gd = jax.grad(loss_dense)(scene["means"])
        scale = float(jnp.abs(gd).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(g) / scale,
                                   np.asarray(gd) / scale, atol=1e-3)


class TestVJP:
    def test_grads_match_dense_autodiff(self):
        scene = sphere_scene(jax.random.PRNGKey(4), n=40, s_feat=2, vs_feat=4)
        cam = default_camera(32, 32)
        bg = jnp.array([0.2, 0.1, 0.4])
        tgt = jax.random.uniform(jax.random.PRNGKey(5), (3, 32, 32))

        def loss_dense(means, scales, quats, opac, colors, feats, vfeats):
            prep = preprocess(
                means, scales, quats, cam.world_view, cam.full_proj,
                cam.camera_center, width=32, height=32, tanfovx=cam.tanfovx,
                tanfovy=cam.tanfovy, focal_x=cam.focal_x, focal_y=cam.focal_y,
                colors=colors, cfg=CFG)
            b = render_dense(prep, opac, feats, vfeats, bg, width=32,
                             height=32, cfg=CFG)
            return (jnp.abs(b.color - tgt).mean() + b.depth.mean()
                    + 0.3 * b.normal.sum() + 0.2 * b.feature.sum()
                    + 0.1 * b.vfeature.sum() + 0.05 * b.opacity.mean()
                    + 1e-3 * b.weights.sum())

        def loss_tiled(means, scales, quats, opac, colors, feats, vfeats):
            b = rasterize(means, scales, quats, opac, cam, bg, colors=colors,
                          features=feats, vfeatures=vfeats, cfg=CFG,
                          interpret=True)
            return (jnp.abs(b.color - tgt).mean() + b.depth.mean()
                    + 0.3 * b.normal.sum() + 0.2 * b.feature.sum()
                    + 0.1 * b.vfeature.sum() + 0.05 * b.opacity.mean()
                    + 1e-3 * b.weights.sum())

        args = (scene["means"], scene["scales"], scene["quats"],
                scene["opacity"], scene["colors"], scene["features"],
                scene["vfeatures"])
        gd = jax.grad(loss_dense, argnums=tuple(range(7)))(*args)
        gt = jax.grad(loss_tiled, argnums=tuple(range(7)))(*args)
        names = ["means", "scales", "quats", "opacity", "colors", "features",
                 "vfeatures"]
        for name, a, b in zip(names, gd, gt):
            scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-4,
                err_msg=f"gradient mismatch for {name}")

    def test_weights_grad_false_matches_other_grads(self):
        """The production paths set weights_grad=False (reference parity:
        out_weights is non-differentiable in CUDA too); every other gradient
        must be identical to the weights_grad=True path when the loss does
        not touch weights."""
        scene = sphere_scene(jax.random.PRNGKey(11), n=30, s_feat=1,
                             vs_feat=4)
        cam = default_camera(32, 32)
        bg = jnp.zeros(3)
        tgt = jax.random.uniform(jax.random.PRNGKey(12), (3, 32, 32))

        def make_loss(wgrad):
            def loss(means, opac, vfeats):
                b = rasterize(means, scene["scales"], scene["quats"], opac,
                              cam, bg, colors=scene["colors"],
                              features=scene["features"], vfeatures=vfeats,
                              cfg=CFG, interpret=True, weights_grad=wgrad)
                return (jnp.abs(b.color - tgt).mean() + b.depth.mean()
                        + 0.1 * b.vfeature.sum())
            return loss

        args = (scene["means"], scene["opacity"], scene["vfeatures"])
        g_true = jax.grad(make_loss(True), argnums=(0, 1, 2))(*args)
        g_false = jax.grad(make_loss(False), argnums=(0, 1, 2))(*args)
        for a, b in zip(g_true, g_false):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)

    def test_mean2d_offset_grads(self):
        """Screen-space gradient hook used for densification stats."""
        scene = sphere_scene(jax.random.PRNGKey(6), n=30)
        cam = default_camera(32, 32)
        bg = jnp.zeros(3)
        zeros = jnp.zeros((30, 2))

        def loss(off):
            b = rasterize(scene["means"], scene["scales"], scene["quats"],
                          scene["opacity"], cam, bg, colors=scene["colors"],
                          mean2d_offset=off, cfg=CFG, interpret=True)
            return jnp.square(b.color).sum()

        g = jax.grad(loss)(zeros)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0
