"""Tracer tests: visibility products, nearest-hit march, one-bounce loss."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from svgir_tpu.models import radiance as RAD
from svgir_tpu.ops import tracing
from svgir_tpu.utils.transforms import normal_to_rotation


def wall(z, n=1, opacity=0.8, scale=0.5):
    """A flat surfel at (0,0,z) facing -z."""
    means = jnp.array([[0.0, 0.0, z]])
    quats = jnp.array([[0.0, 1.0, 0.0, 0.0]])  # normal -z... R=diag(1,-1,-1)
    scales = jnp.array([[scale, scale, 1e-9]])
    return means, scales, quats, jnp.array([opacity])


class TestVisibility:
    def test_single_blocker(self):
        """Ray through a surfel center: visibility = 1 - opacity (if >= .9)
        else 0 (trace.cu:249-254)."""
        means, scales, quats, opac = wall(1.0, opacity=0.05)
        geo = tracing.build_surfel_geometry(means, scales, quats, opac)
        o = jnp.array([[0.0, 0, 0]])
        d = jnp.array([[0.0, 0, 1.0]])
        res = tracing.trace_visibility(geo, o + 0.05 * d, d)
        np.testing.assert_allclose(res["visibility"], [[0.95]], atol=1e-5)
        assert int(res["contribute"][0, 0]) == 1

    def test_opaque_blocker_zeroes(self):
        means, scales, quats, opac = wall(1.0, opacity=0.8)
        geo = tracing.build_surfel_geometry(means, scales, quats, opac)
        d = jnp.array([[0.0, 0, 1.0]])
        res = tracing.trace_visibility(geo, jnp.zeros((1, 3)) + 0.05 * d, d)
        # product 0.2 < 0.9 -> hard zero
        np.testing.assert_allclose(res["visibility"], [[0.0]], atol=1e-6)

    def test_backface_skipped(self):
        """Ray along -z hits the surfel's back (normal . dir > 0): skipped."""
        means, scales, quats, opac = wall(-1.0, opacity=0.9)
        geo = tracing.build_surfel_geometry(means, scales, quats, opac)
        d = jnp.array([[0.0, 0, -1.0]])
        res = tracing.trace_visibility(geo, jnp.zeros((1, 3)) + 0.05 * d, d)
        np.testing.assert_allclose(res["visibility"], [[1.0]], atol=1e-6)
        assert int(res["contribute"][0, 0]) == 0

    def test_miss(self):
        means, scales, quats, opac = wall(1.0, opacity=0.9, scale=0.1)
        geo = tracing.build_surfel_geometry(means, scales, quats, opac)
        o = jnp.array([[5.0, 5.0, 0.0]])
        d = jnp.array([[0.0, 0, 1.0]])
        res = tracing.trace_visibility(geo, o, d)
        np.testing.assert_allclose(res["visibility"], [[1.0]], atol=1e-6)


class TestNearestHits:
    def _line_scene(self):
        """Three walls at z = 0.1, 0.15, 0.5 facing -z."""
        means = jnp.array([[0, 0, 0.1], [0, 0, 0.15], [0, 0, 0.5]],
                          jnp.float32)
        quats = jnp.tile(jnp.array([[0.0, 1, 0, 0]]), (3, 1))
        scales = jnp.tile(jnp.array([[0.5, 0.5, 1e-9]]), (3, 1))
        opac = jnp.array([0.5, 0.6, 0.7])
        return means, scales, quats, opac

    def test_sorted_by_t(self):
        means, scales, quats, opac = self._line_scene()
        geo = tracing.build_surfel_geometry(means, scales, quats, opac)
        o = jnp.array([[0.01, 0.0, 0.0]])
        d = jnp.array([[0.0, 0, 1.0]])
        hits = tracing.nearest_hits(geo, o, d, k=4)
        t = np.asarray(hits["t"][0])
        assert np.allclose(t[:3], [0.1, 0.15, 0.5], atol=1e-5)
        assert np.isinf(t[3])
        assert list(np.asarray(hits["idx"][0][:3])) == [0, 1, 2]

    def test_march_windows(self):
        """First window [0.042, 0.2]: hits at .1, .15 composited; the wall
        at .5 is beyond .15+0.2=0.35 -> gap terminates the march."""
        means, scales, quats, opac = self._line_scene()
        geo = tracing.build_surfel_geometry(means, scales, quats, opac)
        shs = jnp.zeros((3, 16, 3))
        shs = shs.at[:, 0, :].set(jnp.array([[1.0, 0, 0], [0, 1.0, 0],
                                             [0, 0, 1.0]]) / 0.28209479177)
        o = jnp.array([[0.01, 0.0, 0.0]])
        d = jnp.array([[0.0, 0, 1.0]])
        hits = tracing.nearest_hits(geo, o, d, k=8)
        res = tracing.radiance_march(hits, jnp.array([-5], jnp.int32), shs,
                                     means, o)
        # contributions: wall0 alpha=.5 T=1; wall1 alpha=.6 T=.5; wall2 none
        # sh colors: wall0 ~ (1.5,.5,.5), wall1 ~ (.5,1.5,.5)
        rad = np.asarray(res["radiance"][0])
        expected = 0.5 * np.array([1.5, 0.5, 0.5]) + 0.6 * 0.5 * np.array(
            [0.5, 1.5, 0.5])
        np.testing.assert_allclose(rad, expected, atol=1e-3)
        assert int(res["first_hit"][0]) == 0
        # T = .5*.4 = .2 -> visibility flag: T < .2 is strict; .2 stays visible
        np.testing.assert_allclose(res["visibility"][0], [0.2], atol=1e-3)

    def test_march_first_window_skips_near(self):
        """A wall at z=0.02 < t_min 0.042 is skipped entirely."""
        means = jnp.array([[0, 0, 0.02], [0, 0, 0.1]], jnp.float32)
        quats = jnp.tile(jnp.array([[0.0, 1, 0, 0]]), (2, 1))
        scales = jnp.tile(jnp.array([[0.5, 0.5, 1e-9]]), (2, 1))
        opac = jnp.array([0.9, 0.5])
        geo = tracing.build_surfel_geometry(means, scales, quats, opac)
        shs = jnp.zeros((2, 16, 3))
        o = jnp.zeros((1, 3))
        d = jnp.array([[0.0, 0, 1.0]])
        hits = tracing.nearest_hits(geo, o, d, k=4)
        res = tracing.radiance_march(hits, jnp.array([-5], jnp.int32), shs,
                                     means, o)
        assert int(res["first_hit"][0]) == 1   # the z=0.1 wall
        np.testing.assert_allclose(res["visibility"][0], [0.5], atol=1e-5)

    def test_self_hit_terminates(self):
        means = jnp.array([[0, 0, 0.1], [0, 0, 0.3]], jnp.float32)
        quats = jnp.tile(jnp.array([[0.0, 1, 0, 0]]), (2, 1))
        scales = jnp.tile(jnp.array([[0.5, 0.5, 1e-9]]), (2, 1))
        opac = jnp.array([0.5, 0.5])
        geo = tracing.build_surfel_geometry(means, scales, quats, opac)
        shs = jnp.ones((2, 16, 3))
        o = jnp.zeros((1, 3))
        d = jnp.array([[0.0, 0, 1.0]])
        hits = tracing.nearest_hits(geo, o, d, k=4)
        # marching as gaussian 0: its own surfel is the nearest hit -> stop
        res = tracing.radiance_march(hits, jnp.array([0], jnp.int32), shs,
                                     means, o)
        assert int(res["first_hit"][0]) == -1
        np.testing.assert_allclose(res["radiance"][0], [0, 0, 0], atol=1e-6)


class TestBakeAndLoss:
    def test_bake_shapes_and_consistency_loss_grads(self):
        from svgir_tpu.models import gaussians as G
        from svgir_tpu.utils.transforms import normalize

        key = jax.random.PRNGKey(0)
        n, s = 24, 8
        dirs = normalize(jax.random.normal(key, (n, 3)))
        # small sphere (radius 0.1) with INWARD normals: chord lengths fall
        # inside the march's [0.042, 0.2] window so rays find hits
        pts = dirs * 0.1
        state = G.init_from_points(pts, jnp.ones((n, 3)) * 0.5,
                                   normals=-dirs,
                                   capacity=n, rotation_init="normal")
        state = G.upgrade_to_pbr(state)
        params = state["params"]

        bake = RAD.bake_radiance(
            params["xyz"], G.get_scaling(params), G.get_rotation(params),
            G.get_opacity(params)[:, 0], G.get_shs(params), sample_num=s,
            ray_chunk=256, gauss_chunk=32)
        assert bake["radiance"].shape == (n, s, 3)
        assert bake["visibility"].shape == (n, s, 1)
        assert bake["hit_idx"].shape == (n, s)
        assert np.isfinite(np.asarray(bake["radiance"])).all()
        # concave sphere interior: some rays must hit other surfels
        assert int((np.asarray(bake["hit_idx"]) >= 0).sum()) > 0

        params = dict(params)
        params["radiances"] = bake["radiance"]
        params["radiance_ratio"] = jnp.ones(())
        bake2 = {k: v for k, v in bake.items() if k != "exhausted_frac"}

        def loss_fn(p):
            return RAD.radiance_consistency_loss(
                p, bake2, jnp.array([0.0, 0, -3.0]),
                lambda d: jnp.ones(d.shape) * 0.5)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        # gradients reach albedo + roughness + radiance ratio, not xyz
        assert float(jnp.abs(grads["base_color"]).max()) >= 0
        assert np.isfinite(np.asarray(grads["roughness"])).all()
        assert np.isfinite(np.asarray(grads["radiance_ratio"]))
