"""Unit tests for transforms / SH / graphics / losses (SURVEY.md §4 oracle a:
analytic unit tests for camera/SH/quaternion/cov math)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svgir_tpu.utils import sh as sh_utils
from svgir_tpu.utils import transforms as tf
from svgir_tpu.utils import graphics as gfx
from svgir_tpu.utils import losses


class TestTransforms:
    def test_quat_identity(self):
        R = tf.quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)

    def test_quat_z90(self):
        # 90 deg about z: (w, x, y, z) = (cos45, 0, 0, sin45)
        q = jnp.array([[math.cos(math.pi / 4), 0, 0, math.sin(math.pi / 4)]])
        R = tf.quat_to_rotmat(q)[0]
        np.testing.assert_allclose(R @ np.array([1.0, 0, 0]),
                                   np.array([0.0, 1, 0]), atol=1e-6)

    def test_quat_roundtrip(self):
        key = jax.random.PRNGKey(0)
        q = tf.normalize(jax.random.normal(key, (64, 4)))
        q = jnp.where(q[:, :1] < 0, -q, q)  # canonical sign
        R = tf.quat_to_rotmat(q)
        q2 = tf.rotmat_to_quat(R)
        np.testing.assert_allclose(q, q2, atol=1e-4)

    def test_rotation_orthonormal(self):
        q = tf.normalize(jax.random.normal(jax.random.PRNGKey(1), (16, 4)))
        R = tf.quat_to_rotmat(q)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)

    def test_cov3d_surface_rank2(self):
        """Surfel covariance must have zero variance along the normal."""
        q = tf.normalize(jax.random.normal(jax.random.PRNGKey(2), (8, 4)))
        s = jnp.exp(jax.random.normal(jax.random.PRNGKey(3), (8, 3)))
        cov6 = tf.build_cov3d(s, q, surface=True)
        Sigma = tf.cov3d_matrix(cov6)
        normal = tf.quat_to_rotmat(q)[..., :, 2]
        quad = jnp.einsum("ni,nij,nj->n", normal, Sigma, normal)
        np.testing.assert_allclose(quad, np.zeros(8), atol=1e-5)
        # and matches R diag(s^2) R^T with s_z = 0
        R = tf.quat_to_rotmat(q)
        s0 = s.at[:, 2].set(0.0)
        expected = jnp.einsum("nij,nj,nkj->nik", R, s0 * s0, R)
        np.testing.assert_allclose(Sigma, expected, atol=1e-5)

    def test_expon_lr_matches_reference_formula(self):
        """general_utils.py:30-63 with the stage-1 xyz schedule."""
        fn = tf.get_expon_lr_fn(1.6e-4, 1.6e-6, lr_delay_steps=0,
                                lr_delay_mult=0.01, max_steps=30_000)
        assert np.isclose(fn(0), 1.6e-4, rtol=1e-4)
        assert np.isclose(fn(30_000), 1.6e-6, rtol=1e-4)
        t = 0.5
        assert np.isclose(fn(15_000),
                          math.exp(math.log(1.6e-4) * t + math.log(1.6e-6) * t),
                          rtol=1e-5)

    def test_normal_to_rotation(self):
        n = tf.normalize(jax.random.normal(jax.random.PRNGKey(4), (32, 3)))
        q = tf.normal_to_rotation(n)
        col2 = tf.quat_to_rotmat(q)[..., :, 2]
        np.testing.assert_allclose(col2, n, atol=1e-4)


class TestSH:
    def test_deg0_constant(self):
        shs = jnp.ones((5, 3, 16))
        dirs = tf.normalize(jax.random.normal(jax.random.PRNGKey(0), (5, 3)))
        out = sh_utils.eval_sh(0, shs, dirs)
        np.testing.assert_allclose(out, sh_utils.C0 * np.ones((5, 3)), atol=1e-6)

    def test_active_degree_mask_equals_truncated_eval(self):
        """eval_sh with a traced active_degree == static eval at that degree
        (the oneupSHdegree ramp, reference train.py:115-116), and gradients
        w.r.t. masked coefficients are exactly zero (so they stay zero until
        their band activates)."""
        key = jax.random.PRNGKey(2)
        shs = jax.random.normal(key, (7, 3, 16))
        dirs = tf.normalize(jax.random.normal(jax.random.PRNGKey(3), (7, 3)))
        for act in range(4):
            masked = sh_utils.eval_sh(3, shs, dirs,
                                      active_degree=jnp.float32(act))
            static = sh_utils.eval_sh(act, shs, dirs)
            np.testing.assert_allclose(masked, static, atol=1e-6)
        g = jax.grad(lambda s: jnp.sum(sh_utils.eval_sh(
            3, s, dirs, active_degree=jnp.float32(1)) ** 2))(shs)
        assert np.all(np.asarray(g)[..., 4:] == 0.0)   # bands 2+ masked
        assert np.any(np.asarray(g)[..., :4] != 0.0)

    def test_parseval_deg3(self):
        """Sum of squared basis values = sum_l (2l+1)/(4 pi) (addition thm)."""
        dirs = tf.normalize(jax.random.normal(jax.random.PRNGKey(1), (100, 3)))
        basis = sh_utils.eval_sh_basis(3, dirs)
        total = (basis ** 2).sum(-1)
        expected = sum((2 * l + 1) for l in range(4)) / (4 * math.pi)
        np.testing.assert_allclose(total, np.full(100, expected), rtol=1e-4)

    def test_rotation_between_z(self):
        vec = tf.normalize(jax.random.normal(jax.random.PRNGKey(2), (64, 3)))
        # keep away from the -z pole where the reference formula degenerates
        vec = tf.normalize(vec.at[:, 2].set(jnp.abs(vec[:, 2]) - 0.5))
        R = sh_utils.rotation_between_z(vec)
        z = jnp.array([0.0, 0, 1.0])
        np.testing.assert_allclose(R @ z, vec, atol=1e-4)

    def test_rgb_sh_roundtrip(self):
        rgb = jax.random.uniform(jax.random.PRNGKey(3), (10, 3))
        np.testing.assert_allclose(
            sh_utils.sh_to_rgb(sh_utils.rgb_to_sh(rgb)), rgb, atol=1e-6)


class TestGraphics:
    def test_fibonacci_hemisphere(self):
        n = tf.normalize(jax.random.normal(jax.random.PRNGKey(0), (16, 3)))
        dirs, areas = gfx.fibonacci_sphere_sampling(n, 32)
        assert dirs.shape == (16, 32, 3)
        np.testing.assert_allclose(jnp.linalg.norm(dirs, axis=-1),
                                   np.ones((16, 32)), atol=1e-5)
        # all samples in the normal's upper hemisphere, clamped at sin(10 deg)
        cos = jnp.sum(dirs * n[:, None], -1)
        assert (cos >= math.sin(10 / 180 * math.pi) - 1e-4).all()
        np.testing.assert_allclose(areas, 2 * math.pi * np.ones((16, 32, 1)))

    def test_fibonacci_random_rotation_changes_azimuth_only(self):
        n = tf.normalize(jax.random.normal(jax.random.PRNGKey(1), (4, 3)))
        d1, _ = gfx.fibonacci_sphere_sampling(n, 16, key=jax.random.PRNGKey(2))
        d2, _ = gfx.fibonacci_sphere_sampling(n, 16)
        cos1 = jnp.sum(d1 * n[:, None], -1)
        cos2 = jnp.sum(d2 * n[:, None], -1)
        np.testing.assert_allclose(cos1, cos2, atol=1e-4)
        assert not np.allclose(d1, d2, atol=1e-3)

    def test_srgb_roundtrip(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (3, 8, 8))
        np.testing.assert_allclose(gfx.rgb_to_srgb(gfx.srgb_to_rgb(img)),
                                   img, atol=1e-5)

    def test_projection_matrix(self):
        P = gfx.projection_matrix(0.01, 100.0, math.pi / 2, math.pi / 2)
        # point on the fov boundary at z=1 maps to ndc x = 1
        p = P @ np.array([1.0, 0, 1, 1])
        assert np.isclose(p[0] / p[3], 1.0, atol=1e-5)


class TestLosses:
    def test_ssim_identical(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 32))
        assert float(losses.ssim(img, img)) > 0.9999

    def test_ssim_range(self):
        a = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32))
        b = jax.random.uniform(jax.random.PRNGKey(2), (3, 32, 32))
        v = float(losses.ssim(a, b))
        assert -1.0 <= v < 0.9

    def test_tv_constant_zero(self):
        assert float(losses.tv_loss(jnp.ones((3, 16, 16)))) == 0.0

    def test_cos_loss(self):
        n = jnp.zeros((3, 4, 4)).at[2].set(1.0)
        assert float(losses.cos_loss(n, n)) < 1e-6

    def test_edge_aware_smooth_on_flat(self):
        flat = jnp.ones((3, 16, 16)) * 0.5
        img = jax.random.uniform(jax.random.PRNGKey(3), (3, 16, 16))
        assert float(losses.first_order_edge_aware_loss(flat, img)) < 1e-6
        assert float(losses.second_order_edge_aware_loss(flat, img)) < 1e-6

    def test_psnr(self):
        a = jnp.zeros((3, 8, 8))
        b = jnp.full((3, 8, 8), 0.1)
        assert np.isclose(float(losses.psnr(a, b)), 20.0, atol=1e-4)


def test_init_morton_order():
    """morton_order=True spatially sorts the init cloud (native morton3d
    with numpy fallback); params are a permutation of the unsorted init."""
    import jax
    import jax.numpy as jnp

    from svgir_tpu.models import gaussians as G

    pts = jax.random.uniform(jax.random.PRNGKey(0), (300, 3)) * 4 - 2
    cols = jax.random.uniform(jax.random.PRNGKey(1), (300, 3))
    plain = G.init_from_points(pts, cols, capacity=300)
    sorted_ = G.init_from_points(pts, cols, capacity=300, morton_order=True)
    a = np.asarray(plain["params"]["xyz"])
    b = np.asarray(sorted_["params"]["xyz"])
    # same point set, different order
    np.testing.assert_allclose(np.sort(a.round(5), axis=0),
                               np.sort(b.round(5), axis=0), atol=1e-5)
    assert not np.allclose(a, b)
    # spatial locality: mean index-adjacent distance shrinks
    d_plain = np.linalg.norm(np.diff(a, axis=0), axis=1).mean()
    d_sorted = np.linalg.norm(np.diff(b, axis=0), axis=1).mean()
    assert d_sorted < 0.6 * d_plain
