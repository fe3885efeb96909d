"""Real spherical harmonics, degrees 0..4 (pure JAX).

Constants and band layout match the reference ``utils/sh_utils.py`` (and the
in-kernel ``computeColorFromSH``, svgss forward.cu:20-71), so SH coefficients
round-trip bit-compatibly with reference PLY/checkpoint assets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def eval_sh_basis(deg: int, dirs: jax.Array) -> jax.Array:
    """SH basis values at unit ``dirs`` [..., 3] -> [..., (deg+1)**2].

    Reference: ``eval_sh_coef`` (utils/sh_utils.py:131-182).
    """
    assert 0 <= deg <= 4
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, C0, dirs.dtype)]
    if deg > 0:
        out += [-C1 * y, C1 * z, -C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz, C2[4] * (xx - yy)]
    if deg > 2:
        out += [C3[0] * y * (3 * xx - yy), C3[1] * xy * z,
                C3[2] * y * (4 * zz - xx - yy),
                C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                C3[4] * x * (4 * zz - xx - yy), C3[5] * z * (xx - yy),
                C3[6] * x * (xx - 3 * yy)]
    if deg > 3:
        out += [C4[0] * xy * (xx - yy), C4[1] * yz * (3 * xx - yy),
                C4[2] * xy * (7 * zz - 1), C4[3] * yz * (7 * zz - 3),
                C4[4] * (zz * (35 * zz - 30) + 3), C4[5] * xz * (7 * zz - 3),
                C4[6] * (xx - yy) * (7 * zz - 1), C4[7] * xz * (xx - 3 * yy),
                C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
    return jnp.stack(out, axis=-1)


def band_index(deg: int) -> jax.Array:
    """Band (degree) of each SH coefficient: [0, 1,1,1, 2,...] [(deg+1)**2]."""
    return jnp.concatenate([jnp.full((2 * b + 1,), b, jnp.float32)
                            for b in range(deg + 1)])


def eval_sh(deg: int, sh: jax.Array, dirs: jax.Array,
            active_degree=None) -> jax.Array:
    """Evaluate SH: ``sh`` [..., C, (deg+1)**2] x dirs [..., 3] -> [..., C].

    Reference: ``eval_sh`` (utils/sh_utils.py:71-128).  ``active_degree``
    (traced scalar) masks bands above it — the SH-degree ramp
    (``oneupSHdegree``, reference train.py:115-116) without recompiles:
    masked coefficients get zero gradients, so they stay exactly zero until
    their band activates, exactly like the reference's degree-limited eval.
    """
    basis = eval_sh_basis(deg, dirs)  # [..., K]
    if active_degree is not None:
        basis = basis * (band_index(deg) <= active_degree)
    k = (deg + 1) ** 2
    return jnp.einsum("...ck,...k->...c", sh[..., :k], basis)


def sh_to_rgb_clamped(deg: int, sh: jax.Array, dirs: jax.Array,
                      active_degree=None) -> jax.Array:
    """SH -> RGB with the +0.5 offset and clamp-at-0 used by the rasterizer
    (``computeColorFromSH``, forward.cu:20-71).  Autodiff through the clamp
    reproduces the reference's `clamped`-gated backward."""
    return jnp.maximum(eval_sh(deg, sh, dirs, active_degree) + 0.5, 0.0)


def rgb_to_sh(rgb: jax.Array) -> jax.Array:
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jax.Array) -> jax.Array:
    return sh * C0 + 0.5


def rotation_between_z(vec: jax.Array) -> jax.Array:
    """Rotation matrix aligning +z to ``vec`` [..., 3] -> [..., 3, 3].

    Reference: ``rotation_between_z`` (utils/sh_utils.py:36-68), including the
    -identity fallback when vec_z == -1.
    """
    v1 = -vec[..., 1]
    v2 = vec[..., 0]
    v11, v22, v12 = v1 * v1, v2 * v2, v1 * v2
    cos_p_1 = jnp.clip(vec[..., 2] + 1, min=1e-7)
    R = jnp.stack([
        jnp.stack([1 + (-v22) / cos_p_1, v12 / cos_p_1, v2], -1),
        jnp.stack([v12 / cos_p_1, 1 + (-v11) / cos_p_1, -v1], -1),
        jnp.stack([-v2, v1, 1 + (-v22 - v11) / cos_p_1], -1),
    ], axis=-2)
    flip = (vec[..., 2] + 1 > 0)[..., None, None]
    return jnp.where(flip, R, -jnp.eye(3, dtype=vec.dtype))
