"""Quaternion / rotation / covariance math (pure JAX, batched-first).

Numerical contracts follow the reference:
* quaternions are w-first, ``build_rotation`` (utils/general_utils.py:82-103),
* the surfel covariance zeroes the 3rd scale axis
  (svgss forward.cu computeCov3D, :186-226),
* activation inverses (scene/gaussian_model.py:104-125).
All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along ``axis`` (torch.nn.functional.normalize semantics).

    Uses the clamped-square rsqrt form: ``jnp.linalg.norm`` has a NaN
    gradient at exactly-zero vectors (0/0 in the sqrt backward), which
    poisons autodiff through masked/degenerate normals (e.g. depth2normal
    on flat regions); clamping the *squared* norm keeps the backward finite
    while matching torch's forward exactly.
    """
    sq = jnp.sum(v * v, axis=axis, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Quaternion (w, x, y, z) [..., 4] -> rotation matrix [..., 3, 3].

    Matches ``build_rotation`` (utils/general_utils.py:82-103) /
    ``quaternion2rotmat`` (svgss forward.cu:165-180, read column-major so the
    math matrix is this standard one).  Input is normalized internally.
    """
    q = normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> (w, x, y, z); ``rotation_to_quaternion``
    (general_utils.py:105-117).  Uses the w-branch only, like the reference."""
    r11, r22, r33 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    qw = jnp.sqrt(jnp.clip(1 + r11 + r22 + r33, min=1e-7)) / 2
    qx = (R[..., 2, 1] - R[..., 1, 2]) / (4 * qw)
    qy = (R[..., 0, 2] - R[..., 2, 0]) / (4 * qw)
    qz = (R[..., 1, 0] - R[..., 0, 1]) / (4 * qw)
    return normalize(jnp.stack([qw, qx, qy, qz], axis=-1))


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product, w-first (general_utils.py:139+)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def build_cov3d(scale: jax.Array, quat: jax.Array,
                scale_modifier: float = 1.0, surface: bool = True) -> jax.Array:
    """World-space 3D covariance, upper-triangular 6-vector
    (xx, xy, xz, yy, yz, zz).

    Matches svgss ``computeCov3D`` (forward.cu:186-226): Sigma = R S^2 R^T with
    the z scale forced to 0 when ``surface`` (2D surfel).  NOTE the reference
    has `mod * surface ? 0 : scale.z` which parses as `(mod*surface) ? 0 : s.z`
    — i.e. z is zeroed whenever surface is on; we reproduce that behavior.
    """
    R = quat_to_rotmat(quat)
    s = scale * scale_modifier
    if surface:
        s = s.at[..., 2].set(0.0)
    M = R * s[..., None, :]  # R @ diag(s)
    Sigma = M @ jnp.swapaxes(M, -1, -2)
    return jnp.stack([Sigma[..., 0, 0], Sigma[..., 0, 1], Sigma[..., 0, 2],
                      Sigma[..., 1, 1], Sigma[..., 1, 2], Sigma[..., 2, 2]],
                     axis=-1)


def cov3d_matrix(cov6: jax.Array) -> jax.Array:
    """Expand the 6-vector back to the symmetric [..., 3, 3] matrix."""
    xx, xy, xz, yy, yz, zz = jnp.moveaxis(cov6, -1, 0)
    return jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1),
    ], axis=-2)


def inverse_sigmoid(x: jax.Array) -> jax.Array:
    return jnp.log(x / (1 - x))


def normal_to_rotation(normal: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Quaternion whose rotation's 3rd column equals ``normal``
    (general_utils.py `normal2rotation` analog): build an orthonormal frame
    with z = normal."""
    n = normalize(normal)
    helper = jnp.where(jnp.abs(n[..., 2:3]) < 0.999,
                       jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
                       jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape))
    x = normalize(jnp.cross(helper, n), eps=eps)
    y = jnp.cross(n, x)
    R = jnp.stack([x, y, n], axis=-1)  # columns
    return rotmat_to_quat(R)


def get_expon_lr_fn(lr_init: float, lr_final: float,
                    lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
                    max_steps: int = 1_000_000):
    """Log-lerp LR schedule with sine delay (general_utils.py:30-63).

    Returns a function of the (possibly traced) step producing the LR.
    """
    def helper(step):
        if not isinstance(step, (jax.core.Tracer, jax.Array)):
            # host path for concrete steps: the training loops call this
            # once per iteration — a jnp version would add a device
            # round-trip (and a blocking D2H sync at ``float()``) to every
            # step of the hot loop
            import math
            if (lr_init == 0.0 and lr_final == 0.0) or step < 0:
                return 0.0
            if lr_delay_steps > 0:
                delay_rate = lr_delay_mult + (1 - lr_delay_mult) * math.sin(
                    0.5 * math.pi * min(max(step / lr_delay_steps, 0.0), 1.0))
            else:
                delay_rate = 1.0
            t = min(max(step / max_steps, 0.0), 1.0)
            li = math.log(lr_init) if lr_init > 0 else -math.inf
            lf = math.log(lr_final) if lr_final > 0 else -math.inf
            return delay_rate * math.exp(li * (1 - t) + lf * t)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(jnp.asarray(step, jnp.float32))
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        lr = delay_rate * log_lerp
        return jnp.where(step < 0, 0.0, lr)

    return helper
