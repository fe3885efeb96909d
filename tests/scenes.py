"""Shared synthetic test scenes."""

import math

import jax
import jax.numpy as jnp

from svgir_tpu.cameras import look_at_camera
from svgir_tpu.utils.transforms import normal_to_rotation, normalize


def sphere_scene(key, n=100, radius=1.0, scale=0.08, opacity_range=(0.3, 0.95),
                 s_feat=0, vs_feat=0):
    """Surfels on a sphere, normals pointing outward (toward any camera
    outside the sphere, roughly half face it)."""
    ks = jax.random.split(key, 6)
    dirs = normalize(jax.random.normal(ks[0], (n, 3)))
    means = dirs * radius
    quats = normal_to_rotation(dirs)
    scales = jnp.exp(jax.random.normal(ks[1], (n, 3)) * 0.3) * scale
    opac = jax.random.uniform(ks[2], (n,), minval=opacity_range[0],
                              maxval=opacity_range[1])
    colors = jax.random.uniform(ks[3], (n, 3))
    feats = jax.random.uniform(ks[4], (n, s_feat)) if s_feat else None
    vfeats = jax.random.uniform(ks[5], (n, vs_feat)) if vs_feat else None
    return dict(means=means, quats=quats, scales=scales, opacity=opac,
                colors=colors, features=feats, vfeatures=vfeats)


def default_camera(width=64, height=64, dist=3.0):
    return look_at_camera(eye=[0.3, 0.2, -dist], target=[0, 0, 0],
                          up=[0, -1, 0], fovx=math.pi / 3, fovy=math.pi / 3,
                          width=width, height=height)
