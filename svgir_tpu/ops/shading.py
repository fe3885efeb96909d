"""Physically-based per-vertex shading (the deferred-PBR stage).

Reference: ``gaussian_renderer/svgss.py`` ``rendering_equation4`` (:537-593)
and ``GGX_specular4`` (:595-630) — shading is evaluated per Gaussian VERTEX
(4 per surfel) over S precomputed incident directions *before* rasterization;
the rasterizer then interpolates the 12-channel results bilinearly.

All clamps/constants transcribed exactly: global light clamp [0, 64],
fresnel 0.04, k = (alpha + 2 r + 1)/8, Schlick 2^((-5.55473 VoH - 6.98316) VoH),
denominator clamp [1e-6, 4 pi].  Channel-major vertex layout [c0v0..c0v3,
c1v0..] throughout (SURVEY.md §2.4).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from svgir_tpu.utils.transforms import normalize


def ggx_specular4(normal: jax.Array, pts2c: jax.Array, pts2l: jax.Array,
                  roughness: jax.Array, fresnel: float = 0.04) -> jax.Array:
    """GGX specular per (sample, vertex) — svgss.py:595-630.

    normal [N,4,3]; pts2c [N,3]; pts2l [N,S,3]; roughness [N,4].
    Returns [N,S,4,1].
    """
    L = normalize(pts2l)[:, :, None, :]                  # [N,S,1,3]
    V = normalize(pts2c)[:, None, :]                     # [N,1,3]
    H = normalize((L + V[:, None]) / 2.0)                # [N,S,1,3]
    N = normalize(normal)                                # [N,4,3]

    NoV = jnp.sum(V * N, -1, keepdims=True)              # [N,4,1]
    N = N * jnp.sign(NoV)

    NoL = jnp.clip(jnp.sum(N[:, None] * L, -1, keepdims=True), 1e-6, 1)
    NoV = jnp.clip(jnp.sum(N * V, -1, keepdims=True), 1e-6, 1)   # [N,4,1]
    NoH = jnp.clip(jnp.sum(N[:, None] * H, -1, keepdims=True), 1e-6, 1)
    VoH = jnp.clip(jnp.sum(V[:, None] * H, -1, keepdims=True), 1e-6, 1)

    rough = roughness[:, None, :, None]                  # [N,1,4,1]
    alpha = rough * rough
    alpha2 = alpha * alpha
    k = (alpha + 2 * rough + 1.0) / 8.0
    fmi = ((-5.55473) * VoH - 6.98316) * VoH
    frac0 = fresnel + (1 - fresnel) * jnp.power(2.0, fmi)
    frac = frac0 * alpha2
    nom0 = NoH * NoH * (alpha2 - 1) + 1
    nom1 = NoV[:, None] * (1 - k) + k
    nom2 = NoL * (1 - k) + k
    nom = jnp.clip(4 * math.pi * nom0 * nom0 * nom1 * nom2, 1e-6, 4 * math.pi)
    return frac / nom


def rendering_equation4(base_color: jax.Array, roughness: jax.Array,
                        normals: jax.Array, viewdirs: jax.Array,
                        radiance: jax.Array, env_direct_light,
                        visibility: jax.Array, incident_dirs: jax.Array,
                        incident_areas: jax.Array,
                        env_radiance: Optional[jax.Array] = None
                        ) -> tuple[jax.Array, Dict]:
    """Per-vertex rendering equation — svgss.py:537-593.

    Args:
      base_color [N,12] channel-major; roughness [N,4]; normals [N,4,3]
      (shading normals); viewdirs [N,3] (points -> camera); radiance [N,S,3]
      (baked local incident); env_direct_light: fn(dirs [N,S,3]) -> [N,S,3];
      visibility [N,S,1]; incident_dirs [N,S,3]; incident_areas [N,S,1];
      env_radiance: optional PRE-EVALUATED env_direct_light(incident_dirs)
      — the stage-2 step also needs it for the consistency loss, and the
      two lookups are lax.map loops XLA will not CSE, so the caller
      evaluates once and shares (render/svgss.py).

    Returns (pbr [N,12], extra_results dict).
    """
    if env_radiance is None:
        env_radiance = env_direct_light(incident_dirs)
    global_lights = jnp.clip(env_radiance, 0.0, 64.0)
    local_lights = radiance
    global_lights = global_lights * visibility
    incident_lights = local_lights + global_lights          # [N,S,3]

    # n.l per (sample, vertex): [N,S,4,1]
    n_d_i = jnp.clip(jnp.sum(normals[:, None] * incident_dirs[:, :, None],
                             -1, keepdims=True), min=0)
    f_d = base_color[:, None] / math.pi                     # [N,1,12]
    f_s = ggx_specular4(normals, viewdirs, incident_dirs, roughness)
    # [N,S,4,1] -> [N,S,4] tiled x3 => channel-major [N,S,12]
    f_s = jnp.tile(f_s[..., 0], (1, 1, 3))

    def fold(lights):
        t = lights[:, :, None] * incident_areas[:, :, None] * n_d_i  # [N,S,4,3]
        return jnp.swapaxes(t, 2, 3).reshape(t.shape[0], t.shape[1], -1)

    transport = fold(incident_lights)                        # [N,S,12]
    specular = (f_s * transport).mean(-2)
    pbr = ((f_d + f_s) * transport).mean(-2)
    diffuse_light = transport.mean(-2)

    direct_pbr = ((f_d + f_s) * fold(global_lights)).mean(-2)
    indirect_pbr = ((f_d + f_s) * fold(local_lights)).mean(-2)

    extra = {
        "incident_dirs": incident_dirs,
        "incident_lights": incident_lights,
        "local_incident_lights": local_lights,
        "global_incident_lights": global_lights,
        "incident_visibility": visibility,
        "diffuse_light": diffuse_light,
        "specular": specular,
        "direct": direct_pbr,
        "indirect": indirect_pbr,
    }
    return pbr, extra
