"""Light models: learnable environment map + fixed HDR env.

Reference: ``scene/direct_light_map.py`` (DirectLightMap: H x 2H equirect,
softplus activation, grid_sample(align_corners=True) lookup x 2.0, own Adam,
upsample-with-optimizer-state) and ``scene/envmap.py`` (EnvLight: fixed HDR
downsampled to 32x64 for relighting lookups, no x2 factor).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svgir_tpu.train import optim


_LOOKUP_CHUNK = 65536


def _bilinear_lookup(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """align_corners=True bilinear sample. img [H, W, C]; u, v in pixel
    coords ([0, W-1] / [0, H-1]); out [..., C].

    MXU formulation — ZERO gathers/scatters.  The bilinear kernel
    factorizes over rows and columns, so the sample is two dense
    contractions against 2-tap one-hot weight matrices:

        rows[m, w*c] = Wrow[m, :H] @ img[H, W*C]      (MXU matmul)
        out[m, c]    = sum_w Wcol[m, w] * rows[m, w, c]

    and the VJP w.r.t. ``img`` is likewise a single ``Wrow^T @ (...)``
    matmul — no scatter-add.  The previous 2x2xC-patch ``lax.gather``
    lowered to a per-query scalar loop on TPU (~5.5 us/query: 6.6 s for
    the 1.2M-query env lookup a stage-2 step performs TWICE —
    docs/measurements/s2_debug_20260818.log); this runs the same query
    load in milliseconds (docs/PERF.md "1-D gathers are catastrophic").
    FLOPs are tiny: 2·M·H·W·C (15 GFLOP at M=1.2M, 32x64 env).

    Queries are processed in ``_LOOKUP_CHUNK`` blocks via ``lax.map`` so
    the [B, W*C] intermediate stays bounded regardless of M.

    Edge handling matches the reference four-gather form exactly: the
    floor cell is clamped to H-2/W-2 and when it sat on the last
    row/column the fractional weight collapses onto the second tap
    (weight 1), reproducing grid_sample's clamped-corner duplication."""
    h, w = img.shape[0], img.shape[1]
    c = img.shape[2]
    shape = u.shape
    uf = u.reshape(-1)
    vf = v.reshape(-1)
    m = uf.shape[0]

    # On TPU, large query loads go through the Pallas kernel: the one-hot
    # weight matrices live only in VMEM and the lax.map plumbing (~27 ms of
    # the r3 stage-2 step: dynamic-update-slices + layout copies around
    # <1 ms of matmul) disappears.  NOTE the kernel differentiates w.r.t.
    # the env only — every caller passes constant directions (baked
    # fibonacci dirs, fixed camera grids), matching the reference's actual
    # gradient use of grid_sample.
    if m > 8192 and jax.default_backend() == "tpu":
        from svgir_tpu.ops.env_lookup_pallas import bilinear_lookup_pallas
        return bilinear_lookup_pallas(img, uf, vf).reshape(*shape, c)

    img2d = img.reshape(h, w * c)

    def block(uv):
        ub, vb = uv
        u0 = jnp.clip(jnp.floor(ub), 0, w - 1)
        v0 = jnp.clip(jnp.floor(vb), 0, h - 1)
        fu = jnp.clip(ub - u0, 0.0, 1.0)
        fv = jnp.clip(vb - v0, 0.0, 1.0)
        u0i = u0.astype(jnp.int32)
        v0i = v0.astype(jnp.int32)
        su = jnp.minimum(u0i, w - 2)
        sv = jnp.minimum(v0i, h - 2)
        wu1 = jnp.where(u0i > su, 1.0, fu)
        wv1 = jnp.where(v0i > sv, 1.0, fv)
        hh = jnp.arange(h, dtype=jnp.int32)
        ww = jnp.arange(w, dtype=jnp.int32)
        wrow = ((hh == sv[:, None]) * (1.0 - wv1[:, None])
                + (hh == sv[:, None] + 1) * wv1[:, None])    # [B, H]
        wcol = ((ww == su[:, None]) * (1.0 - wu1[:, None])
                + (ww == su[:, None] + 1) * wu1[:, None])    # [B, W]
        rows = jnp.matmul(
            wrow, img2d,
            precision=jax.lax.Precision.HIGHEST).reshape(-1, w, c)
        return jnp.einsum("bw,bwc->bc", wcol, rows,
                          precision=jax.lax.Precision.HIGHEST)

    if m <= _LOOKUP_CHUNK:
        out = block((uf, vf))
    else:
        nb = -(-m // _LOOKUP_CHUNK)
        pad = nb * _LOOKUP_CHUNK - m
        up = jnp.pad(uf, (0, pad)).reshape(nb, _LOOKUP_CHUNK)
        vp = jnp.pad(vf, (0, pad)).reshape(nb, _LOOKUP_CHUNK)
        out = jax.lax.map(block, (up, vp)).reshape(-1, c)[:m]
    return out.reshape(*shape, c)


def equirect_grid_coords(dirs: jax.Array):
    """(qx, qy) grid coords in [-1, 1], resolution-INDEPENDENT half of the
    reference direct_light mapping (direct_light_map.py:70-83):
    phi = arccos(z) - 1e-6, theta = atan2(y, x), qx = -theta/pi,
    qy = phi/pi*2 - 1.  Precomputed ONCE per bake for the constant
    incident_dirs (``bake_radiance`` stores them as ``incident_qxy``):
    re-deriving them per stage-2 step forced [1.2M, 3] layout transposes
    around the component accesses — ~3.5 ms/step of pure copies in the
    r4 trace."""
    z = jnp.clip(dirs[..., 2], -1.0, 1.0)
    phi = jnp.arccos(z) - 1e-6
    theta = jnp.arctan2(dirs[..., 1], dirs[..., 0])
    return -theta / math.pi, (phi / math.pi) * 2 - 1


def _equirect_query(dirs: jax.Array, h: int, w: int):
    """Pixel-coordinate equirect query (align_corners)."""
    qx, qy = equirect_grid_coords(dirs)
    return (qx + 1) * 0.5 * (w - 1), (qy + 1) * 0.5 * (h - 1)


def direct_light_qxy(params, qx: jax.Array, qy: jax.Array) -> jax.Array:
    """``direct_light`` from precomputed grid coords (same floats: the
    pixel mapping below is identical to _equirect_query's)."""
    env = env_activated(params)
    h, w = env.shape[0], env.shape[1]
    return _bilinear_lookup(env, (qx + 1) * 0.5 * (w - 1),
                            (qy + 1) * 0.5 * (h - 1)) * 2.0


def env_light_direct_qxy(state, qx: jax.Array, qy: jax.Array) -> jax.Array:
    """``env_light_direct`` from precomputed grid coords.  Only valid when
    the light has NO direction transform (rotated relight envs re-derive
    uv from the transformed dirs — callers gate on that)."""
    env = state["lookup"]
    h, w = env.shape[0], env.shape[1]
    return _bilinear_lookup(env, (qx + 1) * 0.5 * (w - 1),
                            (qy + 1) * 0.5 * (h - 1))


# ---------------------------------------------------------------------------
# DirectLightMap — learnable environment
# ---------------------------------------------------------------------------

def direct_light_map_init(key: jax.Array, h: int = 128,
                          light_init: float = 0.5) -> Dict:
    """env ~ light_init * U[0,1), shape [H, 2H, 3]
    (direct_light_map.py:11-16)."""
    env = light_init * jax.random.uniform(key, (h, 2 * h, 3))
    params = {"env": env}
    return {"params": params, "opt": optim.adam_init(params)}


def env_activated(params) -> jax.Array:
    """softplus activation (direct_light_map.py:103-106): [H, W, 3]."""
    return jax.nn.softplus(params["env"])


def direct_light(params, dirs: jax.Array) -> jax.Array:
    """Radiance lookup x 2.0 (direct_light_map.py:70-83)."""
    env = env_activated(params)
    u, v = _equirect_query(dirs, env.shape[0], env.shape[1])
    return _bilinear_lookup(env, u, v) * 2.0


def direct_light_map_step(state: Dict, grads: Dict, env_lr: float) -> Dict:
    params, opt_state = optim.adam_step(state["params"], grads, state["opt"],
                                        {"env": env_lr})
    return {"params": params, "opt": opt_state}


def direct_light_map_upsample(state: Dict) -> Dict:
    """Bilinear 2x upsample of env AND its Adam moments
    (direct_light_map.py:85-101)."""
    def up(x):
        h, w = x.shape[0], x.shape[1]
        return jax.image.resize(x, (2 * h, 2 * w, x.shape[2]), "bilinear")

    params = {"env": up(state["params"]["env"])}
    opt = {
        "m": {"env": up(state["opt"]["m"]["env"])},
        "v": {"env": up(state["opt"]["v"]["env"])},
        "step": state["opt"]["step"],
    }
    return {"params": params, "opt": opt}


# ---------------------------------------------------------------------------
# EnvLight — fixed HDR environment (relighting)
# ---------------------------------------------------------------------------

def load_hdr(path: str) -> np.ndarray:
    """Load .hdr/.exr/.png as linear float RGB [H, W, 3] (envmap.py:37-62)."""
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(path)).astype(np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    img = img[..., :3]
    if path.lower().endswith(".png"):
        img = img / 255.0 if img.max() > 1.5 else img
        from svgir_tpu.utils.graphics import srgb_to_rgb
        img = np.asarray(srgb_to_rgb(jnp.asarray(img)))
    return img


def env_light_init(envmap: np.ndarray, scale: float = 1.0,
                   lookup_res: Tuple[int, int] = (32, 64),
                   transform: Optional[np.ndarray] = None) -> Dict:
    """Fixed HDR light.  Keeps the full map plus a downsampled lookup copy
    (envmap.py:63-71; 32x64 is the relighting-eval resolution)."""
    full = jnp.asarray(envmap) * scale
    small = jax.image.resize(full, (*lookup_res, 3), "linear")
    return {"envmap": full, "lookup": small,
            "transform": None if transform is None else jnp.asarray(transform)}


def env_light_direct(state: Dict, dirs: jax.Array) -> jax.Array:
    """Lookup in the downsampled map; NO x2 factor (envmap.py)."""
    if state.get("transform") is not None:
        dirs = dirs @ state["transform"].T
    env = state["lookup"]
    u, v = _equirect_query(dirs, env.shape[0], env.shape[1])
    return _bilinear_lookup(env, u, v)


# ---------------------------------------------------------------------------
# Spherical-gaussian / SH / gamma light variants (scene/direct_light_sg.py,
# scene/derect_light_sh.py, scene/gamma_trans.py — present in the reference
# but unused by the default recipes)
# ---------------------------------------------------------------------------

def direct_light_sg_init(key: jax.Array, num_sgs: int = 32) -> Dict:
    """Learnable mixture of spherical gaussians (direct_light_sg.py):
    lobe axis (unit), sharpness lambda (softplus), amplitude mu (softplus).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    axis = jax.random.normal(k1, (num_sgs, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    params = {
        "sg_axis": axis,
        "sg_sharpness": jax.random.uniform(k2, (num_sgs, 1), minval=0.0,
                                           maxval=2.0),
        "sg_amplitude": jax.random.uniform(k3, (num_sgs, 3)),
    }
    return {"params": params, "opt": optim.adam_init(params)}


def direct_light_sg(params, dirs: jax.Array) -> jax.Array:
    """Radiance = sum_i mu_i * exp(lambda_i * (axis_i . d - 1))."""
    axis = params["sg_axis"] / jnp.linalg.norm(params["sg_axis"], axis=-1,
                                               keepdims=True)
    lam = jax.nn.softplus(params["sg_sharpness"])
    mu = jax.nn.softplus(params["sg_amplitude"])
    cos = jnp.einsum("...d,kd->...k", dirs, axis)          # [..., K]
    w = jnp.exp(lam[:, 0] * (cos - 1.0))
    return w @ mu


def direct_light_sh_init(key: jax.Array, deg: int = 2) -> Dict:
    """Learnable global SH environment (derect_light_sh.py)."""
    k = (deg + 1) ** 2
    params = {"sh": 0.1 * jax.random.normal(key, (3, k))}
    return {"params": params, "opt": optim.adam_init(params), "deg": deg}


def direct_light_sh(params, dirs: jax.Array, deg: int = 2) -> jax.Array:
    from svgir_tpu.utils.sh import eval_sh
    return jnp.clip(eval_sh(deg, params["sh"], dirs), min=0.0)


def gamma_correct(img: jax.Array, gamma_params=None) -> jax.Array:
    """Learnable-gamma transform (scene/gamma_trans.py LearningGammaTransform
    analog): img ** (1/softplus(g))."""
    g = jax.nn.softplus(gamma_params["gamma"]) if gamma_params else 2.2
    return jnp.power(jnp.clip(img, 1e-8, None), 1.0 / g)
