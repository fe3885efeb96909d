"""finetune_visibility (gaussian_model.py:397-432): fitting the per-point
visibility SH against the ray tracer on a scene with a known occluder."""

import jax
import jax.numpy as jnp
import numpy as np

from svgir_tpu.models import gaussians as G
from svgir_tpu.utils.sh import eval_sh
from svgir_tpu.utils.transforms import normal_to_rotation, normalize


def _occluded_scene(n_base=48):
    """Points on the z=0 plane (normals +z) under a large opaque ceiling
    surfel at z=1: upward rays hit the ceiling (visibility ~0 beyond the
    0.9 cutoff is impossible — alpha 0.99 max -> T=0.01 -> hard 0), while
    the SH hemisphere sample directions all point up, so the fit target is
    nearly uniform darkness for base points and full visibility for the
    ceiling itself."""
    rng = np.random.default_rng(0)
    base = np.concatenate([rng.uniform(-0.5, 0.5, (n_base, 2)),
                           np.zeros((n_base, 1))], axis=1)
    ceiling = np.array([[0.0, 0.0, 1.0]])
    pts = jnp.asarray(np.concatenate([base, ceiling]).astype(np.float32))
    # ceiling normal faces DOWN so upward rays hit its front face (the
    # tracer backface-culls n.d > 0, trace.cu:235)
    normals = jnp.asarray(np.concatenate(
        [np.repeat([[0.0, 0.0, 1.0]], n_base, 0),
         [[0.0, 0.0, -1.0]]]).astype(np.float32))
    quats = normal_to_rotation(normals)
    # normal_to_rotation is singular at exactly -z; set the ceiling's
    # rotation explicitly (pi about x maps +z -> -z)
    quats = quats.at[-1].set(jnp.array([0.0, 1.0, 0.0, 0.0]))
    scales = jnp.concatenate(
        [jnp.full((n_base, 2), 0.05), jnp.zeros((n_base, 1))], axis=1)
    scales = jnp.concatenate(
        [scales, jnp.array([[3.0, 3.0, 0.0]])], axis=0)
    opac = jnp.full((n_base + 1,), 0.995)
    return pts, scales, quats, opac, normals


def test_finetune_visibility_fits_occlusion():
    pts, scales, quats, opac, normals = _occluded_scene()
    n = pts.shape[0]
    state = G.init_from_points(pts, jnp.full((n, 3), 0.5), normals=normals,
                               capacity=n, rotation_init="normal")
    state = G.upgrade_to_pbr(state)
    # pin the exact geometry (init_from_points re-derives scales and
    # rotations — and normal_to_rotation is singular at the ceiling's -z)
    p = dict(state["params"])
    p["scaling"] = jnp.log(jnp.maximum(scales, 1e-7))
    p["rotation"] = quats
    p["opacity"] = jnp.log(opac / (1 - opac))[:, None]
    state = {**state, "params": p}

    state2 = G.finetune_visibility(state, iterations=150, lr=3e-2,
                                   key=jax.random.PRNGKey(1), use_grid=False)

    sh = jnp.concatenate([state2["params"]["visibility_dc"],
                          state2["params"]["visibility_rest"]], axis=1)
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    pred_up = jnp.clip(eval_sh(3, jnp.swapaxes(sh, 1, 2), up) + 0.5, 0, 1)

    # base points look up into the opaque ceiling (3-sigma radius 9 covers
    # the whole hemisphere of exits) -> fitted visibility ~0 upward
    assert float(pred_up[:-1].mean()) < 0.3, float(pred_up[:-1].mean())

    # held-out check: fresh random hemisphere dirs, fitted SH vs a fresh
    # trace — the fit must generalize (low L1), not just memorize
    from svgir_tpu.ops import tracing
    d = jax.random.normal(jax.random.PRNGKey(99), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    geo_n = jnp.where((d * normals).sum(-1, keepdims=True) < 0, -d, d)
    geo = tracing.build_surfel_geometry(
        state2["params"]["xyz"], scales, quats, opac)
    tr = tracing.trace_visibility(geo, state2["params"]["xyz"] + 0.05 * geo_n,
                                  geo_n)
    pred = jnp.clip(eval_sh(3, jnp.swapaxes(sh, 1, 2), geo_n) + 0.5, 0, 1)
    l1 = float(jnp.abs(pred - tr["visibility"]).mean())
    assert l1 < 0.15, l1

    # untouched params stay identical
    for k in ("xyz", "scaling", "opacity"):
        np.testing.assert_array_equal(state2["params"][k],
                                      state["params"][k])
