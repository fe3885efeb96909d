"""Gaussian-surfel model state: parameters, activations, densification.

Functional re-design of the reference ``scene/gaussian_model.py`` GaussianModel
for XLA: all learnable state lives in a pytree of **fixed-capacity padded
arrays** with an ``alive`` mask; densify/clone/split/prune are masked scatter
ops (no dynamic shapes — recompilation happens only when the capacity bucket
grows).  Optimizer-state surgery (zeroed moments for new/replaced points,
gaussian_model.py:1005-1088) becomes direct index updates on the Adam moment
pytrees.

Numerical contracts (activations, init, thresholds) follow
gaussian_model.py:104-125, 695-735, 1136-1268 — see SURVEY.md Appendix A.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from svgir_tpu.utils.transforms import (
    inverse_sigmoid,
    normalize,
    quat_to_rotmat,
)

VERTEX_NUM = 4  # gaussian_model.py:150


# ---------------------------------------------------------------------------
# activations (gaussian_model.py:104-125, 270-351)
# ---------------------------------------------------------------------------

def get_scaling(params) -> jax.Array:
    return jnp.nan_to_num(jnp.exp(params["scaling"]), nan=1e-6)


def get_rotation(params) -> jax.Array:
    return jnp.nan_to_num(normalize(params["rotation"]), nan=1e-6)


def get_opacity(params) -> jax.Array:
    return jax.nn.sigmoid(params["opacity"])


def get_geo_normal(params) -> jax.Array:
    """3rd column of the rotation matrix (gaussian_model.py:297-299)."""
    return quat_to_rotmat(get_rotation(params))[..., :, 2]


def get_shading_normal(params) -> jax.Array:
    """[N, 4, 3] per-vertex normals: geo + offsets, normalized
    (gaussian_model.py:287-295).  ``normal`` stores channel-major offsets
    [cx*4, cy*4, cz*4]."""
    geo = get_geo_normal(params)[:, None, :]                     # [N, 1, 3]
    off = params["normal"].reshape(-1, 3, VERTEX_NUM)            # [N, 3, 4]
    off = jnp.swapaxes(off, 1, 2)                                # [N, 4, 3]
    return normalize(geo + off)


def get_shs(params) -> jax.Array:
    return jnp.concatenate([params["shs_dc"], params["shs_rest"]], axis=1)


def get_base_color(params, base_color_scale: Optional[jax.Array] = None):
    """sigmoid(x)*0.77 + 0.03, channel-major over 4 vertices, optionally
    rescaled per color channel (gaussian_model.py:123,338-339)."""
    bc = jax.nn.sigmoid(params["base_color"]) * 0.77 + 0.03
    if base_color_scale is not None:
        bc = bc * jnp.repeat(base_color_scale, VERTEX_NUM)[None, :]
    return bc


def get_roughness(params) -> jax.Array:
    return jnp.nan_to_num(jax.nn.sigmoid(params["roughness"]) * 0.9 + 0.09,
                          nan=1e-8)


def get_radiances(params) -> jax.Array:
    """Radiance field: detached values x trainable ratio
    (gaussian_model.py:322-324) — gradients reach ``radiances`` only through
    the consistency loss, while ``radiance_ratio`` trains through the
    rendered PBR loss."""
    return jnp.nan_to_num(
        jax.lax.stop_gradient(params["radiances"]) * params["radiance_ratio"],
        nan=0.0)


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def _round_capacity(n: int) -> int:
    """Smallest capacity bucket >= n (power-of-two steps from 4096)."""
    cap = 4096
    while cap < n:
        cap *= 2
    return cap


def init_from_points(points: jax.Array, colors: jax.Array,
                     normals: Optional[jax.Array] = None, *,
                     sh_degree: int = 3, use_pbr: bool = False,
                     capacity: Optional[int] = None,
                     mean_sq_dist: Optional[jax.Array] = None,
                     rotation_init: str = "identity",
                     morton_order: bool = False) -> Dict[str, Any]:
    """create_from_pcd (gaussian_model.py:695-735) with padded capacity.

    Returns a dict with "params", "alive", and bookkeeping stats arrays.
    ``mean_sq_dist``: mean squared distance to the 3 nearest neighbors
    (simple-knn distCUDA2); computed brute-force if not given.
    ``morton_order``: sort the input cloud by 30-bit morton code (the
    spatial ordering simple-knn applies internally, simple_knn.cu) so
    index-adjacent gaussians stay spatially adjacent — the counting
    binner's gaussian-chunk windows then touch coherent tile sets.
    """
    if morton_order:
        import numpy as _np

        from native.build import morton3d
        pts_h = _np.asarray(points, _np.float32)
        lo = pts_h.min(axis=0)
        ext = _np.maximum(pts_h.max(axis=0) - lo, 1e-12)
        codes = morton3d(pts_h, lo, 1.0 / ext)
        if codes is None:      # native lib unavailable: numpy fallback
            q = _np.clip(((pts_h - lo) / ext) * 1024, 0,
                         1023).astype(_np.uint64)
            codes = _np.zeros(len(pts_h), _np.uint64)
            for axis_i in range(3):
                v = q[:, axis_i]
                for bit in range(10):
                    codes |= ((v >> bit) & 1) << (3 * bit + (2 - axis_i))
        order = _np.argsort(codes, kind="stable")
        points = points[order]
        colors = colors[order]
        if normals is not None:
            normals = normals[order]
        if mean_sq_dist is not None:
            mean_sq_dist = mean_sq_dist[order]
    n = points.shape[0]
    cap = capacity or _round_capacity(n)
    k = (sh_degree + 1) ** 2

    if mean_sq_dist is None:
        from svgir_tpu.ops.knn import mean_sq_dist_3nn
        mean_sq_dist = mean_sq_dist_3nn(points)
    dist2 = jnp.clip(mean_sq_dist, min=1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        shape = (cap,) + x.shape[1:]
        out = jnp.full(shape, fill, x.dtype)
        return out.at[:n].set(x)

    from svgir_tpu.utils.sh import rgb_to_sh
    shs = jnp.zeros((n, k, 3))
    shs = shs.at[:, 0, :].set(rgb_to_sh(colors))

    if rotation_init == "normal" and normals is not None:
        from svgir_tpu.utils.transforms import normal_to_rotation
        rots = normal_to_rotation(normals)
    else:  # reference default: identity (gaussian_model.py:708-709)
        rots = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    opac = inverse_sigmoid(0.1 * jnp.ones((n, 1)))
    if normals is None:
        normals = jnp.zeros((n, 3))

    params = {
        "xyz": pad(points),
        "normal": pad(normals),
        "shs_dc": pad(shs[:, 0:1, :]),
        "shs_rest": pad(shs[:, 1:, :]),
        "scaling": pad(scales),
        "rotation": pad(rots),
        "opacity": pad(opac, fill=-10.0),
    }
    if use_pbr:
        params.update(pbr_init(cap))

    alive = jnp.zeros((cap,), bool).at[:n].set(True)
    return {
        "params": params,
        "alive": alive,
        "stats": init_stats(cap),
    }


def pbr_init(cap: int, sh_degree: int = 3) -> Dict[str, jax.Array]:
    """Per-vertex PBR parameters created when upgrading stage-1 -> stage-2
    (gaussian_model.py:667-684): zeros everywhere; ``normal`` is replaced by
    [cap, 12] per-vertex offsets by the caller."""
    k = (sh_degree + 1) ** 2
    return {
        "base_color": jnp.zeros((cap, 3 * VERTEX_NUM)),
        "roughness": jnp.zeros((cap, VERTEX_NUM)),
        "incidents_dc": jnp.zeros((cap, 1, 3)),
        "incidents_rest": jnp.zeros((cap, k - 1, 3)),
        "visibility_dc": jnp.zeros((cap, 1, 1)),
        "visibility_rest": jnp.zeros((cap, 15, 1)),
    }


def upgrade_to_pbr(state: Dict[str, Any]) -> Dict[str, Any]:
    """Stage-1 -> stage-2 (create_from_ckpt from_gs path,
    gaussian_model.py:667-684): add per-vertex params, replace the [cap, 3]
    normal with zeroed [cap, 12] per-vertex offsets."""
    params = dict(state["params"])
    cap = params["xyz"].shape[0]
    params.update(pbr_init(cap))
    params["normal"] = jnp.zeros((cap, 3 * VERTEX_NUM))
    return {**state, "params": params}


def init_stats(cap: int) -> Dict[str, jax.Array]:
    return {
        "xyz_gradient_accum": jnp.zeros((cap, 1)),
        "normal_gradient_accum": jnp.zeros((cap, 1)),
        "denom": jnp.zeros((cap, 1)),
        "weights_accum": jnp.zeros((cap, 1)),
        "max_radii2d": jnp.zeros((cap,)),
    }


def num_alive(state) -> jax.Array:
    return state["alive"].sum()


# ---------------------------------------------------------------------------
# densification (gaussian_model.py:1136-1268; train.py:194-209)
# ---------------------------------------------------------------------------

def densify_and_prune(state: Dict[str, Any], opt_state, key: jax.Array, *,
                      max_grad: float, min_opacity: float, extent: float,
                      max_screen_size: Optional[float],
                      max_grad_normal: float = 99999.0,
                      percent_dense: float = 0.001,
                      weights_threshold: float = 1e-5,
                      n_split: int = 2):
    """Clone + split + prune in one fixed-shape pass.

    Matches gaussian_model.py:1229-1268:
      clone  if |grad| >= max_grad and max(scale) <= percent_dense*extent
      split  if |grad| >= max_grad and max(scale) >  percent_dense*extent
             (N=2 samples from the gaussian, scales /1.6, z-scale -> -1e10)
      prune  if opacity < min_opacity or weights_accum < thresh or
             (size gate) radii2d > max_screen or scale > 0.1*extent
    New points get zeroed Adam moments; stats are reset.
    """
    params, alive, stats = state["params"], state["alive"], state["stats"]
    cap = alive.shape[0]

    grads = stats["xyz_gradient_accum"] / jnp.maximum(stats["denom"], 1e-12)
    grads = jnp.nan_to_num(grads[:, 0], nan=0.0)
    grads_n = stats["normal_gradient_accum"] / jnp.maximum(stats["denom"], 1e-12)
    grads_n = jnp.nan_to_num(grads_n[:, 0], nan=0.0)

    scaling = get_scaling(params)
    max_scale = scaling.max(axis=1)
    hot = ((grads >= max_grad) | (grads_n >= max_grad_normal)) & alive

    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    # ---- prune (applied to the ORIGINAL points; split originals also die) --
    opac = get_opacity(params)[:, 0]
    prune = (opac < min_opacity) | (stats["weights_accum"][:, 0] < weights_threshold)
    if max_screen_size is not None:
        prune |= stats["max_radii2d"] > max_screen_size
        prune |= max_scale > 0.1 * extent
    prune = (prune | split_mask) & alive

    survivors = alive & ~prune

    # ---- gather new points: clones (1x) + split children (n_split x) -------
    # Sources laid out as [clone sources..., split sources x n_split].
    # We scatter each source row into the k-th free slot of `survivors`.
    free = ~survivors
    free_idx = jnp.nonzero(free, size=cap, fill_value=cap - 1)[0]

    n_clone = clone_mask.sum()
    # clone ranks 0..n_clone-1; split ranks follow, n_split slots each
    clone_rank = jnp.cumsum(clone_mask.astype(jnp.int32)) - 1
    split_rank = jnp.cumsum(split_mask.astype(jnp.int32)) - 1

    rot_mat = quat_to_rotmat(get_rotation(params))
    split_scaling = jnp.log(scaling / (0.8 * n_split))

    new_params = {k: jnp.asarray(v) for k, v in params.items()}
    new_m = {k: jnp.asarray(v) for k, v in opt_state["m"].items()}
    new_v = {k: jnp.asarray(v) for k, v in opt_state["v"].items()}
    free_count = free.sum()

    placed_alive = survivors

    def place(dst_params, dst_m, dst_v, placed, src_mask, rank_offset, rank,
              transform):
        """Scatter transformed copies of masked sources into free slots."""
        slot_rank = rank_offset + rank
        ok = src_mask & (slot_rank < free_count)
        dst = jnp.where(ok, free_idx[jnp.clip(slot_rank, 0, cap - 1)], cap)
        # dst==cap rows are dropped by scatter (out of bounds, mode drop)
        for name in dst_params:
            src = transform(name, params[name])
            dst_params[name] = dst_params[name].at[dst].set(
                src, mode="drop")
            zeros = jnp.zeros_like(src)
            dst_m[name] = dst_m[name].at[dst].set(zeros, mode="drop")
            dst_v[name] = dst_v[name].at[dst].set(zeros, mode="drop")
        placed = placed.at[dst].set(True, mode="drop")
        return placed

    # clones: verbatim copies (gaussian_model.py:1189-1227)
    placed_alive = place(new_params, new_m, new_v, placed_alive, clone_mask,
                         0, clone_rank, lambda name, x: x)

    # splits: n_split children with sampled positions + shrunk scales
    keys = jax.random.split(key, n_split)
    for i in range(n_split):
        noise = jax.random.normal(keys[i], (cap, 3)) * scaling
        child_xyz = params["xyz"] + jnp.einsum("nij,nj->ni", rot_mat, noise)
        child_scaling = split_scaling.at[:, 2].set(-1e10)

        def transform(name, x, cx=child_xyz, cs=child_scaling):
            if name == "xyz":
                return cx
            if name == "scaling":
                return cs
            return x

        placed_alive = place(new_params, new_m, new_v, placed_alive,
                             split_mask, n_clone + i * split_mask.sum(),
                             split_rank, transform)

    new_state = {
        "params": new_params,
        "alive": placed_alive,
        "stats": init_stats(cap),
    }
    new_opt = {**opt_state, "m": new_m, "v": new_v}
    report = {
        "n_clone": n_clone,
        "n_split": split_mask.sum(),
        "n_prune": (prune & ~split_mask).sum(),
        "n_alive": placed_alive.sum(),
        "out_of_capacity": n_clone + n_split * split_mask.sum() > free_count,
    }
    return new_state, new_opt, report


def reset_opacity(params, opt_state):
    """opacity <- min(opacity, 0.01), zero its Adam moments
    (gaussian_model.py:886-889, replace_tensor_to_optimizer)."""
    new_opac = inverse_sigmoid(jnp.minimum(get_opacity(params), 0.01))
    params = {**params, "opacity": new_opac}
    opt_state = {
        **opt_state,
        "m": {**opt_state["m"], "opacity": jnp.zeros_like(new_opac)},
        "v": {**opt_state["v"], "opacity": jnp.zeros_like(new_opac)},
    }
    return params, opt_state


def add_densification_stats(stats, mean2d_grad_ndc, update_filter, weights,
                            radii):
    """train.py:194-199 + gaussian_model.py:1270-1276.

    ``mean2d_grad_ndc``: [cap, 2] gradient w.r.t. NDC-scale screen position
    (pixel-grad x (0.5 W, 0.5 H), matching backward.cu:639-640).
    """
    upd = update_filter[:, None]
    stats = dict(stats)
    stats["weights_accum"] = stats["weights_accum"] + weights
    stats["xyz_gradient_accum"] = stats["xyz_gradient_accum"] + jnp.where(
        upd, jnp.linalg.norm(mean2d_grad_ndc, axis=-1, keepdims=True), 0.0)
    stats["denom"] = stats["denom"] + upd.astype(jnp.float32)
    stats["max_radii2d"] = jnp.where(update_filter,
                                     jnp.maximum(stats["max_radii2d"], radii),
                                     stats["max_radii2d"])
    return stats


def grow_capacity(state, opt_state, new_cap: int):
    """Re-pad all arrays to a larger capacity (outside jit; triggers one
    recompile per bucket)."""
    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((new_cap - x.shape[0],) + x.shape[1:], x.dtype)],
            axis=0)

    state = {
        "params": {k: pad(v) for k, v in state["params"].items()},
        "alive": pad(state["alive"]),
        "stats": {k: pad(v) for k, v in state["stats"].items()},
    }
    opt_state = {
        **opt_state,
        "m": {k: pad(v) for k, v in opt_state["m"].items()},
        "v": {k: pad(v) for k, v in opt_state["v"].items()},
    }
    return state, opt_state


def apply_transform(params: Dict[str, jax.Array], transform: jax.Array
                    ) -> Dict[str, jax.Array]:
    """Rigid+scale transform of the model (GaussianModel.set_transform,
    gaussian_model.py:169-193): used by multi-scene composition
    (relighting.py scene_composition)."""
    from svgir_tpu.utils.transforms import quat_multiply, rotmat_to_quat

    params = dict(params)
    scale = jnp.linalg.norm(transform[:3, :3], axis=-1)     # per-row norm
    params["scaling"] = jnp.log(get_scaling(params) * scale)
    ones = jnp.ones_like(params["xyz"][:, :1])
    homo = jnp.concatenate([params["xyz"], ones], -1)
    params["xyz"] = (homo @ transform.T)[:, :3]
    rot = transform[:3, :3] / scale[:, None]
    if params["normal"].shape[-1] == 3:
        params["normal"] = params["normal"] @ rot.T
    rot_q = rotmat_to_quat(rot[None])[0]
    params["rotation"] = quat_multiply(rot_q[None], params["rotation"])
    return params


def concatenate_models(states) -> Dict:
    """create_from_gaussians (gaussian_model.py:599-611): concatenate the
    alive rows of several models into one padded state."""
    parts = []
    for st in states:
        import numpy as np
        alive = np.asarray(st["alive"])
        parts.append({k: v[alive] for k, v in st["params"].items()
                      if hasattr(v, "ndim") and v.ndim >= 1})
    total = sum(p["xyz"].shape[0] for p in parts)
    cap = _round_capacity(total)
    keys = parts[0].keys()
    params = {}
    for k in keys:
        cat = jnp.concatenate([p[k] for p in parts], axis=0)
        out = jnp.zeros((cap,) + cat.shape[1:], cat.dtype)
        params[k] = out.at[:total].set(cat)
    if "radiance_ratio" in states[0]["params"]:
        params["radiance_ratio"] = states[0]["params"]["radiance_ratio"]
    alive = jnp.zeros((cap,), bool).at[:total].set(True)
    return {"params": params, "alive": alive, "stats": init_stats(cap)}


def knn_regularization_loss(params, alive=None, k: int = 8):
    """get_knn_loss (gaussian_model.py:577-592): variance of albedo and
    roughness over each point's top-k neighborhood (defined in the reference
    but not wired into any loss path; exposed for parity)."""
    from svgir_tpu.ops.knn import knn

    pts = params["xyz"]
    n_valid = None if alive is None else alive.sum()
    _, idx = knn(pts, k=k, n_valid=n_valid)
    albedo = get_base_color(params)
    rough = get_roughness(params)
    knn_albedo = albedo[idx]                    # [N, k, 12]
    knn_rough = rough[idx]
    return knn_albedo.var(axis=1).mean(), knn_rough.var(axis=1).mean()


def finetune_visibility(state, *, iterations: int = 1000, lr: float = 1e-2,
                        key: Optional[jax.Array] = None,
                        use_grid: Optional[bool] = None,
                        log_every: int = 0):
    """Fit the per-gaussian visibility SH (deg 3, 16 coeffs, 1 channel) to
    ray-traced visibility — ``GaussianModel.finetune_visibility``
    (gaussian_model.py:397-432).

    Per iteration: one random direction per gaussian flipped into the
    geometric normal's hemisphere, ``clamp(eval_sh + 0.5, 0, 1)`` as the
    prediction, traced transmittance (``trace_visibility`` semantics:
    product of (1-alpha), hard 0 below 0.9, origins offset 0.05*d —
    bvh/__init__.py:59) as the target, L1 loss, Adam lr 1e-2 on
    visibility_dc/rest only.  The trace is not differentiated (the CUDA
    tracer has no backward).  Returns the updated ``state``.
    """
    from svgir_tpu.ops import tracing
    from svgir_tpu.train import optim
    from svgir_tpu.utils.sh import eval_sh

    params = state["params"]
    alive = state["alive"]
    n = params["xyz"].shape[0]
    key = jax.random.PRNGKey(0) if key is None else key

    opacity = jnp.where(alive, get_opacity(params)[:, 0], 0.0)
    geo = tracing.build_surfel_geometry(
        params["xyz"], get_scaling(params), get_rotation(params), opacity,
        valid=alive)
    normal = get_geo_normal(params)

    if use_grid is None:
        use_grid = int(alive.sum()) >= 4096
    grid = None
    if use_grid:
        from svgir_tpu.ops import grid_tracer
        grid = grid_tracer.build_grid_auto(
            geo, res=grid_tracer.auto_res(geo))
        import numpy as np
        m_np = np.asarray(jax.device_get(params["xyz"]))
        diag = float(np.linalg.norm(m_np.max(0) - m_np.min(0))) + 1e-3
        n_steps = grid_tracer._concrete_n_steps(grid, diag)

    vis = {"visibility_dc": params["visibility_dc"],
           "visibility_rest": params["visibility_rest"]}
    opt_state = optim.adam_init(vis)
    lrs = {"visibility_dc": lr, "visibility_rest": lr}
    denom = jnp.maximum(alive.sum(), 1)

    @jax.jit
    def step(vis, opt_state, k):
        d = normalize(jax.random.normal(k, (n, 3)))
        flip = jnp.sum(d * normal, -1, keepdims=True) < 0
        d = jnp.where(flip, -d, d)
        o = params["xyz"] + 0.05 * d
        if use_grid:
            from svgir_tpu.ops import grid_tracer
            tr = grid_tracer.trace_visibility_grid(geo, grid, o, d,
                                                   t_max=float(diag),
                                                   n_steps=n_steps)
        else:
            tr = tracing.trace_visibility(geo, o, d)
        target = jax.lax.stop_gradient(tr["visibility"])        # [N, 1]

        def loss_fn(vp):
            sh = jnp.concatenate([vp["visibility_dc"],
                                  vp["visibility_rest"]], axis=1)  # [N,16,1]
            pred = eval_sh(3, jnp.swapaxes(sh, 1, 2), d)           # [N, 1]
            pred = jnp.clip(pred + 0.5, 0.0, 1.0)
            err = jnp.abs(target - pred)
            return jnp.where(alive[:, None], err, 0.0).sum() / denom

        loss, grads = jax.value_and_grad(loss_fn)(vis)
        vis, opt_state = optim.adam_step(vis, grads, opt_state, lrs)
        return vis, opt_state, loss

    for it in range(iterations):
        key, k = jax.random.split(key)
        vis, opt_state, loss = step(vis, opt_state, k)
        if log_every and (it + 1) % log_every == 0:
            print(f"finetune_visibility {it + 1}/{iterations}: "
                  f"L1 {float(loss):.4f}", flush=True)

    new_params = dict(params)
    new_params.update(vis)
    return {**state, "params": new_params}
