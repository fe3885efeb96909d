"""Checkpoint / resume + PLY interop.

Two formats, mirroring the reference (SURVEY.md §5):
* native checkpoints: the state/opt/env pytrees flattened into one ``.npz``
  (the torch.save((capture(), iter)) analog, gaussian_model.py:195-268) —
  simple, portable, resumable;
* PLY import/export with the reference's exact column layout
  (construct_list_of_attributes, gaussian_model.py:825-884) so assets
  round-trip with the CUDA implementation.  NOTE the reference's load_ply
  reads roughness from the ``normal_*`` columns (latent bug, :955-960); we
  read the ``roughness_*`` columns.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svgir_tpu.data.ply import read_ply, write_ply
from svgir_tpu.models import gaussians as G


# ---------------------------------------------------------------------------
# npz pytree checkpoints
# ---------------------------------------------------------------------------

def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]) -> None:
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}/{k}", out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.strip("/").split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def save_checkpoint(path: str, iteration: int, state: Dict, opt_state: Dict,
                    env: Optional[Dict] = None,
                    extra: Optional[Dict] = None) -> None:
    flat: Dict[str, np.ndarray] = {"__iteration__": np.int64(iteration)}
    _flatten(state, "state", flat)
    _flatten(opt_state, "opt", flat)
    if env is not None:
        _flatten(env, "env", flat)
    if extra is not None:
        _flatten(extra, "extra", flat)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_checkpoint(path: str) -> Tuple[int, Dict]:
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    iteration = int(flat.pop("__iteration__"))
    return iteration, _unflatten(flat)


# ---------------------------------------------------------------------------
# reference-layout PLY
# ---------------------------------------------------------------------------

def save_model_ply(path: str, params: Dict, alive: Optional[jnp.ndarray],
                   use_pbr: bool = False) -> None:
    """save_ply (gaussian_model.py:855-884): raw (pre-activation) params;
    the nx/ny/nz columns carry the geometric normal."""
    sel = np.asarray(alive) if alive is not None else slice(None)

    def np_(x):
        return np.asarray(x)[sel].astype(np.float32)

    cols: Dict[str, np.ndarray] = {}
    xyz = np_(params["xyz"])
    for i, ax in enumerate("xyz"):
        cols[ax] = xyz[:, i]
    geo_n = np_(G.get_geo_normal(params))
    for i, ax in enumerate(["nx", "ny", "nz"]):
        cols[ax] = geo_n[:, i]
    def flat_sh(x):
        # explicit column count: reshape(n, -1) breaks when n == 0
        x = np_(x).transpose(0, 2, 1)
        return x.reshape(len(xyz), x.shape[1] * x.shape[2])

    dc = flat_sh(params["shs_dc"])
    for i in range(dc.shape[1]):
        cols[f"f_dc_{i}"] = dc[:, i]
    rest = flat_sh(params["shs_rest"])
    for i in range(rest.shape[1]):
        cols[f"f_rest_{i}"] = rest[:, i]
    cols["opacity"] = np_(params["opacity"])[:, 0]
    scaling = np_(params["scaling"])
    for i in range(scaling.shape[1]):
        cols[f"scale_{i}"] = scaling[:, i]
    rot = np_(params["rotation"])
    for i in range(rot.shape[1]):
        cols[f"rot_{i}"] = rot[:, i]

    if use_pbr:
        bc = np_(params["base_color"])
        for i in range(bc.shape[1]):
            cols[f"base_color_{i}"] = bc[:, i]
        nrm = np_(params["normal"])
        for i in range(nrm.shape[1]):
            cols[f"normal_{i}"] = nrm[:, i]
        rough = np_(params["roughness"])
        for i in range(rough.shape[1]):
            cols[f"roughness_{i}"] = rough[:, i]
        for name in ("incidents_dc", "incidents_rest", "visibility_dc",
                     "visibility_rest"):
            arr = np_(params[name]).transpose(0, 2, 1).reshape(len(xyz), -1)
            for i in range(arr.shape[1]):
                cols[f"{name}_{i}"] = arr[:, i]
    write_ply(path, cols)


def load_model_ply(path: str, sh_degree: int = 3,
                   capacity: Optional[int] = None) -> Dict:
    """load_ply (gaussian_model.py:891-1003) -> padded model state dict."""
    v = read_ply(path)
    n = len(v["x"])
    k = (sh_degree + 1) ** 2

    def grab(prefix, count):
        return np.stack([v[f"{prefix}_{i}"] for i in range(count)], -1)

    xyz = np.stack([v["x"], v["y"], v["z"]], -1)
    dc = grab("f_dc", 3).reshape(n, 3, 1).transpose(0, 2, 1)
    rest = grab("f_rest", 3 * (k - 1)).reshape(n, 3, k - 1).transpose(0, 2, 1)
    params = {
        "xyz": jnp.asarray(xyz, jnp.float32),
        "shs_dc": jnp.asarray(dc, jnp.float32),
        "shs_rest": jnp.asarray(rest, jnp.float32),
        "opacity": jnp.asarray(v["opacity"], jnp.float32)[:, None],
        "scaling": jnp.asarray(grab("scale", 3), jnp.float32),
        "rotation": jnp.asarray(grab("rot", 4), jnp.float32),
    }
    use_pbr = "base_color_0" in v
    if use_pbr:
        params["base_color"] = jnp.asarray(grab("base_color", 12), jnp.float32)
        params["normal"] = jnp.asarray(grab("normal", 12), jnp.float32)
        params["roughness"] = jnp.asarray(grab("roughness", 4), jnp.float32)
        params["incidents_dc"] = jnp.asarray(
            grab("incidents_dc", 3).reshape(n, 3, 1).transpose(0, 2, 1),
            jnp.float32)
        params["incidents_rest"] = jnp.asarray(
            grab("incidents_rest", 3 * (k - 1)).reshape(n, 3, k - 1)
            .transpose(0, 2, 1), jnp.float32)
        params["visibility_dc"] = jnp.asarray(
            grab("visibility_dc", 1).reshape(n, 1, 1), jnp.float32)
        params["visibility_rest"] = jnp.asarray(
            grab("visibility_rest", 15).reshape(n, 1, 15).transpose(0, 2, 1),
            jnp.float32)
    else:
        params["normal"] = jnp.asarray(
            np.stack([v["nx"], v["ny"], v["nz"]], -1), jnp.float32)

    cap = capacity or G._round_capacity(n)

    def pad(x):
        out = jnp.zeros((cap,) + x.shape[1:], x.dtype)
        return out.at[:n].set(x)

    params = {k2: pad(p) for k2, p in params.items()}
    alive = jnp.zeros((cap,), bool).at[:n].set(True)
    return {"params": params, "alive": alive, "stats": G.init_stats(cap)}
