"""Relighting evaluation — ``eval_relighting_tensoIR.py`` equivalent.

Per novel environment map:
  1. re-bake hemisphere buffers (update_radiace, envmap ignored as in the
     reference — gaussian_model.py:490),
  2. calibrate per-channel albedo scale by the median GT/pred ratio on the
     first frame (eval_relighting_tensoIR.py:197-241),
  3. re-bake ``radiances`` as traced one-bounce under the NEW light
     (calculate_radiance + update_radiance_with_calc, :298-299),
  4. render test frames in eval mode with the fixed HDR light; metric
     PSNR/SSIM(/LPIPS)/MSE for pbr + albedo, MSE + MAE for normals.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from svgir_tpu.config import OptimizationConfig, RasterConfig
from svgir_tpu.eval import metrics as M
from svgir_tpu.eval.nvs import save_image
from svgir_tpu.models import gaussians as G
from svgir_tpu.models import lights as LT
from svgir_tpu.models import radiance as RAD
from svgir_tpu.render.svgss import render_svgss


def calibrate_albedo_scale(pred_albedo, gt_albedo, mask) -> jnp.ndarray:
    """Per-channel median GT/pred ratio over masked pixels
    (eval_relighting_tensoIR.py:237-241)."""
    m = np.asarray(mask)[0] > 0.5
    pred = np.asarray(pred_albedo)[:, m]
    gt = np.asarray(gt_albedo)[:, m]
    ratio = np.median(gt / np.clip(pred, 1e-6, None), axis=1)
    return jnp.asarray(ratio, jnp.float32)


def rebake_radiance_for_light(params, alive, env_state: Dict, *,
                              sample_num: int, key=None,
                              ray_chunk=16384, gauss_chunk=512,
                              bake: Optional[Dict] = None) -> Dict:
    """Steps 1 + 3: hemisphere bake (fibonacci dirs, light-independent),
    then replace radiances with the one-bounce estimate under the new
    light.  Returns (bake buffers, new radiances [N,S,3]).

    ``bake``: precomputed hemisphere buffers from an earlier call on the
    SAME geometry.  The trace depends only on geometry + sample_num (eval
    dirs are deterministic, key=None), so a multi-env sweep traces once
    and re-shades per light — the reference's hemisphere hit-table reuse
    (pbgi/renderer.py:470-489 builds its 256-dir table once per proxy)."""
    if bake is None:
        bake = RAD.bake_radiance(
            params["xyz"], G.get_scaling(params), G.get_rotation(params),
            G.get_opacity(params)[:, 0], G.get_shs(params),
            sample_num=sample_num, key=key, valid=alive,
            ray_chunk=ray_chunk, gauss_chunk=gauss_chunk)

    env_term = LT.env_light_direct(env_state, bake["incident_dirs"]) \
        * bake["incident_areas"]
    n = params["xyz"].shape[0]
    vertex_normals = G.get_shading_normal(params)
    albedo = G.get_base_color(params).reshape(n, 3, 4).transpose(0, 2, 1)
    roughness = G.get_roughness(params)[:, 0]
    radiances = RAD.irradiance_full(bake, env_term, vertex_normals, albedo,
                                    roughness)
    return bake, radiances


def eval_relighting(out_dir: str, params, alive, env_state: Dict,
                    cameras: List, *, sample_num: int = 384,
                    raster_cfg: RasterConfig = RasterConfig(),
                    gt_albedo_fn=None, lpips_weights=None,
                    bg=(0.0, 0.0, 0.0), light_name: str = "env",
                    bake: Optional[Dict] = None) -> Dict:
    bg = jnp.asarray(bg)
    bake, radiances = rebake_radiance_for_light(
        params, alive, env_state, sample_num=sample_num, bake=bake)
    params = dict(params)
    params["radiances"] = radiances
    params["radiance_ratio"] = jnp.ones(())
    bake_static = {k: v for k, v in bake.items() if k != "exhausted_frac"}
    env_fn = lambda dirs: LT.env_light_direct(env_state, dirs)
    # precomputed-uv fast path (only valid without a direction transform)
    env_qxy_fn = None
    if env_state.get("transform") is None:
        env_qxy_fn = lambda q: LT.env_light_direct_qxy(env_state, q[..., 0],
                                                       q[..., 1])

    # one jitted render shared across views (strip_meta collapses per-camera
    # static metadata to a single jit cache entry); the identity scale
    # stands in for "uncalibrated" so the albedo rescale reuses the same
    # compiled fn.  Eager per-frame dispatch pays full retrace cost on TPU.
    from svgir_tpu.train.trainer import strip_meta

    @jax.jit
    def _render(params, alive, bake, cam, bcs):
        return render_svgss(cam, params, bg, bake=bake, env_params=None,
                            env_fn=env_fn, env_qxy_fn=env_qxy_fn,
                            opt=OptimizationConfig(),
                            is_training=False, alive=alive, cfg=raster_cfg,
                            base_color_scale=bcs)

    base_color_scale = jnp.ones(3)
    rows = []
    warned_overflow = False
    os.makedirs(os.path.join(out_dir, light_name), exist_ok=True)
    for idx, cam in enumerate(cameras):
        res = _render(params, alive, bake_static, strip_meta(cam),
                      base_color_scale)
        if (not warned_overflow and "overflow" in res
                and bool(jnp.any(res["overflow"]))):
            warned_overflow = True
            print(f"WARNING: instance-buffer overflow rendering "
                  f"{light_name} view {idx}: splats were dropped — raise "
                  "--max_instances", flush=True)
        if idx == 0 and gt_albedo_fn is not None:
            gt_albedo, mask = gt_albedo_fn(0)
            base_color_scale = calibrate_albedo_scale(
                res["base_color"], gt_albedo, mask)
            res = _render(params, alive, bake_static, strip_meta(cam),
                          base_color_scale)

        row = {}
        if cam.image is not None:
            row.update({f"pbr_{k}": v for k, v in
                        M.image_metrics(jnp.clip(res["pbr"], 0, 1),
                                        cam.image).items()})
            lp = M.lpips(jnp.clip(res["pbr"], 0, 1), cam.image,
                         lpips_weights)
            if lp is not None:
                row["pbr_lpips"] = lp
        if gt_albedo_fn is not None:
            gt_albedo, mask = gt_albedo_fn(idx)
            row.update({f"albedo_{k}": v for k, v in
                        M.image_metrics(jnp.clip(res["base_color"], 0, 1),
                                        gt_albedo).items()})
        if cam.normal is not None:
            row["normal_mse"] = M.mse(res["normal"], cam.normal)
            row["normal_mae_deg"] = M.normal_mae_deg(
                res["normal"], cam.normal, cam.image_mask)
        rows.append(row)

        for key in ("pbr", "base_color", "visibility", "local_lights"):
            if key in res:
                save_image(os.path.join(out_dir, light_name,
                                        f"{idx:05d}_{key}.png"),
                           jnp.clip(res[key], 0, 1))

    summary: Dict[str, float] = {}
    for key in rows[0] if rows else ():
        vals = [r[key] for r in rows if key in r]
        summary[key] = float(np.mean(vals))
    available, note = M.lpips_status(lpips_weights)
    if not available:
        # loud absence: never a silently-missing column (VERDICT r3 item 3)
        summary["pbr_lpips"] = note
        summary["albedo_lpips"] = note
    summary["n_views"] = len(rows)
    with open(os.path.join(out_dir, light_name, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary
