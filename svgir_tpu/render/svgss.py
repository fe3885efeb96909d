"""Stage-2 ("render_relight") forward + loss — the SVG deferred-PBR mode.

Mirrors ``gaussian_renderer/svgss.py``: shade per-vertex PBR *before*
rasterization (rendering_equation4 over baked incident radiance +
learnable env), pack blended features [visibility(1), local lights(3)]
(train) and vertex features [brdf(12), base_color(12), view normal(12),
roughness(4), diffuse(12)] (VS=52; eval adds direct+indirect, VS=64),
rasterize, then the stage-2 loss recipe (svgss.py:265-403).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from svgir_tpu.config import OptimizationConfig, RasterConfig
from svgir_tpu.models import gaussians as G
from svgir_tpu.models import lights as LT
from svgir_tpu.models import radiance as RAD
from svgir_tpu.ops.rasterizer import rasterize
from svgir_tpu.ops.shading import rendering_equation4
from svgir_tpu.utils import losses as L
from svgir_tpu.utils.graphics import rgb_to_srgb
from svgir_tpu.utils.image import depth2normal
from svgir_tpu.utils.transforms import normalize
from svgir_tpu.render.stage1 import _maxpool9


def _clamp_svgss_tile(cfg: RasterConfig) -> RasterConfig:
    """r3 clamped stage-2 to tile=16 (the VS=52 blend backward needed
    ~19 MB of scoped VMEM against XLA's default 16 MB budget).  r4 raises
    the Mosaic scoped-vmem limit to 64 MB (blend_pallas._compiler_params;
    v5e has 128 MB physical VMEM), and tile=32 measured FASTER on-chip
    (55.2 vs 63.1 ms/step, 2026-08-20) — so stage-2 now runs the shared
    tile default unclamped.  SVGIR_SVGSS_TILE still overrides for kernel
    experiments."""
    import dataclasses
    import os
    forced = os.environ.get("SVGIR_SVGSS_TILE")
    if forced:
        return dataclasses.replace(cfg, tile=int(forced))
    return cfg


def render_view_svgss(camera, params, bake: Dict, env_params, bg: jax.Array,
                      *, is_training: bool = True,
                      alive: Optional[jax.Array] = None,
                      mean2d_offset: Optional[jax.Array] = None,
                      sh_degree: int = 3,
                      base_color_scale: Optional[jax.Array] = None,
                      env_fn=None, env_qxy_fn_override=None,
                      cfg: RasterConfig = RasterConfig()) -> Dict[str, Any]:
    """svgss.py:15-262 equivalent.

    ``bake``: buffers from models.radiance.bake_radiance.
    ``env_fn``: optional override for the env lookup (defaults to the
    learnable DirectLightMap in ``env_params``).
    """
    cfg = _clamp_svgss_tile(cfg)
    n = params["xyz"].shape[0]
    xyz = params["xyz"]
    opacity = G.get_opacity(params)[:, 0]
    if alive is not None:
        opacity = jnp.where(alive, opacity, 0.0)

    base_color = G.get_base_color(params, base_color_scale)      # [N,12]
    roughness = G.get_roughness(params)                          # [N,4]
    shading_normal = G.get_shading_normal(params)                # [N,4,3]
    if not is_training:
        shading_normal = jax.lax.stop_gradient(shading_normal)
    radiances = G.get_radiances(params)                          # [N,S,3]
    viewdirs = normalize(camera.camera_center[None] - xyz)

    env_qxy_fn = None
    if env_fn is None:
        env_fn = lambda dirs: LT.direct_light(env_params, dirs)
        env_qxy_fn = lambda q: LT.direct_light_qxy(env_params, q[..., 0],
                                                   q[..., 1])
    elif env_qxy_fn_override is not None:
        env_qxy_fn = env_qxy_fn_override

    # ONE env evaluation per step: eq4's global lights and the consistency
    # loss both need env(incident_dirs); the lookup is a lax.map loop XLA
    # will not CSE, so evaluate here and share (exposed to the loss as
    # results["_env_radiance"]).  Baked incident dirs carry precomputed
    # equirect coords (incident_qxy) — the per-step dirs->uv math and its
    # [N*S, 3] layout transposes vanish (same floats, lights.py).
    qxy = bake.get("incident_qxy")
    if qxy is not None and env_qxy_fn is not None:
        env_radiance = env_qxy_fn(qxy)
    else:
        env_radiance = env_fn(bake["incident_dirs"])

    pbr, extra = rendering_equation4(
        base_color, roughness, shading_normal, viewdirs, radiances,
        env_fn, bake["visibility"], bake["incident_dirs"],
        bake["incident_areas"], env_radiance=env_radiance)

    if is_training:
        features = jnp.concatenate([
            extra["incident_visibility"].mean(-2),
            extra["local_incident_lights"].mean(-2)], axis=-1)   # S=4
    else:
        features = jnp.concatenate([
            extra["incident_lights"].mean(-2),
            extra["local_incident_lights"].mean(-2),
            extra["incident_visibility"].mean(-2)], axis=-1)     # S=7

    # view-space shading normals, channel-major [N,12] (svgss.py:158-159)
    nrm_view = shading_normal @ camera.world_view[:3, :3].T      # [N,4,3]
    nrm_view = jnp.swapaxes(nrm_view, 1, 2).reshape(n, -1)
    if is_training:
        vfeatures = jnp.concatenate(
            [pbr, base_color, nrm_view, roughness, extra["diffuse_light"]],
            axis=-1)                                             # VS=52
    else:
        vfeatures = jnp.concatenate(
            [pbr, base_color, nrm_view, roughness, extra["direct"],
             extra["indirect"]], axis=-1)                        # VS=64

    # weights_grad/need_weights False: per-gaussian weight sums only feed
    # densification stats, and stage 2 never densifies (densify_until_iter
    # 15k < first_iter 30k, run_tensoir.sh) — skip the in-kernel wsum
    # writebacks and the [M]->[N] scatter entirely
    bufs = rasterize(xyz, G.get_scaling(params), G.get_rotation(params),
                     opacity, camera, bg, shs=G.get_shs(params),
                     sh_degree=sh_degree, features=features,
                     vfeatures=vfeatures, mean2d_offset=mean2d_offset,
                     cfg=cfg, mask=alive, weights_grad=False,
                     need_weights=False)

    opac = bufs.opacity
    feat = bufs.feature / jnp.clip(opac, min=1e-5)
    vfeat = bufs.vfeature / jnp.clip(opac, min=1e-5)

    def opacity_filter(r):
        return r * opac + (1 - opac) * bg[:, None, None]

    results: Dict[str, Any] = {
        "render": bufs.color,
        "depth": bufs.depth,
        "opacity": opac,
        "weights": bufs.weights,
        "radii": bufs.radii,
        "visibility_filter": bufs.radii > 0,
        "n_contrib": bufs.n_contrib,
        "overflow": bufs.overflow,
        "diffuse_light": extra["diffuse_light"],
        "_env_radiance": env_radiance,
    }

    if is_training:
        r_vis, r_local = feat[0:1], feat[1:4]
        results["local_lights"] = opacity_filter(rgb_to_srgb(r_local))
        results["visibility"] = opacity_filter(r_vis)
        r_pbr, r_base, r_nrm, r_rough, r_diff = (
            vfeat[0:3], vfeat[3:6], vfeat[6:9], vfeat[9:10], vfeat[10:13])
        results["base_color"] = opacity_filter(rgb_to_srgb(r_base))
        results["diffuse"] = opacity_filter(rgb_to_srgb(r_diff))
        results["roughness"] = opacity_filter(r_rough)
    else:
        r_light, r_local, r_vis = feat[0:3], feat[3:6], feat[6:7]
        results["lights"] = opacity_filter(rgb_to_srgb(r_light))
        results["local_lights"] = opacity_filter(rgb_to_srgb(r_local))
        results["visibility"] = opacity_filter(r_vis)
        r_pbr, r_base, r_nrm, r_rough, r_direct, r_indirect = (
            vfeat[0:3], vfeat[3:6], vfeat[6:9], vfeat[9:10], vfeat[10:13],
            vfeat[13:16])
        results["base_color"] = opacity_filter(rgb_to_srgb(r_base))
        results["direct"] = rgb_to_srgb(r_direct)
        results["indirect"] = rgb_to_srgb(r_indirect)
        results["roughness"] = opacity_filter(r_rough)

    results["pbr"] = rgb_to_srgb(r_pbr * opac + (1 - opac) * bg[:, None, None])
    results["normal"] = r_nrm            # view-space (losses see this)
    image_mask = camera.image_mask if camera.image_mask is not None else \
        jnp.ones_like(opac)
    results["pseudo_normal"] = depth2normal(bufs.depth, image_mask, camera)
    results["env"] = LT.env_activated(env_params) if env_params else None

    if not is_training:
        dirs_img = camera.world_directions()                     # [3,H,W]
        env_img = env_fn(jnp.moveaxis(dirs_img, 0, -1))
        env_img = jnp.moveaxis(env_img, -1, 0)
        results["render_env"] = bufs.color + (1 - opac) * rgb_to_srgb(env_img)
        results["pbr_env"] = rgb_to_srgb(r_pbr * opac + (1 - opac) * env_img)
        results["env_only"] = rgb_to_srgb(env_img)

    return results


def calculate_loss_svgss(camera, params, bake, results,
                         opt: OptimizationConfig, env_params, iteration, *,
                         alive=None) -> tuple[jax.Array, Dict]:
    """svgss.py:265-403 with identical weights/gating."""
    rendered = results["render"]
    depth = results["depth"]
    normal = results["normal"]
    pbr = results["pbr"]
    opac = results["opacity"]
    gt = camera.image
    image_mask = camera.image_mask if camera.image_mask is not None else \
        jnp.ones_like(depth)

    tb = {}
    l1 = L.l1_loss(rendered, gt)
    # one stacked blur for both SSIMs (GT window stats shared)
    ssim_val, ssim_pbr = L.ssim_pair(rendered, pbr, gt)
    tb["l1"], tb["ssim"], tb["psnr"] = l1, ssim_val, L.psnr(rendered, gt)
    loss = (1 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1 - ssim_val)

    l1_pbr = L.l1_loss(pbr, gt)
    tb["l1_pbr"], tb["psnr_pbr"] = l1_pbr, L.psnr(pbr, gt)
    loss = loss + opt.lambda_pbr * (
        (1 - opt.lambda_dssim) * l1_pbr + opt.lambda_dssim * (1 - ssim_pbr))

    d2n = depth2normal(depth, image_mask, camera)
    loss_surface = L.cos_loss(normal, d2n)
    loss = loss + 0.02 * loss_surface
    tb["loss_surface"] = loss_surface

    # normal-offset regularizer (svgss.py:316)
    loss = loss + 0.1 * jnp.square(params["normal"]).mean()

    # radiance consistency (svgss.py:319 -> gaussian_model.py:544-575);
    # reuses the render's env(incident_dirs) evaluation when present
    loss_rad = RAD.radiance_consistency_loss(
        params, bake, camera.camera_center,
        lambda d: LT.direct_light(env_params, d), alive=alive,
        env_radiance=results.get("_env_radiance"))
    loss = loss + opt.lambda_radiance * loss_rad
    tb["loss_radiance"] = loss_rad

    if opt.lambda_mask_entropy > 0:
        lme = L.mask_entropy_loss(opac, image_mask)
        loss = loss + opt.lambda_mask_entropy * lme
        tb["loss_mask_entropy"] = lme

    if opt.lambda_base_color_smooth > 0:
        lb = L.first_order_edge_aware_loss(
            results["base_color"] * image_mask, gt * image_mask)
        loss = loss + opt.lambda_base_color_smooth * lb
        tb["loss_base_color_smooth"] = lb

    if opt.lambda_roughness_smooth > 0:
        lr = L.first_order_edge_aware_loss(
            results["roughness"] * image_mask, gt * image_mask)
        loss = loss + opt.lambda_roughness_smooth * lr
        tb["loss_roughness_smooth"] = lr

    # NOTE lambda_local_lights_smooth is DEAD in the reference: defined
    # (arguments/__init__.py:140) and zeroed at the first %1000 iteration
    # (train.py:211-214) but consumed by NO loss body — so no term here
    # either (tests/test_loss_parity.py::test_dead_flags_are_dead).  The
    # r1-r3 repo applied it at weight 1, a divergence the exec-oracle
    # parity test caught.

    if opt.lambda_light_smooth > 0:
        lsm = L.first_order_edge_aware_loss(
            results["diffuse"] * image_mask, normal)
        loss = loss + opt.lambda_light_smooth * lsm
        tb["loss_light_smooth"] = lsm

    if opt.lambda_env_smooth > 0 and results.get("env") is not None:
        le = L.tv_loss(jnp.moveaxis(results["env"], -1, 0))
        loss = loss + opt.lambda_env_smooth * le
        tb["loss_env_smooth"] = le

    if opt.lambda_normal_smooth > 0:    # svgss.py:394-399 (stage-2 only)
        lns = L.second_order_edge_aware_loss(normal * image_mask, gt)
        loss = loss + opt.lambda_normal_smooth * lns
        tb["loss_normal_smooth"] = lns

    if opt.lambda_light > 0:
        dl = results["diffuse_light"]
        mean_light = dl.mean(-1, keepdims=True)
        ll2 = jnp.abs(dl - jnp.broadcast_to(mean_light, dl.shape)).mean()
        loss = loss + opt.lambda_light * ll2
        tb["loss_light"] = ll2

    tb["loss"] = loss
    return loss, tb


def render_svgss(camera, params, bg, *, bake=None, env_params=None,
                 opt: OptimizationConfig = None, iteration=0,
                 is_training=False, alive=None, mean2d_offset=None,
                 sh_degree=3, base_color_scale=None, env_fn=None,
                 env_qxy_fn=None,
                 cfg: RasterConfig = RasterConfig(), **_) -> Dict[str, Any]:
    """svgss.py:406-424: render, loss, then rotate normals to world space
    *after* the loss (losses see view space)."""
    results = render_view_svgss(
        camera, params, bake, env_params, bg, is_training=is_training,
        alive=alive, mean2d_offset=mean2d_offset, sh_degree=sh_degree,
        base_color_scale=base_color_scale, env_fn=env_fn,
        env_qxy_fn_override=env_qxy_fn, cfg=cfg)
    if is_training:
        loss, tb = calculate_loss_svgss(
            camera, params, bake, results, opt, env_params, iteration,
            alive=alive)
        results["loss"] = loss
        results["tb_dict"] = tb

    c2w_rot = camera.world_view[:3, :3].T
    for key in ("normal", "pseudo_normal"):
        img = results[key]
        results[key] = jnp.einsum("ij,jhw->ihw", c2w_rot, img)
    return results
