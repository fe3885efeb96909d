"""Training loop (stage 1): jitted step + host-side schedule.

Mirrors ``train.py:28-249``: random camera order without replacement,
exponential xyz LR schedule, densify/prune every ``densification_interval``
within [densify_from_iter, densify_until_iter), opacity reset every
``opacity_reset_interval``, periodic checkpoints.  All device work (render,
loss, backward, Adam, stats) is one jitted function; densification is a
second jitted function invoked on schedule; capacity-bucket growth happens
on host and triggers at most a handful of recompiles per run.
"""

from __future__ import annotations

import dataclasses
import random
import time
from functools import partial
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from svgir_tpu.config import ModelConfig, OptimizationConfig, RasterConfig
from svgir_tpu.models import gaussians as G
from svgir_tpu.render.stage1 import render_stage1
from svgir_tpu.train import optim
from svgir_tpu.utils.transforms import get_expon_lr_fn


def strip_meta(camera):
    """Remove per-camera static metadata so all cameras share one jit cache
    entry."""
    return dataclasses.replace(camera, uid=0, image_name="")


def make_train_step(opt: OptimizationConfig, raster_cfg: RasterConfig,
                    bg, *, sh_degree: int = 3,
                    render_fn: Callable = render_stage1,
                    lrs: Optional[Dict[str, float]] = None,
                    extra_args_fn=None):
    """Build the jitted stage-1 train step.

    Returns step(state, opt_state, camera, iteration, xyz_lr)
      -> (state, opt_state, tb_dict)
    """
    bg = jnp.asarray(bg)

    @jax.jit
    def step(state, opt_state, camera, iteration, xyz_lr):
        params, alive, stats = state["params"], state["alive"], state["stats"]
        cap = alive.shape[0]
        off0 = jnp.zeros((cap, 2))

        def loss_fn(p, off):
            res = render_fn(camera, p, bg, opt=opt, iteration=iteration,
                            is_training=True, alive=alive, mean2d_offset=off,
                            sh_degree=sh_degree, mono=camera.mono,
                            cfg=raster_cfg)
            return res["loss"], res

        (loss, res), (gp, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, off0)

        step_lrs = {**(lrs or {}), "xyz": xyz_lr}
        params, opt_state = optim.adam_step(params, gp, opt_state, step_lrs)

        # densification stats: NDC-scale screen gradients (backward.cu:639)
        gnd = goff * jnp.array([0.5 * camera.width, 0.5 * camera.height])
        visible = res["visibility_filter"] & alive
        stats = G.add_densification_stats(
            stats, gnd, visible, res["weights"],
            res["radii"].astype(jnp.float32))

        new_state = {"params": params, "alive": alive, "stats": stats}
        tb = dict(res["tb_dict"])
        tb["n_visible"] = visible.sum()
        return new_state, opt_state, tb

    return step


def train_stage1(state, cameras: List, opt: OptimizationConfig, *,
                 bg=(0.0, 0.0, 0.0), raster_cfg: RasterConfig = RasterConfig(),
                 spatial_lr_scale: float = 1.0, sh_degree: int = 3,
                 first_iter: int = 0, iterations: Optional[int] = None,
                 seed: int = 0, log_every: int = 50,
                 callback=None, use_pbr: bool = False):
    """Run the stage-1 loop.  Returns (state, opt_state, history)."""
    iterations = iterations or opt.iterations
    lrs = optim.group_lrs(opt, spatial_lr_scale, use_pbr)
    xyz_sched = get_expon_lr_fn(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps)

    opt_state = optim.adam_init(state["params"])
    step_fn = make_train_step(opt, raster_cfg, bg, sh_degree=sh_degree,
                              lrs=lrs)
    densify_fn = jax.jit(
        partial(G.densify_and_prune,
                max_grad=opt.densify_grad_threshold, min_opacity=0.005,
                percent_dense=opt.percent_dense),
        static_argnames=("max_screen_size",))

    rng = random.Random(seed)
    key = jax.random.PRNGKey(seed)
    stack: List[int] = []
    cams = [strip_meta(c) for c in cameras]
    extent = spatial_lr_scale  # cameras_extent == spatial_lr_scale (train.py)

    history = []
    t0 = time.time()
    for it in range(first_iter + 1, iterations + 1):
        if not stack:
            stack = list(range(len(cams)))
        cam = cams[stack.pop(rng.randrange(len(stack)))]
        xyz_lr = float(xyz_sched(it))

        state, opt_state, tb = step_fn(state, opt_state, cam,
                                       jnp.float32(it), jnp.float32(xyz_lr))

        if it < opt.densify_until_iter:
            n_alive = int(state["alive"].sum())
            if (it > opt.densify_from_iter
                    and it % opt.densification_interval == 0
                    and n_alive < opt.max_points):
                # grow capacity if nearly full (host-side, rare recompile)
                cap = state["alive"].shape[0]
                if n_alive > 0.85 * cap:
                    state, opt_state = G.grow_capacity(state, opt_state,
                                                       cap * 2)
                size_thr = 20.0 if it > opt.opacity_reset_interval else None
                key, sub = jax.random.split(key)
                gnorm_thr = (opt.densify_grad_normal_threshold
                             if it > opt.normal_densify_from_iter else 99999.0)
                state, opt_state, rep = densify_fn(
                    state, opt_state, sub, extent=extent,
                    max_grad_normal=gnorm_thr, max_screen_size=size_thr)
            if it % opt.opacity_reset_interval == 0:
                params, opt_state = G.reset_opacity(state["params"], opt_state)
                state = {**state, "params": params}

        if it % log_every == 0 or it == iterations:
            entry = {"iter": it, "psnr": float(tb["psnr"]),
                     "loss": float(tb["loss"]),
                     "n_alive": int(state["alive"].sum()),
                     "elapsed": time.time() - t0}
            history.append(entry)
            if callback:
                callback(entry, state)

    return state, opt_state, history


def make_svgss_train_step(opt: OptimizationConfig, raster_cfg: RasterConfig,
                          bg, *, sh_degree: int = 3,
                          lrs: Optional[Dict[str, float]] = None):
    """Jitted stage-2 (render_relight) train step.

    step(state, opt_state, env_state, bake, camera, iteration, xyz_lr,
         radiance_lr, lls_weight) -> (state, opt_state, env_state, tb)

    Covers train.py's stage-2 loop mechanics: joint gaussian + env-map Adam
    steps; the radiance-group LR and the local-lights smoothness weight are
    per-step scalars so the %1000 zeroing (train.py:211-214) needs no
    recompile.
    """
    from svgir_tpu.render.svgss import render_svgss

    bg = jnp.asarray(bg)

    @jax.jit
    def step(state, opt_state, env_state, bake, camera, iteration, xyz_lr,
             radiance_lr, lls_weight):
        params, alive, stats = state["params"], state["alive"], state["stats"]
        cap = alive.shape[0]
        off0 = jnp.zeros((cap, 2))

        def loss_fn(p, env_p, off):
            res = render_svgss(camera, p, bg, bake=bake, env_params=env_p,
                               opt=opt, iteration=iteration,
                               is_training=True, alive=alive,
                               mean2d_offset=off, sh_degree=sh_degree,
                               lambda_local_lights_smooth=lls_weight,
                               cfg=raster_cfg)
            return res["loss"], res

        (loss, res), (gp, genv, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                params, env_state["params"], off0)

        step_lrs = {**(lrs or {}), "xyz": xyz_lr, "radiances": radiance_lr}
        params, opt_state = optim.adam_step(params, gp, opt_state, step_lrs)
        env_params, env_opt = optim.adam_step(
            env_state["params"], genv, env_state["opt"],
            {"env": opt.env_lr})

        new_state = {"params": params, "alive": alive, "stats": stats}
        new_env = {"params": env_params, "opt": env_opt}
        tb = dict(res["tb_dict"])
        return new_state, opt_state, new_env, tb

    return step


def train_stage2(state, cameras: List, opt: OptimizationConfig, *,
                 bg=(0.0, 0.0, 0.0), raster_cfg: RasterConfig = RasterConfig(),
                 spatial_lr_scale: float = 1.0, sh_degree: int = 3,
                 sample_num: int = 64, env_resolution: int = 16,
                 first_iter: int = 30_000, iterations: int = 50_000,
                 seed: int = 0, log_every: int = 50, callback=None,
                 bake_key=None, env_state=None, bake=None):
    """Stage-2 loop (train.py with is_pbr=True).

    ``state`` must already be PBR-upgraded (models.gaussians.upgrade_to_pbr).
    Bakes radiance once at start (update_radiace, train.py:59), initializes
    radiances/ratio params if absent, freezes geometry LRs per the recipe
    (run_tensoir.sh:20-42 sets position/scaling/rotation lr 0 for stage 2).
    """
    from svgir_tpu.models import lights as LT
    from svgir_tpu.models import radiance as RAD

    params = dict(state["params"])
    alive = state["alive"]
    key = jax.random.PRNGKey(seed)

    if bake is None:
        key, sub = jax.random.split(key)
        bake = bake_radiance_compact(params, alive, sample_num=sample_num,
                                     key=bake_key if bake_key is not None
                                     else sub)
    bake_static = {k: v for k, v in bake.items() if k != "exhausted_frac"}

    if "radiances" not in params or params["radiances"].shape[1] != sample_num:
        params["radiances"] = bake["radiance"]
        params["radiance_ratio"] = jnp.ones(())
    state = {**state, "params": params}

    if env_state is None:
        key, sub = jax.random.split(key)
        env_state = LT.direct_light_map_init(sub, h=env_resolution,
                                             light_init=opt.light_init)

    lrs = optim.group_lrs(opt, spatial_lr_scale, use_pbr=True)
    opt_state = optim.adam_init(params)
    step_fn = make_svgss_train_step(opt, raster_cfg, bg,
                                    sh_degree=sh_degree, lrs=lrs)
    xyz_sched = get_expon_lr_fn(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps)

    rng = random.Random(seed)
    stack: List[int] = []
    cams = [strip_meta(c) for c in cameras]

    radiance_lr = opt.radiance_lr
    lls_weight = opt.lambda_local_lights_smooth
    history = []
    t0 = time.time()
    for it in range(first_iter + 1, iterations + 1):
        if not stack:
            stack = list(range(len(cams)))
        cam = cams[stack.pop(rng.randrange(len(stack)))]
        xyz_lr = float(xyz_sched(it))

        state, opt_state, env_state, tb = step_fn(
            state, opt_state, env_state, bake_static, cam,
            jnp.float32(it - first_iter), jnp.float32(xyz_lr),
            jnp.float32(radiance_lr), jnp.float32(lls_weight))

        # train.py:211-214: zero the radiance lr + local-lights smoothness
        # at the first %1000 boundary
        if it % 1000 == 0:
            radiance_lr = 0.0
            lls_weight = 0.0

        if it % log_every == 0 or it == iterations:
            entry = {"iter": it, "psnr": float(tb["psnr"]),
                     "psnr_pbr": float(tb["psnr_pbr"]),
                     "loss": float(tb["loss"]),
                     "elapsed": time.time() - t0}
            history.append(entry)
            if callback:
                callback(entry, state, env_state)

    return state, opt_state, env_state, bake_static, history


def bake_radiance_compact(params, alive, *, sample_num: int, key=None,
                          **bake_kw):
    """Bake only over ALIVE gaussians (the padded capacity can be several
    times the live count after pruning), then re-expand the buffers to
    capacity indexing, remapping hit indices back to capacity rows."""
    from svgir_tpu.models import radiance as RAD

    cap = alive.shape[0]
    n_alive = int(jax.device_get(alive.sum()))
    idx = jnp.nonzero(alive, size=n_alive)[0]              # compact -> cap

    sub = {k: params[k][idx] for k in
           ("xyz", "scaling", "rotation", "opacity", "shs_dc", "shs_rest")}
    bake_c = RAD.bake_radiance(
        sub["xyz"], G.get_scaling(sub), G.get_rotation(sub),
        G.get_opacity(sub)[:, 0], G.get_shs(sub),
        sample_num=sample_num, key=key, **bake_kw)

    s = sample_num

    def expand(x, fill=0.0):
        out = jnp.full((cap,) + x.shape[1:], fill, x.dtype)
        return out.at[idx].set(x, unique_indices=True)

    hit_c = bake_c["hit_idx"]
    hit_cap = jnp.where(hit_c >= 0,
                        idx[jnp.clip(hit_c, 0, n_alive - 1)], -1)
    return {
        "radiance": expand(bake_c["radiance"]),
        "visibility": expand(bake_c["visibility"], fill=1.0),
        "incident_dirs": expand(bake_c["incident_dirs"]),
        "incident_areas": expand(bake_c["incident_areas"],
                                 fill=2.0 * 3.141592653589793),
        "hit_idx": expand(hit_cap.astype(jnp.int32), fill=-1),
        "uv": expand(bake_c["uv"]),
        "exhausted_frac": bake_c["exhausted_frac"],
    }


def jsonl_logger(path: str):
    """Callback factory: append history entries to a JSONL file (the
    TensorBoard-scalars equivalent; tail -f friendly)."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def cb(entry, *_):
        with open(path, "a") as f:
            f.write(json.dumps(entry) + "\n")

    return cb


def tensorboard_logger(log_dir: str):
    """Callback factory writing history entries as TensorBoard scalars
    (training_report, reference train.py:252-311: one
    ``train_loss_patches/<key>`` scalar per tb_dict entry).  Returns None
    when no tensorboard backend is importable (zero-egress images)."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        return None
    writer = SummaryWriter(log_dir)

    def cb(entry, *_):
        step = int(entry.get("iter", 0))
        for key, val in entry.items():
            if key != "iter" and isinstance(val, (int, float)):
                writer.add_scalar(f"train_loss_patches/{key}", val, step)

    cb.writer = writer          # exposed so callers can add_images / close
    return cb
