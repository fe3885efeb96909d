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
import os
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
    from svgir_tpu.train.staging import StagedCamera
    if isinstance(camera, StagedCamera):
        return StagedCamera(strip_meta(camera.cam), camera.packed)
    return dataclasses.replace(camera, uid=0, image_name="")


def make_train_step(opt: OptimizationConfig, raster_cfg: RasterConfig,
                    bg, *, sh_degree: int = 3,
                    render_fn: Callable = render_stage1,
                    lrs: Optional[Dict[str, float]] = None,
                    extra_args_fn=None, donate: bool = False,
                    track_stats: bool = True):
    """Build the jitted stage-1 train step.

    Returns step(state, opt_state, camera, iteration, xyz_lr)
      -> (state, opt_state, tb_dict)

    ``donate=True`` donates (state, opt_state) to XLA (in-place update —
    halves their HBM footprint at 1M-gaussian scale); callers must then
    drop the old references, as the training loops do.

    ``track_stats=False`` skips the densification bookkeeping entirely —
    the per-gaussian weight sums (in-kernel writebacks + [M]->[N] scatter)
    and the screen-gradient stat accumulation.  Stats only feed
    densify/prune, which stops at ``densify_until_iter`` (reference
    train.py:194-209), so the second half of stage 1 never needs them.
    """
    bg = jnp.asarray(bg)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(state, opt_state, camera, iteration, xyz_lr):
        params, alive, stats = state["params"], state["alive"], state["stats"]
        cap = alive.shape[0]
        off0 = jnp.zeros((cap, 2))

        def loss_fn(p, off):
            res = render_fn(camera, p, bg, opt=opt, iteration=iteration,
                            is_training=True, alive=alive, mean2d_offset=off,
                            sh_degree=sh_degree, mono=camera.mono,
                            need_weights=track_stats, cfg=raster_cfg)
            return res["loss"], res

        (loss, res), (gp, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, off0)

        step_lrs = {**(lrs or {}), "xyz": xyz_lr}
        params, opt_state = optim.adam_step(params, gp, opt_state, step_lrs)

        visible = res["visibility_filter"] & alive
        if track_stats:
            # densification stats: NDC-scale screen grads (backward.cu:639)
            gnd = goff * jnp.array([0.5 * camera.width,
                                    0.5 * camera.height])
            stats = G.add_densification_stats(
                stats, gnd, visible, res["weights"],
                res["radii"].astype(jnp.float32))

        new_state = {"params": params, "alive": alive, "stats": stats}
        tb = dict(res["tb_dict"])
        tb["n_visible"] = visible.sum()
        tb["overflow"] = res["overflow"]
        return new_state, opt_state, tb

    return step


def camera_for_iter(cams: List, it: int, seed: int):
    """Deterministic without-replacement camera schedule: epoch
    ``(it-1)//len`` is a seed+epoch-keyed shuffle, so kill-and-resume at any
    iteration continues the exact uninterrupted sequence (the reference's
    in-memory ``viewpoint_stack`` pop loses this across restarts)."""
    epoch, k = divmod(it - 1, len(cams))
    order = list(range(len(cams)))
    random.Random(seed * 1_000_003 + epoch).shuffle(order)
    return cams[order[k]]


class PeriodicTasks:
    """Mid-run checkpointing + test-set eval + training vis.

    The reference cadence: ``chkpnt<iter>.pth`` every ``checkpoint_interval``
    (train.py:229-241), test-PSNR ``training_report`` every ``test_interval``
    (:252-316), ``save_training_vis`` grids on their own cadence (:319-363).
    """

    def __init__(self, *, out_dir: Optional[str] = None,
                 checkpoint_interval: int = 0,
                 test_cameras: Optional[List] = None,
                 test_interval: int = 0, vis_interval: int = 0,
                 max_test_views: int = 8):
        self.out_dir = out_dir
        self.ckpt_iv = checkpoint_interval if out_dir else 0
        self.test_cams = [strip_meta(c) for c in (test_cameras or [])]
        self.test_iv = test_interval if self.test_cams else 0
        self.vis_iv = vis_interval if out_dir else 0
        self.max_test_views = max_test_views

    def run(self, it: int, *, eval_fn=None, save_fn=None,
            vis_cam=None) -> Dict[str, float]:
        """Returns extra log entries ({} when nothing fired)."""
        extras: Dict[str, float] = {}
        if self.ckpt_iv and it % self.ckpt_iv == 0 and save_fn is not None:
            save_fn(it)
            extras["checkpoint"] = float(it)
        if eval_fn is not None and self.test_iv and it % self.test_iv == 0:
            psnrs = []
            for cam in self.test_cams[:self.max_test_views]:
                res = eval_fn(cam)
                pred = jnp.clip(res["render"], 0, 1)
                mse = jnp.mean(jnp.square(pred - cam.image))
                psnrs.append(float(-10.0 * jnp.log10(mse)))
            extras["test_psnr"] = float(sum(psnrs) / len(psnrs))
        if (eval_fn is not None and self.vis_iv
                and it % self.vis_iv == 0):
            from svgir_tpu.eval.nvs import save_training_vis
            cam = vis_cam if vis_cam is not None else (
                self.test_cams[0] if self.test_cams else None)
            if cam is not None:
                res = eval_fn(cam)
                save_training_vis(
                    os.path.join(self.out_dir, "visualize"), it, res,
                    gt_image=cam.image)
        return extras


def train_stage1(state, cameras: List, opt: OptimizationConfig, *,
                 bg=(0.0, 0.0, 0.0), raster_cfg: RasterConfig = RasterConfig(),
                 spatial_lr_scale: float = 1.0, sh_degree: int = 3,
                 first_iter: int = 0, iterations: Optional[int] = None,
                 seed: int = 0, log_every: int = 50,
                 callback=None, use_pbr: bool = False,
                 opt_state=None, out_dir: Optional[str] = None,
                 checkpoint_interval: int = 0,
                 test_cameras: Optional[List] = None,
                 test_interval: int = 0, vis_interval: int = 0,
                 auto_grow_instances: bool = True,
                 white_background: bool = False):
    """Run the stage-1 loop.  Returns (state, opt_state, history)."""
    from svgir_tpu.render.stage1 import render_view_stage1
    from svgir_tpu.train import checkpoint as CK

    iterations = iterations or opt.iterations
    lrs = optim.group_lrs(opt, spatial_lr_scale, use_pbr)
    xyz_sched = get_expon_lr_fn(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps)

    if opt_state is None:
        opt_state = optim.adam_init(state["params"])
    step_fn = make_train_step(opt, raster_cfg, bg, sh_degree=sh_degree,
                              lrs=lrs, donate=True)
    # past densify_until_iter the stats (weight sums + screen grads) are
    # dead weight — switch to a stats-free step for the rest of the run
    step_fn_fast = None
    densify_fn = jax.jit(
        partial(G.densify_and_prune,
                max_grad=opt.densify_grad_threshold, min_opacity=0.005,
                percent_dense=opt.percent_dense),
        static_argnames=("max_screen_size",))

    def _sync(tag):
        if os.environ.get("SVGIR_DEBUG_SYNC"):
            try:
                jax.block_until_ready(jnp.zeros(()) + 1.0)
                print(f"sync ok: {tag}", flush=True)
            except Exception as exc:
                print(f"SYNC FAILED at {tag}: {type(exc).__name__}: {exc}",
                      flush=True)
                raise

    key = jax.random.PRNGKey(seed)
    _sync("prngkey")
    # one-time device residency: per-step host->device image upload is the
    # dominant trainer cost on a tunneled TPU (25x gap, see staging.py)
    from svgir_tpu.train.staging import resolve, stage_cameras
    cams = stage_cameras([strip_meta(c) for c in cameras])
    _sync("staging")
    extent = spatial_lr_scale  # cameras_extent == spatial_lr_scale (train.py)

    bgj = jnp.asarray(bg)

    def make_eval_render(cfg):
        @jax.jit
        def eval_render(params, alive, camera):
            return render_view_stage1(camera, params, bgj,
                                      sh_degree=sh_degree, alive=alive,
                                      cfg=cfg)
        return eval_render

    eval_render = make_eval_render(raster_cfg)

    periodic = PeriodicTasks(
        out_dir=out_dir, checkpoint_interval=checkpoint_interval,
        test_cameras=test_cameras, test_interval=test_interval,
        vis_interval=vis_interval)

    history = []
    _sync("pre-loop")
    t0 = time.time()
    for it in range(first_iter + 1, iterations + 1):
        cam = resolve(camera_for_iter(cams, it, seed))
        if it == first_iter + 1:
            _sync("first-resolve")
        xyz_lr = float(xyz_sched(it))

        if it >= opt.densify_until_iter and step_fn_fast is None:
            step_fn_fast = make_train_step(
                opt, raster_cfg, bg, sh_degree=sh_degree, lrs=lrs,
                donate=True, track_stats=False)
        fn = step_fn_fast if it >= opt.densify_until_iter else step_fn
        state, opt_state, tb = fn(state, opt_state, cam,
                                  jnp.float32(it), jnp.float32(xyz_lr))

        if it < opt.densify_until_iter:
            at_densify = (it > opt.densify_from_iter
                          and it % opt.densification_interval == 0)
            # reference train.py:209-210: reset on cadence, plus once at
            # densify_from_iter on white-background scenes
            at_reset = (it % opt.opacity_reset_interval == 0
                        or (white_background and it == opt.densify_from_iter))
            if at_densify or at_reset:
                # host sync only at cadence points — a per-step
                # int(alive.sum()) would block the async dispatch pipeline
                # on every iteration of the whole densification phase
                n_alive = int(state["alive"].sum())
                under_cap = n_alive < opt.max_points
                if at_densify and under_cap:
                    # grow capacity if nearly full (host-side, rare recompile)
                    cap = state["alive"].shape[0]
                    if n_alive > 0.85 * cap:
                        state, opt_state = G.grow_capacity(state, opt_state,
                                                           cap * 2)
                    size_thr = (20.0 if it > opt.opacity_reset_interval
                                else None)
                    sub = jax.random.fold_in(key, it)
                    gnorm_thr = (opt.densify_grad_normal_threshold
                                 if it > opt.normal_densify_from_iter
                                 else 99999.0)
                    state, opt_state, rep = densify_fn(
                        state, opt_state, sub, extent=extent,
                        max_grad_normal=gnorm_thr, max_screen_size=size_thr)
                    # children beyond the free slots are dropped by the
                    # fixed-shape scatter — never silently: warn and grow
                    # capacity so the next cadence has room (symmetric with
                    # _grow_instance_cap; the 85% pre-grow above makes this
                    # a rare backstop)
                    if bool(rep["out_of_capacity"]):
                        cap = state["alive"].shape[0]
                        print(f"WARNING: densify out of capacity at iter "
                              f"{it} (cap {cap}): some clone/split children "
                              f"were dropped; growing capacity -> {cap * 2}",
                              flush=True)
                        state, opt_state = G.grow_capacity(state, opt_state,
                                                           cap * 2)
                # only while the densification block is live (under the cap)
                if at_reset and under_cap:
                    params, opt_state = G.reset_opacity(state["params"],
                                                        opt_state)
                    state = {**state, "params": params}

        extras = periodic.run(
            it,
            eval_fn=lambda c: eval_render(state["params"], state["alive"], c),
            save_fn=lambda i: CK.save_checkpoint(
                os.path.join(out_dir, f"chkpnt{i}.npz"), i, state, opt_state),
            vis_cam=cam)

        if it % log_every == 0 or it == iterations or extras:
            entry = {"iter": it, "psnr": float(tb["psnr"]),
                     "loss": float(tb["loss"]),
                     "n_alive": int(state["alive"].sum()),
                     "elapsed": time.time() - t0, **extras}
            if _warn_overflow(entry, tb, it) and auto_grow_instances:
                raster_cfg = _grow_instance_cap(raster_cfg)
                step_fn = make_train_step(opt, raster_cfg, bg,
                                          sh_degree=sh_degree, lrs=lrs,
                                          donate=True)
                if step_fn_fast is not None:
                    step_fn_fast = make_train_step(
                        opt, raster_cfg, bg, sh_degree=sh_degree, lrs=lrs,
                        donate=True, track_stats=False)
                eval_render = make_eval_render(raster_cfg)
            history.append(entry)
            if callback:
                callback(entry, state)

    return state, opt_state, history


def _warn_overflow(entry, tb, it) -> bool:
    """Surface binner overflow (instances silently truncated this frame):
    the CUDA reference grows its buffers dynamically (rasterizer_impl.cu:
    70-111); our fixed caps are grown by the training loops when this fires
    (checked at log cadence — a per-step host sync would serialize the
    dispatch pipeline)."""
    if bool(tb.get("overflow", False)):
        entry["overflow"] = 1.0
        print(f"WARNING: instance-buffer overflow at iter {it}: splats were "
              "dropped this frame", flush=True)
        return True
    return False


def _grow_instance_cap(raster_cfg: RasterConfig) -> RasterConfig:
    """Double max_instances (the CUDA reference's resizeFunctional realloc,
    rasterizer_impl.cu:70-111, made static-shape: rare recompile instead of
    per-frame realloc)."""
    import dataclasses
    new = dataclasses.replace(raster_cfg,
                              max_instances=raster_cfg.max_instances * 2)
    print(f"growing max_instances {raster_cfg.max_instances} -> "
          f"{new.max_instances} (recompile)", flush=True)
    return new


def make_svgss_train_step(opt: OptimizationConfig, raster_cfg: RasterConfig,
                          bg, *, sh_degree: int = 3,
                          lrs: Optional[Dict[str, float]] = None,
                          donate: bool = False):
    """Jitted stage-2 (render_relight) train step.

    step(state, opt_state, env_state, bake, camera, iteration, xyz_lr,
         radiance_lr) -> (state, opt_state, env_state, tb)

    Covers train.py's stage-2 loop mechanics: joint gaussian + env-map Adam
    steps; the radiance-group LR is a per-step scalar so the %1000 zeroing
    (train.py:211-214) needs no recompile.  (The reference also zeroes
    lambda_local_lights_smooth there, but no loss consumes that flag —
    see render/svgss.py and tests/test_loss_parity.py.)
    """
    from svgir_tpu.render.svgss import render_svgss

    bg = jnp.asarray(bg)

    # bake/camera are NOT donated: callers reuse them across steps
    @partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def step(state, opt_state, env_state, bake, camera, iteration, xyz_lr,
             radiance_lr):
        params, alive, stats = state["params"], state["alive"], state["stats"]
        cap = alive.shape[0]
        off0 = jnp.zeros((cap, 2))

        def loss_fn(p, env_p, off):
            res = render_svgss(camera, p, bg, bake=bake, env_params=env_p,
                               opt=opt, iteration=iteration,
                               is_training=True, alive=alive,
                               mean2d_offset=off, sh_degree=sh_degree,
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
        tb["overflow"] = res["overflow"]
        return new_state, opt_state, new_env, tb

    return step


def train_stage2(state, cameras: List, opt: OptimizationConfig, *,
                 bg=(0.0, 0.0, 0.0), raster_cfg: RasterConfig = RasterConfig(),
                 spatial_lr_scale: float = 1.0, sh_degree: int = 3,
                 sample_num: int = 64, env_resolution: int = 16,
                 first_iter: int = 30_000, iterations: int = 50_000,
                 seed: int = 0, log_every: int = 50, callback=None,
                 bake_key=None, env_state=None, bake=None,
                 opt_state=None, out_dir: Optional[str] = None,
                 checkpoint_interval: int = 0,
                 test_cameras: Optional[List] = None,
                 test_interval: int = 0, vis_interval: int = 0,
                 auto_grow_instances: bool = True):
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
        # COPY, not alias: state is donated every step, and an aliased
        # buffer would leave bake_static["radiance"] deleted after step 1
        params["radiances"] = jnp.array(bake["radiance"])
        params["radiance_ratio"] = jnp.ones(())
    state = {**state, "params": params}

    if env_state is None:
        key, sub = jax.random.split(key)
        env_state = LT.direct_light_map_init(sub, h=env_resolution,
                                             light_init=opt.light_init)

    lrs = optim.group_lrs(opt, spatial_lr_scale, use_pbr=True)
    if opt_state is None:
        opt_state = optim.adam_init(params)
    step_fn = make_svgss_train_step(opt, raster_cfg, bg,
                                    sh_degree=sh_degree, lrs=lrs,
                                    donate=True)
    xyz_sched = get_expon_lr_fn(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps)

    from svgir_tpu.train.staging import resolve, stage_cameras
    cams = stage_cameras([strip_meta(c) for c in cameras])

    from svgir_tpu.render.svgss import render_view_svgss
    from svgir_tpu.train import checkpoint as CK

    bgj = jnp.asarray(bg)

    def make_eval_render(cfg):
        @jax.jit
        def eval_render(params, alive, env_params, camera):
            return render_view_svgss(camera, params, bake_static, env_params,
                                     bgj, is_training=False, alive=alive,
                                     sh_degree=sh_degree, cfg=cfg)
        return eval_render

    eval_render = make_eval_render(raster_cfg)

    periodic = PeriodicTasks(
        out_dir=out_dir, checkpoint_interval=checkpoint_interval,
        test_cameras=test_cameras, test_interval=test_interval,
        vis_interval=vis_interval)

    radiance_lr = opt.radiance_lr
    # resuming past the first %1000 boundary keeps it zeroed
    if first_iter >= 1000 and (first_iter // 1000) * 1000 > 30_000:
        radiance_lr = 0.0
    history = []
    t0 = time.time()
    for it in range(first_iter + 1, iterations + 1):
        cam = resolve(camera_for_iter(cams, it, seed))
        xyz_lr = float(xyz_sched(it))

        state, opt_state, env_state, tb = step_fn(
            state, opt_state, env_state, bake_static, cam,
            jnp.float32(it - first_iter), jnp.float32(xyz_lr),
            jnp.float32(radiance_lr))

        # train.py:211-214: zero the radiance lr at the first %1000
        # boundary (the lls zeroing there is a no-op — dead flag)
        if it % 1000 == 0:
            radiance_lr = 0.0

        extras = periodic.run(
            it,
            eval_fn=lambda c: eval_render(state["params"], state["alive"],
                                          env_state["params"], c),
            save_fn=lambda i: CK.save_checkpoint(
                os.path.join(out_dir, f"chkpnt{i}.npz"), i, state, opt_state,
                env=env_state, extra=bake_static),
            vis_cam=cam)

        if it % log_every == 0 or it == iterations or extras:
            entry = {"iter": it, "psnr": float(tb["psnr"]),
                     "psnr_pbr": float(tb["psnr_pbr"]),
                     "loss": float(tb["loss"]),
                     "elapsed": time.time() - t0, **extras}
            if _warn_overflow(entry, tb, it) and auto_grow_instances:
                raster_cfg = _grow_instance_cap(raster_cfg)
                step_fn = make_svgss_train_step(opt, raster_cfg, bg,
                                                sh_degree=sh_degree, lrs=lrs,
                                                donate=True)
                eval_render = make_eval_render(raster_cfg)
            history.append(entry)
            if callback:
                callback(entry, state, env_state)

    return state, opt_state, env_state, bake_static, history


def bake_radiance_compact(params, alive, *, sample_num: int, key=None,
                          k_hits: int = 16, max_k_hits: int = 128,
                          exhausted_tol: float = 0.01, **bake_kw):
    """Bake only over ALIVE gaussians (the padded capacity can be several
    times the live count after pruning), then re-expand the buffers to
    capacity indexing, remapping hit indices back to capacity rows.

    Rays whose K-hit list overflowed (``exhausted``) composite a truncated
    radiance; the Slang march has no such cap (intersect_test.slang:
    1928-1978).  When more than ``exhausted_tol`` of rays overflow, warn
    and re-bake with doubled ``k_hits`` (up to ``max_k_hits``) — never
    silently truncate."""
    from svgir_tpu.models import radiance as RAD

    cap = alive.shape[0]
    n_alive = int(jax.device_get(alive.sum()))
    idx = jnp.nonzero(alive, size=n_alive)[0]              # compact -> cap

    sub = {k: params[k][idx] for k in
           ("xyz", "scaling", "rotation", "opacity", "shs_dc", "shs_rest")}
    while True:
        bake_c = RAD.bake_radiance(
            sub["xyz"], G.get_scaling(sub), G.get_rotation(sub),
            G.get_opacity(sub)[:, 0], G.get_shs(sub),
            sample_num=sample_num, key=key, k_hits=k_hits, **bake_kw)
        frac = float(jax.device_get(bake_c["exhausted_frac"]))
        if frac <= exhausted_tol or k_hits >= max_k_hits:
            if frac > exhausted_tol:
                print(f"WARNING: radiance bake still has {frac:.1%} "
                      f"exhausted rays at k_hits={k_hits} (max reached)",
                      flush=True)
            break
        print(f"WARNING: {frac:.1%} of bake rays exhausted the {k_hits}-hit "
              f"list; re-baking with k_hits={k_hits * 2}", flush=True)
        k_hits *= 2

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
