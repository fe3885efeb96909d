"""Multi-device training step: data parallelism over cameras.

The reference is strictly single-GPU (SURVEY.md §2.3); this layer is new.
Design (scaling-book style): pick a mesh, shard the *view* batch over the
``data`` axis with parameters replicated, compute per-view gradients locally
(each device runs the full rasterizer for its own camera — splat work is
embarrassingly parallel across views), then ``psum`` gradients over ICI and
apply a replicated Adam step.  The gaussian-axis ("tensor") sharding of
preprocess/shading and tile-axis ("spatial") sharding of the blend kernel
compose on top of this (see parallel/gshard.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from svgir_tpu.config import OptimizationConfig, RasterConfig
from svgir_tpu.models import gaussians as G
from svgir_tpu.render.stage1 import render_stage1
from svgir_tpu.train import optim


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return jax.make_mesh((len(devs),), (axis,), devices=devs)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bootstrap: wire this process into a global JAX runtime.

    Call once per host before any device use; afterwards ``jax.devices()``
    spans all hosts and ``make_mesh``/``make_global_mesh`` build ICI+DCN
    meshes transparently (collectives in the train steps are unchanged —
    XLA routes them over ICI within a slice and DCN across slices).

    With no arguments, relies on the cluster's auto-detection (TPU pods
    populate coordinator/process env vars); explicit args cover manual
    launches.  Returns this host's process index.  Safe to call when
    already initialized (no-op).
    """
    if not jax.distributed.is_initialized():
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index()


def make_global_mesh(axes: Dict[str, int] | None = None) -> Mesh:
    """Mesh over every device in the (possibly multi-host) runtime.

    ``axes`` maps axis name -> size with at most one -1 (inferred), e.g.
    ``{"data": -1, "tile": 4}``; default is a 1-D ``data`` mesh.  Axis
    order follows dict order; put the fastest-varying (ICI-heavy) axis
    last so it lands on neighbouring devices within a slice.
    """
    n = len(jax.devices())
    axes = dict(axes or {"data": -1})
    sizes = list(axes.values())
    if -1 in sizes:
        known = 1
        for s in sizes:
            if s != -1:
                known *= s
        sizes[sizes.index(-1)] = n // known
    prod = 1
    for s in sizes:
        prod *= s
    if prod != n:
        raise ValueError(f"mesh axes {axes} do not tile {n} devices "
                         f"(product {prod})")
    return jax.make_mesh(tuple(sizes), tuple(axes.keys()))


def stack_cameras(cameras: List):
    """Stack per-camera arrays into leading-batch leaves (statics must
    match across the batch)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cameras)


def index_camera(batched, i):
    return jax.tree.map(lambda x: x[i], batched)


def make_dp_train_step(mesh: Mesh, opt: OptimizationConfig,
                       raster_cfg: RasterConfig, bg, *, sh_degree: int = 3,
                       lrs: Optional[Dict[str, float]] = None,
                       render_fn=render_stage1):
    """Build a jitted DP train step.

    step(state, opt_state, cam_batch, iteration, xyz_lr) where ``cam_batch``
    holds one camera per device (leading dim == mesh size).  Per-view loss
    and gradients are computed locally; gradients and scalars are psum'd
    over the ``data`` axis (mean), densification stats are summed — the
    multi-view generalization of the reference's one-view-per-iteration
    loop (train.py:108-246).
    """
    bg = jnp.asarray(bg)
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size

    def per_device(params, alive, stats, cam_batch, iteration, xyz_lr,
                   opt_state):
        cam = index_camera(cam_batch, 0)   # local batch of 1
        cap = alive.shape[0]

        def loss_fn(p, off):
            res = render_fn(cam, p, bg, opt=opt, iteration=iteration,
                            is_training=True, alive=alive, mean2d_offset=off,
                            sh_degree=sh_degree, mono=cam.mono, cfg=raster_cfg)
            return res["loss"], res

        (loss, res), (gp, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params,
                                                   jnp.zeros((cap, 2)))
        # gradient all-reduce over ICI (mean over views)
        gp = jax.lax.pmean(gp, axis)
        loss = jax.lax.pmean(loss, axis)

        step_lrs = {**(lrs or {}), "xyz": xyz_lr}
        params, opt_state = optim.adam_step(params, gp, opt_state, step_lrs)

        gnd = goff * jnp.array([0.5 * cam.width, 0.5 * cam.height])
        visible = res["visibility_filter"] & alive
        # per-view stat deltas summed over the data axis, then applied once
        delta = G.add_densification_stats(
            G.init_stats(cap), gnd, visible, res["weights"],
            res["radii"].astype(jnp.float32))
        delta = jax.tree.map(lambda x: jax.lax.psum(x, axis), delta)
        stats = {
            **{k: stats[k] + delta[k] for k in
               ("xyz_gradient_accum", "normal_gradient_accum", "denom",
                "weights_accum")},
            "max_radii2d": jnp.maximum(stats["max_radii2d"],
                                       delta["max_radii2d"]),
        }
        psnr = jax.lax.pmean(res["tb_dict"]["psnr"], axis)
        return params, opt_state, stats, loss, psnr

    @jax.jit
    def step(state, opt_state, cam_batch, iteration, xyz_lr):
        params, alive, stats = state["params"], state["alive"], state["stats"]
        fn = shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(), P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False)
        params, opt_state, stats, loss, psnr = fn(
            params, alive, stats, cam_batch, iteration, xyz_lr, opt_state)
        new_state = {"params": params, "alive": alive, "stats": stats}
        return new_state, opt_state, {"loss": loss, "psnr": psnr}

    return step


def make_dp_svgss_train_step(mesh: Mesh, opt: OptimizationConfig,
                             raster_cfg: RasterConfig, bg, *,
                             sh_degree: int = 3,
                             lrs: Optional[Dict[str, float]] = None):
    """Stage-2 (render_relight) DP train step: one camera per device, the
    full deferred-PBR forward/loss locally, gaussian AND env-map gradients
    psum'd over the ``data`` axis, replicated joint Adam (the multi-view
    generalization of trainer.make_svgss_train_step; bake buffers are
    replicated — they refresh on the host bake cadence, not per step)."""
    from svgir_tpu.render.svgss import render_svgss

    bg = jnp.asarray(bg)
    axis = mesh.axis_names[0]

    def per_device(params, alive, cam_batch, bake, env_params, env_opt,
                   iteration, xyz_lr, radiance_lr, opt_state):
        cam = index_camera(cam_batch, 0)   # local batch of 1

        def loss_fn(p, env_p):
            res = render_svgss(cam, p, bg, bake=bake, env_params=env_p,
                               opt=opt, iteration=iteration,
                               is_training=True, alive=alive,
                               sh_degree=sh_degree,
                               cfg=raster_cfg)
            return res["loss"], res

        (loss, res), (gp, genv) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, env_params)
        gp = jax.lax.pmean(gp, axis)
        genv = jax.lax.pmean(genv, axis)   # env grads all-reduced over ICI
        loss = jax.lax.pmean(loss, axis)

        step_lrs = {**(lrs or {}), "xyz": xyz_lr, "radiances": radiance_lr}
        params, opt_state = optim.adam_step(params, gp, opt_state, step_lrs)
        env_params, env_opt = optim.adam_step(env_params, genv, env_opt,
                                              {"env": opt.env_lr})
        psnr = jax.lax.pmean(res["tb_dict"]["psnr"], axis)
        return params, opt_state, env_params, env_opt, loss, psnr

    @jax.jit
    def step(state, opt_state, env_state, bake, cam_batch, iteration,
             xyz_lr, radiance_lr):
        fn = shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(),) * 6, check_vma=False)
        params, new_opt, env_p, env_o, loss, psnr = fn(
            state["params"], state["alive"], cam_batch, bake,
            env_state["params"], env_state["opt"], iteration, xyz_lr,
            radiance_lr, opt_state)
        new_state = {"params": params, "alive": state["alive"],
                     "stats": state["stats"]}
        return (new_state, new_opt, {"params": env_p, "opt": env_o},
                {"loss": loss, "psnr": psnr})

    return step


def bake_radiance_sharded(mesh: Mesh, axis: str, means, scales, quats,
                          opacity, shs, *, sample_num: int, key=None,
                          k_hits: int = 8, gauss_chunk: int = 256) -> Dict:
    """Gaussian-sharded radiance bake: the N*S hemisphere rays are sharded
    over ``axis`` (each device traces its gaussians' rays against the
    REPLICATED surfel geometry — rays are independent, so the only
    collective is the implicit output all-gather).  Identical outputs to
    ``models.radiance.bake_radiance(use_grid=False)``; N*S must divide the
    mesh size."""
    from svgir_tpu.ops import tracing
    from svgir_tpu.utils.graphics import fibonacci_sphere_sampling

    n = means.shape[0]
    s = sample_num
    geo = tracing.build_surfel_geometry(means, scales, quats, opacity)
    dirs, areas = fibonacci_sphere_sampling(geo.normal, s, key=key)
    rays_o = jnp.repeat(means, s, axis=0)
    rays_d = dirs.reshape(-1, 3)
    self_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), s)

    def local(geo_, shs_, means_, o, d, si):
        hits = tracing.nearest_hits(geo_, o, d, chunk=gauss_chunk, k=k_hits)
        return tracing.radiance_march(hits, si, shs_, means_, o)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
                   out_specs=P(axis), check_vma=False)
    with jax.set_mesh(mesh):
        cat = jax.jit(fn)(geo, shs, means, rays_o, rays_d, self_idx)
    return {
        "radiance": cat["radiance"].reshape(n, s, 3),
        "visibility": cat["visibility"].reshape(n, s, 1),
        "incident_dirs": dirs,
        "incident_areas": areas,
        "hit_idx": cat["first_hit"].reshape(n, s),
        "uv": cat["first_uv"].reshape(n, s, 2),
        "exhausted_frac": cat["exhausted"].mean(),
    }
