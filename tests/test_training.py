"""End-to-end stage-1 training on a synthetic scene (SURVEY.md §4 oracle e,
scaled down): GT images rendered from a known surfel cloud; a fresh model
must fit them (loss falls, PSNR rises) with densification active."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svgir_tpu.cameras import look_at_camera
from svgir_tpu.config import OptimizationConfig, RasterConfig
from svgir_tpu.models import gaussians as G
from svgir_tpu.ops.rasterizer import rasterize
from svgir_tpu.train.trainer import train_stage1
from svgir_tpu.utils.transforms import normal_to_rotation, normalize

CFG = RasterConfig(max_instances=1 << 14, chunk=128)


def make_gt_scene(key, n=60):
    ks = jax.random.split(key, 4)
    dirs = normalize(jax.random.normal(ks[0], (n, 3)))
    means = dirs * 1.0
    quats = normal_to_rotation(dirs)
    scales = jnp.full((n, 3), 0.25).at[:, 2].set(0.0)
    opac = jnp.full((n,), 0.95)
    colors = jax.random.uniform(ks[1], (n, 3), minval=0.2, maxval=1.0)
    return means, quats, scales, opac, colors


def ring_cameras(k=6, dist=3.0, res=64):
    cams = []
    for i in range(k):
        a = 2 * math.pi * i / k
        eye = [dist * math.sin(a), 0.5, -dist * math.cos(a)]
        cams.append(look_at_camera(eye=eye, target=[0, 0, 0], up=[0, -1, 0],
                                   fovx=math.pi / 3, fovy=math.pi / 3,
                                   width=res, height=res))
    return cams


@pytest.mark.slow
def test_stage1_fits_synthetic_scene():
    key = jax.random.PRNGKey(0)
    means, quats, scales, opac, colors = make_gt_scene(key)
    bg = jnp.zeros(3)
    cams = []
    for cam in ring_cameras(k=6, res=64):
        bufs = rasterize(means, scales, quats, opac, cam, bg, colors=colors,
                         cfg=CFG, interpret=True)
        import dataclasses
        cams.append(dataclasses.replace(
            cam, image=jnp.clip(bufs.color, 0, 1),
            image_mask=jnp.ones((1, 64, 64))))

    # init: jittered points near the GT surface, wrong colors
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    init_pts = means + 0.1 * jax.random.normal(k1, means.shape)
    init_cols = jnp.full_like(colors, 0.5)
    state = G.init_from_points(init_pts, init_cols, capacity=4096)

    def mean_psnr(st):
        # through the public eval path (render_view_stage1 masks dead
        # gaussians out of BINNING too — without the mask they overflow the
        # instance buffer and silently truncate real splats)
        from svgir_tpu.render.stage1 import render_view_stage1
        vals = []
        for cam in cams:
            res = render_view_stage1(cam, st["params"], bg,
                                     alive=st["alive"], cfg=CFG)
            mse = jnp.mean(jnp.square(jnp.clip(res["render"], 0, 1)
                                      - cam.image))
            vals.append(float(-10 * jnp.log10(mse)))
        return np.mean(vals)

    psnr0 = mean_psnr(state)

    opt = OptimizationConfig(
        iterations=120, densify_from_iter=30, densify_until_iter=100,
        densification_interval=40, opacity_reset_interval=10_000,
        position_lr_max_steps=120)
    state, opt_state, history = train_stage1(
        state, cams, opt, bg=(0, 0, 0), raster_cfg=CFG,
        spatial_lr_scale=1.0, iterations=120, log_every=20)

    losses = [h["loss"] for h in history]
    assert np.isfinite(losses).all()
    # fitting must make clear progress (mean over ALL cameras: per-step
    # logged psnr depends on which camera that step drew)
    psnr1 = mean_psnr(state)
    assert psnr1 > psnr0 + 1.0, f"no progress: {psnr0} -> {psnr1}"
    # densification ran without corrupting state
    assert history[-1]["n_alive"] >= 60
    assert np.isfinite(np.asarray(state["params"]["xyz"])).all()


@pytest.mark.slow
def test_checkpoint_resume_reproduces_uninterrupted_run(tmp_path):
    """Kill-and-resume parity (VERDICT r1 #3): a run checkpointed at iter 20
    and resumed to 40 matches the uninterrupted 40-iter run exactly — the
    camera schedule, densify RNG, and Adam moments all survive the restart."""
    import os

    from svgir_tpu.train import checkpoint as CK

    key = jax.random.PRNGKey(0)
    means, quats, scales, opac, colors = make_gt_scene(key, n=40)
    bg = jnp.zeros(3)
    cams = []
    for cam in ring_cameras(k=3, res=32):
        bufs = rasterize(means, scales, quats, opac, cam, bg, colors=colors,
                         cfg=CFG, interpret=True)
        import dataclasses
        cams.append(dataclasses.replace(
            cam, image=jnp.clip(bufs.color, 0, 1),
            image_mask=jnp.ones((1, 32, 32))))

    def fresh_state():
        k1, _ = jax.random.split(jax.random.PRNGKey(1))
        init_pts = means + 0.1 * jax.random.normal(k1, means.shape)
        return G.init_from_points(init_pts, jnp.full_like(colors, 0.5),
                                  capacity=256)

    opt = OptimizationConfig(
        iterations=40, densify_from_iter=5, densify_until_iter=35,
        densification_interval=10, opacity_reset_interval=10_000,
        position_lr_max_steps=40)

    # uninterrupted
    state_a, opt_a, _ = train_stage1(
        fresh_state(), cams, opt, bg=(0, 0, 0), raster_cfg=CFG,
        spatial_lr_scale=1.0, iterations=40, log_every=40, seed=3)

    # checkpointed at 20, then resumed
    out = str(tmp_path)
    state_b, opt_b, _ = train_stage1(
        fresh_state(), cams, opt, bg=(0, 0, 0), raster_cfg=CFG,
        spatial_lr_scale=1.0, iterations=20, log_every=40, seed=3,
        out_dir=out, checkpoint_interval=20)
    it0, tree = CK.load_checkpoint(os.path.join(out, "chkpnt20.npz"))
    assert it0 == 20
    state_b, opt_b, _ = train_stage1(
        tree["state"], cams, opt, bg=(0, 0, 0), raster_cfg=CFG,
        spatial_lr_scale=1.0, first_iter=20, iterations=40, log_every=40,
        seed=3, opt_state=tree["opt"])

    for k in state_a["params"]:
        np.testing.assert_allclose(
            np.asarray(state_a["params"][k]), np.asarray(state_b["params"][k]),
            atol=1e-6, err_msg=f"param {k} diverged across resume")
    np.testing.assert_array_equal(np.asarray(state_a["alive"]),
                                  np.asarray(state_b["alive"]))


def test_densify_and_prune_shapes():
    """Unit-level: clones land in free slots, prunes free them."""
    state = G.init_from_points(
        jax.random.normal(jax.random.PRNGKey(0), (50, 3)),
        jnp.ones((50, 3)) * 0.5, capacity=256)
    opt_state = {"m": {k: jnp.zeros_like(v) for k, v in state["params"].items()},
                 "v": {k: jnp.zeros_like(v) for k, v in state["params"].items()},
                 "step": jnp.zeros((), jnp.int32)}
    # force clone of the first 10 points: big grads, small scales
    stats = state["stats"]
    stats["xyz_gradient_accum"] = stats["xyz_gradient_accum"].at[:10].set(1.0)
    stats["denom"] = stats["denom"].at[:50].set(1.0)
    stats["weights_accum"] = stats["weights_accum"].at[:50].set(1.0)
    state = {**state, "stats": stats}

    new_state, new_opt, rep = G.densify_and_prune(
        state, opt_state, jax.random.PRNGKey(1),
        max_grad=0.5, min_opacity=0.005, extent=10000.0,
        max_screen_size=None)
    assert int(rep["n_clone"]) == 10
    assert int(rep["n_split"]) == 0
    assert int(new_state["alive"].sum()) == 60
    # cloned params match their sources
    np.testing.assert_allclose(
        np.sort(np.asarray(new_state["params"]["xyz"][50:60, 0])),
        np.sort(np.asarray(state["params"]["xyz"][:10, 0])), atol=1e-6)


def test_split_replaces_large_points():
    state = G.init_from_points(
        jax.random.normal(jax.random.PRNGKey(0), (20, 3)),
        jnp.ones((20, 3)) * 0.5, capacity=128)
    # make point 0 large and high-gradient -> split (2 children, parent dies)
    params = dict(state["params"])
    params["scaling"] = params["scaling"].at[0].set(jnp.log(5.0))
    state = {**state, "params": params}
    stats = state["stats"]
    stats["xyz_gradient_accum"] = stats["xyz_gradient_accum"].at[0].set(1.0)
    stats["denom"] = stats["denom"].at[:20].set(1.0)
    stats["weights_accum"] = stats["weights_accum"].at[:20].set(1.0)
    state = {**state, "stats": stats}
    opt_state = {"m": {k: jnp.zeros_like(v) for k, v in state["params"].items()},
                 "v": {k: jnp.zeros_like(v) for k, v in state["params"].items()},
                 "step": jnp.zeros((), jnp.int32)}

    new_state, _, rep = G.densify_and_prune(
        state, opt_state, jax.random.PRNGKey(1),
        max_grad=0.5, min_opacity=0.005, extent=0.001,
        max_screen_size=None)
    assert int(rep["n_split"]) == 1
    assert int(new_state["alive"].sum()) == 21  # 20 - 1 parent + 2 children
    # two children exist with z-scale forced to -1e10 and scales / 1.6
    scal = np.asarray(new_state["params"]["scaling"])[
        np.asarray(new_state["alive"])]
    children = scal[scal[:, 2] < -1e9]
    assert children.shape[0] == 2
    np.testing.assert_allclose(children[:, 0], np.log(5.0 / 1.6), atol=1e-5)


@pytest.mark.slow
def test_overflow_auto_grows_instance_cap():
    """A run started with an absurdly small max_instances must surface the
    overflow in the history AND keep training by growing the cap (the CUDA
    reference reallocs per frame, rasterizer_impl.cu:70-111; we recompile at
    log cadence instead) until a later logged step is overflow-free."""
    key = jax.random.PRNGKey(0)
    means, quats, scales, opac, colors = make_gt_scene(key, n=40)
    bg = jnp.zeros(3)
    cams = []
    for cam in ring_cameras(k=3, res=32):
        bufs = rasterize(means, scales, quats, opac, cam, bg, colors=colors,
                         cfg=CFG, interpret=True)
        import dataclasses
        cams.append(dataclasses.replace(
            cam, image=jnp.clip(bufs.color, 0, 1),
            image_mask=jnp.ones((1, 32, 32))))

    k1, _ = jax.random.split(jax.random.PRNGKey(1))
    init_pts = means + 0.1 * jax.random.normal(k1, means.shape)
    state = G.init_from_points(init_pts, jnp.full_like(colors, 0.5),
                               capacity=256)

    opt = OptimizationConfig(
        iterations=12, densify_from_iter=10_000, densify_until_iter=10_000,
        opacity_reset_interval=10_000, position_lr_max_steps=12)
    # tile=16 pinned: the point is the overflow-growth mechanics, which
    # need a cap the scene actually overflows (at the tile=32 default a
    # 32px image is ONE tile and 128 instances suffice)
    tiny = RasterConfig(max_instances=128, chunk=128, tile=16)
    state, _, history = train_stage1(
        state, cams, opt, bg=(0, 0, 0), raster_cfg=tiny,
        spatial_lr_scale=1.0, iterations=12, log_every=2, seed=3)

    flags = [h.get("overflow", 0.0) for h in history]
    assert flags[0] == 1.0, "tiny cap must overflow on the first logged step"
    assert flags[-1] == 0.0, f"cap never grew clear of overflow: {flags}"
    assert np.isfinite([h["loss"] for h in history]).all()
