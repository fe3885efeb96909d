"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4 oracle
d): sharded == single-device."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svgir_tpu.config import OptimizationConfig, RasterConfig
from svgir_tpu.ops.rasterizer import rasterize
from svgir_tpu.parallel.dp import make_dp_train_step, make_mesh, stack_cameras
from svgir_tpu.parallel.gshard import rasterize_sharded

from tests.scenes import default_camera, sphere_scene

CFG = RasterConfig(max_instances=1 << 14)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_gshard_matches_single_device():
    sc = sphere_scene(jax.random.PRNGKey(0), n=128, s_feat=2, vs_feat=8)
    cam = default_camera(64, 64)
    bg = jnp.array([0.1, 0.2, 0.3])
    mesh = make_mesh(8, axis="gauss")

    single = rasterize(sc["means"], sc["scales"], sc["quats"], sc["opacity"],
                       cam, bg, colors=sc["colors"], features=sc["features"],
                       vfeatures=sc["vfeatures"], cfg=CFG, interpret=True)
    shard = rasterize_sharded(mesh, "gauss", sc["means"], sc["scales"],
                              sc["quats"], sc["opacity"], cam, bg,
                              colors=sc["colors"], features=sc["features"],
                              vfeatures=sc["vfeatures"], cfg=CFG,
                              interpret=True)
    np.testing.assert_allclose(shard.color, single.color, atol=1e-4)
    np.testing.assert_allclose(shard.opacity, single.opacity, atol=1e-4)
    np.testing.assert_allclose(shard.feature, single.feature, atol=1e-4)
    np.testing.assert_allclose(shard.vfeature, single.vfeature, atol=1e-4)
    np.testing.assert_allclose(shard.depth, single.depth, atol=1e-3)
    np.testing.assert_allclose(shard.weights, single.weights, atol=1e-4)


@needs_8
def test_gshard_exchange_matches_single_device():
    """Budgeted all-to-all exchange (instead of the O(N) slab all-gather):
    same image, weights routed back to their owner shards."""
    sc = sphere_scene(jax.random.PRNGKey(0), n=128, s_feat=2, vs_feat=8)
    cam = default_camera(64, 64)
    bg = jnp.array([0.1, 0.2, 0.3])
    mesh = make_mesh(8, axis="gauss")

    single = rasterize(sc["means"], sc["scales"], sc["quats"], sc["opacity"],
                       cam, bg, colors=sc["colors"], features=sc["features"],
                       vfeatures=sc["vfeatures"], cfg=CFG, interpret=True)
    shard = rasterize_sharded(mesh, "gauss", sc["means"], sc["scales"],
                              sc["quats"], sc["opacity"], cam, bg,
                              colors=sc["colors"], features=sc["features"],
                              vfeatures=sc["vfeatures"], cfg=CFG,
                              exchange_cap=16, interpret=True)
    np.testing.assert_allclose(shard.color, single.color, atol=1e-4)
    np.testing.assert_allclose(shard.feature, single.feature, atol=1e-4)
    np.testing.assert_allclose(shard.vfeature, single.vfeature, atol=1e-4)
    np.testing.assert_allclose(shard.depth, single.depth, atol=1e-3)
    np.testing.assert_allclose(shard.weights, single.weights, atol=1e-4)
    assert not bool(shard.overflow)

    # an undersized budget must flag, not crash
    tiny = rasterize_sharded(mesh, "gauss", sc["means"], sc["scales"],
                             sc["quats"], sc["opacity"], cam, bg,
                             colors=sc["colors"], features=sc["features"],
                             vfeatures=sc["vfeatures"], cfg=CFG,
                             exchange_cap=2, interpret=True)
    assert bool(tiny.overflow)


@needs_8
def test_gshard_exchange_gradients():
    sc = sphere_scene(jax.random.PRNGKey(1), n=64)
    cam = default_camera(32, 32)
    bg = jnp.zeros(3)
    mesh = make_mesh(8, axis="gauss")

    def loss_sharded(means):
        b = rasterize_sharded(mesh, "gauss", means, sc["scales"],
                              sc["quats"], sc["opacity"], cam, bg,
                              colors=sc["colors"], cfg=CFG, exchange_cap=8,
                              interpret=True)
        return jnp.square(b.color).sum()

    def loss_single(means):
        b = rasterize(means, sc["scales"], sc["quats"], sc["opacity"], cam,
                      bg, colors=sc["colors"], cfg=CFG, interpret=True)
        return jnp.square(b.color).sum()

    with jax.set_mesh(mesh):
        gs = jax.jit(jax.grad(loss_sharded))(sc["means"])
    g1 = jax.grad(loss_single)(sc["means"])
    scale = np.abs(np.asarray(g1)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(gs) / scale,
                               np.asarray(g1) / scale, atol=5e-4)


@needs_8
def test_gshard_gradients():
    sc = sphere_scene(jax.random.PRNGKey(1), n=64)
    cam = default_camera(32, 32)
    bg = jnp.zeros(3)
    mesh = make_mesh(8, axis="gauss")

    def loss_sharded(means):
        b = rasterize_sharded(mesh, "gauss", means, sc["scales"],
                              sc["quats"], sc["opacity"], cam, bg,
                              colors=sc["colors"], cfg=CFG, interpret=True)
        return jnp.square(b.color).sum()

    def loss_single(means):
        b = rasterize(means, sc["scales"], sc["quats"], sc["opacity"], cam,
                      bg, colors=sc["colors"], cfg=CFG, interpret=True)
        return jnp.square(b.color).sum()

    with jax.set_mesh(mesh):
        gs = jax.jit(jax.grad(loss_sharded))(sc["means"])
    g1 = jax.grad(loss_single)(sc["means"])
    scale = np.abs(np.asarray(g1)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(gs) / scale,
                               np.asarray(g1) / scale, atol=5e-4)


@needs_8
def test_dp_train_step():
    import math
    from svgir_tpu.cameras import look_at_camera
    from svgir_tpu.models import gaussians as G
    from svgir_tpu.train import optim
    from svgir_tpu.train.trainer import strip_meta
    from svgir_tpu.utils.transforms import normalize

    mesh = make_mesh(8)
    n = 64
    dirs = normalize(jax.random.normal(jax.random.PRNGKey(0), (n, 3)))
    state = G.init_from_points(dirs, jnp.full((n, 3), 0.6), normals=dirs,
                               capacity=n, rotation_init="normal")
    bg = jnp.zeros(3)
    cams = []
    for i in range(8):
        a = 2 * math.pi * i / 8
        cam = look_at_camera(eye=[3 * math.sin(a), 0.3, -3 * math.cos(a)],
                             target=[0, 0, 0], up=[0, -1, 0],
                             fovx=math.pi / 3, fovy=math.pi / 3,
                             width=32, height=32)
        cams.append(dataclasses.replace(
            strip_meta(cam),
            image=jax.random.uniform(jax.random.PRNGKey(i), (3, 32, 32)),
            image_mask=jnp.ones((1, 32, 32))))
    batch = stack_cameras(cams)

    opt = OptimizationConfig()
    lrs = optim.group_lrs(opt, 1.0, use_pbr=False)
    step = make_dp_train_step(mesh, opt, CFG, bg, lrs=lrs)
    opt_state = optim.adam_init(state["params"])
    new_state, opt_state, metrics = step(state, opt_state, batch,
                                         jnp.float32(1), jnp.float32(1e-4))
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved and are replicated-consistent
    assert float(jnp.abs(new_state["params"]["xyz"]
                         - state["params"]["xyz"]).max()) > 0


def test_distributed_bootstrap_single_process():
    """init_distributed + make_global_mesh in a fresh process (initialize
    must precede backend init, so this runs in a subprocess)."""
    import os
    import subprocess
    import sys

    code = (
        "from svgir_tpu.parallel.dp import init_distributed, make_global_mesh\n"
        "import jax\n"
        "pid = init_distributed('localhost:12395', num_processes=1, "
        "process_id=0)\n"
        "pid2 = init_distributed('localhost:12395', num_processes=1, "
        "process_id=0)\n"   # idempotent re-init (backend is up by now)
        "assert pid == pid2 == 0\n"
        "assert jax.process_count() == 1\n"
        "m1 = make_global_mesh()\n"
        "assert m1.axis_names == ('data',) and m1.devices.size == 8\n"
        "m2 = make_global_mesh({'data': -1, 'tile': 4})\n"
        "assert m2.shape == {'data': 2, 'tile': 4}\n"
        "print('bootstrap-ok', pid)\n")
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:] + out.stdout[-500:]
    assert "bootstrap-ok 0" in out.stdout


@needs_8
@pytest.mark.slow
def test_gshard_exchange_bench_shapes():
    """Sharded == single at near-bench scale (VERDICT r1 #9): 400x400, 8k
    gaussians, ~0.5M instances, budgeted all-to-all exchange.  Tolerances
    are looser than the small-scene tests: the tile-row screen-translation
    trick changes last-ulp rounding of dy, and deep transmittance stacks
    amplify it multiplicatively."""
    sc = sphere_scene(jax.random.PRNGKey(0), n=8192)
    cam = default_camera(400, 400)
    bg = jnp.zeros(3)
    cfg = RasterConfig(max_instances=1 << 20)
    mesh = make_mesh(8, axis="gauss")

    single = rasterize(sc["means"], sc["scales"], sc["quats"], sc["opacity"],
                       cam, bg, colors=sc["colors"], cfg=cfg, interpret=True)
    shard = rasterize_sharded(mesh, "gauss", sc["means"], sc["scales"],
                              sc["quats"], sc["opacity"], cam, bg,
                              colors=sc["colors"], cfg=cfg,
                              exchange_cap=4096, interpret=True)
    assert not bool(single.overflow) and not bool(shard.overflow)
    diff = np.abs(np.asarray(shard.color) - np.asarray(single.color))
    assert diff.max() < 5e-3 and diff.mean() < 1e-5
    wdiff = np.abs(np.asarray(shard.weights) - np.asarray(single.weights))
    assert wdiff.max() < 5e-3


@needs_8
def test_gshard_balanced_rows_matches_single_device():
    """Instance-balanced uneven tile-row partition (SURVEY §7 hard part 5):
    same image as single-device, and the realized per-device instance
    imbalance improves on the equal-area split for a skewed scene."""
    from svgir_tpu.parallel.gshard import (balanced_row_starts,
                                           instance_stats,
                                           row_instance_histogram)

    cfg = dataclasses.replace(CFG, tile=16)   # 256px/16 = 16 rows > 8 dev
    sc = sphere_scene(jax.random.PRNGKey(0), n=256, s_feat=2, vs_feat=8)
    # skew the scene downward so the bottom tile rows carry most instances
    means = sc["means"].at[:, 1].add(-0.45 * jnp.abs(sc["means"][:, 0]) - 0.3)
    cam = default_camera(128, 256)
    bg = jnp.array([0.1, 0.2, 0.3])
    mesh = make_mesh(8, axis="gauss")

    hist = row_instance_histogram(means, sc["scales"], sc["quats"],
                                  sc["opacity"], cam, cfg=cfg)
    starts = balanced_row_starts(hist, 8)
    grid_y = -(-cam.height // cfg.tile)
    assert starts[0] == 0 and starts[-1] == grid_y and len(starts) == 9

    even = tuple(range(0, grid_y + 1, grid_y // 8)) if grid_y % 8 == 0 \
        else None
    bal_stats = instance_stats(means, sc["scales"], sc["quats"],
                               sc["opacity"], cam, starts, cfg=cfg)
    if even is not None:
        even_stats = instance_stats(means, sc["scales"], sc["quats"],
                                    sc["opacity"], cam, even, cfg=cfg)
        assert bal_stats["imbalance"] <= even_stats["imbalance"] + 1e-6

    single = rasterize(means, sc["scales"], sc["quats"], sc["opacity"],
                       cam, bg, colors=sc["colors"], features=sc["features"],
                       vfeatures=sc["vfeatures"], cfg=cfg, interpret=True)
    for cap in (None, 64):
        shard = rasterize_sharded(mesh, "gauss", means, sc["scales"],
                                  sc["quats"], sc["opacity"], cam, bg,
                                  colors=sc["colors"],
                                  features=sc["features"],
                                  vfeatures=sc["vfeatures"], cfg=cfg,
                                  exchange_cap=cap, row_starts=starts,
                                  interpret=True)
        np.testing.assert_allclose(shard.color, single.color, atol=1e-4)
        np.testing.assert_allclose(shard.feature, single.feature, atol=1e-4)
        np.testing.assert_allclose(shard.vfeature, single.vfeature,
                                   atol=1e-4)
        np.testing.assert_allclose(shard.depth, single.depth, atol=1e-3)
        np.testing.assert_allclose(shard.weights, single.weights, atol=1e-4)
        assert not bool(shard.overflow)


def test_dp_svgss_train_step_and_sharded_bake():
    """Stage-2 DP step (param + env grads psum'd) and the gaussian-sharded
    radiance bake on the 8-device mesh; bake parity vs single-device."""
    import math
    from svgir_tpu.cameras import look_at_camera
    from svgir_tpu.models import gaussians as G
    from svgir_tpu.models import lights as LT
    from svgir_tpu.models import radiance as RAD
    from svgir_tpu.parallel.dp import (bake_radiance_sharded,
                                       make_dp_svgss_train_step)
    from svgir_tpu.train import optim
    from svgir_tpu.train.trainer import strip_meta
    from svgir_tpu.utils.transforms import normalize

    mesh = make_mesh(8)
    n = 64
    key = jax.random.PRNGKey(3)
    dirs = normalize(jax.random.normal(key, (n, 3)))
    state = G.init_from_points(dirs * 0.8, jnp.full((n, 3), 0.6),
                               normals=dirs, capacity=n,
                               rotation_init="normal")
    state = G.upgrade_to_pbr(state)
    p = dict(state["params"])

    bk = jax.random.PRNGKey(5)
    bake = bake_radiance_sharded(
        mesh, "data", p["xyz"], G.get_scaling(p), G.get_rotation(p),
        G.get_opacity(p)[:, 0], G.get_shs(p), sample_num=8, key=bk)
    ref = RAD.bake_radiance(
        p["xyz"], G.get_scaling(p), G.get_rotation(p),
        G.get_opacity(p)[:, 0], G.get_shs(p), sample_num=8, key=bk,
        use_grid=False, k_hits=8, gauss_chunk=256)
    np.testing.assert_allclose(np.asarray(bake["radiance"]),
                               np.asarray(ref["radiance"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bake["hit_idx"]),
                                  np.asarray(ref["hit_idx"]))

    p["radiances"] = jnp.array(bake["radiance"])
    p["radiance_ratio"] = jnp.ones(())
    state = {**state, "params": p}
    bake_static = {k: v for k, v in bake.items() if k != "exhausted_frac"}

    cams = []
    for i in range(8):
        a = 2 * math.pi * i / 8
        cam = look_at_camera(eye=[3 * math.sin(a), 0.3, -3 * math.cos(a)],
                             target=[0, 0, 0], up=[0, -1, 0],
                             fovx=math.pi / 3, fovy=math.pi / 3,
                             width=32, height=32)
        cams.append(dataclasses.replace(
            strip_meta(cam),
            image=jax.random.uniform(jax.random.PRNGKey(i), (3, 32, 32)),
            image_mask=jnp.ones((1, 32, 32))))
    batch = stack_cameras(cams)

    opt = OptimizationConfig()
    env_state = LT.direct_light_map_init(jax.random.PRNGKey(6), h=8,
                                         light_init=opt.light_init)
    lrs = optim.group_lrs(opt, 1.0, use_pbr=True)
    step = make_dp_svgss_train_step(mesh, opt, CFG, jnp.zeros(3), lrs=lrs)
    opt_state = optim.adam_init(state["params"])
    env0 = env_state["params"]["env"]
    new_state, opt_state, env_state, metrics = step(
        state, opt_state, env_state, bake_static, batch,
        jnp.float32(1), jnp.float32(1e-4), jnp.float32(opt.radiance_lr))
    assert np.isfinite(float(metrics["loss"]))
    # env map trained through the psum'd gradient path
    assert float(jnp.abs(env_state["params"]["env"] - env0).max()) > 0
    assert float(jnp.abs(new_state["params"]["base_color"]
                         - state["params"]["base_color"]).max()) > 0
