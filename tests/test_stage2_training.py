"""Stage-2 training loop smoke + checkpoint/PLY roundtrips."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svgir_tpu.config import OptimizationConfig, RasterConfig
from svgir_tpu.models import gaussians as G
from svgir_tpu.ops.rasterizer import rasterize
from svgir_tpu.train import checkpoint as CK
from svgir_tpu.train.trainer import train_stage2
from svgir_tpu.utils.transforms import normalize


CFG = RasterConfig(max_instances=1 << 14, chunk=128)


def _pbr_state(n=50):
    key = jax.random.PRNGKey(0)
    dirs = normalize(jax.random.normal(key, (n, 3)))
    pts = dirs * 1.0
    state = G.init_from_points(pts, jnp.full((n, 3), 0.6), normals=dirs,
                               capacity=n, rotation_init="normal")
    return G.upgrade_to_pbr(state)


@pytest.mark.slow
def test_stage2_trains():
    import math
    from svgir_tpu.cameras import look_at_camera

    state = _pbr_state()
    p = state["params"]
    bg = jnp.zeros(3)
    cams = []
    for i in range(4):
        a = 2 * math.pi * i / 4
        cam = look_at_camera(eye=[3 * math.sin(a), 0.4, -3 * math.cos(a)],
                             target=[0, 0, 0], up=[0, -1, 0],
                             fovx=math.pi / 3, fovy=math.pi / 3,
                             width=48, height=48)
        img = jnp.clip(rasterize(
            p["xyz"], G.get_scaling(p), G.get_rotation(p),
            G.get_opacity(p)[:, 0], cam, bg, shs=G.get_shs(p),
            cfg=CFG).color, 0, 1)
        cams.append(dataclasses.replace(cam, image=img,
                                        image_mask=jnp.ones((1, 48, 48))))

    opt = OptimizationConfig(lambda_base_color_smooth=0.1,
                             lambda_roughness_smooth=0.05,
                             lambda_env_smooth=0.02)
    state, opt_state, env_state, bake, hist = train_stage2(
        state, cams, opt, bg=(0, 0, 0), raster_cfg=CFG, sample_num=8,
        env_resolution=8, first_iter=0, iterations=40, log_every=10)

    losses = [h["loss"] for h in hist]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert np.isfinite(np.asarray(state["params"]["base_color"])).all()
    assert np.isfinite(np.asarray(env_state["params"]["env"])).all()


def test_checkpoint_roundtrip(tmp_path):
    state = _pbr_state(n=20)
    from svgir_tpu.train import optim
    opt_state = optim.adam_init(state["params"])
    path = os.path.join(tmp_path, "ck.npz")
    CK.save_checkpoint(path, 1234, state, opt_state,
                       env={"params": {"env": jnp.ones((4, 8, 3))}})
    it, tree = CK.load_checkpoint(path)
    assert it == 1234
    np.testing.assert_allclose(tree["state"]["params"]["xyz"],
                               state["params"]["xyz"])
    np.testing.assert_allclose(tree["opt"]["m"]["opacity"],
                               opt_state["m"]["opacity"])
    assert tree["env"]["params"]["env"].shape == (4, 8, 3)


def test_model_ply_roundtrip(tmp_path):
    state = _pbr_state(n=16)
    path = os.path.join(tmp_path, "model.ply")
    CK.save_model_ply(path, state["params"], state["alive"], use_pbr=True)
    loaded = CK.load_model_ply(path, capacity=4096)
    n = 16
    for name in ("xyz", "scaling", "rotation", "opacity", "base_color",
                 "roughness", "shs_dc", "shs_rest"):
        np.testing.assert_allclose(
            np.asarray(loaded["params"][name][:n]),
            np.asarray(state["params"][name][:n]), atol=1e-6,
            err_msg=name)
    assert int(loaded["alive"].sum()) == n
