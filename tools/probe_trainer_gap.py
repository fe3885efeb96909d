"""Measure the trainer-vs-bench per-iter gap (VERDICT r4 weakness 1).

Hypothesis: the ~25x gap is per-step host->device upload of the camera's
image-plane tensors (host-resident numpy by make_camera policy) through the
axon relay.  Times the SAME jitted stage-1 train step three ways:

  A. device-resident camera, same object every step      (bench.py's shape)
  B. host-numpy camera tensors, new object every step    (trainer's shape)
  C. device-resident cameras, cycling among 8 objects    (bank-style target)
"""

import dataclasses
import math
import sys
import time

import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)
import jax.numpy as jnp
import numpy as np

from svgir_tpu.config import OptimizationConfig, RasterConfig
from svgir_tpu.models import gaussians as G
from svgir_tpu.cameras import look_at_camera
from svgir_tpu.train.trainer import make_train_step
from svgir_tpu.utils.transforms import normalize
from svgir_tpu.train import optim

RES = 800
N = 100_000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log("devices:", jax.devices())
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    dirs = normalize(jax.random.normal(k[0], (N, 3)))
    pts = dirs * (0.7 + 0.3 * jax.random.uniform(k[1], (N, 1)))
    cols = jax.random.uniform(k[2], (N, 3))
    state = G.init_from_points(pts, cols, normals=dirs, capacity=N,
                               rotation_init="normal")
    opt = OptimizationConfig()
    cfg = RasterConfig(max_instances=10 << 15)
    opt_state = optim.adam_init(state["params"])

    base = look_at_camera(eye=[0.5, 0.4, -2.6], target=[0, 0, 0],
                          up=[0, -1, 0], fovx=math.pi / 3, fovy=math.pi / 3,
                          width=RES, height=RES)
    rng = np.random.default_rng(0)
    imgs = [rng.random((3, RES, RES), dtype=np.float32) for _ in range(8)]
    mask = np.ones((1, RES, RES), np.float32)

    lrs = optim.group_lrs(opt, 1.0, False)
    step = make_train_step(opt, cfg, jnp.zeros(3), donate=False, lrs=lrs)

    def run(name, cam_for_it, n_iter=30):
        st, ost = state, opt_state
        # warmup/compile
        s2, o2, tb = step(st, ost, cam_for_it(0), jnp.float32(1.0),
                          jnp.float32(1e-4))
        jax.block_until_ready(tb["loss"])
        t0 = time.perf_counter()
        for i in range(n_iter):
            s2, o2, tb = step(st, ost, cam_for_it(i), jnp.float32(1.0),
                              jnp.float32(1e-4))
        jax.block_until_ready(tb["loss"])
        dt = (time.perf_counter() - t0) / n_iter
        log(f"{name}: {dt*1e3:.1f} ms/iter")
        return dt

    # A: one device-resident camera
    cam_dev = dataclasses.replace(base, image=jnp.asarray(imgs[0]),
                                  image_mask=jnp.asarray(mask))
    jax.block_until_ready(cam_dev.image)
    run("A device-resident, single cam ", lambda i: cam_dev)

    # B: host-numpy camera tensors, fresh object per step (trainer today)
    host_cams = [dataclasses.replace(base, image=im, image_mask=mask)
                 for im in imgs]
    run("B host-numpy, cycling 8 cams  ", lambda i: host_cams[i % 8])

    # C: device-resident, cycling 8 distinct camera objects
    dev_cams = [dataclasses.replace(base, image=jnp.asarray(im),
                                    image_mask=jnp.asarray(mask))
                for im in imgs]
    jax.block_until_ready([c.image for c in dev_cams])
    run("C device-resident, cycling 8  ", lambda i: dev_cams[i % 8])


if __name__ == "__main__":
    main()
