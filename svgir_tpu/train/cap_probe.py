"""Snug instance-cap probing for the training CLI.

bench.py sizes ``max_instances`` by probing the scene's actual instance
count (the r2 exp matrix's best configuration); train.py used a fixed
1<<19 default instead — and that exact cap is CATASTROPHIC on TPU: the
same jitted step measured 38.7 ms/iter at cap 327680 and 43.6 at 458752,
but 1115 ms/iter at cap 524288 == 1<<19 (2026-08-20/21, 100k gaussians,
800x800, tools/probe_trainer_gap.py variants) — while the real trainer
at snug cap 872448 runs 95 ms/iter at 228k gaussians.  The pathology is
the POWER-OF-TWO cap value (layout/stride aliasing at exactly 2^19), not
buffer size; snug probing yields non-pow2 caps and sidesteps it, besides
shrinking every instance-sized gather/scatter in the step.  The CUDA
reference sizes its buffers dynamically per frame
(rasterizer_impl.cu:70-111); the TPU analog is: probe snug at start,
grow on overflow (trainer auto-grow).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp


def snug_instance_cap(params, camera_list: List, cfg, *,
                      alive: Optional[jax.Array] = None,
                      n_probe_views: int = 3, headroom: float = 1.3,
                      quantum: int = 2048, probe_cap: int = 1 << 21) -> int:
    """Max instance count over ``n_probe_views`` views, x ``headroom``,
    rounded up to ``quantum``.  The probe bins at a deliberately huge cap
    so the count is exact regardless of tile/chunk padding."""
    from svgir_tpu.models.gaussians import get_rotation, get_scaling
    from svgir_tpu.ops.binning import bin_instances_counting
    from svgir_tpu.ops.preprocess import preprocess

    pcfg = dataclasses.replace(cfg, max_instances=probe_cap)

    def probe(params, cam):
        scaling = get_scaling(params)
        if alive is not None:
            # dead capacity slots hold stale params after pruning; shrink
            # them to zero extent so they bin zero instances
            scaling = jnp.where(alive[:, None], scaling, 1e-10)
        prep = preprocess(
            params["xyz"], scaling, get_rotation(params),
            cam.world_view, cam.full_proj, cam.camera_center,
            width=cam.width, height=cam.height,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            focal_x=cam.focal_x, focal_y=cam.focal_y, cfg=pcfg)
        binned = bin_instances_counting(prep, width=cam.width,
                                        height=cam.height, cfg=pcfg,
                                        rect_cap=pcfg.rect_cap)
        return binned.num_instances, binned.overflow

    jprobe = jax.jit(probe)
    worst = 0
    step = max(1, len(camera_list) // n_probe_views)
    for cam in camera_list[::step][:n_probe_views]:
        # strip image tensors: the probe needs only geometry
        light = dataclasses.replace(cam, image=None, image_mask=None,
                                    depth=None, normal=None, mono=None,
                                    uid=0, image_name="")
        total, overflow = jax.device_get(jprobe(params, light))
        assert not bool(overflow), "probe cap too small"
        worst = max(worst, int(total))
    snug = -(-int(worst * headroom) // quantum) * quantum
    return max(snug, quantum)
