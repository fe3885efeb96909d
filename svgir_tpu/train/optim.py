"""Per-group Adam matching the reference optimizer semantics.

torch.optim.Adam(eps=1e-15) with named parameter groups and per-group
learning rates (gaussian_model.py:737-773), the exponential xyz schedule
(general_utils.py:30-63), and NaN-gradient scrubbing
(replace_nangrad_to_zero, gaussian_model.py:775-795).

Functional: state is a pytree {m, v, step}; densification surgery indexes
into m/v directly (the optimizer-state surgery of
gaussian_model.py:1005-1088).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from svgir_tpu.config import OptimizationConfig

BETA1, BETA2, EPS = 0.9, 0.999, 1e-15

# NaN gradients are replaced per group (gaussian_model.py:775-795):
# 1e-6 for scaling/rotation/roughness, 0 elsewhere.
_NAN_FILL = {"scaling": 1e-6, "rotation": 1e-6, "roughness": 1e-6}


def group_lrs(opt: OptimizationConfig, spatial_lr_scale: float,
              use_pbr: bool) -> Dict[str, float]:
    """Static per-group LRs (xyz is overridden per step by the schedule)."""
    lrs = {
        "xyz": opt.position_lr_init * spatial_lr_scale,
        "normal": opt.normal_lr,
        "rotation": opt.rotation_lr,
        "scaling": opt.scaling_lr,
        "opacity": opt.opacity_lr,
        "shs_dc": opt.sh_lr,
        "shs_rest": opt.sh_lr / 20.0,
    }
    if use_pbr:
        light_rest = opt.light_rest_lr if opt.light_rest_lr >= 0 \
            else opt.light_lr / 20.0
        vis_rest = opt.visibility_rest_lr if opt.visibility_rest_lr >= 0 \
            else opt.visibility_lr / 20.0
        lrs.update({
            "base_color": opt.base_color_lr,
            "roughness": opt.roughness_lr,
            "incidents_dc": opt.light_lr,
            "incidents_rest": light_rest,
            "visibility_dc": opt.visibility_lr,
            "visibility_rest": vis_rest,
            "radiances": opt.radiance_lr,
            "radiance_ratio": opt.radiance_ratio_lr,
        })
    return lrs


def adam_init(params: Dict[str, jax.Array]) -> Dict:
    zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
    return {"m": zeros,
            "v": {k: jnp.zeros_like(v) for k, v in params.items()},
            "step": jnp.zeros((), jnp.int32)}


def adam_step(params: Dict[str, jax.Array], grads: Dict[str, jax.Array],
              state: Dict, lrs: Dict[str, jax.Array]) -> tuple[Dict, Dict]:
    """One Adam step with NaN scrubbing.  ``lrs`` values may be traced
    (the xyz schedule feeds one in per iteration)."""
    step = state["step"] + 1
    bc1 = 1.0 - BETA1 ** step.astype(jnp.float32)
    bc2 = 1.0 - BETA2 ** step.astype(jnp.float32)
    new_params, new_m, new_v = {}, {}, {}
    for k, p in params.items():
        g = grads.get(k)
        if g is None:
            new_params[k], new_m[k], new_v[k] = p, state["m"][k], state["v"][k]
            continue
        g = jnp.nan_to_num(g, nan=_NAN_FILL.get(k, 0.0), posinf=0.0,
                           neginf=0.0)
        m = BETA1 * state["m"][k] + (1 - BETA1) * g
        v = BETA2 * state["v"][k] + (1 - BETA2) * g * g
        m_hat = m / bc1
        v_hat = v / bc2
        new_params[k] = p - lrs[k] * m_hat / (jnp.sqrt(v_hat) + EPS)
        new_m[k], new_v[k] = m, v
    return new_params, {"m": new_m, "v": new_v, "step": step}
