"""Stage-2 step attribution (VERDICT r5 item 2): where do the ~27 ms over
stage-1 sit?  Times the bench_stage2 step with components ablated by
monkeypatching BEFORE trace (XLA then never sees the ablated component —
its fwd AND bwd cost disappears).  Deltas vs baseline attribute the cost.

Run on the TPU (needs the chip free):  python tools/profile_stage2.py
"""

import sys
import time

import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_step(step_fn, args, batch=10, reps=3):
    out = step_fn(*args)
    jax.block_until_ready(out[-1]["loss"])
    for _ in range(2):
        out = step_fn(*args)
    jax.block_until_ready(out[-1]["loss"])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(batch):
            out = step_fn(*args)
        jax.block_until_ready(out[-1]["loss"])
        times.append((time.perf_counter() - t0) / batch)
    times.sort()
    return times[len(times) // 2]


def main():
    import bench_stage2
    from svgir_tpu.models import lights as LT
    from svgir_tpu.models import radiance as RAD
    from svgir_tpu.utils import losses as L
    from svgir_tpu.ops import shading as SH

    results = {}

    def run(tag):
        step, args = bench_stage2.build()
        ms = time_step(step, args) * 1e3
        results[tag] = ms
        log(f"{tag:>24}: {ms:7.2f} ms/step")
        return ms

    base = run("baseline")

    orig_cons = RAD.radiance_consistency_loss
    RAD.radiance_consistency_loss = \
        lambda *a, **k: jnp.zeros(())
    run("no_consistency")
    RAD.radiance_consistency_loss = orig_cons

    orig_ssim = L.ssim
    L.ssim = lambda a, b, **k: jnp.float32(1.0) + 0.0 * a.mean()
    run("no_ssim")
    L.ssim = orig_ssim

    orig_req4 = SH.rendering_equation4
    def fake_req4(base_color, roughness, normals, viewdirs, radiance,
                  env_direct_light, visibility, incident_dirs,
                  incident_areas, env_radiance=None):
        # same output structure, no BRDF math (diffuse passthrough)
        n, s = radiance.shape[0], radiance.shape[1]
        pbr = base_color * 0.5
        z12 = jnp.zeros((n, 12))
        zs3 = jnp.zeros((n, s, 3))
        extra = {"incident_dirs": incident_dirs, "incident_lights": zs3,
                 "local_incident_lights": zs3,
                 "global_incident_lights": zs3,
                 "incident_visibility": visibility, "diffuse_light": z12,
                 "specular": z12, "direct": z12, "indirect": z12}
        return pbr, extra
    SH.rendering_equation4 = fake_req4
    try:
        run("no_eq4_brdf")
    except Exception as exc:
        log(f"no_eq4_brdf failed: {exc}")
    SH.rendering_equation4 = orig_req4

    orig_dl = LT.direct_light
    orig_dlq = LT.direct_light_qxy
    LT.direct_light = lambda env, d, *a, **k: \
        jnp.ones(d.shape[:-1] + (3,), jnp.float32) * 0.5
    LT.direct_light_qxy = lambda env, qx, qy, *a, **k: \
        jnp.ones(qx.shape + (3,), jnp.float32) * 0.5
    try:
        run("no_env_lookup")
    except Exception as exc:
        log(f"no_env_lookup failed: {exc}")
    LT.direct_light = orig_dl
    LT.direct_light_qxy = orig_dlq

    log("\nattribution (delta vs baseline):")
    for tag, ms in results.items():
        if tag != "baseline":
            log(f"  {tag:>24}: {base - ms:6.2f} ms")
    print(results)


if __name__ == "__main__":
    main()
