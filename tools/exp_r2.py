"""Round-2 perf experiment matrix — one process, one axon handshake.

Runs, printing results incrementally (so partial progress survives a
tunnel drop):
  1. stage-1 bench baseline (captures the committed residual-slab win)
  2. stage-1 A/B: blend MXU precision HIGH (bf16_3x)
  3. stage-1 A/B: chunk=256
  4. stage-2 bench (captures the fused vertex matmuls)
  5. stage-1 + stage-2 trace profiles (top ops by self time)

Usage: python tools/exp_r2.py [steps...]   e.g. `python tools/exp_r2.py 1 2 5`
"""

import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)

sys.path.insert(0, '/root/repo')


def log(*a):
    print(*a, flush=True)


def time_step(step, args, batch=10, rounds=5, ready=None):
    if ready is None:
        ready = lambda out: out
    t0 = time.time()
    out = step(*args)
    jax.block_until_ready(ready(out))
    log(f"  compile+first: {time.time()-t0:.1f}s")
    for _ in range(2):
        out = step(*args)
    jax.block_until_ready(ready(out))
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(batch):
            out = step(*args)
        jax.block_until_ready(ready(out))
        times.append((time.perf_counter() - t0) / batch)
    times.sort()
    med = times[len(times) // 2]
    log(f"  median {med*1e3:.2f} ms  ({800*800/med/1e6:.2f} Mpix/s)")
    return med


def stage1_step():
    import bench
    step, params = bench.build()
    return step, (params,), (lambda out: out[0])


def main():
    steps = set(sys.argv[1:]) or {"1", "2", "3", "4", "6", "5"}
    log("devices:", jax.devices())
    import svgir_tpu.ops.blend_pallas as bp

    if "1" in steps:
        log("== 1. stage-1 baseline (chunk=128, HIGHEST)")
        step, args, ready = stage1_step()
        time_step(step, args, ready=ready)

    if "2" in steps:
        log("== 2. stage-1 precision HIGH")
        bp._PRECISION = jax.lax.Precision.HIGH
        step, args, ready = stage1_step()
        time_step(step, args, ready=ready)
        bp._PRECISION = jax.lax.Precision.HIGHEST

    if "3" in steps:
        # chunk trades per-tile padding (VPU work scales with padded total)
        # against loop iterations (padded/chunk) — resolve empirically
        import os
        for ch in ("256", "64"):
            log(f"== 3. stage-1 chunk={ch} (HIGHEST)")
            os.environ["SVGIR_BENCH_CHUNK"] = ch
            step, args, ready = stage1_step()
            time_step(step, args, ready=ready)
        del os.environ["SVGIR_BENCH_CHUNK"]

    if "4" in steps:
        log("== 4. stage-2 (fused vertex matmuls)")
        import bench_stage2
        s2, a2 = bench_stage2.build()
        time_step(s2, a2, rounds=3, ready=lambda out: out[-1]["loss"])

    if "6" in steps:
        log("== 6. env-lookup microbench (1.2M queries, fwd+bwd)")
        import jax.numpy as jnp
        from svgir_tpu.models import lights as LT
        k = jax.random.split(jax.random.PRNGKey(0), 2)
        env_state = LT.direct_light_map_init(k[0], h=32, light_init=3.0)
        dirs = jax.random.normal(k[1], (50_000, 24, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        def f(p):
            return jnp.sum(LT.direct_light(p, dirs) ** 2)

        stepe = jax.jit(jax.value_and_grad(f))
        time_step(stepe, (env_state["params"],),
                  ready=lambda out: out[0])

    if "5" in steps:
        log("== 5. trace profiles")
        import subprocess
        # profiles need their own process for a clean trace; reuse of this
        # process's compile cache makes them cheap
        for extra in ([], ["--stage2"]):
            log("  profile", extra or ["stage1"])
            r = subprocess.run(
                [sys.executable, "/root/repo/tools/profile_step.py"] + extra,
                capture_output=True, text=True, timeout=2400)
            log(r.stdout[-4000:])
            if r.returncode:
                log("  profile failed:", r.stderr[-1500:])


if __name__ == "__main__":
    main()
