"""Quick stage-2 step timer for A/B debugging (few steps, coarse medians).

The full bench harness times 50+ steps; at the pathological ~10 s/step
measured on 2026-08-18 that is 9 minutes per configuration.  This script
times 2 warmup + 2x4 pipelined steps — coarse, but enough to tell 175 ms
from 10 s.  Usage: [env knobs] python tools/bench_s2_quick.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)


def main():
    import os
    print("devices:", jax.devices(), flush=True)
    knobs = {k: v for k, v in os.environ.items() if k.startswith("SVGIR_")}
    print("knobs:", knobs, flush=True)
    import bench_stage2
    step, args = bench_stage2.build()
    t0 = time.time()
    out = step(*args)
    jax.block_until_ready(out[-1]["loss"])
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    out = step(*args)
    jax.block_until_ready(out[-1]["loss"])
    for r in range(2):
        t0 = time.perf_counter()
        for _ in range(4):
            out = step(*args)
        jax.block_until_ready(out[-1]["loss"])
        dt = (time.perf_counter() - t0) / 4
        print(f"round {r}: {dt*1e3:.2f} ms/step "
              f"({800*800/dt/1e6:.2f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main()
