"""Round-3 stage-1 tuning matrix: tile x chunk x strip, one process.

The r2 exp matrix measured snug-cap 18.6 and tile=32 18.2 Mpix/s
separately; this sweeps the COMBINATIONS (snug cap is now the bench
default) plus the chunk=64 point that the wsum slot layout unlocked and
the fatter chunk=256 point.  Each configuration rebuilds the step from
scratch (fresh jit cache entry — RasterConfig is a static arg), so one
process + one axon handshake covers the grid.

Usage: python tools/exp_r3.py [--quick]
"""

import os
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)

sys.path.insert(0, '/root/repo')


def log(*a):
    print(*a, flush=True)


def time_step(step, args, ready, *, batch=10, rounds=3):
    t0 = time.time()
    out = step(*args)
    jax.block_until_ready(ready(out))
    log(f"    compile+first: {time.time()-t0:.1f}s")
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
    log(f"    median {med*1e3:.2f} ms  ({800*800/med/1e6:.2f} Mpix/s)")
    return med


def main():
    quick = "--quick" in sys.argv
    log("devices:", jax.devices())
    import bench

    grid = [
        # (tile, chunk, strip)
        (16, 128, 8),     # current default
        (32, 128, 8),
        (16, 256, 8),
        (32, 256, 8),
        (16, 64, 8),      # unlocked by the wsum slot layout
        (32, 64, 8),
    ]
    if quick:
        grid = grid[:2]

    results = []
    for tile, chunk, strip in grid:
        log(f"== tile={tile} chunk={chunk} strip={strip}")
        os.environ["SVGIR_BENCH_TILE"] = str(tile)
        os.environ["SVGIR_BENCH_CHUNK"] = str(chunk)
        os.environ["SVGIR_BENCH_STRIP"] = str(strip)
        try:
            step, params = bench.build()   # already jitted
            med = time_step(step, (params,), lambda o: o[0])
            results.append((tile, chunk, strip, med))
        except Exception as exc:
            log(f"    FAILED: {type(exc).__name__}: {str(exc)[:300]}")
            results.append((tile, chunk, strip, None))
        finally:
            for k in ("SVGIR_BENCH_TILE", "SVGIR_BENCH_CHUNK",
                      "SVGIR_BENCH_STRIP"):
                os.environ.pop(k, None)

    log("== summary (stage-1 fwd+bwd, snug cap)")
    for tile, chunk, strip, med in results:
        s = "FAILED" if med is None else \
            f"{med*1e3:7.2f} ms  {800*800/med/1e6:5.2f} Mpix/s"
        log(f"  tile={tile:2d} chunk={chunk:3d} strip={strip}: {s}")


if __name__ == "__main__":
    main()
