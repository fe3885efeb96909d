"""Radiance-bake wall-clock benchmark (VERDICT item: 50k x 64 < 30 s).

Times ``bake_radiance`` at the stage-2 recipe shape (sample_num 64,
reference script/run_tensoir.sh:39) on whatever backend is active, and a
1M x 64 projection from the per-chunk rate.

Usage: python tools/bench_bake.py [--n 50000] [--samples 64]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--brute", action="store_true")
    ap.add_argument("--ray-chunk", type=int, default=16384)
    ap.add_argument("--merge-every", type=int, default=None)
    args = ap.parse_args()

    from svgir_tpu.models import radiance as RAD
    from svgir_tpu.utils.transforms import normalize

    k = jax.random.split(jax.random.PRNGKey(0), 4)
    dirs = normalize(jax.random.normal(k[0], (args.n, 3)))
    r = 0.7 + 0.3 * jax.random.uniform(k[1], (args.n, 1))
    means = dirs * r
    scales = jnp.concatenate(
        [0.01 + 0.02 * jax.random.uniform(k[2], (args.n, 2)),
         jnp.zeros((args.n, 1))], axis=-1)
    # quats with normal ~ dirs: w=1-ish random
    quats = jax.random.normal(k[3], (args.n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=1, keepdims=True)
    opacity = jnp.full((args.n,), 0.9)
    shs = jnp.zeros((args.n, 16, 3))

    print(f"devices: {jax.devices()}", file=sys.stderr)
    t0 = time.time()
    bake = RAD.bake_radiance(means, scales, quats, opacity, shs,
                             sample_num=args.samples,
                             ray_chunk=args.ray_chunk,
                             merge_every=args.merge_every,
                             use_grid=not args.brute)
    jax.block_until_ready(bake["radiance"])
    t_total = time.time() - t0
    print(f"bake {args.n} x {args.samples} "
          f"({'brute' if args.brute else 'grid'}): {t_total:.1f}s "
          f"(incl. compile)", file=sys.stderr)

    # second run = steady state (cached compile)
    t0 = time.time()
    bake = RAD.bake_radiance(means, scales, quats, opacity, shs,
                             sample_num=args.samples,
                             ray_chunk=args.ray_chunk,
                             merge_every=args.merge_every,
                             use_grid=not args.brute)
    jax.block_until_ready(bake["radiance"])
    t_warm = time.time() - t0
    rays_s = args.n * args.samples / t_warm
    print(f"warm: {t_warm:.1f}s  ({rays_s/1e6:.2f} Mrays/s; "
          f"1M x 64 projection {1e6*64/rays_s:.0f}s)", file=sys.stderr)
    print({"bake_s": round(t_warm, 2), "mrays_s": round(rays_s / 1e6, 2)})


if __name__ == "__main__":
    main()
