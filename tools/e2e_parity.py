"""Run the stand-in end-to-end parity harness at a chosen scale and print
the metric JSON (BASELINE.md parity rows).

  python tools/e2e_parity.py              # small (CPU-friendly)
  python tools/e2e_parity.py --big        # TPU scale (densify to ~100k)
"""

import argparse
import json
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true")
    ap.add_argument("--medium", action="store_true",
                    help="CPU-feasible (~8 min): 1000-surfel GT, 12 views, "
                         "64px, 600+250 iters; measured 16.7/17.7/18.2 dB")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from svgir_tpu.config import RasterConfig
    from svgir_tpu.eval.standin import run_standin_parity

    t0 = time.time()
    if args.big:
        out = run_standin_parity(
            n_gt=20_000, n_views=24, res=400, sample_num=24,
            stage1_iters=3000, stage2_iters=800, init_points=5_000,
            capacity=131_072,
            cfg=RasterConfig(max_instances=1 << 19))
    elif args.medium:
        out = run_standin_parity(n_gt=1000, n_views=12, res=64,
                                 sample_num=12, stage1_iters=600,
                                 stage2_iters=250, init_points=400,
                                 capacity=4096,
                                 cfg=RasterConfig(max_instances=1 << 14))
    else:
        out = run_standin_parity(n_gt=250, n_views=8, res=40, sample_num=8,
                                 stage1_iters=200, stage2_iters=100,
                                 init_points=120, capacity=512)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
