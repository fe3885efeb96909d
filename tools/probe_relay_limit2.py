"""Replicate the staging transfer pattern exactly: 100 x (7.68 MB + 2.56 MB)
sequential synced puts (200 live buffers), then eager + jitted ops."""
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    img = rng.random((3, 800, 800), np.float32)
    mask = np.ones((1, 800, 800), np.float32)
    keep = []
    for i in range(100):
        a = jax.device_put(img)
        b = jax.device_put(mask)
        jax.block_until_ready((a, b))
        keep.append((a, b))
        if (i + 1) % 20 == 0:
            print(f"  {i+1} cams staged", file=sys.stderr, flush=True)
    # the op that failed in the trainer: eager jnp arithmetic
    try:
        v = float(jnp.log(jnp.float32(2.0)) * 3.0)
        print(f"eager op ok: {v:.3f}", file=sys.stderr, flush=True)
    except Exception as exc:
        print(f"EAGER FAILED: {type(exc).__name__}: {exc}",
              file=sys.stderr, flush=True)
    try:
        f = jax.jit(lambda x: (x * 2 + 1).sum())
        print(f"jit op ok: {float(f(jnp.arange(8.0))):.1f}",
              file=sys.stderr, flush=True)
    except Exception as exc:
        print(f"JIT FAILED: {type(exc).__name__}: {exc}",
              file=sys.stderr, flush=True)
    # and a big jitted op touching one staged buffer
    try:
        g = jax.jit(lambda x: x.mean())
        print(f"big jit ok: {float(g(keep[50][0])):.4f}",
              file=sys.stderr, flush=True)
    except Exception as exc:
        print(f"BIG JIT FAILED: {type(exc).__name__}: {exc}",
              file=sys.stderr, flush=True)
    print("done")


if __name__ == "__main__":
    main()
