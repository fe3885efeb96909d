"""Find the axon relay's tolerated device-resident transfer volume.

Sequential synced 32 MB device_puts; after each 128 MB, run a tiny jitted
computation to check the backend still works.  Prints the last good total.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 32 << 20     # 32 MB
CHECK_EVERY = 4      # every 128 MB


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    f = jax.jit(lambda x: (x * 2 + 1).sum())
    keep = []
    host = np.random.default_rng(0).random(CHUNK // 4, np.float32)
    total = 0
    last_good = 0
    for i in range(64):   # up to 2 GB
        try:
            d = jax.device_put(host)
            jax.block_until_ready(d)
            keep.append(d)
            total += CHUNK
            if (i + 1) % CHECK_EVERY == 0:
                v = float(f(jnp.arange(8.0)))
                assert np.isfinite(v)
                last_good = total
                print(f"  ok at {total >> 20} MB", file=sys.stderr, flush=True)
        except Exception as exc:
            print(f"FAILED at {total >> 20} MB resident: "
                  f"{type(exc).__name__}: {exc}", file=sys.stderr, flush=True)
            break
    print(f"last_good_MB={last_good >> 20}")


if __name__ == "__main__":
    main()
