import time, sys
t0 = time.time()
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
d = jax.devices()
print(f"devices={d} init_s={time.time()-t0:.1f}", flush=True)
import jax.numpy as jnp
x = jnp.ones((256, 256))
y = (x @ x).block_until_ready()
print(f"matmul ok sum={float(y.sum())} total_s={time.time()-t0:.1f}", flush=True)
