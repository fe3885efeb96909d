"""Test configuration: run everything on a virtual 8-device CPU mesh.

Per SURVEY.md §4: multi-host/sharding tests use
``--xla_force_host_platform_device_count=8`` so sharded == single-device
checks run without TPU hardware.  Must set env before importing jax.
"""

import os

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must run
# on the local CPU backend with a virtual 8-device mesh.  NOTE: the image's
# sitecustomize imports jax at interpreter start (before this file runs), so
# setting os.environ alone is too late — the jax config snapshot already
# holds "axon".  jax.config.update after import is authoritative as long as
# no backend has been initialized yet, which holds at conftest time.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests spawn
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
