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
#
# Real-hardware runs: `SVGIR_TPU_TESTS=1 pytest -m tpu -p no:xdist -n 0`
# keeps the environment's TPU backend and runs only the @pytest.mark.tpu
# smoke tests on the actual chip (serial — the tunnel admits one client).
_ON_TPU = os.environ.get("SVGIR_TPU_TESTS") == "1"

import jax  # noqa: E402

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests spawn
    _flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_collection_modifyitems(config, items):
    import pytest
    if _ON_TPU:
        skip = pytest.mark.skip(reason="SVGIR_TPU_TESTS=1 runs only -m tpu")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(reason="needs real TPU (SVGIR_TPU_TESTS=1)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
