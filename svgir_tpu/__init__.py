"""svgir_tpu — a TPU-native inverse-rendering framework.

A from-scratch JAX/Pallas re-design of the capabilities of SVG-IR
(Spatially-Varying Gaussian Splatting for Inverse Rendering): differentiable
2D Gaussian-surfel rasterization with per-vertex spatially-varying BRDF
attributes, physically-based per-surfel shading, ray-traced visibility /
one-bounce indirect radiance, and two-stage training — built TPU-first:

* compute path: jax / XLA / Pallas kernels (MXU matmul formulation of
  alpha compositing, sort+segment binning, no atomics);
* scale-out: ``jax.sharding`` meshes + ``shard_map`` collectives;
* runtime helpers (PLY codec, morton/radix host utilities): C++.

The public rendering API mirrors the reference's render-function layer
(``render_fn_dict`` in ``gaussian_renderer/__init__.py``): pure functions from
(camera, model params, light, config) -> dict of rendered buffers + loss.
"""

__version__ = "0.1.0"

from svgir_tpu.config import (  # noqa: F401
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
)
