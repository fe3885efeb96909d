"""K-nearest-neighbor queries (TPU-native replacements for the CUDA
simple-knn ``distCUDA2`` and custom-knn ``topKdistCUDA2`` extensions).

Chunked brute-force: distance tiles [chunk, N] are MXU-friendly
(-2 x.y^T + |x|^2 + |y|^2) and exact, which is all the reference's two uses
need (scale init at ~1e5 points; top-8 regularizer).  A Morton-bucketed
culling grid can replace this for multi-million-point scenes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _chunk_topk(chunk_pts, all_pts, k, self_offset, n_valid):
    """Smallest-k squared distances from chunk_pts to all_pts (excluding
    self, masking padded points)."""
    d2 = (jnp.sum(chunk_pts**2, -1, keepdims=True)
          - 2.0 * chunk_pts @ all_pts.T
          + jnp.sum(all_pts**2, -1)[None, :])                   # [C, N]
    n = all_pts.shape[0]
    cols = jnp.arange(n)[None, :]
    rows = jnp.arange(chunk_pts.shape[0])[:, None] + self_offset
    invalid = (cols == rows) | (cols >= n_valid)
    d2 = jnp.where(invalid, jnp.inf, d2)
    neg_top, idx = jax.lax.top_k(-d2, k)
    return -neg_top, idx


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(points: jax.Array, k: int = 8, *, n_valid=None,
        chunk: int = 1024) -> tuple[jax.Array, jax.Array]:
    """Exact top-k nearest neighbors.  Returns (sq_dists [N,k], idx [N,k]).

    Equivalent of custom-knn ``topKdistCUDA2`` (gaussian_model.py:577-592).
    ``n_valid``: treat rows >= n_valid as padding (excluded as neighbors).
    """
    n = points.shape[0]
    if n_valid is None:
        n_valid = n
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))

    def body(_, i):
        cp = jax.lax.dynamic_slice_in_dim(pts, i * chunk, chunk)
        return None, _chunk_topk(cp, points, k, i * chunk, n_valid)

    _, (d2, idx) = jax.lax.scan(body, None, jnp.arange(pts.shape[0] // chunk))
    d2 = d2.reshape(-1, k)[:n]
    idx = idx.reshape(-1, k)[:n]
    return d2, idx


def mean_sq_dist_3nn(points: jax.Array, n_valid=None) -> jax.Array:
    """Mean squared distance to the 3 nearest neighbors — the simple-knn
    ``distCUDA2`` contract (spatial.cu:15; used for log-scale init at
    gaussian_model.py:706-707)."""
    d2, _ = knn(points, k=3, n_valid=n_valid)
    return jnp.where(jnp.isfinite(d2), d2, 0.0).mean(axis=1)
