"""Fused Pallas march kernel (ops/march_pallas.py) vs the XLA visit path:
identical finite hits through the full grid march, and directly at the
single-visit level."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svgir_tpu.ops import grid_tracer as GT
from svgir_tpu.ops import tracing
from svgir_tpu.utils.transforms import normalize


def _scene(n=4000, seed=3, smin=0.005, smax=0.02):
    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    dirs = normalize(jax.random.normal(k[0], (n, 3)))
    pts = dirs * (0.6 + 0.4 * jax.random.uniform(k[1], (n, 1)))
    scales = smin + (smax - smin) * jax.random.uniform(k[2], (n, 3))
    scales = scales.at[:, 2].set(0.0)
    quats = normalize(jax.random.normal(k[3], (n, 4)))
    opac = 0.2 + 0.7 * jax.random.uniform(k[4], (n,))
    geo = tracing.build_surfel_geometry(pts, scales, quats, opac)
    R = 400
    ro = jax.random.normal(k[5], (R, 3)) * 0.05
    rd = normalize(jax.random.normal(jax.random.PRNGKey(9), (R, 3)))
    return geo, ro, rd


@pytest.mark.xfail(
    reason="thin-surfel alpha gate is reassociation noise (see "
           "march_pallas.use_pallas_march docstring): kernel and XLA "
           "evaluation orders disagree near the rim; exact parity needs "
           "the stable -0.5*dis gate in BOTH paths + oracle",
    strict=False)
def test_march_kernel_matches_xla_path(monkeypatch):
    geo, ro, rd = _scene()
    # block_geo layout is a BUILD-time decision: build one grid per path
    monkeypatch.setenv("SVGIR_MARCH_PALLAS", "0")
    grid_c = GT.build_grid_auto(geo)
    assert grid_c.block_geo is not None and not grid_c.field_major
    # most surfels must march through the grid (not the big-surfel pass)
    assert grid_c.big_ids.shape[0] < 200
    h_xla = {k: np.asarray(v) for k, v in GT.nearest_hits_grid(
        geo, grid_c, ro, rd, t_max=4.0, k=16).items()}

    monkeypatch.setenv("SVGIR_MARCH_PALLAS", "1")
    grid_f = GT.build_grid_auto(geo)
    assert grid_f.field_major
    h_ker = {k: np.asarray(v) for k, v in GT.nearest_hits_grid(
        geo, grid_f, ro, rd, t_max=4.0, k=16).items()}

    ft = np.isfinite(h_xla["t"])
    assert ft.sum() > 100            # the scene actually produces hits
    assert np.isfinite(h_ker["t"]).sum() == ft.sum()
    assert ((h_xla["idx"] == h_ker["idx"]) | ~ft).all()
    np.testing.assert_allclose(np.where(ft, h_xla["t"], 0.0),
                               np.where(ft, h_ker["t"], 0.0), atol=1e-5)
    np.testing.assert_allclose(np.where(ft, h_xla["alpha"], 0.0),
                               np.where(ft, h_ker["alpha"], 0.0), atol=1e-5)


def test_march_kernel_single_visit_merge_contract(monkeypatch):
    """march_test_merge == _test_candidates + bitonic merge for one visit,
    including running-hit carry-over and inf/-1 padding."""
    from svgir_tpu.ops.march_pallas import march_test_merge

    monkeypatch.setenv("SVGIR_MARCH_PALLAS", "1")   # field-major build
    geo, ro, rd = _scene(n=1500, seed=5)
    grid = GT.build_grid_auto(geo)
    assert grid.field_major
    blk = GT._TRACE_BLOCK
    r = ro.shape[0]
    # take an arbitrary set of occupied block rows
    rng = np.random.default_rng(0)
    nrows = grid.block_geo.shape[0] - 1
    rows = jnp.asarray(rng.integers(0, max(nrows, 1), r), jnp.int32)
    g = grid.block_geo[rows]
    t_lo = jnp.zeros((r,))
    t_hi = jnp.full((r,), 4.0)
    k = 8
    # seed running hits with a previous visit's output (non-trivial carry)
    ht0 = jnp.full((r, k), jnp.inf)
    hi0 = jnp.full((r, k), -1, jnp.int32)
    ht1, hi1 = march_test_merge(g, ro, rd, t_lo, t_hi, ht0, hi0,
                                blk=blk, k=k, interpret=True)

    # reference: XLA test + bitonic merge on the same rows
    g3 = g.reshape(r, GT._PACK_W, blk).transpose(0, 2, 1)
    cand = GT._test_candidates(geo, None, ro, rd, t_lo, t_hi, geo_rows=g3)
    mt, mi = GT.bitonic_topk_small(
        jnp.concatenate([ht0, cand["t"]], axis=1),
        jnp.concatenate([hi0, jnp.where(cand["ok"], cand["idx"], -1)],
                        axis=1), k)
    ft = np.isfinite(np.asarray(mt))
    assert (np.asarray(hi1) == np.asarray(mi))[ft].all()
    np.testing.assert_allclose(np.asarray(ht1)[ft], np.asarray(mt)[ft],
                               atol=1e-6)
    # dead slots stay inf/-1
    assert (np.asarray(hi1)[~np.isfinite(np.asarray(ht1))] == -1).all()


@pytest.mark.nightly
def test_march_kernel_aot_compiles_for_v5e():
    """Mosaic-compile the kernel for a v5e topology via local libtpu (no
    chips needed) — guards against kernel constructs that interpret mode
    accepts but the TPU compiler rejects."""
    import functools

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-8")
    from jax.experimental import topologies
    from svgir_tpu.ops.march_pallas import march_test_merge
    try:
        topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    except Exception as exc:          # no libtpu in this environment
        pytest.skip(f"no TPU topology support: {exc}")
    mesh = Mesh(np.array(topo.devices[:1]), ("x",))
    R, BLK, K = 4096, 64, 16
    sh = lambda shape, dt: jax.ShapeDtypeStruct(
        shape, dt, sharding=NamedSharding(mesh, P()))
    f = jax.jit(functools.partial(march_test_merge, blk=BLK, k=K,
                                  interpret=False))
    compiled = f.lower(
        sh((R, 32 * BLK), np.float32), sh((R, 3), np.float32),
        sh((R, 3), np.float32), sh((R,), np.float32),
        sh((R,), np.float32), sh((R, K), np.float32),
        sh((R, K), np.int32)).compile()
    assert "tpu_custom_call" in compiled.as_text()
