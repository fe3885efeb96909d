"""Grid tracer == brute-force tracer (SURVEY §7 P4 acceptance)."""

import jax
import jax.numpy as jnp
import numpy as np

from svgir_tpu.ops import grid_tracer, tracing
from svgir_tpu.utils.transforms import normal_to_rotation, normalize


def _scene(n=300, radius=0.5, scale=0.08):
    key = jax.random.PRNGKey(0)
    dirs = normalize(jax.random.normal(key, (n, 3)))
    means = dirs * radius
    quats = normal_to_rotation(-dirs)
    scales = jnp.full((n, 3), scale).at[:, 2].set(1e-9)
    opac = jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=0.3,
                              maxval=0.9)
    return tracing.build_surfel_geometry(means, scales, quats, opac)


def test_grid_matches_brute():
    geo = _scene()
    res = grid_tracer.auto_res(geo)
    grid = grid_tracer.build_grid(geo, res=res, cell_cap=128,
                                  max_cells_per_gauss=128)
    assert not bool(grid.overflow)

    ro = 0.02 * jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    rd = normalize(jax.random.normal(jax.random.PRNGKey(3), (64, 3)))

    hb = tracing.nearest_hits(geo, ro, rd, k=8)
    hg = grid_tracer.nearest_hits_grid(geo, grid, ro, rd, t_max=2.0, k=8)
    tb, tg = np.asarray(hb["t"]), np.asarray(hg["t"])
    ib, ig = np.asarray(hb["idx"]), np.asarray(hg["idx"])
    for r in range(64):
        fb = tb[r][np.isfinite(tb[r])]
        fg = tg[r][np.isfinite(tg[r])]
        assert len(fb) == len(fg)
        np.testing.assert_allclose(fb, fg, atol=1e-5)
        assert (ib[r][:len(fb)] == ig[r][:len(fg)]).all()

    vb = tracing.trace_visibility(geo, ro + 0.05 * rd, rd)
    vg = grid_tracer.trace_visibility_grid(geo, grid, ro + 0.05 * rd, rd,
                                           n_steps=4 * res)
    np.testing.assert_allclose(vg["visibility"], vb["visibility"], atol=1e-5)


def test_cell_cap_auto_grow():
    """build_grid_auto doubles the candidate cap until nothing overflows."""
    geo = _scene(n=400)
    res = grid_tracer.auto_res(geo)
    small = grid_tracer.build_grid(geo, res=res, cell_cap=2,
                                   max_cells_per_gauss=128)
    assert bool(small.overflow)
    grown = grid_tracer.build_grid_auto(geo, res=res, cell_cap=2,
                                        max_cells_per_gauss=128)
    assert not bool(grown.overflow)
    assert grown.cell_cap > 2


def test_full_bake_grid_matches_brute():
    """bake_radiance with the grid tracer == brute force on the same scene
    (radiance, visibility, first hits, uvs) — the VERDICT r1 #4 acceptance
    for making the grid path the production default."""
    from svgir_tpu.models.radiance import bake_radiance
    from svgir_tpu.utils.transforms import normal_to_rotation

    n, s = 200, 8
    key = jax.random.PRNGKey(5)
    dirs = normalize(jax.random.normal(key, (n, 3)))
    means = dirs * 0.5
    quats = normal_to_rotation(-dirs)
    scales = jnp.full((n, 3), 0.08).at[:, 2].set(1e-9)
    opac = jax.random.uniform(jax.random.PRNGKey(6), (n,), minval=0.3,
                              maxval=0.9)
    shs = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (n, 16, 3))

    kw = dict(sample_num=s, key=jax.random.PRNGKey(8), k_hits=8,
              ray_chunk=512)
    brute = bake_radiance(means, scales, quats, opac, shs, use_grid=False,
                          **kw)
    grid = bake_radiance(means, scales, quats, opac, shs, use_grid=True,
                         **kw)
    np.testing.assert_array_equal(np.asarray(brute["hit_idx"]),
                                  np.asarray(grid["hit_idx"]))
    np.testing.assert_allclose(np.asarray(grid["radiance"]),
                               np.asarray(brute["radiance"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grid["visibility"]),
                               np.asarray(brute["visibility"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grid["uv"]),
                               np.asarray(brute["uv"]), atol=1e-5)


def test_mixed_scale_scene_uses_big_partition():
    """Large surfels whose AABB spans many cells go to the dense
    once-per-ray big partition instead of having their cell coverage
    silently clipped — hits must still match brute force exactly.  Pre-r3
    the single-level ``max_cells_per_gauss`` dropped far cells of big
    surfels (missed hits, no signal)."""
    n = 300
    key = jax.random.PRNGKey(0)
    dirs = normalize(jax.random.normal(key, (n, 3)))
    means = dirs * 0.5
    quats = normal_to_rotation(-dirs)
    # small surfels + 6 big ones + 1 giant (spans most of the scene)
    scale = jnp.full((n,), 0.01).at[:6].set(0.22).at[6].set(0.8)
    scales = jnp.stack([scale, scale, jnp.full((n,), 1e-9)], axis=1)
    opac = jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=0.3,
                              maxval=0.9)
    geo = tracing.build_surfel_geometry(means, scales, quats, opac)

    res = 64   # fine cells are tiny vs the big surfels
    grid = grid_tracer.build_grid_auto(geo, res=res)
    assert not bool(grid.overflow)
    assert grid.big_ids.shape[0] >= 7, "the 7 large surfels should be big"

    ro = 0.02 * jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    rd = normalize(jax.random.normal(jax.random.PRNGKey(3), (64, 3)))
    hb = tracing.nearest_hits(geo, ro, rd, k=8)
    hg = grid_tracer.nearest_hits_grid(geo, grid, ro, rd, t_max=3.0, k=8)
    tb, tg = np.asarray(hb["t"]), np.asarray(hg["t"])
    ib, ig = np.asarray(hb["idx"]), np.asarray(hg["idx"])
    for r in range(64):
        fb = tb[r][np.isfinite(tb[r])]
        fg = tg[r][np.isfinite(tg[r])]
        assert len(fb) == len(fg), f"ray {r}: {len(fb)} vs {len(fg)} hits"
        np.testing.assert_allclose(fb, fg, atol=1e-5)
        assert (ib[r][:len(fb)] == ig[r][:len(fg)]).all()


def test_bitonic_topk_matches_lax_topk():
    """The static merge network == lax.top_k on distinct finite keys, for
    every width class the march uses (k+me*blk and the big-pass width)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from svgir_tpu.ops.grid_tracer import bitonic_topk_small

    key = jax.random.PRNGKey(0)
    for w in (48, 144, 272, 64):
        key, k1 = jax.random.split(key)
        t = jax.random.permutation(
            k1, jnp.arange(37 * w, dtype=jnp.float32).reshape(37, w),
            axis=1, independent=True)
        # sprinkle inf "no hit" slots
        t = jnp.where(t % 7 == 3, jnp.inf, t)
        idx = t.astype(jnp.int32)
        bt, bi = bitonic_topk_small(t, idx, 16)
        neg, sel = jax.lax.top_k(-t, 16)
        rt = -neg
        ri = jnp.take_along_axis(idx, sel, axis=1)
        np.testing.assert_array_equal(np.asarray(bt), np.asarray(rt))
        fin = np.isfinite(np.asarray(rt))
        np.testing.assert_array_equal(np.asarray(bi)[fin],
                                      np.asarray(ri)[fin])
