"""Gaussian-sharded + tile-sharded rasterization (the TP/SP analog).

SURVEY.md §2.3 plan: shard the N-gaussian axis for preprocess/shading
("model parallel"), exchange splats to tile owners, shard the tile grid for
blending ("spatial parallel").  Realized TPU-natively as one ``shard_map``:

  1. each device preprocesses its gaussian shard (embarrassingly parallel);
  2. ``all_gather`` the compacted per-gaussian blend payload over ICI
     (the sorted-key all-to-all of the CUDA plan collapses to one gather
     because every device re-bins only the rects overlapping ITS tile rows);
  3. each device translates screen space so its tile-row slice starts at
     y=0 — the depth-affine channels are translation-invariant by
     construction — then bins + blends its rows with the standard
     single-device kernels;
  4. the image comes out row-sharded; gradients flow through the collective
     transposes automatically (all_gather^T = psum + slice), so the same
     jitted value_and_grad covers multi-chip training with parameter
     gradients reduced over ICI.

Load balance (SURVEY §7 hard part 5): tile rows can be split equal-area
(default) or instance-count-balanced — ``balanced_row_starts`` probes the
per-tile-row instance histogram (a difference-array over the projected
rects, no binning) and chooses contiguous uneven row bands with ~equal
instance counts; ``rasterize_sharded(row_starts=...)`` consumes them (the
per-device tile grid is padded to the widest band — SPMD needs one static
shape — and ``instance_stats`` reports the realized per-device counts).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from svgir_tpu.config import RasterConfig
from svgir_tpu.ops import blend_pallas, common
from svgir_tpu.ops.binning import bin_instances_counting
from svgir_tpu.ops.preprocess import Preprocessed, preprocess
from svgir_tpu.ops.rasterizer import _make_blend_gather, _pack_slab


def row_instance_histogram(means3d, scales, quats, opacity, camera, *,
                           mask=None, cfg: RasterConfig = RasterConfig()):
    """[grid_y] instances per tile row (each projected rect contributes its
    x-width to every row it spans) via a difference array — no binning.
    Host-side probe for ``balanced_row_starts``."""
    width, height = camera.width, camera.height
    tile = cfg.tile
    grid_y = -(-height // tile)
    prep = preprocess(means3d, scales, quats, camera.world_view,
                      camera.full_proj, camera.camera_center,
                      width=width, height=height, tanfovx=camera.tanfovx,
                      tanfovy=camera.tanfovy, focal_x=camera.focal_x,
                      focal_y=camera.focal_y, cfg=cfg)
    valid = prep.valid if mask is None else (prep.valid & mask)
    w = jnp.where(valid, (prep.rect_max[:, 0] - prep.rect_min[:, 0])
                  .astype(jnp.int32), 0)
    lo = jnp.clip(prep.rect_min[:, 1], 0, grid_y)
    hi = jnp.clip(prep.rect_max[:, 1], 0, grid_y)
    diff = (jnp.zeros((grid_y + 1,), jnp.int32).at[lo].add(w)
            .at[hi].add(-w))
    return jnp.cumsum(diff)[:grid_y]


def balanced_row_starts(hist, ndev: int) -> tuple:
    """Contiguous instance-balanced row partition: D+1 CONCRETE boundaries
    (a static tuple — the partition is a setup-time decision; re-deriving
    it recompiles, which callers do at densify cadence, not per step).

    Exact min-max DP over contiguous blocks (each >= 1 row): minimizes the
    heaviest device's instance count, the quantity ``instance_stats``
    reports.  The r4 quantile-cut heuristic could land a heavy row just
    past a cut and overload one device (measured 1.342 vs the DP's optimum
    on the 100k/800px skewed scene, tools/multichip_at_scale.py); the DP
    cost is O(ndev * grid_y^2) on tiny arrays — microseconds."""
    import numpy as np
    h = np.asarray(jax.device_get(hist)).astype(np.int64)
    if len(h) < ndev:        # fewer rows than devices: pad with empty rows
        h = np.pad(h, (0, ndev - len(h)))
    grid_y = len(h)
    c = np.concatenate([[0], np.cumsum(h)])
    INF = np.iinfo(np.int64).max
    # dp[d][i]: min over partitions of rows[0:i] into d blocks of the max
    # block load; block d covers rows[j:i], j ranges over [d-1, i-1]
    dp = np.full((ndev + 1, grid_y + 1), INF)
    cut = np.zeros((ndev + 1, grid_y + 1), np.int64)
    dp[1, 1:] = c[1:]
    for d in range(2, ndev + 1):
        for i in range(d, grid_y - (ndev - d) + 1):
            js = np.arange(d - 1, i)
            cand = np.maximum(dp[d - 1, js], c[i] - c[js])
            k = int(np.argmin(cand))
            dp[d, i] = cand[k]
            cut[d, i] = js[k]
    starts = [grid_y]
    i = grid_y
    for d in range(ndev, 1, -1):
        i = int(cut[d, i])
        starts.append(i)
    starts.append(0)
    return tuple(reversed(starts))


def instance_stats(means3d, scales, quats, opacity, camera, row_starts, *,
                   mask=None, cfg: RasterConfig = RasterConfig()) -> dict:
    """Per-device instance counts for a row partition: the load-balance
    report SURVEY §7 hard part 5 calls for (max/mean imbalance)."""
    import numpy as np
    hist = np.asarray(jax.device_get(row_instance_histogram(
        means3d, scales, quats, opacity, camera, mask=mask, cfg=cfg)))
    counts = [int(hist[row_starts[d]:row_starts[d + 1]].sum())
              for d in range(len(row_starts) - 1)]
    mean = max(float(np.mean(counts)), 1e-9)
    return {"per_device": counts, "max": int(np.max(counts)),
            "mean": mean, "imbalance": float(np.max(counts) / mean)}


def rasterize_sharded(mesh: Mesh, axis: str, means3d, scales, quats, opacity,
                      camera, bg, *, shs=None, sh_degree=3, colors=None,
                      features=None, vfeatures=None, mask=None,
                      cfg: RasterConfig = RasterConfig(),
                      exchange_cap: Optional[int] = None,
                      row_starts: Optional[tuple] = None,
                      interpret: Optional[bool] = None):
    """Multi-device rasterization: gaussian-sharded preprocess, tile-row-
    sharded blend.  Returns the same buffer dict as ``rasterize`` with
    full-image outputs (already reassembled).

    The N axis must divide the mesh; the image height is padded so the tile
    rows divide evenly.

    ``exchange_cap``: when set, the blend payload moves by a budgeted
    all-to-all — each source compacts only the splats whose rects overlap
    each destination's tile rows into a fixed [cap, KR] buffer — instead of
    all-gathering the full [N, KR] slab (O(N) per-device memory + ICI
    traffic, VERDICT r1 #9).  Per-device traffic drops from N*KR to
    D*cap*KR; budget overflow is flagged in ``RenderBuffers.overflow``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ndev = mesh.devices.size
    width, height = camera.width, camera.height
    tile = cfg.tile
    grid_x = -(-width // tile)
    if row_starts is None:
        grid_y_total = -(-height // tile)
        grid_y_total = -(-grid_y_total // ndev) * ndev  # rows divide devices
        rows_per_dev = grid_y_total // ndev
        row_starts = tuple(d * rows_per_dev for d in range(ndev + 1))
    else:
        # balanced_row_starts pads the grid to >= 1 row per device
        grid_y_total = max(-(-height // tile), ndev)
        if (len(row_starts) != ndev + 1 or row_starts[0] != 0
                or row_starts[-1] != grid_y_total):
            raise ValueError(
                f"row_starts must be {ndev + 1} boundaries covering "
                f"[0, {grid_y_total}]; got {row_starts}")
    bands = tuple(row_starts[d + 1] - row_starts[d] for d in range(ndev))
    if min(bands) < 1:
        raise ValueError(f"empty tile-row band in {row_starts}")
    # SPMD needs one static per-device grid: pad every band to the widest
    rows_per_dev = max(bands)
    y0_tab = jnp.asarray(row_starts[:-1], jnp.int32)       # [D] first row
    band_tab = jnp.asarray(bands, jnp.int32)               # [D] band height
    num_tiles_local = grid_x * rows_per_dev
    # every tile's count is chunk-padded by the binner, so the local slab
    # must hold at least one chunk per tile (bites when uneven bands pad
    # the per-device grid wider than grid_y_total/ndev)
    m_local = max(cfg.max_instances // ndev, num_tiles_local * cfg.chunk)
    cfg_local = dataclasses.replace(cfg, max_instances=m_local)

    n = means3d.shape[0]
    kw = dict(width=width, height=height, tanfovx=camera.tanfovx,
              tanfovy=camera.tanfovy, focal_x=camera.focal_x,
              focal_y=camera.focal_y, sh_degree=sh_degree,
              cfg=cfg)

    def _local_prep(means_l, scales_l, quats_l, opac_l, shs_l, colors_l,
                    feat_l, vfeat_l, mask_l):
        prep = preprocess(means_l, scales_l, quats_l, camera.world_view,
                          camera.full_proj, camera.camera_center,
                          shs=shs_l, colors=colors_l, **kw)
        if mask_l is not None:
            valid = prep.valid & mask_l
            prep = prep._replace(
                valid=valid, radius=jnp.where(valid, prep.radius, 0),
                tiles_touched=jnp.where(valid, prep.tiles_touched, 0))
        slab_l, ca, cv = _pack_slab(prep, opac_l, feat_l, vfeat_l, cfg)
        return prep, slab_l, ca, cv

    def _blend_rows(slab, depth, valid, rect_min, rect_max, n_rows, ca, cv,
                    overflow_in):
        """Bin + blend ``n_rows`` candidate splats against this device's
        tile rows (slab already y-translated)."""
        idx = jax.lax.axis_index(axis)
        y0 = y0_tab[idx]
        band = band_tab[idx]                 # rows this device actually owns
        rmin_y = jnp.clip(rect_min[:, 1] - y0, 0, band)
        rmax_y = jnp.clip(rect_max[:, 1] - y0, 0, band)
        touched = (rect_max[:, 0] - rect_min[:, 0]) * (rmax_y - rmin_y)
        valid_loc = valid & (touched > 0)

        prep_view = Preprocessed(
            valid=valid_loc, mean2d=jnp.zeros((n_rows, 2)), depth=depth,
            conic=jnp.zeros((n_rows, 3)),
            radius=jnp.zeros((n_rows,), jnp.int32),
            rect_min=jnp.stack([rect_min[:, 0], rmin_y], -1),
            rect_max=jnp.stack([rect_max[:, 0], rmax_y], -1),
            tiles_touched=jnp.where(valid_loc, touched, 0),
            normal_view=jnp.zeros((n_rows, 3)), jinv=jnp.zeros((n_rows, 10)),
            lam=jnp.zeros((n_rows, 2)), rgb=jnp.zeros((n_rows, 3)),
            view_cos=jnp.zeros((n_rows,)))
        padded = bin_instances_counting(
            prep_view, width=width, height=rows_per_dev * tile,
            cfg=cfg_local)

        blend = _make_blend_gather(ca, cv, num_tiles_local, grid_x, tile,
                                   cfg.chunk, n_rows, m_local, 0,
                                   interpret)
        # sacrificial zero row for padding slots (see _make_blend_gather)
        slab_ext = jnp.pad(slab, ((0, 1), (0, 0)))
        out, weights = blend(slab_ext, padded.gaussian_id,
                             padded.tile_start, padded.tile_count)
        return out, weights, padded.overflow | overflow_in

    def _translate(slab, y_off):
        # translate mean2d.y and the depth-affine intercept by the row
        # offset (exactly compensated by local pixel coords)
        slab = slab.at[:, 1].add(-y_off)
        return slab.at[:, NG_ADEPTH].add(y_off * slab[:, NG_C2])

    def per_device(means_l, scales_l, quats_l, opac_l, shs_l, colors_l,
                   feat_l, vfeat_l, mask_l):
        """All-gather variant: every device re-bins the full payload."""
        prep, slab_l, ca, cv = _local_prep(
            means_l, scales_l, quats_l, opac_l, shs_l, colors_l,
            feat_l, vfeat_l, mask_l)

        slab = jax.lax.all_gather(slab_l, axis, tiled=True)     # [N, KR]
        depth = jax.lax.all_gather(prep.depth, axis, tiled=True)
        valid = jax.lax.all_gather(prep.valid, axis, tiled=True)
        rect_min = jax.lax.all_gather(prep.rect_min, axis, tiled=True)
        rect_max = jax.lax.all_gather(prep.rect_max, axis, tiled=True)

        idx = jax.lax.axis_index(axis)
        slab = _translate(slab, (y0_tab[idx] * tile).astype(jnp.float32))
        out, weights, overflow = _blend_rows(
            slab, depth, valid, rect_min, rect_max, n, ca, cv, False)
        # per-gaussian weight sums span all devices' tiles
        weights = jax.lax.psum(weights, axis)
        radii = jax.lax.all_gather(prep.radius, axis, tiled=True)
        # gather the tile outputs so assembly sees a replicated array
        # (differentiates cleanly: all_gather^T = psum-scatter)
        out_full = jax.lax.all_gather(out, axis, tiled=True)
        return (out_full, weights, radii,
                jax.lax.pmax(overflow.astype(jnp.float32), axis) > 0)

    def per_device_exchange(means_l, scales_l, quats_l, opac_l, shs_l,
                            colors_l, feat_l, vfeat_l, mask_l):
        """Budgeted all-to-all variant: send each destination only the
        splats overlapping its tile rows."""
        cap = exchange_cap
        prep, slab_l, ca, cv = _local_prep(
            means_l, scales_l, quats_l, opac_l, shs_l, colors_l,
            feat_l, vfeat_l, mask_l)
        n_l = slab_l.shape[0]
        kr = slab_l.shape[1]

        # per-destination overlap of the local shard's rects
        d_iota = jnp.arange(ndev)[:, None]                      # [D, 1]
        band0 = y0_tab[:, None]
        band1 = (y0_tab + band_tab)[:, None]
        ov = (prep.valid[None, :]
              & (prep.rect_min[None, :, 1] < band1)
              & (prep.rect_max[None, :, 1] > band0))            # [D, n_l]
        pos = jnp.cumsum(ov, axis=1) - 1                        # [D, n_l]
        send_overflow = jnp.any(jnp.where(ov, pos, -1) >= cap)
        slot = jnp.where(ov & (pos < cap), d_iota * cap + pos, ndev * cap)

        # compact payload + metadata into [D*cap(+1 drop row), ...]
        meta_l = jnp.concatenate([
            prep.depth[:, None], prep.rect_min.astype(jnp.float32),
            prep.rect_max.astype(jnp.float32),
            prep.valid[:, None].astype(jnp.float32)], axis=1)   # [n_l, 6]
        src_rows = jnp.arange(n_l)

        def compact(x, width_):
            buf = jnp.zeros((ndev * cap + 1, width_), x.dtype)
            return buf.at[slot.reshape(-1)].set(
                jnp.broadcast_to(x[None], (ndev,) + x.shape).reshape(
                    -1, width_), mode="drop")[:ndev * cap]

        send_slab = compact(slab_l, kr)
        send_meta = compact(meta_l, 6)
        # which local row went to each (dst, slot): for routing weights back
        send_src = jnp.full((ndev * cap + 1,), -1, jnp.int32).at[
            slot.reshape(-1)].set(
                jnp.broadcast_to(src_rows[None], (ndev, n_l)).reshape(-1)
                .astype(jnp.int32), mode="drop")[:ndev * cap]

        recv_slab = jax.lax.all_to_all(
            send_slab.reshape(ndev, cap, kr), axis, 0, 0, tiled=False
        ).reshape(ndev * cap, kr)
        recv_meta = jax.lax.all_to_all(
            send_meta.reshape(ndev, cap, 6), axis, 0, 0, tiled=False
        ).reshape(ndev * cap, 6)

        depth = recv_meta[:, 0]
        rect_min = recv_meta[:, 1:3].astype(jnp.int32)
        rect_max = recv_meta[:, 3:5].astype(jnp.int32)
        valid = recv_meta[:, 5] > 0.5

        idx = jax.lax.axis_index(axis)
        slab = _translate(recv_slab,
                          (y0_tab[idx] * tile).astype(jnp.float32))
        out, weights_r, overflow = _blend_rows(
            slab, depth, valid, rect_min, rect_max, ndev * cap, ca, cv,
            send_overflow)

        # route the received rows' weight sums back to their owners
        w_back = jax.lax.all_to_all(
            weights_r.reshape(ndev, cap), axis, 0, 0, tiled=False)  # [D,cap]
        weights_l = jnp.zeros((n_l + 1,)).at[
            jnp.where(send_src >= 0, send_src, n_l)].add(
                w_back.reshape(-1))[:n_l]

        out_full = jax.lax.all_gather(out, axis, tiled=True)
        return (out_full, weights_l, prep.radius,
                jax.lax.pmax(overflow.astype(jnp.float32), axis) > 0)

    # slab column indices for the translation fix-up
    NG_ADEPTH = 12 + 6      # geometry(12) + rgb(3) + normal(3) => adepth
    NG_C2 = 12 + 8          # ... + c1 => c2

    spec_n = P(axis)
    if exchange_cap is None:
        body, out_specs = per_device, (P(), P(), P(), P())
    else:
        # weights/radii come back sharded over the gaussian axis
        body, out_specs = per_device_exchange, (P(), P(axis), P(axis), P())
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_n, spec_n, spec_n, spec_n, spec_n,
                  spec_n, spec_n, spec_n, spec_n),
        out_specs=out_specs,
        check_vma=False)
    # under jit, XLA reshards inputs to the in_specs automatically
    fn = jax.jit(fn)

    out, weights, radii, overflow = fn(means3d, scales, quats, opacity,
                                       shs if shs is not None
                                       else jnp.zeros((n, 0, 3)),
                                       colors, features, vfeatures, mask)
    # out: [ndev * T_local, CO, 256] replicated channel-major tiles -> image
    s = 0 if features is None else features.shape[1]
    vs = 0 if vfeatures is None else vfeatures.shape[1]
    ca = 9 + s
    cv = vs // 4
    co = ca + cv + 3
    out = out.reshape(ndev, rows_per_dev, grid_x, co, tile, tile)
    if min(bands) == rows_per_dev:
        rows = out.reshape(grid_y_total, grid_x, co, tile, tile)
    else:   # uneven bands: drop each device's pad rows (static slices)
        rows = jnp.concatenate([out[d, :bands[d]] for d in range(ndev)], 0)
    img = rows.transpose(2, 0, 3, 1, 4).reshape(co, grid_y_total * tile,
                                                grid_x * tile)
    img = img[:, :height, :width]

    color_raw, normal = img[0:3], img[3:6]
    adepth, c1img, c2img = img[6], img[7], img[8]
    feat = img[9:9 + s]
    vfeat = img[ca:ca + cv]
    logT = img[ca + cv]
    n_contrib = img[ca + cv + 1].astype(jnp.int32)

    vv, uu = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    # local-row pixel maps: py within each device's band (static offsets)
    import numpy as np
    off = np.zeros((height,), np.float32)
    for d in range(ndev):
        a = min(row_starts[d] * tile, height)
        b = min(row_starts[d + 1] * tile, height)
        off[a:b] = row_starts[d] * tile
    py_local = vv - jnp.asarray(off)[:, None]
    D = adepth + uu * c1img + py_local * c2img
    T = jnp.minimum(1.0 - 1e-6, jnp.exp(logT))
    from svgir_tpu.ops.dense_ref import RenderBuffers
    return RenderBuffers(
        color=color_raw + T[None] * bg[:, None, None], normal=normal,
        depth=common.finalize_depth(D, T, cfg.normalize_depth)[None],
        opacity=(1.0 - T)[None], feature=feat, vfeature=vfeat, final_t=T,
        n_contrib=n_contrib, weights=weights[:, None], radii=radii,
        overflow=overflow)
