"""Uniform-grid accelerated ray tracing (the LBVH replacement at scale).

SURVEY.md §7 P4: "replace [the stack-based LBVH] with a TPU-idiomatic
culling structure with identical outputs — a uniform-grid candidate
structure queried with vectorized tests".  Build once per bake:

* gaussians are binned into a ``res^3`` cell grid by their ±3σ AABBs
  (cells capped per gaussian; one bake-time sort builds the cell lists);
* queries walk each ray's cells at half-cell steps, test the cell's
  candidate list with the exact surfel math from ``ops/tracing.py``, and
  accept hits only inside the current step's t-span (each hit lies in
  exactly one span, so duplicates across neighboring cells cancel).

Outputs match the brute-force tracer (the oracle) wherever candidates fit
the per-cell cap; `overflow` flags cells that didn't.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from svgir_tpu.ops import tracing

# per-visit candidate width of the compacted march: each visit tests one
# block-wide slice of one cell's list, so per-cell caps can grow tall for
# hot cells without inflating every visit's gather.  64 (r4 final): at the
# coarse target_span=1.0 grid the per-cell lists are fat enough that
# 64-wide visits halve the visit count without much padding — measured
# {32: 40.3 s, 64: 37.4 s, 128: 51.0 s} on the 50k x 64 bench bake.
_TRACE_BLOCK = int(__import__("os").environ.get("SVGIR_TRACE_BLOCK", "64"))


class TraceGrid(NamedTuple):
    """Uniform grid for small surfels + dense list for large ones.

    Surfels are PARTITIONED by their grid span (covered-cell count):
    span <= span_cap bins into the cell lists; the rest — typically a few
    hundred large surfels after densification — go to ``big_ids`` and are
    tested ONCE per ray in a dense [R, B] pass merged into the march's
    top-k (exact: a surfel lives in exactly one partition).  No surfel's
    cell coverage is ever clipped — the old single-level
    ``max_cells_per_gauss`` silently dropped far cells of large surfels —
    and big surfels never inflate per-step cell occupancy, which would
    defeat the visit compaction.

    ``block_geo``/``block_start``: per-(cell, _TRACE_BLOCK-slice)
    PRE-GATHERED packed geometry rows for every occupied block,
    contiguous per block.  The march's per-visit candidate fetch becomes
    ONE gather of [BLK*32]-float rows (16 KB — amplification-free, runs
    at HBM bandwidth) instead of a [R, BLK]-indexed gather of 128-byte
    packed rows, which paid (8,128)-tile read amplification and
    dominated the r3 bake (10.6 of ~14 ms per visit step,
    docs/measurements/bake_r3_20260819.log).  Geometry is duplicated per
    covering cell (bounded by ``_BLOCKGEO_LIMIT``; ``block_geo=None``
    falls back to the per-visit packed gather).
    """
    cell_ids: jax.Array     # [C, L] int32 gaussian ids (-1 padding)
    cell_count: jax.Array   # [C] int32 candidates per cell (uncapped)
    big_ids: jax.Array      # [B] int32 (B may be 0)
    lo: jax.Array           # [3] grid origin
    inv_cell: jax.Array     # [3] 1 / cell size
    res: int
    cell_cap: int
    overflow: jax.Array     # [] bool — some cell exceeded its cap
    block_geo: Optional[jax.Array] = None    # [Bocc+1, BLK*32] f32
    block_start: Optional[jax.Array] = None  # [C] i32 first block row
    # block_geo row layout, chosen at BUILD time: False = candidate-major
    # ([BLK, 32] flattened, the r4 layout _test_candidates consumes
    # directly), True = field-major ([32, BLK] flattened, the Pallas march
    # kernel's static-lane-slice layout, ops/march_pallas.py).  Stored as
    # a (traced-but-unused) leaf; jitted entry points receive it as a
    # STATIC flag from the eager wrapper.
    field_major: bool = False


def auto_res(geo: tracing.SurfelGeometry, *, sigma: float = 3.0,
             target_span: float = 1.0, max_res: int = 128,
             span_cap: int = 64, big_frac: float = 0.01) -> int:
    """Pick a grid resolution: start from the res where the MEDIAN surfel
    spans ~target_span cells per axis, then walk down until at most
    ``big_frac`` of surfels exceed the ``span_cap``-cell span budget
    (exact span simulation, including the dt/2 AABB expansion and AABB
    cubing of tilted disks) — otherwise wide scale distributions dump a
    large fraction of surfels into the dense big-surfel pass.

    target_span 1.0 (r4, was 2.0): the march-cost optimum measured on the
    50k bench scene — res {12,16,20,30} gave warm bakes {48,40,41,53} s;
    smaller spans cut per-surfel cell duplication (fewer repeated tests
    of the same surfel from neighboring cells) faster than the fatter
    per-cell lists grow the per-visit width."""
    import numpy as np
    valid = np.asarray(geo.valid)
    sc = np.asarray(geo.scales)[valid]
    pts = np.asarray(geo.means)[valid]
    if len(sc) == 0:
        return 16
    med = np.median(sc.max(axis=1))
    ext3 = pts.max(0) - pts.min(0) + 2 * sigma * sc.max() + 1e-6
    extent = float(ext3.max())
    res_med = int(np.clip(extent / max(2 * sigma * med / target_span, 1e-6),
                          4, max_res))
    # exact per-surfel AABB half widths (sigma * |R| s, as build_grid bins)
    r = sigma * np.einsum("nij,nj->ni", np.abs(np.asarray(geo.rot)[valid]),
                          sc)
    res = res_med
    while res > 4:
        cell = ext3 / res
        e = float(cell.min()) / 4.0          # dt/2 expansion per side
        # expected span (alignment-averaged); the exact build routes the
        # few upper-bound stragglers to the big list anyway
        span = np.floor(2 * (r + e) / cell[None]).astype(np.int64) + 1
        frac = float(np.mean(span.prod(axis=1) > span_cap))
        if frac <= big_frac:
            break
        res = max(int(res * 0.75), 4)
    return res


@partial(jax.jit, static_argnames=("res", "span_cap"))
def _sort_pairs(pts, r_exp, select, lo, inv_cell, *, res, span_cap):
    """Enumerate + sort the (cell, gaussian) pairs of the SELECTED surfels.
    ``select`` guarantees span-product <= span_cap, so the [N, span_cap]
    cell enumeration never clips a surfel's coverage.  Returns
    (gid_s [N*K], starts [C], counts [C]) — ONE sort serves cap probing,
    list expansion and geo-block construction (the r3 build re-ran the
    whole pipeline per cap-doubling step: 104 s at bench shapes)."""
    n = pts.shape[0]
    c0 = jnp.clip(((pts - r_exp - lo) * inv_cell).astype(jnp.int32),
                  0, res - 1)
    c1 = jnp.clip(((pts + r_exp - lo) * inv_cell).astype(jnp.int32),
                  0, res - 1)
    span = c1 - c0 + 1
    ncells = jnp.where(select, span[:, 0] * span[:, 1] * span[:, 2], 0)

    k = jnp.arange(span_cap)
    sx, sy = span[:, 0:1], span[:, 1:2]
    dx = k[None] % sx
    dy = (k[None] // sx) % sy
    dz = k[None] // (sx * sy)
    cell = ((c0[:, 2:3] + dz) * res + (c0[:, 1:2] + dy)) * res \
        + (c0[:, 0:1] + dx)                                   # [N, K]
    valid_pair = k[None] < ncells[:, None]
    num_cells = res ** 3
    cell = jnp.where(valid_pair, cell, num_cells)

    gid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                           cell.shape)
    cell_f, gid_f = cell.reshape(-1), gid.reshape(-1)
    cell_s, gid_s = jax.lax.sort((cell_f.astype(jnp.int32), gid_f),
                                 num_keys=1, is_stable=True)
    grid_ids = jnp.arange(num_cells, dtype=jnp.int32)
    starts = jnp.searchsorted(cell_s, grid_ids, side="left")
    counts = (jnp.searchsorted(cell_s, grid_ids, side="right")
              - starts).astype(jnp.int32)
    return gid_s, starts, counts


def _expand_lists(gid_s, starts, counts, num_cells, cell_cap):
    """[C, L] per-cell candidate lists from the sorted pairs.  Chunked: at
    high res (2M cells) the src/ok temporaries would otherwise take
    several GB each on device."""
    slot = jnp.arange(cell_cap)
    blocks = []
    step = max((1 << 22) // max(cell_cap, 1), 1)
    for b0 in range(0, num_cells, step):
        b1 = min(b0 + step, num_cells)
        src = starts[b0:b1, None] + slot[None]                # [c, L]
        ok = slot[None] < jnp.minimum(counts[b0:b1], cell_cap)[:, None]
        src = jnp.clip(src, 0, gid_s.shape[0] - 1)
        blocks.append(jnp.where(ok, gid_s[src], -1))
    return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, 0)


def build_grid(geo: tracing.SurfelGeometry, *, res: int = 32,
               cell_cap: Optional[int] = 64, span_cap: int = 64,
               sigma: float = 3.0,
               max_cells_per_gauss: Optional[int] = None,
               big_warn_frac: float = 0.05) -> TraceGrid:
    """Bin gaussians into the grid by ±sigma·scale AABBs (bake-time,
    eager-only: the big-list size is data-dependent).

    ``cell_cap=None`` sizes the cap EXACTLY (max per-cell count rounded up
    to a _TRACE_BLOCK multiple) from the single pair sort — no overflow
    possible; an explicit cap clips the lists and sets ``overflow`` when
    exceeded.

    AABBs are expanded by half a march step (dt/2) so a hit point within
    dt/2 of the step midpoint always finds its surfel listed in the
    midpoint's cell — without this, sub-cell surfels straddling a cell
    boundary could be missed by rays probing the neighboring cell (the
    pre-r3 ~0.1% hit mismatch vs brute force).
    """
    if max_cells_per_gauss is not None:   # legacy knob == span budget
        span_cap = max_cells_per_gauss
    # world AABB from valid gaussians; per-axis half-widths from the rotated
    # ±sigma corners (|R| @ (sigma*s)), matching the reference's leaf AABBs
    # (bvh/__init__.py:34-52) — flat surfels get ~zero thickness along the
    # normal instead of an inflated isotropic box
    big = 1e30
    pts = jnp.where(geo.valid[:, None], geo.means, 0.0)
    r = sigma * jnp.einsum("nij,nj->ni", jnp.abs(geo.rot), geo.scales)
    r = jnp.where(geo.valid[:, None], r, 0.0)
    lo = jnp.min(jnp.where(geo.valid[:, None], pts - r, big), axis=0)
    hi = jnp.max(jnp.where(geo.valid[:, None], pts + r, -big), axis=0)
    extent = jnp.maximum(hi - lo, 1e-6)
    inv_cell = res / extent
    dt = jnp.min(extent / res) * 0.5
    r_exp = r + 0.5 * dt

    c0 = jnp.clip(((pts - r_exp - lo) * inv_cell).astype(jnp.int32),
                  0, res - 1)
    c1 = jnp.clip(((pts + r_exp - lo) * inv_cell).astype(jnp.int32),
                  0, res - 1)
    s = c1 - c0 + 1
    fine_sel = geo.valid & (s[:, 0] * s[:, 1] * s[:, 2] <= span_cap)

    import numpy as np
    big_np = np.asarray(jax.device_get(geo.valid & ~fine_sel))
    big_ids = jnp.asarray(np.nonzero(big_np)[0].astype(np.int32))
    n_valid = max(int(np.asarray(jax.device_get(geo.valid)).sum()), 1)
    if big_ids.shape[0] > big_warn_frac * n_valid:
        print(f"WARNING: {int(big_ids.shape[0])}/{n_valid} surfels exceed "
              f"the {span_cap}-cell span budget at res={res} — the dense "
              "big-surfel pass degenerates toward brute force; lower the "
              "grid res", flush=True)

    gid_s, starts, counts = _sort_pairs(pts, r_exp, fine_sel, lo, inv_cell,
                                        res=res, span_cap=span_cap)
    max_count = int(jax.device_get(counts.max()))
    if cell_cap is None:
        cell_cap = max(-(-max_count // _TRACE_BLOCK) * _TRACE_BLOCK,
                       _TRACE_BLOCK)
        overflow = jnp.asarray(False)
    else:
        overflow = jnp.asarray(max_count > cell_cap)
    ids = _expand_lists(gid_s, starts, counts, res ** 3, cell_cap)
    block_geo, block_start, fmaj = _build_geo_blocks(geo, starts, counts,
                                                     gid_s, cell_cap)
    return TraceGrid(cell_ids=ids, cell_count=counts, big_ids=big_ids,
                     lo=lo, inv_cell=inv_cell, res=res, cell_cap=cell_cap,
                     overflow=overflow, block_geo=block_geo,
                     block_start=block_start, field_major=fmaj)


# block_geo memory ceiling; above it the march falls back to the per-visit
# packed-row gather (correct, ~25x slower on the candidate fetch)
_BLOCKGEO_LIMIT = int(__import__("os").environ.get(
    "SVGIR_BLOCKGEO_LIMIT", 6 << 30))


def _build_geo_blocks(geo, starts, counts, gid_s, cell_cap):
    """Pre-gather packed geometry for every occupied (cell, block) pair:
    block_geo [Bocc + 1, _TRACE_BLOCK * 32] f32 (last row = zero/padding
    block) and block_start [C] i32 (first block row per cell; the march
    addresses visit (cell, bi) as ``block_start[cell] + bi``).  Eager
    (bake-time) — the occupied-block count is data-dependent."""
    import numpy as np
    blk = _TRACE_BLOCK
    counts_c = np.minimum(np.asarray(jax.device_get(counts)), cell_cap)
    nbc = -(-counts_c // blk)                       # blocks per cell
    bocc = int(nbc.sum())
    est = (bocc + 1) * blk * _PACK_W * 4
    if est > _BLOCKGEO_LIMIT:
        print(f"WARNING: geo-block table would take {est/2**30:.1f} GiB "
              f"(> {_BLOCKGEO_LIMIT/2**30:.1f}); falling back to the "
              "per-visit packed gather", flush=True)
        return None, None, False
    block_start = np.zeros(len(counts_c), np.int32)
    np.cumsum(nbc[:-1], out=block_start[1:])
    # per-block source slices of the sorted (cell, gid) pair array
    cell_of_b = np.repeat(np.arange(len(counts_c), dtype=np.int64), nbc)
    k_of_b = np.arange(bocc, dtype=np.int64) - \
        np.repeat(block_start.astype(np.int64), nbc)
    starts_np = np.asarray(jax.device_get(starts)).astype(np.int64)
    src0 = starts_np[cell_of_b] + k_of_b * blk
    slot = np.arange(blk, dtype=np.int64)
    src = src0[:, None] + slot[None]                             # [B, BLK]
    ok = slot[None] < (counts_c[cell_of_b] - k_of_b * blk)[:, None]
    gid_np = np.asarray(jax.device_get(gid_s))
    rows = np.where(ok, gid_np[np.clip(src, 0, len(gid_np) - 1)], -1)
    rows = np.concatenate([rows, np.full((1, blk), -1, rows.dtype)], 0)
    # one device gather builds the whole table; id == -1 -> zero row N.
    # Layout picked at build time: candidate-major when the XLA visit path
    # will consume it (no per-visit transpose — the r4 fast path),
    # field-major ([_PACK_W, blk] flattened) when the Pallas march kernel
    # is enabled, whose static lane slices [f*blk:(f+1)*blk] need it
    packed = pack_geometry(geo)
    n = packed.shape[0] - 1
    rows_j = jnp.asarray(rows.astype(np.int32))
    gathered = packed[jnp.where(rows_j >= 0, rows_j, n)]   # [B+1, blk, 32]
    from svgir_tpu.ops.march_pallas import use_pallas_march
    if use_pallas_march():
        block_geo = gathered.transpose(0, 2, 1).reshape(
            bocc + 1, _PACK_W * blk)
        field_major = True
    else:
        block_geo = gathered.reshape(bocc + 1, blk * _PACK_W)
        field_major = False
    return block_geo, jnp.asarray(block_start), field_major


def build_grid_auto(geo: tracing.SurfelGeometry, *, res: int = 32,
                    cell_cap: int = 64, max_cells_per_gauss: int = 64,
                    sigma: float = 3.0, cap_limit: int = 4096,
                    res_limit: int = 128) -> TraceGrid:
    """build_grid with the cap sized EXACTLY in one pass (``cell_cap``
    only sets the floor).  Tall caps are cheap since the sub-block march
    fixes every visit's gather width at _TRACE_BLOCK — hot cells just
    cost more visits for the rays that actually cross them.  If the exact
    cap exceeds ``cap_limit`` the RESOLUTION escalates (x1.5): thinner
    cells drain the hot spots, and the larger-surfel tail this creates
    stays exact through the dense big-surfel pass."""
    while True:
        grid = build_grid(geo, res=res, cell_cap=None,
                          span_cap=max_cells_per_gauss, sigma=sigma)
        if grid.cell_cap >= cell_cap:
            cell_cap = grid.cell_cap        # exact >= requested floor
        if grid.cell_cap <= cap_limit:
            return grid
        if res < res_limit:
            res = min(int(res * 1.5), res_limit)
            continue
        # no silent caps (docs/PERF.md): rebuild clipped at the limit —
        # candidates beyond it are dropped and rays through hot cells
        # will miss hits
        print(f"WARNING: exact grid cap {grid.cell_cap} exceeds cap_limit "
              f"{cap_limit} at res={res} (res_limit {res_limit}) — "
              "clipping; some candidates are dropped", flush=True)
        return build_grid(geo, res=res, cell_cap=cap_limit,
                          span_cap=max_cells_per_gauss, sigma=sigma)


def _cell_index(grid: TraceGrid, pos: jax.Array) -> jax.Array:
    """Flat cell index [R] at world positions [R, 3]."""
    c = jnp.clip(((pos - grid.lo) * grid.inv_cell).astype(jnp.int32),
                 0, grid.res - 1)
    return (c[:, 2] * grid.res + c[:, 1]) * grid.res + c[:, 0]


def _gather_candidates(grid: TraceGrid, pos: jax.Array) -> jax.Array:
    """Cell candidate ids [R, L] at world positions [R, 3] (small-surfel
    partition only — big surfels take the dense once-per-ray pass)."""
    return grid.cell_ids[_cell_index(grid, pos)]


def _occupancy_at(grid: TraceGrid, pos: jax.Array) -> jax.Array:
    """[R] cell candidate count at positions (small-surfel partition)."""
    return grid.cell_count[_cell_index(grid, pos)]


def rank_topk_small(t: jax.Array, idx: jax.Array, k: int):
    """Smallest-k by COUNTING RANK: rank_i = #{j: t_j < t_i} + #{j < i:
    t_j == t_i}; keep rank < k, place by one-hot max-select.  All
    broadcast elementwise ops — no cross-lane permutes (the bitonic
    network's 2 takes/stage) — at O(W^2) compares, which wins for the
    march's W = k + blk = 48.  Exact lax.top_k semantics incl. stable
    tie-break (the bitonic variant reorders ties; both are accepted by
    callers, but rank is the stricter contract)."""
    r, w = t.shape
    lane = jnp.arange(w)
    less = t[:, None, :] < t[:, :, None]                  # t_j < t_i
    eq_lo = (t[:, None, :] == t[:, :, None]) \
        & (lane[None, None, :] < lane[None, :, None])
    rank = (less | eq_lo).sum(-1)                         # [R, W]
    onehot = rank[:, :, None] == lane[None, None, :k]     # [R, W, k]
    sel_t = jnp.max(jnp.where(onehot, t[:, :, None], -jnp.inf), axis=1)
    sel_i = jnp.max(jnp.where(onehot, idx[:, :, None], -(1 << 30)), axis=1)
    # ranks >= w can't happen; every slot < k is filled exactly once
    return sel_t, sel_i.astype(idx.dtype)


_MERGE_IMPL = __import__("os").environ.get("SVGIR_MERGE_IMPL", "rank")


def merge_topk_small(t: jax.Array, idx: jax.Array, k: int):
    """March merge dispatch: 'rank' (default) | 'bitonic' | 'topk'."""
    if _MERGE_IMPL == "bitonic":
        return bitonic_topk_small(t, idx, k)
    if _MERGE_IMPL == "topk":
        neg, sel = jax.lax.top_k(-t, k)
        return -neg, jnp.take_along_axis(idx, sel, axis=1)
    if _MERGE_IMPL == "none":      # attribution only: WRONG results
        return t[:, :k], idx[:, :k]
    return rank_topk_small(t, idx, k)


def bitonic_topk_small(t: jax.Array, idx: jax.Array, k: int):
    """Smallest-k of (t [R, W], idx) along the last axis, ascending —
    ``lax.top_k`` semantics via a STATIC bitonic network of elementwise
    min/max + fixed permutations instead of XLA's sort custom call (the
    sort was the dominant per-visit march cost: 9.5 ms for [8k, 48] on
    v5e).  W is padded to a power of two with +inf/-1.  Ties and the
    ordering of +inf slots may differ from lax.top_k (bitonic nets are
    unstable); callers treat t==inf as "no hit", so only finite-slot
    agreement matters.
    """
    r, w = t.shape
    wp = 1 << (w - 1).bit_length()
    if wp != w:
        t = jnp.pad(t, ((0, 0), (0, wp - w)), constant_values=jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, wp - w)), constant_values=-1)
    lane = jnp.arange(wp)
    size = 2
    while size <= wp:
        stride = size // 2
        while stride > 0:
            partner = lane ^ stride
            pt = jnp.take(t, partner, axis=1)
            pi = jnp.take(idx, partner, axis=1)
            up = (lane & size) == 0           # block sort direction
            is_lo = lane < partner
            # keep the smaller at the low lane of ascending blocks
            keep_self = jnp.where(up == is_lo, t <= pt, t >= pt)
            t = jnp.where(keep_self, t, pt)
            idx = jnp.where(keep_self, idx, pi)
            stride //= 2
        size *= 2
    return t[:, :k], idx[:, :k]


# packed-row surfel table: ONE [R, L]-indexed row gather of a 32-lane table
# instead of seven narrow per-field gathers (docs/PERF.md: tiny-row gathers
# pay tile-read amplification; the rasterizer's slab gather idiom)
_PACK_W = 32


def pack_geometry(geo: tracing.SurfelGeometry) -> jax.Array:
    """[N + 1, 32] row table; row N is the padding row (valid=0, id=-1)
    that id == -1 candidates route to.  Lane 26 carries the surfel id as
    f32 (exact for N < 2^24) so pre-gathered geometry blocks need no
    parallel id table."""
    n = geo.means.shape[0]
    packed = jnp.concatenate([
        geo.means,                                   # 0:3
        geo.scales,                                  # 3:6
        geo.rot.reshape(n, 9),                       # 6:15
        geo.inv_cov,                                 # 15:21
        geo.normal,                                  # 21:24
        geo.opacity[:, None],                        # 24
        geo.valid.astype(jnp.float32)[:, None],      # 25
        jnp.arange(n, dtype=jnp.float32)[:, None],   # 26 (id)
        jnp.zeros((n, _PACK_W - 27)),
    ], axis=1)
    pad = jnp.zeros((1, _PACK_W)).at[0, 26].set(-1.0)
    return jnp.concatenate([packed, pad], axis=0)


def _unpack_sub(g: jax.Array) -> tracing.SurfelGeometry:
    return tracing.SurfelGeometry(
        means=g[..., 0:3], scales=g[..., 3:6],
        rot=g[..., 6:15].reshape(g.shape[:-1] + (3, 3)),
        inv_cov=g[..., 15:21], normal=g[..., 21:24],
        opacity=g[..., 24], valid=g[..., 25] > 0.5)


def _test_candidates(geo, ids, rays_o, rays_d, t_lo, t_hi, *, packed=None,
                     geo_rows=None):
    """Exact surfel tests for candidate ids [R, L] within t-span
    [t_lo, t_hi) (per ray).  Returns per-(ray, cand) dict.  ``packed``:
    optional precomputed pack_geometry(geo) table (single-gather path).
    ``geo_rows``: optional PRE-GATHERED packed rows [R, L, 32] (the
    geo-block path; ``ids`` may be None — taken from lane 26)."""
    if geo_rows is not None:
        sub = _unpack_sub(geo_rows)
        if ids is None:
            ids = geo_rows[..., 26].astype(jnp.int32)
    elif packed is not None:
        sub = _unpack_sub(packed[jnp.where(ids >= 0, ids,
                                           packed.shape[0] - 1)])
    else:
        idx = jnp.clip(ids, 0, geo.means.shape[0] - 1)
        sub = tracing.SurfelGeometry(*[x[idx] for x in geo])  # [R, L, ...]
    n = sub.normal
    denom = jnp.sum(n * rays_d[:, None], -1)
    denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    t_plane = jnp.sum((sub.means - rays_o[:, None]) * n, -1) / denom
    pos = rays_o[:, None] + t_plane[..., None] * rays_d[:, None]
    local = jnp.einsum("rgij,rgi->rgj", sub.rot, pos - sub.means)
    sx = jnp.maximum(sub.scales[..., 0], 1e-12)
    sy = jnp.maximum(sub.scales[..., 1], 1e-12)
    u = local[..., 0] / sx
    v = local[..., 1] / sy
    swap = u < v
    u2, v2 = jnp.where(swap, v, u), jnp.where(swap, u, v)
    uv = jnp.stack([jnp.clip(u2 * 0.5 + 0.5, 0.001, 0.999),
                    jnp.clip(v2 * 0.5 + 0.5, 0.001, 0.999)], -1)
    dis = u * u + v * v

    ic = sub.inv_cov
    pd = sub.means - rays_o[:, None] - t_plane[..., None] * rays_d[:, None]
    px, py, pz = pd[..., 0], pd[..., 1], pd[..., 2]
    power = -0.5 * (ic[..., 0] * px * px + ic[..., 3] * py * py
                    + ic[..., 5] * pz * pz
                    + 2 * (ic[..., 1] * px * py + ic[..., 2] * px * pz
                           + ic[..., 4] * py * pz))
    alpha = jnp.minimum(tracing.ALPHA_MAX,
                        sub.opacity * jnp.exp(power))
    facing = jnp.sum(rays_d[:, None] * n, -1) < 0.0
    ok = ((ids >= 0) & sub.valid & (dis <= 9.0) & (power <= 0)
          & (alpha >= tracing.ALPHA_MIN) & facing
          & (t_plane >= t_lo[:, None]) & (t_plane < t_hi[:, None]))
    return {"t": jnp.where(ok, t_plane, jnp.inf), "alpha": alpha, "uv": uv,
            "ok": ok, "idx": ids, "valid": sub.valid,
            "opacity": sub.opacity}


def _concrete_n_steps(grid: TraceGrid, t_max: float) -> int:
    """Step count covering [0, t_max] at half-cell strides, computed from
    CONCRETE grid arrays (grids are built eagerly at bake time).  Falls
    back to the diagonal bound when the grid is traced."""
    try:
        import numpy as np
        dt = float(np.min(1.0 / np.asarray(grid.inv_cell))) * 0.5
        return max(1, min(int(np.ceil(t_max / dt)), 6 * int(grid.res)))
    except Exception:               # traced grid inside jit
        return 4 * int(grid.res)


def count_occupied_steps(grid: TraceGrid, rays_o: jax.Array,
                         rays_d: jax.Array, *, t_max: float,
                         n_steps: int) -> jax.Array:
    """[R] number of march steps whose cell holds >= 1 candidate."""
    return _occupancy_scan(grid, rays_o, rays_d, t_max=t_max,
                           n_steps=n_steps).sum(1)


def count_visit_blocks(grid: TraceGrid, rays_o: jax.Array,
                       rays_d: jax.Array, *, t_max: float, n_steps: int,
                       blk: int = _TRACE_BLOCK) -> jax.Array:
    """[R] total candidate BLOCKS over a ray's march — the exact visit
    budget of the sub-block compacted march (each visit tests one
    ``blk``-wide slice of one CELL-RUN's list; consecutive steps in the
    same cell are deduplicated into one visit, see ``_run_scan``)."""
    nb, _ = _run_scan(grid, rays_o, rays_d, n_steps=n_steps, blk=blk,
                      kmax=_run_kmax(grid))
    return nb.sum(1)


def _run_kmax(grid: TraceGrid) -> int:
    """Static cap on how many half-cell steps one cell can span along a
    ray: ceil(sqrt(3) * max_cell / (min_cell / 2)), clamped to 8 (longer
    pathological runs are split into multiple exact visits)."""
    try:
        import numpy as np
        cell = 1.0 / np.asarray(jax.device_get(grid.inv_cell))
        return int(min(8, max(2, np.ceil(3.47 * cell.max() / cell.min()))))
    except Exception:               # traced grid inside jit
        return 4


@partial(jax.jit, static_argnames=("n_steps", "blk", "kmax"))
def _run_scan(grid, rays_o, rays_d, *, n_steps, blk, kmax):
    """Cell-run visit list: half-cell steps sample the same cell 2-3x
    (dt = min_cell/2), so marching per STEP re-gathers and re-tests every
    candidate per repeat.  This scan marks only RUN STARTS (first step of
    a consecutive same-cell group, groups capped at ``kmax`` steps) and
    returns

      nb    [R, n_steps] — candidate blocks at run starts, 0 elsewhere
      spans [R, n_steps] — run length in steps (valid at run starts)

    The march then visits each distinct cell once with the window
    [t_lo, t_lo + span*dt) — outputs identical to the per-step walk (the
    dt/2 AABB expansion guarantee is per-step and every step of a run
    shares the run's cell)."""
    r = rays_o.shape[0]
    dt = jnp.min(1.0 / grid.inv_cell) * 0.5
    cap = grid.cell_ids.shape[1]

    def body(carry, j):
        prev_cell, run_pos = carry
        mid = rays_o + (j * dt + 0.5 * dt) * rays_d
        cell = _cell_index(grid, mid)
        cnt = jnp.minimum(grid.cell_count[cell], cap)
        same = (cell == prev_cell) & (j > 0)
        run_pos = jnp.where(same, run_pos + 1, 0)
        start = (cnt > 0) & (run_pos % kmax == 0)
        nb = jnp.where(start, -(-cnt // blk), 0)
        return (cell, run_pos), (nb, cell)

    init = (jnp.full((r,), -1, jnp.int32), jnp.zeros((r,), jnp.int32))
    _, (nb, cells) = jax.lax.scan(body, init, jnp.arange(n_steps))
    nb, cells = nb.T, cells.T                        # [R, n_steps]
    same = jnp.concatenate(
        [jnp.zeros((r, 1), bool), cells[:, 1:] == cells[:, :-1]], axis=1)
    spans = jnp.ones(nb.shape, jnp.int32)
    acc = jnp.ones(nb.shape, bool)
    for u in range(1, kmax):
        # prod_{v=1..u} same[j+v]  ==  cells j..j+u all equal
        nxt = jnp.pad(same[:, u:], ((0, 0), (0, u)))
        acc = acc & nxt
        spans = spans + acc.astype(jnp.int32)
    return nb, spans


@partial(jax.jit, static_argnames=("n_steps",))
def _occupancy_scan(grid, rays_o, rays_d, *, t_max, n_steps):
    """[R, n_steps] bool — step's cell is nonempty.  Cheap: one [R] count
    lookup per step, no candidate gathers."""
    del t_max
    dt = jnp.min(1.0 / grid.inv_cell) * 0.5

    def body(_, j):
        mid = rays_o + (j * dt + 0.5 * dt) * rays_d
        return None, _occupancy_at(grid, mid) > 0

    _, occ = jax.lax.scan(body, None, jnp.arange(n_steps))
    return occ.T


def nearest_hits_grid(geo: tracing.SurfelGeometry, grid: TraceGrid,
                      rays_o: jax.Array, rays_d: jax.Array, *,
                      t_max: float = 2.0, k: int = 16,
                      n_steps: Optional[int] = None,
                      max_visits: Optional[int] = None,
                      merge_every: int = 1) -> Dict:
    """Grid-walk replacement for tracing.nearest_hits (same output dict,
    plus ``trunc`` [R] when the visit budget clipped a ray — see below).

    Two-phase compacted march (conditionals inside ``scan`` measured 3.7x
    overhead on TPU, tools/bench_trace_chunk.py 2026-08-19):

    1. a cheap occupancy scan ([R] cell-count lookup per step) finds each
       ray's nonempty steps;
    2. the expensive phase (candidate gather + exact tests + top-k merge)
       scans only the first ``max_visits`` occupied steps per ray,
       cond-free.

    Visits advance monotonically in t, each visit tests one _TRACE_BLOCK-
    wide slice of one step's cell list within that step's t-span, so
    merged hits stay globally depth-sorted and duplicates cancel —
    identical outputs to the full scan whenever no ray exceeds
    ``max_visits`` BLOCK visits (callers get exactness by probing
    ``count_visit_blocks().max()`` first, as ``bake_radiance`` does).
    ``max_visits=None`` uses the worst case (always exact, slower).
    """
    if n_steps is None:
        n_steps = _concrete_n_steps(grid, t_max)
    nb_cap = -(-grid.cell_ids.shape[1] // _TRACE_BLOCK)
    if max_visits is None:
        max_visits = n_steps * nb_cap
    max_visits = min(max_visits, n_steps * nb_cap)
    return _nearest_hits_grid(geo, grid, rays_o, rays_d, t_max=t_max, k=k,
                              n_steps=n_steps, max_visits=max_visits,
                              merge_every=merge_every,
                              kmax=_run_kmax(grid),
                              use_kernel=bool(grid.field_major))


@partial(jax.jit, static_argnames=("k", "n_steps", "max_visits",
                                   "merge_every", "kmax", "use_kernel"))
def _nearest_hits_grid(geo, grid, rays_o, rays_d, *, t_max, k, n_steps,
                       max_visits, merge_every=1, kmax=4,
                       use_kernel=False):
    r = rays_o.shape[0]
    cell_size = 1.0 / grid.inv_cell
    dt = jnp.min(cell_size) * 0.5      # half-cell steps: no diagonal misses
    cap = grid.cell_ids.shape[1]
    blk = _TRACE_BLOCK
    nb_cap = -(-cap // blk)
    use_blocks = grid.block_geo is not None
    use_kernel = use_kernel and use_blocks
    from svgir_tpu.ops.march_pallas import march_test_merge
    _kernel_interpret = lambda: jax.default_backend() != "tpu"
    if not use_blocks:
        # fallback: cell lists as [C * nb_cap, blk] rows — (cell, block)
        # pairs become one id-row gather + a [R, blk] packed-row gather
        ids_blocked = grid.cell_ids.reshape(-1, nb_cap, blk).reshape(
            -1, blk) if cap % blk == 0 else jnp.pad(
                grid.cell_ids, ((0, 0), (0, nb_cap * blk - cap)),
                constant_values=-1).reshape(-1, blk)

    nblocks, spans = _run_scan(grid, rays_o, rays_d, n_steps=n_steps,
                               blk=blk, kmax=kmax)        # [R, n_steps] x2
    # run-start step indices, ascending; dead slots -> n_steps + 9.  The
    # step-level visit list is at most max_visits long (>=1 block/run)
    steps_or_big = jnp.where(nblocks > 0, jnp.arange(n_steps)[None, :],
                             n_steps + 9)
    vs_budget = min(max_visits, n_steps)
    neg, _ = jax.lax.top_k(-steps_or_big, vs_budget)
    visit_step = -neg                                      # [R, Vs]
    visit_span = jnp.take_along_axis(
        spans, jnp.minimum(visit_step, n_steps - 1), axis=1)
    trunc = nblocks.sum(1) > max_visits

    # idx-only merge carry: t (the sort key) + candidate id.  alpha/uv are
    # pure functions of (ray, surfel) and are recomputed ONCE post-march
    # for the k winners — carrying them through every merge cost two extra
    # take_along_axis passes per visit (the [R, k+blk, 2] uv one widest),
    # the bulk of the r4-attributed 9.5 ms/visit merge.
    init = {
        "t": jnp.full((r, k), jnp.inf),
        "idx": jnp.full((r, k), -1, jnp.int32),
    }

    packed = pack_geometry(geo)
    rows = jnp.arange(r)

    def merge(hits, cand_t, cand_idx):
        all_t = jnp.concatenate([hits["t"], cand_t], axis=1)
        all_idx = jnp.concatenate([hits["idx"], cand_idx], axis=1)
        mt, mi = bitonic_topk_small(all_t, all_idx, k)
        return {"t": mt, "idx": mi}

    def visit(vi, bi, hits):
        """One block visit at cursor (vi, bi).  Returns (cand-or-None,
        hits, vi, bi): the fused-kernel path merges into ``hits`` itself
        and returns cand=None; the XLA path returns the candidate dict
        for the caller's batched merge."""
        vc = jnp.minimum(vi, vs_budget - 1)
        j = visit_step[rows, vc]                               # [R]
        live = (j < n_steps) & (vi < vs_budget)
        jj = jnp.minimum(j, n_steps - 1).astype(rays_o.dtype)
        span = visit_span[rows, vc].astype(rays_o.dtype)       # run length
        t_lo = jj * dt
        t_hi = jnp.minimum((jj + span) * dt, t_max)
        mid = rays_o + (t_lo + 0.5 * dt)[:, None] * rays_d
        cell = _cell_index(grid, mid)
        cand = None
        if use_blocks:
            # ONE contiguous block-row gather per visit instead of a
            # [R, blk] packed per-candidate gather ((8,128)-tile
            # amplification, 10.6 ms/visit-step at r3 shapes)
            zrow = grid.block_geo.shape[0] - 1
            row = jnp.where(live, grid.block_start[cell] + bi, zrow)
            g = grid.block_geo[row]                    # [R, blk*32]
            if use_kernel:
                # fused test + top-k merge in VMEM (ops/march_pallas.py):
                # no [R, BLK] temporaries or sort calls touch HBM
                # (g rows are field-major — build-time layout)
                ht, hi_ = march_test_merge(
                    g, rays_o, rays_d, t_lo, t_hi, hits["t"], hits["idx"],
                    blk=blk, k=k, interpret=_kernel_interpret())
                hits = {"t": ht, "idx": hi_}
            else:
                # candidate-major rows feed _test_candidates directly (the
                # r4 fast path, no per-visit transpose)
                g3 = g.reshape(r, blk, _PACK_W)
                cand = _test_candidates(geo, None, rays_o, rays_d, t_lo,
                                        t_hi, geo_rows=g3)
        else:
            row = cell * nb_cap + bi
            ids = jnp.where(live[:, None], ids_blocked[row], -1)
            cand = _test_candidates(geo, ids, rays_o, rays_d, t_lo, t_hi,
                                    packed=packed)
        # cursor advance: next block of this cell, else next occupied step
        nb_here = jnp.minimum(_occupancy_at(grid, mid), cap)
        nb_here = -(-nb_here // blk)
        more = live & (bi + 1 < nb_here)
        vi = jnp.where(more, vi, vi + 1)
        bi = jnp.where(more, bi + 1, 0)
        return cand, hits, vi, bi

    def body(carry, _):
        vi, bi, hits = carry
        # batch ``merge_every`` visits into ONE top-k merge: the merge is
        # the dominant per-visit cost (9.5 ms/visit attributed r4) and
        # top_k cost grows sublinearly in candidate width.  (The fused
        # kernel merges per visit in VMEM — cand comes back None.)
        cts, cis = [], []
        for _u in range(merge_every):
            cand, hits, vi, bi = visit(vi, bi, hits)
            if cand is not None:
                cts.append(cand["t"])
                cis.append(cand["idx"])
        if cts:
            hits = merge(hits, jnp.concatenate(cts, axis=1),
                         jnp.concatenate(cis, axis=1))
        return (vi, bi, hits), None

    init_cur = (jnp.zeros((r,), jnp.int32), jnp.zeros((r,), jnp.int32),
                init)
    (_, _, hits), _ = jax.lax.scan(
        body, init_cur, None, length=-(-max_visits // merge_every))
    hits = _merge_big(hits, geo, grid, packed, rays_o, rays_d,
                      jnp.zeros((r,)), jnp.full((r,), t_max), k=k)

    # post-march recomputation of the winners' full records: [R, k] rows
    # through the same exact tests over the march's whole [0, t_max) span
    # (t/alpha/uv are span-independent; the spans only enforced ordering)
    full = _test_candidates(geo, hits["idx"], rays_o, rays_d,
                            jnp.zeros((r,)), jnp.full((r,), t_max),
                            packed=packed)
    hits = {"t": jnp.where(jnp.isfinite(hits["t"]), full["t"], jnp.inf),
            "idx": hits["idx"], "alpha": full["alpha"], "uv": full["uv"],
            "trunc": trunc}
    return hits


_BIG_BLOCK = 256


def _big_blocks(grid: TraceGrid):
    """Big-surfel ids as padded [nb, _BIG_BLOCK] blocks (static shapes)."""
    b = grid.big_ids.shape[0]
    nb = -(-b // _BIG_BLOCK)
    pad = nb * _BIG_BLOCK - b
    return jnp.concatenate(
        [grid.big_ids, jnp.full((pad,), -1, jnp.int32)]).reshape(
            nb, _BIG_BLOCK)


def _merge_big(hits, geo, grid, packed, rays_o, rays_d, t_lo, t_hi, *, k):
    """Dense once-per-ray pass over the big-surfel partition, merged into
    the march's top-k (idx-only carry, like the march).  Exact: big
    surfels are absent from all cell lists, each is tested exactly once
    per ray with the same acceptance rules and the same overall
    [t_lo, t_hi) window the march covers."""
    if grid.big_ids.shape[0] == 0:
        return hits
    r = rays_o.shape[0]

    def body(carry, blk):
        ids = jnp.broadcast_to(blk[None], (r, _BIG_BLOCK))
        cand = _test_candidates(geo, ids, rays_o, rays_d, t_lo, t_hi,
                                packed=packed)
        all_t = jnp.concatenate([carry["t"], cand["t"]], axis=1)
        all_idx = jnp.concatenate([carry["idx"], cand["idx"]], axis=1)
        mt, mi = merge_topk_small(all_t, all_idx, k)
        return {"t": mt, "idx": mi}, None

    hits, _ = jax.lax.scan(body, hits, _big_blocks(grid))
    return hits


@partial(jax.jit, static_argnames=("n_steps",))
def trace_visibility_grid(geo: tracing.SurfelGeometry, grid: TraceGrid,
                          rays_o: jax.Array, rays_d: jax.Array, *,
                          t_max: float = 20.0, n_steps: int = 256) -> Dict:
    """Grid-walk visibility (trace.cu semantics; see tracing.py for the
    order-independence argument)."""
    r = rays_o.shape[0]
    cell_size = 1.0 / grid.inv_cell
    dt = jnp.min(cell_size) * 0.5

    packed = pack_geometry(geo)

    def body(carry, j):
        log_t, count = carry
        t_lo = jnp.maximum(j * dt, 0.01)     # skip t < 0.01 (trace.cu:238)
        t_hi = jnp.minimum((j + 1) * dt, t_max)
        mid = rays_o + (j * dt + 0.5 * dt) * rays_d
        ids = _gather_candidates(grid, mid)
        cand = _test_candidates(geo, ids, rays_o, rays_d,
                                jnp.full((r,), t_lo), jnp.full((r,), t_hi),
                                packed=packed)
        # visibility wants opacity >= 1/255 pre-exp (trace.cu:233) and no
        # ellipse test — accept on power<=0 & facing & t window
        ok = ((cand["idx"] >= 0) & cand["valid"]
              & (cand["opacity"] >= tracing.ALPHA_MIN)
              & jnp.isfinite(cand["t"]))
        a = jnp.where(ok, jnp.minimum(cand["alpha"], tracing.ALPHA_MAX), 0.0)
        log_t = log_t + jnp.sum(jnp.log1p(-a), axis=1)
        count = count + ok.sum(axis=1)
        return (log_t, count), None

    (log_t, count), _ = jax.lax.scan(
        body, (jnp.zeros((r,)), jnp.zeros((r,), jnp.int32)),
        jnp.arange(n_steps))

    if grid.big_ids.shape[0] > 0:
        # dense once-per-ray pass over the big-surfel partition (the
        # (1-a) product is order-independent, so no merge is needed)
        def bbody(carry, blk):
            log_t, count = carry
            ids = jnp.broadcast_to(blk[None], (r, _BIG_BLOCK))
            cand = _test_candidates(geo, ids, rays_o, rays_d,
                                    jnp.full((r,), 0.01),
                                    jnp.full((r,), t_max), packed=packed)
            ok = ((cand["idx"] >= 0) & cand["valid"]
                  & (cand["opacity"] >= tracing.ALPHA_MIN)
                  & jnp.isfinite(cand["t"]))
            a = jnp.where(ok, jnp.minimum(cand["alpha"], tracing.ALPHA_MAX),
                          0.0)
            return (log_t + jnp.sum(jnp.log1p(-a), axis=1),
                    count + ok.sum(axis=1)), None

        (log_t, count), _ = jax.lax.scan(bbody, (log_t, count),
                                         _big_blocks(grid))

    vis = jnp.exp(log_t)
    vis = jnp.where(vis < 0.9, 0.0, vis)
    return {"visibility": vis[:, None], "contribute": count[:, None]}
