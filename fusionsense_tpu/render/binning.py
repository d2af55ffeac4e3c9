"""Tile binning with static shapes: one fused-key sort over a static cover
window.

Replaces gsplat's dynamic tile-binning CUDA stage (atomic counters + radix
sort over (tile, depth) keys) with a shape-static TPU design:

1. each Gaussian may cover a static window of up to `window` x `window`
   tiles anchored at its bbox corner — enumerated with adds/compares only
   (no integer div/mod, which are slow on the VPU),
2. every (gaussian, window-slot) pair gets ONE int32 key
   `tile_id << 16 | depth_q` where depth_q is the 16-bit log-quantized
   depth (compositing only needs near-to-far order, not a perfect
   permutation — quantization replaces an N-element argsort + scatter),
   and a single fused sort orders pairs by tile then by depth,
3. per-tile segments located by searchsorted; each tile keeps its first
   TILE_CAPACITY (nearest) entries.

Everything downstream (gather + composite) sees fixed [num_tiles, capacity]
arrays, so jit compiles once per resolution/capacity bucket. Overflowing a
tile's capacity drops the *farthest* Gaussians (the most occluded); the
overflow count is returned for monitoring, as is the count of pairs dropped
by the static cover window.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TileBins(NamedTuple):
    # (num_tiles, capacity) indices into the *unsorted* Gaussian arrays,
    # depth-ordered within each tile; -1 marks an empty slot.
    indices: jax.Array
    # (num_tiles, capacity) bool validity mask
    mask: jax.Array
    # scalar: total (tile, gaussian) pairs dropped due to capacity overflow
    overflow: jax.Array
    # scalar: pairs dropped because a Gaussian covered more tiles than the
    # static window allows
    truncated: jax.Array
    # (N, C) landing position of each (gaussian, window-slot) pair in the
    # flattened (num_tiles * capacity) tile arrays, -1 if the pair was
    # dropped — lets gradient transposes run as GATHERS from the gaussian
    # side instead of scatter-adds (TPU scatters are ~2x slower per row)
    landing: jax.Array
    # (5,) pairs that WOULD be truncated at cover windows 1x1..5x5 —
    # telemetry for the trainer's auto-cover-window policy (pick the
    # smallest window whose truncation is negligible; every window step
    # changes the sort population by ~2x)
    trunc_by_win: jax.Array


def bin_gaussians(
    mean2d: jax.Array,     # (N, 2)
    radius: jax.Array,     # (N,) screen-space radius, 0 = culled
    depth: jax.Array,      # (N,)
    *,
    width: int,
    height: int,
    tile_size: int,
    tile_capacity: int,
    max_tiles_per_gaussian: int = 16,
) -> TileBins:
    N = mean2d.shape[0]
    tiles_x = -(-width // tile_size)
    tiles_y = -(-height // tile_size)
    num_tiles = tiles_x * tiles_y
    K = tile_capacity
    # static square cover window (e.g. cap 16 -> 4x4 tiles)
    win = max(1, int(math.isqrt(max_tiles_per_gaussian)))
    C = win * win

    depth_bits = 16
    assert (num_tiles + 1) << depth_bits < 2 ** 31, (
        "key overflow: reduce tiles (int64 path not implemented)")

    valid = radius > 0

    # ---- quantized depth keys (near -> far) --------------------------------
    # 16-bit log-space quantization over the valid depth range; equal-bucket
    # ties compose in arbitrary order, which is fine at ~1e-4 relative
    # depth resolution
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    d_safe = jnp.maximum(depth, 1e-12)
    log_d = jnp.log(jnp.where(valid, d_safe, big))
    lo = jnp.min(log_d)
    hi = jnp.max(jnp.where(valid, log_d, -big))
    span = jnp.maximum(hi - lo, 1e-12)
    n_q = (1 << depth_bits) - 1
    rank = jnp.clip(((log_d - lo) / span * n_q), 0, n_q).astype(jnp.int32)

    # ---- static-window pair expansion -------------------------------------
    tx0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    bw = tx1 - tx0 + 1
    bh = ty1 - ty0 + 1

    dx = jnp.arange(win, dtype=jnp.int32)
    dy = jnp.arange(win, dtype=jnp.int32)
    # (N, win, win) covered-tile ids
    tile_id = ((ty0[:, None, None] + dy[None, :, None]) * tiles_x
               + tx0[:, None, None] + dx[None, None, :])
    pair_ok = (valid[:, None, None]
               & (dy[None, :, None] < bh[:, None, None])
               & (dx[None, None, :] < bw[:, None, None]))
    cover = jnp.where(valid, jnp.maximum(bw, 0) * jnp.maximum(bh, 0), 0)
    truncated = jnp.sum(
        cover - jnp.where(valid,
                          jnp.minimum(bw, win) * jnp.minimum(bh, win), 0))
    # counterfactual truncation at candidate windows 1..5 (elementwise —
    # a few extra N-length reductions, negligible next to the sort)
    trunc_by_win = jnp.stack([
        jnp.sum(cover - jnp.where(
            valid, jnp.minimum(bw, w) * jnp.minimum(bh, w), 0))
        for w in range(1, 6)])

    key = jnp.where(pair_ok,
                    (tile_id << depth_bits) | rank[:, None, None],
                    jnp.int32((num_tiles << depth_bits)))
    flat_key = key.reshape(-1)                       # (N*C,)

    # ---- one fused sort orders pairs by (tile, depth) ---------------------
    # sort_key_val carries the pair id along with the key — cheaper than
    # argsort + two 1M-element gathers
    pair_ids = jax.lax.iota(jnp.int32, N * C)
    sorted_key, sorted_pair = jax.lax.sort_key_val(flat_key, pair_ids)
    sorted_tile = sorted_key >> depth_bits

    # ---- per-tile segments -------------------------------------------------
    bounds = jnp.searchsorted(sorted_tile,
                              jnp.arange(num_tiles + 1, dtype=jnp.int32))
    starts, ends = bounds[:-1], bounds[1:]
    counts = ends - starts
    overflow = jnp.sum(jnp.maximum(counts - K, 0))

    slot = jnp.arange(K, dtype=jnp.int32)[None, :]
    gather_idx = jnp.minimum(starts[:, None] + slot, N * C - 1)
    idx = sorted_pair[gather_idx] // C
    mask = slot < counts[:, None]
    idx = jnp.where(mask, idx, -1)

    # ---- landing map: pair -> flat (tile * K + slot) ----------------------
    # Compute each sorted position's flat tile slot IN SORTED ORDER (slot =
    # distance from the segment head, found with a cummax over
    # segment-start markers — a bandwidth-bound scan, not a 442k-row
    # dynamic gather of `starts`), then invert the sort by sorting the
    # flat slots back into pair order. Measured: the old
    # [perm-sort + starts-gather] form cost ~1.5 ms more at N*C=442k.
    i = jax.lax.iota(jnp.int32, N * C)
    is_start = jnp.concatenate([
        jnp.ones((1,), jnp.bool_), sorted_tile[1:] != sorted_tile[:-1]])
    seg_head = jax.lax.cummax(jnp.where(is_start, i, 0))
    slot_sorted = i - seg_head
    flat_sorted = jnp.where(
        (slot_sorted < K) & (sorted_tile < num_tiles),
        sorted_tile * K + slot_sorted, -1)
    _, landing_flat = jax.lax.sort_key_val(sorted_pair, flat_sorted)
    landing = landing_flat.reshape(N, C)

    return TileBins(indices=idx, mask=mask, overflow=overflow,
                    truncated=truncated, landing=landing,
                    trunc_by_win=trunc_by_win)


class FlatBins(NamedTuple):
    """Flat segmented pair layout: tiles own variable-length, block-aligned
    segments of ONE (pair_budget,) array instead of fixed (T, K) rows.

    The dense (T, K) layout sizes EVERY tile at the hottest tile's K — the
    gather, the kernel's dtab writes, and the elementwise masking all scale
    with T*K while the true pair population is 1.5-2.5x smaller. Aligning
    each tile's segment up to the kernel block (128) keeps pallas BlockSpec
    indexing valid while paying only ~T*B/2 padding. There is no per-tile
    capacity: overflow happens only when the TOTAL budget is exceeded
    (keep-nearest-K starvation — VERDICT round-2's quality cliff — cannot
    happen below budget).
    """

    gauss_ids: jax.Array    # (PB,) gaussian index per flat slot (clipped)
    valid: jax.Array        # (PB,) slot holds a live pair
    blk_tile: jax.Array     # (nb,) local tile of each 128-block; T = dummy
    blk_first: jax.Array    # (nb,) 1 if first block of its tile run
    blk_count: jax.Array    # (nb,) live pairs in this block (0..B)
    landing: jax.Array      # (N, C) pair -> flat slot, -1 if dropped
    overflow: jax.Array     # scalar: pairs dropped past the budget
    truncated: jax.Array    # scalar: pairs dropped by the cover window
    trunc_by_win: jax.Array  # (5,) counterfactual truncation telemetry
    used: jax.Array         # scalar: block-aligned live pair total (may
    #                         exceed pair_budget — feeds the budget policy)


def auto_expand_budget(pair_budget: int, n: int,
                       max_tiles_per_gaussian: int,
                       block: int = 128) -> int | None:
    """Compact-expansion budget for the production callers: 1.5x the pair
    budget (which the trainer's policy already sizes at ~1.25x the live
    pair population, so ~1.9x live), block-rounded — or None when the
    dense N*C enumeration is already at least as small (bench-scale
    populations, where the sort is pass-latency-bound anyway,
    DESIGN.md §5d-pre)."""
    win = max(1, int(math.isqrt(max_tiles_per_gaussian)))
    eb = -(-(pair_budget * 3 // 2) // block) * block
    return eb if eb < n * win * win else None


def flat_bin_gaussians(
    mean2d: jax.Array,
    radius: jax.Array,
    depth: jax.Array,
    *,
    width: int,
    height: int,
    tile_size: int,
    pair_budget: int,
    max_tiles_per_gaussian: int = 16,
    block: int = 128,
    tile_lo=0,
    num_tiles_local: int | None = None,
    compute_landing: bool = True,
    expand_budget: int | None = None,
) -> FlatBins:
    """Depth-sorted pairs laid out as block-aligned per-tile segments.

    tile_lo / num_tiles_local restrict the layout to the LOCAL tile block
    [tile_lo, tile_lo + num_tiles_local) for a tile-sharded caller
    (parallel/sharded.py): pairs covering other shards' tiles are dropped
    here (each shard builds its own layout; the landing map stays local and
    the parameter-gradient psum over the tile axis reassembles the full
    transpose). tile_lo may be a traced scalar (mesh axis_index).

    compute_landing=False skips the pair->flat-slot landing map — a second
    full N*C sort plus three N*C scans — for callers whose gradient
    transpose runs as a segment-sum over gauss_ids instead
    (rasterize._flat_select_scatter); landing comes back None.

    expand_budget (static) < N*C switches the pair enumeration from the
    dense window product (N*C rows, mostly dead at large N: culled
    gaussians and window slots beyond each bbox) to a COMPACT live-pair
    array of that many rows: an exclusive cumsum of per-gaussian live
    counts assigns contiguous segments, a scatter+cummax maps rows back to
    their gaussian, and a (rank, width) lookup table recovers each pair's
    window slot. Every sort and scan downstream then runs over
    expand_budget rows instead of N*C — the lever that matters in the
    100k+-alive regime, where N*C is 3-4x the live pair population
    (docs/DESIGN.md §5f). Live pairs keep the dense enumeration's exact
    order (gaussian-major, window-slot minor), so all outputs are
    IDENTICAL to the dense path as long as nothing is dropped; pairs past
    the budget are dropped gaussian-id-major, counted into `overflow`,
    and `used` reports the true need so the trainer's budget policy grows
    both budgets together (rasterize.py sizes expand_budget off
    pair_budget).
    """
    N = mean2d.shape[0]
    tiles_x = -(-width // tile_size)
    tiles_y = -(-height // tile_size)
    num_tiles_global = tiles_x * tiles_y
    num_tiles = (num_tiles_global if num_tiles_local is None
                 else num_tiles_local)
    B = block
    PB = pair_budget
    assert PB % B == 0, "pair_budget must be a multiple of the kernel block"
    win = max(1, int(math.isqrt(max_tiles_per_gaussian)))
    C = win * win

    depth_bits = 16
    assert (num_tiles + 1) << depth_bits < 2 ** 31

    valid = radius > 0

    big = jnp.float32(jnp.finfo(jnp.float32).max)
    d_safe = jnp.maximum(depth, 1e-12)
    log_d = jnp.log(jnp.where(valid, d_safe, big))
    lo = jnp.min(log_d)
    hi = jnp.max(jnp.where(valid, log_d, -big))
    span = jnp.maximum(hi - lo, 1e-12)
    n_q = (1 << depth_bits) - 1
    rank = jnp.clip(((log_d - lo) / span * n_q), 0, n_q).astype(jnp.int32)

    tx0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    bw = tx1 - tx0 + 1
    bh = ty1 - ty0 + 1

    cover = jnp.where(valid, jnp.maximum(bw, 0) * jnp.maximum(bh, 0), 0)
    truncated = jnp.sum(
        cover - jnp.where(valid,
                          jnp.minimum(bw, win) * jnp.minimum(bh, win), 0))
    trunc_by_win = jnp.stack([
        jnp.sum(cover - jnp.where(
            valid, jnp.minimum(bw, w) * jnp.minimum(bh, w), 0))
        for w in range(1, 6)])

    use_compact = expand_budget is not None and expand_budget < N * C
    if use_compact:
        EB = expand_budget
        w_live = jnp.where(valid, jnp.minimum(bw, win), 0)
        h_live = jnp.where(valid, jnp.minimum(bh, win), 0)
        c_live = w_live * h_live                              # (N,)
        S = (jnp.cumsum(c_live) - c_live).astype(jnp.int32)   # exclusive
        total_live = (S[-1] + c_live[-1]).astype(jnp.int32)
        # row -> gaussian: scatter each live gaussian's id at its segment
        # start, then cummax fills the segment (cheaper than an EB-row
        # binary search into S — one N-row scatter + one EB scan)
        start_ok = (c_live > 0) & (S < EB)
        gid = jax.lax.iota(jnp.int32, N)
        seg_mark = jnp.full((EB,), -1, jnp.int32).at[
            jnp.where(start_ok, S, EB)].max(
            jnp.where(start_ok, gid, -1), mode="drop")
        g_of = jnp.maximum(jax.lax.cummax(seg_mark), 0)       # (EB,)
        j = jax.lax.iota(jnp.int32, EB)
        r = j - S[g_of]                                       # live rank
        live = j < total_live
        # (rank, live-width) -> packed window slot dy*8+dx; r < win^2 <= 25
        # and w in [0, win] make this a tiny static table, one 1-D gather
        lut = np.zeros((win * win, win + 1), np.int32)
        for wv in range(1, win + 1):
            for rv in range(win * win):
                lut[rv, wv] = (rv // wv) * 8 + (rv % wv)
        packed = jnp.asarray(lut.reshape(-1))[
            jnp.clip(r, 0, win * win - 1) * (win + 1) + w_live[g_of]]
        dy_c = packed >> 3
        dx_c = packed & 7
        local_c = ((ty0[g_of] + dy_c) * tiles_x
                   + tx0[g_of] + dx_c - tile_lo)
        pair_live = live & (local_c >= 0) & (local_c < num_tiles)
        lid_c = jnp.clip(local_c, 0, num_tiles - 1)
        flat_key = jnp.where(pair_live,
                             (lid_c << depth_bits) | rank[g_of],
                             jnp.int32(num_tiles << depth_bits))
        n_pairs = EB
        expand_dropped = jnp.maximum(total_live - EB, 0)
    else:
        dx = jnp.arange(win, dtype=jnp.int32)
        dy = jnp.arange(win, dtype=jnp.int32)
        tile_id = ((ty0[:, None, None] + dy[None, :, None]) * tiles_x
                   + tx0[:, None, None] + dx[None, None, :])
        pair_ok = (valid[:, None, None]
                   & (dy[None, :, None] < bh[:, None, None])
                   & (dx[None, None, :] < bw[:, None, None]))
        local_id = tile_id - tile_lo
        pair_ok = pair_ok & (local_id >= 0) & (local_id < num_tiles)
        lid = jnp.clip(local_id, 0, num_tiles - 1)
        key = jnp.where(pair_ok,
                        (lid << depth_bits) | rank[:, None, None],
                        jnp.int32((num_tiles << depth_bits)))
        flat_key = key.reshape(-1)
        n_pairs = N * C
        expand_dropped = jnp.zeros((), jnp.int32)

    pair_ids = jax.lax.iota(jnp.int32, n_pairs)
    sorted_key, sorted_pair = jax.lax.sort_key_val(flat_key, pair_ids)
    sorted_tile = sorted_key >> depth_bits

    # ---- per-tile raw and block-aligned segment offsets (T-sized) ----------
    bounds = jnp.searchsorted(sorted_tile,
                              jnp.arange(num_tiles + 1, dtype=jnp.int32))
    starts, ends = bounds[:-1], bounds[1:]
    counts = ends - starts                                     # (T,)
    acounts = ((counts + B - 1) // B) * B
    astarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(acounts)[:-1]]).astype(jnp.int32)
    total_aligned = astarts[-1] + acounts[-1]
    overflow = jnp.sum(
        jnp.maximum(jnp.minimum(astarts + counts, total_aligned)
                    - jnp.maximum(astarts, PB), 0))

    # ---- block maps (nb-sized, cheap) --------------------------------------
    nb = PB // B
    bs = jax.lax.iota(jnp.int32, nb) * B
    t_of = jnp.clip(
        jnp.searchsorted(astarts, bs, side="right") - 1, 0, num_tiles - 1
    ).astype(jnp.int32)
    real = bs < total_aligned
    blk_tile = jnp.where(real, t_of, num_tiles)
    blk_count = jnp.where(
        real, jnp.clip(counts[t_of] - (bs - astarts[t_of]), 0, B), 0)
    blk_first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (blk_tile[1:] != blk_tile[:-1]).astype(jnp.int32)])

    # ---- flat gaussian ids (ONE narrow gather over the budget) -------------
    blk_sorted_start = starts[t_of] + (bs - astarts[t_of])
    sorted_pos = jnp.clip(
        blk_sorted_start[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :],
        0, n_pairs - 1).reshape(-1)
    if use_compact:
        gauss_ids = g_of[sorted_pair[sorted_pos]]
    else:
        gauss_ids = sorted_pair[sorted_pos] // C
    slot_in_blk = jnp.tile(jnp.arange(B, dtype=jnp.int32), nb)
    valid_flat = slot_in_blk < jnp.repeat(blk_count, B)

    # ---- landing map: pair -> flat slot, computed IN SORTED ORDER ----------
    # (same cummax trick as the dense path; the aligned segment start is
    # propagated from segment heads, where it equals the exclusive cumsum of
    # block-aligned segment lengths — identical to astarts by construction)
    landing = None
    if compute_landing:
        i = jax.lax.iota(jnp.int32, n_pairs)
        is_start = jnp.concatenate([
            jnp.ones((1,), jnp.bool_), sorted_tile[1:] != sorted_tile[:-1]])
        seg_head = jax.lax.cummax(jnp.where(is_start, i, 0))
        # next segment head strictly after i (reverse cummin of head indices)
        head_or_inf = jnp.where(is_start, i, n_pairs)
        nh_incl = jnp.flip(jax.lax.cummin(jnp.flip(head_or_inf)))
        nh = jnp.concatenate([nh_incl[1:], jnp.full((1,), n_pairs, jnp.int32)])
        seg_alen = jnp.where(is_start, ((nh - i + B - 1) // B) * B, 0)
        astart_head = jnp.cumsum(seg_alen) - seg_alen          # exclusive
        astart_elem = jax.lax.cummax(
            jnp.where(is_start, astart_head, 0)).astype(jnp.int32)
        flat_pos = astart_elem + (i - seg_head)
        ok = (sorted_tile < num_tiles) & (flat_pos < PB)
        landing_sorted = jnp.where(ok, flat_pos, -1)
        _, landing_flat = jax.lax.sort_key_val(sorted_pair, landing_sorted)
        if use_compact:
            # re-assemble the (N, C) pair->slot map from the compact rows:
            # window slot (dy, dx) of gaussian g is live rank dy*w + dx at
            # compact position S[g] + rank — one (N, C) gather from EB rows
            dy_s = jnp.arange(win, dtype=jnp.int32).repeat(win)[None, :]
            dx_s = jnp.tile(jnp.arange(win, dtype=jnp.int32), win)[None, :]
            rr = dy_s * w_live[:, None] + dx_s
            slot_live = (dy_s < h_live[:, None]) & (dx_s < w_live[:, None])
            pos = S[:, None] + rr
            in_eb = slot_live & (pos < EB)
            landing = jnp.where(
                in_eb, landing_flat[jnp.clip(pos, 0, EB - 1)], -1)
        else:
            landing = landing_flat.reshape(N, C)

    used = total_aligned
    if use_compact:
        # when the expand budget truncates, per-tile counts undercount the
        # true need — report it so the budget policy grows next sync
        used = jnp.maximum(total_aligned, total_live)
        overflow = overflow + expand_dropped

    return FlatBins(gauss_ids=gauss_ids, valid=valid_flat,
                    blk_tile=blk_tile, blk_first=blk_first,
                    blk_count=blk_count.astype(jnp.int32), landing=landing,
                    overflow=overflow, truncated=truncated,
                    trunc_by_win=trunc_by_win, used=used)
