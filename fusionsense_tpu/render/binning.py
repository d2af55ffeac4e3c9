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
