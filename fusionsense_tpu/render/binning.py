"""Tile binning with static shapes: depth sort + capped pair expansion.

Replaces gsplat's dynamic tile-binning CUDA stage (atomic counters + radix
sort over (tile, depth) keys) with a shape-static TPU design:

1. argsort all Gaussians by depth once per frame (XLA global sort),
2. expand each Gaussian into at most MAX_TILES_PER_GAUSSIAN (tile, gaussian)
   pairs via a *static* slot loop with dynamic arithmetic (no data-dependent
   shapes),
3. stable-sort the pairs by tile id — stability preserves depth order within
   each tile — and slice each tile's first TILE_CAPACITY entries.

Everything downstream (gather + composite) sees fixed [num_tiles, capacity]
arrays, so jit compiles once per resolution/capacity bucket. Overflowing a
tile's capacity drops the *farthest* Gaussians (they are the most occluded);
the overflow count is returned for monitoring.
"""
from __future__ import annotations

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
    # scalar: pairs dropped because a Gaussian covered > max_tiles tiles
    truncated: jax.Array


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
    C = max_tiles_per_gaussian
    K = tile_capacity

    valid = radius > 0

    # ---- 1. global depth sort (invalid pushed to the back) ----------------
    sort_depth = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(sort_depth)                       # (N,) near -> far
    mean2d_s = mean2d[order]
    radius_s = radius[order]
    valid_s = valid[order]

    # ---- 2. capped expansion into (tile, gaussian) pairs ------------------
    # tile-bbox of each (sorted) Gaussian, clipped to the screen
    tx0 = jnp.clip(jnp.floor((mean2d_s[:, 0] - radius_s) / tile_size), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor((mean2d_s[:, 0] + radius_s) / tile_size), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor((mean2d_s[:, 1] - radius_s) / tile_size), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor((mean2d_s[:, 1] + radius_s) / tile_size), 0, tiles_y - 1)
    tx0, tx1, ty0, ty1 = (v.astype(jnp.int32) for v in (tx0, tx1, ty0, ty1))
    bw = tx1 - tx0 + 1                                    # dynamic values,
    bh = ty1 - ty0 + 1                                    # static shapes
    cover = bw * bh

    # static slot loop: slot j of Gaussian n covers tile (ty0 + j//bw, tx0 + j%bw)
    j = jnp.arange(C, dtype=jnp.int32)[None, :]           # (1, C)
    jx = j % bw[:, None]
    jy = j // bw[:, None]
    pair_ok = valid_s[:, None] & (j < cover[:, None])
    tile_id = (ty0[:, None] + jy) * tiles_x + (tx0[:, None] + jx)
    tile_id = jnp.where(pair_ok, tile_id, num_tiles)      # sentinel sorts last
    truncated = jnp.sum(jnp.where(valid_s, jnp.maximum(cover - C, 0), 0))

    # ---- 3. stable sort pairs by tile id ---------------------------------
    flat_tile = tile_id.reshape(-1)                       # (N*C,)
    # pair i corresponds to sorted-gaussian i//C -> original index order[i//C]
    flat_gauss = jnp.repeat(order.astype(jnp.int32), C)
    pair_order = jnp.argsort(flat_tile, stable=True)
    sorted_tile = flat_tile[pair_order]
    sorted_gauss = flat_gauss[pair_order]

    # per-tile segment starts/ends in the sorted pair array
    starts = jnp.searchsorted(sorted_tile, jnp.arange(num_tiles, dtype=jnp.int32))
    ends = jnp.searchsorted(sorted_tile, jnp.arange(1, num_tiles + 1, dtype=jnp.int32))
    counts = ends - starts
    overflow = jnp.sum(jnp.maximum(counts - K, 0))

    # ---- 4. slice each tile's first K pairs ------------------------------
    slot = jnp.arange(K, dtype=jnp.int32)[None, :]        # (1, K)
    gather_idx = jnp.minimum(starts[:, None] + slot, N * C - 1)
    idx = sorted_gauss[gather_idx]                        # (T, K)
    mask = slot < counts[:, None]
    idx = jnp.where(mask, idx, -1)

    return TileBins(indices=idx, mask=mask, overflow=overflow, truncated=truncated)
