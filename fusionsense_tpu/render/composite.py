"""Per-tile alpha compositing, matmul-formulated for the MXU.

TPU-native replacement for gsplat's per-pixel rasterize CUDA kernel
(consumed by the reference at dn_splatter/dn_model.py:570-591,618-656).
Instead of a warp-per-pixel loop, each tile composites ALL its binned
Gaussians with three dense ops:

  1. log-alpha:      logits = F @ K^T      (P x 6) @ (6 x K)   -> MXU
  2. transmittance:  T = exp(exclusive_cumsum(log1p(-alpha)))  -> VPU scan
  3. blend:          out = (alpha * T) @ C  (P x K) @ (K x C)  -> MXU

where F are per-pixel quadratic features [x^2, xy, y^2, x, y, 1] and K are
per-Gaussian conic coefficients from fusionsense_tpu/render/project.py.
RGB + expected depth + normals + alpha come out of ONE pass (the reference
needs two rasterizer calls: dn_model.py:570 and :644).

The whole function is differentiable; XLA's autodiff provides the backward
(the cumsum VJP is another cumsum). Tiles are processed in chunks under
jax.checkpoint to bound the live (tiles, pixels, capacity) alpha tensor.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA_MAX = 0.999
ALPHA_MIN = 1.0 / 255.0
LOG_ALPHA_MAX = math.log(ALPHA_MAX)


class TileGrid(NamedTuple):
    width: int
    height: int
    tile_size: int

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_size)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_size)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def pixels_per_tile(self) -> int:
        return self.tile_size * self.tile_size


def pixel_features(grid: TileGrid) -> jax.Array:
    """(num_tiles, P, 6) quadratic pixel features [x^2, xy, y^2, x, y, 1].

    Pixel centers at integer+0.5 coordinates, matching the projection.
    """
    ts = grid.tile_size
    ty, tx = grid.tiles_y, grid.tiles_x
    # per-tile local pixel offsets
    local = jnp.arange(ts, dtype=jnp.float32) + 0.5
    ly, lx = jnp.meshgrid(local, local, indexing="ij")          # (ts, ts)
    # tile origins
    ox = (jnp.arange(tx, dtype=jnp.float32) * ts)[None, :, None, None]
    oy = (jnp.arange(ty, dtype=jnp.float32) * ts)[:, None, None, None]
    px = jnp.broadcast_to(ox + lx[None, None], (ty, tx, ts, ts)).reshape(ty * tx, ts * ts)
    py = jnp.broadcast_to(oy + ly[None, None], (ty, tx, ts, ts)).reshape(ty * tx, ts * ts)
    one = jnp.ones_like(px)
    return jnp.stack([px * px, px * py, py * py, px, py, one], axis=-1)


def _composite_chunk(
    feats: jax.Array,       # (t, P, 6)
    coeffs: jax.Array,      # (t, K, 6)
    channels: jax.Array,    # (t, K, C)
) -> tuple[jax.Array, jax.Array]:
    """Composite one chunk of tiles. Returns (out (t,P,C), alpha_map (t,P))."""
    logits = jnp.einsum("tpf,tkf->tpk", feats, coeffs,
                        preferred_element_type=jnp.float32)
    alpha = jnp.exp(jnp.minimum(logits, LOG_ALPHA_MAX))
    # gsplat skips contributions below 1/255 (dn_model relies on this clamp)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    log_t = jnp.log1p(-alpha)                                   # <= 0
    cum = jnp.cumsum(log_t, axis=-1)
    trans_excl = jnp.exp(cum - log_t)                           # exclusive prefix
    w = alpha * trans_excl                                      # (t, P, K)
    out = jnp.einsum("tpk,tkc->tpc", w, channels,
                     preferred_element_type=jnp.float32)
    alpha_map = 1.0 - jnp.exp(cum[..., -1])
    return out, alpha_map


def composite_tiles(
    feats: jax.Array,        # (T, P, 6) from pixel_features
    tile_coeffs: jax.Array,  # (T, K, 6) gathered per-tile Gaussian coeffs
    tile_channels: jax.Array,  # (T, K, C)
    *,
    tile_chunk: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Chunked + rematerialized compositing over all tiles.

    Returns (out (T, P, C), alpha (T, P)).
    """
    T = feats.shape[0]
    chunk = min(tile_chunk, T)
    pad = (-T) % chunk
    if pad:
        feats = jnp.concatenate([feats, jnp.zeros_like(feats[:pad])], 0)
        tile_coeffs = jnp.concatenate(
            [tile_coeffs, jnp.full_like(tile_coeffs[:pad], 0).at[..., 5].set(-1e10)], 0)
        tile_channels = jnp.concatenate(
            [tile_channels, jnp.zeros_like(tile_channels[:pad])], 0)
    n_chunks = feats.shape[0] // chunk
    reshape = lambda x: x.reshape((n_chunks, chunk) + x.shape[1:])
    fn = jax.checkpoint(_composite_chunk)
    out, alpha = jax.lax.map(lambda args: fn(*args),
                             (reshape(feats), reshape(tile_coeffs), reshape(tile_channels)))
    out = out.reshape((n_chunks * chunk,) + out.shape[2:])[:T]
    alpha = alpha.reshape((n_chunks * chunk,) + alpha.shape[2:])[:T]
    return out, alpha


def tiles_to_image(tiled: jax.Array, grid: TileGrid) -> jax.Array:
    """(T, P, C) or (T, P) tile-major -> (H, W, C) / (H, W) image, cropped."""
    squeeze = tiled.ndim == 2
    if squeeze:
        tiled = tiled[..., None]
    ts, ty, tx = grid.tile_size, grid.tiles_y, grid.tiles_x
    C = tiled.shape[-1]
    img = (
        tiled.reshape(ty, tx, ts, ts, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(ty * ts, tx * ts, C)
    )[: grid.height, : grid.width]
    return img[..., 0] if squeeze else img
