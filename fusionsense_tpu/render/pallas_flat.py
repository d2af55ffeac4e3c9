"""Flat segmented pair compositing: grid over 128-pair blocks, not (T, K).

The dense pallas_composite2 layout pays for EVERY tile at the hottest
tile's capacity K: the (T, K, 16) gather, the kernel block DMAs, and the
backward's dtab writes all scale with T*K while the live pair population
is typically 1.5-3x smaller (measured: the full train step runs 23.4 ->
10.6 ms as K drops 1536 -> 512 at bench scale). Here tiles own
variable-length block-aligned segments of ONE (pair_budget, 8+C) table
(render/binning.py flat_bin_gaussians), and the kernel walks blocks
sequentially:

- grid = (pair_budget / 128,). TPU pallas grids execute in order on one
  core, so per-tile state (running log-transmittance forward, the suffix
  accumulator backward) lives in VMEM scratch across grid steps,
- the output block index is data-dependent (scalar-prefetched blk_tile):
  consecutive blocks of one tile revisit the same VMEM-resident out block
  and accumulate; the block is flushed exactly once when the tile changes
  (tiles are contiguous in the flat order, so no block is ever revisited),
- early termination per block: once a tile's transmittance saturates, the
  remaining blocks of that tile skip all compute (their table DMAs still
  stream — bandwidth-bound, ~free),
- the backward runs the SAME grid over reversed block arrays, replaying
  from the forward's per-block log-transmittance carries (single sweep,
  no recomputation), writing |d mx|, |d my| into table cols 6, 7 so the
  absgrad densification statistic rides the one flat transpose for free,
- padding slots inside a tile's last block carry log_op = -1e10 from the
  table build, so alpha = 0 and no in-kernel masking is needed; blocks
  past the total population map to a dummy out row (sliced off by the
  caller).

Same math as pallas_composite2 (reference analog: gsplat's tile
rasterizer, consumed at dn_splatter/dn_model.py:570-591,618-656).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fusionsense_tpu.render.pallas_composite2 import (
    T_EPS_LOG,
    _alpha_of_chunk,
    _interpret,
    _pixel_xy,
    _tril_ones,
)


def _fwd_kernel(tile_ref, first_ref, count_ref, gtile_ref,
                tab_ref, out_ref, logt_ref, carry_ref, logt_s,
                *, tiles_x: int, tile_size: int, B: int, C: int,
                blend_bf16: bool = False):
    P = tile_size * tile_size
    b = pl.program_id(0)
    tril = _tril_ones(B)

    @pl.when(first_ref[b] == 1)
    def _init():
        logt_s[:, :] = jnp.zeros((1, P), jnp.float32)
        out_ref[0, :, :] = jnp.zeros((C, P), jnp.float32)

    log_t = logt_s[:, :]
    carry_ref[0, :, :] = log_t

    live = jnp.logical_and(count_ref[b] > 0, jnp.max(log_t) > T_EPS_LOG)

    @pl.when(live)
    def _blend():
        px, py = _pixel_xy(gtile_ref[b], tiles_x, tile_size, P)
        tab = tab_ref[:, :]
        pack = tab[:, 0:8]
        chan = tab[:, 8:8 + C]
        alpha, _, _ = _alpha_of_chunk(pack, px, py)
        lg = jnp.log1p(-alpha)
        cum = jnp.dot(tril, lg, preferred_element_type=jnp.float32)
        t_excl = jnp.exp(log_t + cum - lg)
        w = alpha * t_excl
        if blend_bf16:
            acc = jnp.dot(chan.T.astype(jnp.bfloat16),
                          w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(chan.T, w, preferred_element_type=jnp.float32)
        out_ref[0, :, :] += acc
        logt_s[:, :] = log_t + cum[B - 1:B, :]

    logt_ref[0, :, :] = logt_s[:, :]


def _bwd_kernel(rtile_ref, rfirst_ref, rcount_ref, rgtile_ref,
                tab_ref, g_out_ref, g_logt_ref, logt_ref, carry_ref,
                dtab_ref, s_ref,
                *, tiles_x: int, tile_size: int, B: int, C: int,
                blend_bf16: bool = False):
    P = tile_size * tile_size
    b = pl.program_id(0)
    tril = _tril_ones(B)

    # rfirst = the tile's LAST block in forward order (reversed walk)
    @pl.when(rfirst_ref[b] == 1)
    def _init():
        s_ref[:, :] = jnp.zeros((1, P), jnp.float32)

    log_t_in = carry_ref[0, :, :]
    live = jnp.logical_and(rcount_ref[b] > 0,
                           jnp.max(log_t_in) > T_EPS_LOG)

    @pl.when(live)
    def _grads():
        px, py = _pixel_xy(rgtile_ref[b], tiles_x, tile_size, P)
        tab = tab_ref[:, :]
        pack = tab[:, 0:8]
        chan = tab[:, 8:8 + C]
        g_out = g_out_ref[0, :, :]
        g_logt = g_logt_ref[0, :, :]
        t_fin = jnp.exp(logt_ref[0, :, :])

        alpha, alive, (dx, dy, ca, cb, cc) = _alpha_of_chunk(pack, px, py)
        lg = jnp.log1p(-alpha)
        cum = jnp.dot(tril, lg, preferred_element_type=jnp.float32)
        t_excl = jnp.exp(log_t_in + cum - lg)
        w = alpha * t_excl

        if blend_bf16:
            q = jnp.dot(chan.astype(jnp.bfloat16),
                        g_out.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        else:
            q = jnp.dot(chan, g_out, preferred_element_type=jnp.float32)
        a_term = w * q
        cum_a = jnp.dot(tril, a_term, preferred_element_type=jnp.float32)
        suffix = (cum_a[B - 1:B, :] - cum_a) + s_ref[:, :]

        inv1m = 1.0 / (1.0 - alpha)
        d_alpha = q * t_excl - suffix * inv1m - g_logt * t_fin * inv1m
        d_power = jnp.where(alive, alpha * d_alpha, 0.0)

        gx = ca * dx + cb * dy
        gy = cb * dx + cc * dy
        d_mx = jnp.sum(d_power * gx, axis=1, keepdims=True)
        d_my = jnp.sum(d_power * gy, axis=1, keepdims=True)
        d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=1, keepdims=True)
        d_cb = jnp.sum(d_power * (-dx * dy), axis=1, keepdims=True)
        d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=1, keepdims=True)
        d_lo = jnp.sum(d_power, axis=1, keepdims=True)
        if blend_bf16:
            d_chan = jnp.dot(w.astype(jnp.bfloat16),
                             g_out.T.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
        else:
            d_chan = jnp.dot(w, g_out.T, preferred_element_type=jnp.float32)
        dtab_ref[:, :] = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_lo,
             jnp.abs(d_mx), jnp.abs(d_my), d_chan], axis=1)
        s_ref[:, :] += jnp.sum(a_term, axis=0, keepdims=True)

    @pl.when(jnp.logical_not(live))
    def _dead():
        dtab_ref[:, :] = jnp.zeros((B, 8 + C), jnp.float32)


def _run_fwd(table, blk_tile, blk_first, blk_count, blk_gtile, num_tiles,
             *, tiles_x, tile_size, B, blend_bf16=False):
    PB, W = table.shape
    C = W - 8
    P = tile_size * tile_size
    nb = PB // B
    kern = functools.partial(_fwd_kernel, tiles_x=tiles_x,
                             tile_size=tile_size, B=B, C=C,
                             blend_bf16=blend_bf16)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4, grid=(nb,),
            in_specs=[
                pl.BlockSpec((B, W), lambda b, t, f, c, g: (b, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, C, P), lambda b, t, f, c, g: (t[b], 0, 0)),
                pl.BlockSpec((1, 1, P), lambda b, t, f, c, g: (t[b], 0, 0)),
                pl.BlockSpec((1, 1, P), lambda b, t, f, c, g: (b, 0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((1, P), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles + 1, C, P), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles + 1, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, P), jnp.float32),
        ],
        interpret=_interpret(),
    )(blk_tile, blk_first, blk_count, blk_gtile, table)


def _run_bwd(table, blk_tile, blk_count, blk_gtile,
             g_out, g_logt, logt, carries,
             *, tiles_x, tile_size, B, blend_bf16=False):
    PB, W = table.shape
    C = W - 8
    P = tile_size * tile_size
    nb = PB // B
    # reversed walk: block nb-1-b at grid step b; per-block arrays are
    # flipped so index maps stay simple lookups
    rtile = jnp.flip(blk_tile)
    rcount = jnp.flip(blk_count)
    rgtile = jnp.flip(blk_gtile)
    # first-in-reversed-order = the tile's last forward block
    rfirst = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (rtile[1:] != rtile[:-1]).astype(jnp.int32)])
    kern = functools.partial(_bwd_kernel, tiles_x=tiles_x,
                             tile_size=tile_size, B=B, C=C,
                             blend_bf16=blend_bf16)
    rev = lambda b: nb - 1 - b  # noqa: E731
    (dtab,) = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4, grid=(nb,),
            in_specs=[
                pl.BlockSpec((B, W), lambda b, t, f, c, g: (rev(b), 0)),
                pl.BlockSpec((1, C, P), lambda b, t, f, c, g: (t[b], 0, 0)),
                pl.BlockSpec((1, 1, P), lambda b, t, f, c, g: (t[b], 0, 0)),
                pl.BlockSpec((1, 1, P), lambda b, t, f, c, g: (t[b], 0, 0)),
                pl.BlockSpec((1, 1, P), lambda b, t, f, c, g: (rev(b), 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((B, W), lambda b, t, f, c, g: (rev(b), 0)),
            ],
            scratch_shapes=[pltpu.VMEM((1, P), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((PB, W), jnp.float32)],
        interpret=_interpret(),
    )(rtile, rfirst, rcount, rgtile, table, g_out, g_logt, logt, carries)
    return dtab


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def flat_composite(table, blk_tile, blk_first, blk_count, blk_gtile,
                   num_tiles, tiles_x, tile_size, B=128, blend_bf16=False):
    """Composite the flat segmented pair table.

    table: (pair_budget, 8 + C) rows [mx, my, ca, cb, cc, log_op,
      abs_tap_x, abs_tap_y, chan...]; dead/padding slots carry
      log_op = -1e10. Gradient cols 6, 7 return per-pair |position grad|
      (gsplat absgrad).
    blk_*: (pair_budget / B,) int32 block maps from flat_bin_gaussians;
      blk_gtile carries GLOBAL tile ids for pixel coordinates (equals
      blk_tile on a single device; offset under a tile-sharded mesh).
    Returns (out (num_tiles, P, C), alpha (num_tiles, P)).
    """
    out, logt, _ = _run_fwd(table, blk_tile, blk_first, blk_count,
                            blk_gtile, num_tiles, tiles_x=tiles_x,
                            tile_size=tile_size, B=B, blend_bf16=blend_bf16)
    return _mask_empty(out, logt, blk_tile, num_tiles)


def _mask_empty(out, logt, blk_tile, num_tiles):
    """Zero rows of tiles that own no blocks (their HBM is uninitialized)."""
    seen = jnp.zeros((num_tiles + 1,), jnp.bool_).at[blk_tile].set(True)
    m = seen[:num_tiles]
    # where, not multiply: uninitialized rows may hold NaN
    return (jnp.where(m[:, None, None],
                      jnp.swapaxes(out[:num_tiles], 1, 2), 0.0),
            jnp.where(m[:, None],
                      1.0 - jnp.exp(logt[:num_tiles, 0, :]), 0.0))


def _fwd_rule(table, blk_tile, blk_first, blk_count, blk_gtile,
              num_tiles, tiles_x, tile_size, B, blend_bf16):
    out, logt, carries = _run_fwd(
        table, blk_tile, blk_first, blk_count, blk_gtile, num_tiles,
        tiles_x=tiles_x, tile_size=tile_size, B=B, blend_bf16=blend_bf16)
    res = (table, blk_tile, blk_count, blk_gtile, logt, carries)
    return _mask_empty(out, logt, blk_tile, num_tiles), res


def _bwd_rule(num_tiles, tiles_x, tile_size, B, blend_bf16, res, g):
    table, blk_tile, blk_count, blk_gtile, logt, carries = res
    g_out, g_alpha = g
    C = table.shape[1] - 8
    P = tile_size * tile_size
    # dummy row T receives zero cotangent
    g_out_t = jnp.zeros((num_tiles + 1, C, P), jnp.float32).at[:num_tiles].set(
        jnp.swapaxes(g_out, 1, 2))
    g_logt = jnp.zeros((num_tiles + 1, 1, P), jnp.float32).at[:num_tiles, 0].set(
        -g_alpha)
    dtab = _run_bwd(table, blk_tile, blk_count, blk_gtile,
                    g_out_t, g_logt, logt, carries,
                    tiles_x=tiles_x, tile_size=tile_size, B=B,
                    blend_bf16=blend_bf16)
    return dtab, None, None, None, None


flat_composite.defvjp(_fwd_rule, _bwd_rule)
