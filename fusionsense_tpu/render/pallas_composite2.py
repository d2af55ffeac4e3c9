"""Pallas compositing v2: direct conic evaluation + absgrad backward.

Single fused-table design: per-(tile, slot) payload is ONE (K, 8 + C) row
  cols 0..7   [mx, my, ca, cb, cc, log_op, abs_tap_x, abs_tap_y]
  cols 8..    C blended channels (rgb, depth, normal, pad)
so the whole rasterizer does exactly ONE (T, K, 8+C) gather on the way in
and its transpose is exactly ONE scatter-add on the way out. TPU dynamic
gathers/scatters are per-row-overhead bound (~100x below memcpy bandwidth);
three narrow gathers (pack / channels / absgrad tap) cost nearly 3x one wide
one, so fusing the table is a direct multi-ms win at bench scale.

Kernel details (unchanged from the two-input revision):
- the kernel evaluates power = -(0.5 ca dx^2 + cb dx dy + 0.5 cc dy^2) from
  dx = px - mx directly (the quadratic-coefficient matmul form loses ~3
  digits to cancellation at pixel coords ~10^3),
- prefix transmittance as tril-ones MXU matmuls (no cumsum lowering on
  Pallas TPU),
- early termination: a while_loop exits when every pixel saturates,
- single-sweep backward: the forward stores per-chunk log-transmittance
  carries and the early-termination chunk count, so the backward replays
  nothing and skips chunks the forward never composited,
- the backward writes |d mx|, |d my| into table cols 6, 7 — the zero-valued
  abs_tap columns — so gsplat's absgrad densification statistic (reference
  dn_model consumes means2d.absgrad) rides the one scatter for free.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MAX = 0.999
ALPHA_MIN = 1.0 / 255.0
LOG_ALPHA_MAX = math.log(ALPHA_MAX)
T_EPS_LOG = -9.21


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _tril_ones(B: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    return (r >= c).astype(jnp.float32)


def _pixel_xy(tile_idx, tiles_x: int, tile_size: int, P: int):
    ts = tile_size
    ox = ((tile_idx % tiles_x) * ts).astype(jnp.float32)
    oy = ((tile_idx // tiles_x) * ts).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = ox + (lane % ts).astype(jnp.float32) + 0.5
    py = oy + (lane // ts).astype(jnp.float32) + 0.5
    return px, py


def _alpha_of_chunk(pack_c, px, py):
    """pack_c (B, >=6): [mx, my, ca, cb, cc, log_op, ...] -> alpha (B, P)."""
    mx = pack_c[:, 0:1]
    my = pack_c[:, 1:2]
    ca = pack_c[:, 2:3]
    cb = pack_c[:, 3:4]
    cc = pack_c[:, 4:5]
    lo = pack_c[:, 5:6]
    dx = px - mx                                  # (B, P)
    dy = py - my
    power = -(0.5 * ca * dx * dx + cb * dx * dy + 0.5 * cc * dy * dy) + lo
    alpha_raw = jnp.exp(jnp.minimum(power, LOG_ALPHA_MAX))
    alive = jnp.logical_and(alpha_raw >= ALPHA_MIN, power < LOG_ALPHA_MAX)
    alpha = jnp.where(alpha_raw < ALPHA_MIN, 0.0, alpha_raw)
    return alpha, alive, (dx, dy, ca, cb, cc)


def _fwd_kernel(count_ref, tid_ref, tab_ref, out_ref, logt_ref, carry_ref,
                nused_ref,
                *, tiles_x: int, tile_size: int, B: int, K: int, C: int,
                blend_bf16: bool = False):
    P = tile_size * tile_size
    i = pl.program_id(0)
    # tid maps the local block row to its GLOBAL tile id, so a sharded
    # caller can composite its tile slice with correct pixel coordinates
    px, py = _pixel_xy(tid_ref[i], tiles_x, tile_size, P)
    n_chunks = (count_ref[i] + B - 1) // B
    tril = _tril_ones(B)

    def body(state):
        c, log_t, acc = state
        tab_c = tab_ref[0, pl.ds(c * B, B), :]
        pack_c = tab_c[:, 0:8]
        chan_c = tab_c[:, 8:8 + C]
        # record log T entering this chunk: the backward replays from these
        # carries instead of re-running the whole forward sweep
        carry_ref[0, pl.ds(c, 1), :] = log_t
        alpha, _, _ = _alpha_of_chunk(pack_c, px, py)
        lg = jnp.log1p(-alpha)
        cum = jnp.dot(tril, lg, preferred_element_type=jnp.float32)
        t_excl = jnp.exp(log_t + cum - lg)
        w = alpha * t_excl
        if blend_bf16:
            acc = acc + jnp.dot(chan_c.T.astype(jnp.bfloat16),
                                w.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
        else:
            acc = acc + jnp.dot(chan_c.T, w,
                                preferred_element_type=jnp.float32)
        log_t = log_t + cum[B - 1:B, :]
        return c + 1, log_t, acc

    def cond(state):
        c, log_t, _ = state
        return jnp.logical_and(c < n_chunks, jnp.max(log_t) > T_EPS_LOG)

    c_fin, log_t, acc = jax.lax.while_loop(
        cond, body,
        (0, jnp.zeros((1, P), jnp.float32), jnp.zeros((C, P), jnp.float32)))
    out_ref[0, :, :] = acc
    logt_ref[0, :, :] = log_t
    # chunks actually composited before early termination — the backward
    # skips everything past this (those chunks contributed nothing)
    nused_ref[0, :, :] = jnp.full((1, 128), c_fin, jnp.int32)


def _bwd_kernel(neff_ref, tid_ref, tab_ref, g_out_ref, g_logt_ref,
                logt_ref, carry_ref, dtab_ref,
                *, tiles_x: int, tile_size: int, B: int, K: int, C: int,
                blend_bf16: bool = False):
    P = tile_size * tile_size
    i = pl.program_id(0)
    px, py = _pixel_xy(tid_ref[i], tiles_x, tile_size, P)
    n_eff = neff_ref[i]          # chunks the forward actually composited
    tril = _tril_ones(B)

    g_out = g_out_ref[0, :, :]
    g_logt = g_logt_ref[0, :, :]
    t_fin = jnp.exp(logt_ref[0, :, :])

    dtab_ref[0, :, :] = jnp.zeros((K, 8 + C), jnp.float32)

    def bwd_body(k, S):
        c = n_eff - 1 - k
        tab_c = tab_ref[0, pl.ds(c * B, B), :]
        pack_c = tab_c[:, 0:8]
        chan_c = tab_c[:, 8:8 + C]
        alpha, alive, (dx, dy, ca, cb, cc) = _alpha_of_chunk(pack_c, px, py)
        lg = jnp.log1p(-alpha)
        cum = jnp.dot(tril, lg, preferred_element_type=jnp.float32)
        log_t_in = carry_ref[0, pl.ds(c, 1), :]
        t_excl = jnp.exp(log_t_in + cum - lg)
        w = alpha * t_excl

        if blend_bf16:
            q = jnp.dot(chan_c.astype(jnp.bfloat16),
                        g_out.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        else:
            q = jnp.dot(chan_c, g_out, preferred_element_type=jnp.float32)
        a_term = w * q
        cum_a = jnp.dot(tril, a_term, preferred_element_type=jnp.float32)
        suffix = (cum_a[B - 1:B, :] - cum_a) + S

        inv1m = 1.0 / (1.0 - alpha)
        d_alpha = q * t_excl - suffix * inv1m - g_logt * t_fin * inv1m
        d_power = jnp.where(alive, alpha * d_alpha, 0.0)   # (B, P)

        # chain through power = -(.5 ca dx^2 + cb dx dy + .5 cc dy^2) + lo
        gx = ca * dx + cb * dy                               # -d power/d dx
        gy = cb * dx + cc * dy
        d_mx = jnp.sum(d_power * gx, axis=1, keepdims=True)  # d dx/d mx = -1
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
        # cols 6, 7 carry the per-tile ABSOLUTE position grads — gsplat's
        # absgrad statistic — through the single table scatter
        dtab = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_lo,
             jnp.abs(d_mx), jnp.abs(d_my), d_chan], axis=1)
        dtab_ref[0, pl.ds(c * B, B), :] = dtab
        return S + jnp.sum(a_term, axis=0, keepdims=True)

    jax.lax.fori_loop(0, n_eff, bwd_body, jnp.zeros((1, P), jnp.float32))


def _run_fwd(table, counts, tile_ids, *, tiles_x, tile_size, B,
             blend_bf16=False):
    T, K, W = table.shape
    C = W - 8
    P = tile_size * tile_size
    kern = functools.partial(_fwd_kernel, tiles_x=tiles_x,
                             tile_size=tile_size, B=B, K=K, C=C,
                             blend_bf16=blend_bf16)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(T,),
            in_specs=[
                pl.BlockSpec((1, K, W), lambda i, c, t: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, C, P), lambda i, c, t: (i, 0, 0)),
                pl.BlockSpec((1, 1, P), lambda i, c, t: (i, 0, 0)),
                pl.BlockSpec((1, K // B, P), lambda i, c, t: (i, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda i, c, t: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((T, C, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, K // B, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, 128), jnp.int32),
        ],
        interpret=_interpret(),
    )(counts, tile_ids, table)


def _run_bwd(table, neff, tile_ids, g_out, g_logt, logt, carries,
             *, tiles_x, tile_size, B, blend_bf16=False):
    T, K, W = table.shape
    C = W - 8
    P = tile_size * tile_size
    kern = functools.partial(_bwd_kernel, tiles_x=tiles_x,
                             tile_size=tile_size, B=B, K=K, C=C,
                             blend_bf16=blend_bf16)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(T,),
            in_specs=[
                pl.BlockSpec((1, K, W), lambda i, c, t: (i, 0, 0)),
                pl.BlockSpec((1, C, P), lambda i, c, t: (i, 0, 0)),
                pl.BlockSpec((1, 1, P), lambda i, c, t: (i, 0, 0)),
                pl.BlockSpec((1, 1, P), lambda i, c, t: (i, 0, 0)),
                pl.BlockSpec((1, K // B, P), lambda i, c, t: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, K, W), lambda i, c, t: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((T, K, W), jnp.float32),
        ],
        interpret=_interpret(),
    )(neff, tile_ids, table, g_out, g_logt, logt, carries)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pallas_composite2(table, counts, tile_ids, tiles_x, tile_size, B=128,
                      blend_bf16=False):
    """Fused compositing over the single per-tile table.

    table: (T, K, 8 + C) rows [mx, my, ca, cb, cc, log_op, abs_tap_x,
      abs_tap_y, chan_0..chan_{C-1}]; dead slots must carry log_op = -1e10.
      The gradient's cols 6, 7 return the per-(tile, slot) |position grad|
      (feed zeros in; gsplat's absgrad comes out of the scatter transpose).
    counts: (T,) int32 live slots per tile.
    tile_ids: (T,) int32 GLOBAL tile id per table row — arange(T) for a
      full image, an offset slice when a sharded caller composites only
      its local tile block.
    Returns (out (T, P, C), alpha (T, P)).
    """
    out, logt, _, _ = _run_fwd(table, counts, tile_ids, tiles_x=tiles_x,
                               tile_size=tile_size, B=B,
                               blend_bf16=blend_bf16)
    return jnp.swapaxes(out, 1, 2), 1.0 - jnp.exp(logt[:, 0, :])


def _fwd_rule(table, counts, tile_ids, tiles_x, tile_size, B, blend_bf16):
    out, logt, carries, nused = _run_fwd(
        table, counts, tile_ids, tiles_x=tiles_x, tile_size=tile_size, B=B,
        blend_bf16=blend_bf16)
    return ((jnp.swapaxes(out, 1, 2), 1.0 - jnp.exp(logt[:, 0, :])),
            (table, nused[:, 0, 0], logt, carries, tile_ids))


def _bwd_rule(tiles_x, tile_size, B, blend_bf16, res, g):
    table, neff, logt, carries, tile_ids = res
    g_out, g_alpha = g
    g_out_t = jnp.swapaxes(g_out, 1, 2)
    g_logt = (-g_alpha)[:, None, :]
    (dtab,) = _run_bwd(table, neff, tile_ids, g_out_t, g_logt, logt,
                       carries, tiles_x=tiles_x, tile_size=tile_size, B=B,
                       blend_bf16=blend_bf16)
    return dtab, None, None


pallas_composite2.defvjp(_fwd_rule, _bwd_rule)
