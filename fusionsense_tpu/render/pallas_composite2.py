"""Pallas compositing v2: direct conic evaluation + absgrad backward.

Differences from fusionsense_tpu/render/pallas_composite.py (v1):
- per-slot payload is (mx, my, ca, cb, cc, log_op) and the kernel evaluates
  power = -(0.5 ca dx^2 + cb dx dy + 0.5 cc dy^2) from dx = px - mx
  directly. The v1 quadratic-coefficient matmul loses ~3 digits to
  cancellation at pixel coords ~10^3; the dx/dy form is exact where it
  matters,
- the hand-written backward emits per-(tile, slot) gradients for the screen
  position AND their absolute values — scatter-added outside, this gives
  gsplat's absgrad densification statistic exactly (sum over tiles of
  |per-tile position gradient|, reference dn_model consumes it via
  means2d.absgrad),
- single-sweep backward: the forward stores per-chunk log-transmittance
  carries and the early-termination chunk count, so the backward replays
  nothing and skips chunks the forward never composited (matching its
  early-exit numerics exactly).

Exposed as rasterize(..., backend="pallas") via pallas_composite2 with a
zero-valued `absgrad_tap` input whose custom-vjp "gradient" carries the
absolute accumulation.
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
    """pack_c (B, 8): [mx, my, ca, cb, cc, log_op, 0, 0] -> alpha (B, P)."""
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


def _fwd_kernel(count_ref, pack_ref, chan_ref, out_ref, logt_ref,
                carry_ref, nused_ref,
                *, tiles_x: int, tile_size: int, B: int, K: int, C: int,
                blend_bf16: bool = False):
    P = tile_size * tile_size
    i = pl.program_id(0)
    px, py = _pixel_xy(i, tiles_x, tile_size, P)
    n_chunks = (count_ref[i] + B - 1) // B
    tril = _tril_ones(B)

    def body(state):
        c, log_t, acc = state
        pack_c = pack_ref[0, pl.ds(c * B, B), :]
        chan_c = chan_ref[0, pl.ds(c * B, B), :]
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


def _bwd_kernel(neff_ref, pack_ref, chan_ref, g_out_ref, g_logt_ref,
                logt_ref, carry_ref,
                dpack_ref, dchan_ref, dabs_ref,
                *, tiles_x: int, tile_size: int, B: int, K: int, C: int,
                blend_bf16: bool = False):
    P = tile_size * tile_size
    i = pl.program_id(0)
    px, py = _pixel_xy(i, tiles_x, tile_size, P)
    n_eff = neff_ref[i]          # chunks the forward actually composited
    tril = _tril_ones(B)

    g_out = g_out_ref[0, :, :]
    g_logt = g_logt_ref[0, :, :]
    t_fin = jnp.exp(logt_ref[0, :, :])

    dpack_ref[0, :, :] = jnp.zeros((K, 8), jnp.float32)
    dchan_ref[0, :, :] = jnp.zeros((K, C), jnp.float32)
    dabs_ref[0, :, :] = jnp.zeros((K, 8), jnp.float32)

    def bwd_body(k, S):
        c = n_eff - 1 - k
        pack_c = pack_ref[0, pl.ds(c * B, B), :]
        chan_c = chan_ref[0, pl.ds(c * B, B), :]
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
        zero = jnp.zeros_like(d_lo)
        dpack = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_lo, zero, zero], axis=1)
        dpack_ref[0, pl.ds(c * B, B), :] = dpack
        # per-tile ABSOLUTE position grads: gsplat's absgrad statistic
        dabs_ref[0, pl.ds(c * B, B), :] = jnp.concatenate(
            [jnp.abs(d_mx), jnp.abs(d_my), zero, zero, zero, zero, zero,
             zero], axis=1)
        if blend_bf16:
            dchan_ref[0, pl.ds(c * B, B), :] = jnp.dot(
                w.astype(jnp.bfloat16), g_out.T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        else:
            dchan_ref[0, pl.ds(c * B, B), :] = jnp.dot(
                w, g_out.T, preferred_element_type=jnp.float32)
        return S + jnp.sum(a_term, axis=0, keepdims=True)

    jax.lax.fori_loop(0, n_eff, bwd_body, jnp.zeros((1, P), jnp.float32))


def _run_fwd(pack, chan, counts, *, tiles_x, tile_size, B, blend_bf16=False):
    T, K, _ = pack.shape
    C = chan.shape[-1]
    P = tile_size * tile_size
    kern = functools.partial(_fwd_kernel, tiles_x=tiles_x,
                             tile_size=tile_size, B=B, K=K, C=C,
                             blend_bf16=blend_bf16)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(T,),
            in_specs=[
                pl.BlockSpec((1, K, 8), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, K, C), lambda i, c: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, C, P), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, 1, P), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, K // B, P), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda i, c: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((T, C, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, K // B, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, 128), jnp.int32),
        ],
        interpret=_interpret(),
    )(counts, pack, chan)


def _run_bwd(pack, chan, neff, g_out, g_logt, logt, carries,
             *, tiles_x, tile_size, B, blend_bf16=False):
    T, K, _ = pack.shape
    C = chan.shape[-1]
    P = tile_size * tile_size
    kern = functools.partial(_bwd_kernel, tiles_x=tiles_x,
                             tile_size=tile_size, B=B, K=K, C=C,
                             blend_bf16=blend_bf16)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(T,),
            in_specs=[
                pl.BlockSpec((1, K, 8), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, K, C), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, C, P), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, 1, P), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, 1, P), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, K // B, P), lambda i, c: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, K, 8), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, K, C), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, K, 8), lambda i, c: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((T, K, 8), jnp.float32),
            jax.ShapeDtypeStruct((T, K, C), jnp.float32),
            jax.ShapeDtypeStruct((T, K, 8), jnp.float32),
        ],
        interpret=_interpret(),
    )(neff, pack, chan, g_out, g_logt, logt, carries)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def pallas_composite2(pack, chan, counts, absgrad_tap,
                      tiles_x, tile_size, B=128, blend_bf16=False):
    """Fused compositing, direct-conic form.

    pack: (T, K, 8) [mx, my, ca, cb, cc, log_op, 0, 0]; dead slots must
      carry log_op = -1e10.
    chan: (T, K, C); counts (T,) int32; absgrad_tap (T, K, 2) zeros — its
      custom-vjp gradient returns the per-(tile, slot) |position grad|.
    Returns (out (T, P, C), alpha (T, P)).
    """
    out, logt, _, _ = _run_fwd(pack, chan, counts, tiles_x=tiles_x,
                               tile_size=tile_size, B=B,
                               blend_bf16=blend_bf16)
    return jnp.swapaxes(out, 1, 2), 1.0 - jnp.exp(logt[:, 0, :])


def _fwd_rule(pack, chan, counts, absgrad_tap, tiles_x, tile_size, B,
              blend_bf16):
    out, logt, carries, nused = _run_fwd(
        pack, chan, counts, tiles_x=tiles_x, tile_size=tile_size, B=B,
        blend_bf16=blend_bf16)
    return ((jnp.swapaxes(out, 1, 2), 1.0 - jnp.exp(logt[:, 0, :])),
            (pack, chan, nused[:, 0, 0], logt, carries))


def _bwd_rule(tiles_x, tile_size, B, blend_bf16, res, g):
    pack, chan, neff, logt, carries = res
    g_out, g_alpha = g
    g_out_t = jnp.swapaxes(g_out, 1, 2)
    g_logt = (-g_alpha)[:, None, :]
    dpack, dchan, dabs = _run_bwd(pack, chan, neff, g_out_t, g_logt, logt,
                                  carries, tiles_x=tiles_x,
                                  tile_size=tile_size, B=B,
                                  blend_bf16=blend_bf16)
    return dpack, dchan, None, dabs[..., :2]


pallas_composite2.defvjp(_fwd_rule, _bwd_rule)
