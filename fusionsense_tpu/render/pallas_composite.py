"""Fused per-tile alpha compositing as Pallas TPU kernels.

The pure-JAX compositor (fusionsense_tpu/render/composite.py) materializes
the (tiles, pixels, capacity) alpha tensor in HBM because XLA's cumsum
forces it. These kernels stream Gaussian chunks through VMEM instead:

forward, per tile (one grid program per tile):
  - pixel quadratic features built in-register from the tile origin,
  - for each chunk of B Gaussians: logits = coeff @ feats (MXU),
    alpha -> transmittance via a chunk cumsum + scalar carry,
    out += chan^T @ (alpha * T) (MXU),
  - EARLY TERMINATION: the chunk loop stops when every pixel's
    transmittance is saturated or the tile's bin count is exhausted —
    work scales with actual splats, not tile capacity (the TPU analog of
    gsplat's per-warp saturation break).

backward (custom_vjp): two in-register sweeps — a forward sweep recording
per-chunk transmittance carries, then a reverse sweep with suffix
accumulators. Standard 3DGS backward identities:
  dL/dalpha_b = q_b * T_b - S_b / (1 - alpha_b),  q_b = g_out . chan_b,
  S_b = suffix sum of w_j q_j, plus the alpha-map term g_amap*T_fin/(1-a).

Layouts: alpha and weights live as (B, P) with B=chunk on sublanes and
P=pixels on lanes; both matmuls contract over MXU-friendly dims.
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
T_EPS_LOG = -9.21  # log(1e-4): saturation threshold


def _interpret() -> bool:
    """Interpret-mode on CPU so the same tests run without a TPU."""
    return jax.default_backend() == "cpu"


def _tril_ones(B: int):
    """(B, B) lower-triangular (incl. diagonal) ones matrix.

    Prefix sums inside the kernel are computed as tril @ x on the MXU —
    Pallas TPU has no cumsum lowering, and one 128x128 matmul per chunk is
    effectively free next to the blend matmuls.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    return (r >= c).astype(jnp.float32)


def _pixel_feats(tile_idx, tiles_x: int, tile_size: int, P: int):
    """(6, P) pixel features [x^2, xy, y^2, x, y, 1] for this tile."""
    ts = tile_size
    ox = ((tile_idx % tiles_x) * ts).astype(jnp.float32)
    oy = ((tile_idx // tiles_x) * ts).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = ox + (lane % ts).astype(jnp.float32) + 0.5
    py = oy + (lane // ts).astype(jnp.float32) + 0.5
    one = jnp.ones_like(px)
    return jnp.concatenate([px * px, px * py, py * py, px, py, one], axis=0)


def _fwd_kernel(count_ref, coeff_ref, chan_ref, out_ref, logt_ref,
                *, tiles_x: int, tile_size: int, B: int, K: int, C: int):
    P = tile_size * tile_size
    i = pl.program_id(0)
    feats = _pixel_feats(i, tiles_x, tile_size, P)          # (6, P)
    n_chunks = (count_ref[i] + B - 1) // B

    def body(state):
        c, log_t, acc = state
        coeff_c = coeff_ref[0, pl.ds(c * B, B), :]          # (B, 6)
        chan_c = chan_ref[0, pl.ds(c * B, B), :]            # (B, C)
        logits = jnp.dot(coeff_c, feats,
                         preferred_element_type=jnp.float32)  # (B, P)
        alpha = jnp.exp(jnp.minimum(logits, LOG_ALPHA_MAX))
        alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
        lg = jnp.log1p(-alpha)
        cum = jnp.dot(_tril_ones(B), lg,
                      preferred_element_type=jnp.float32)   # inclusive prefix
        t_excl = jnp.exp(log_t + cum - lg)                  # (B, P)
        w = alpha * t_excl
        acc = acc + jnp.dot(chan_c.T, w,
                            preferred_element_type=jnp.float32)  # (C, P)
        log_t = log_t + cum[B - 1:B, :]
        return c + 1, log_t, acc

    def cond(state):
        c, log_t, _ = state
        return jnp.logical_and(c < n_chunks,
                               jnp.max(log_t) > T_EPS_LOG)

    log_t0 = jnp.zeros((1, P), jnp.float32)
    acc0 = jnp.zeros((C, P), jnp.float32)
    _, log_t, acc = jax.lax.while_loop(cond, body, (0, log_t0, acc0))
    out_ref[0, :, :] = acc
    logt_ref[0, :, :] = log_t


def _bwd_kernel(count_ref, coeff_ref, chan_ref, g_out_ref, g_logt_ref,
                dcoeff_ref, dchan_ref, carries_ref,
                *, tiles_x: int, tile_size: int, B: int, K: int, C: int):
    P = tile_size * tile_size
    i = pl.program_id(0)
    feats = _pixel_feats(i, tiles_x, tile_size, P)
    count = count_ref[i]
    n_chunks = (count + B - 1) // B
    max_chunks = K // B

    g_out = g_out_ref[0, :, :]                               # (C, P)
    g_logt = g_logt_ref[0, :, :]                             # (1, P)

    dcoeff_ref[0, :, :] = jnp.zeros((K, 6), jnp.float32)
    dchan_ref[0, :, :] = jnp.zeros((K, C), jnp.float32)

    # ---- pass 1: forward sweep, record per-chunk log-T carries ----------
    # carries live in a VMEM scratch ref (dynamic writes into a loop-carried
    # array would need a scatter, which Pallas TPU does not lower)
    def fwd_body(c, log_t):
        coeff_c = coeff_ref[0, pl.ds(c * B, B), :]
        logits = jnp.dot(coeff_c, feats, preferred_element_type=jnp.float32)
        alpha = jnp.exp(jnp.minimum(logits, LOG_ALPHA_MAX))
        alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
        lg = jnp.log1p(-alpha)
        carries_ref[pl.ds(c, 1), :] = log_t
        return log_t + jnp.sum(lg, axis=0, keepdims=True)

    log_t0 = jnp.zeros((1, P), jnp.float32)
    log_t_fin = jax.lax.fori_loop(0, n_chunks, fwd_body, log_t0)
    t_fin = jnp.exp(log_t_fin)                               # (1, P)

    # ---- pass 2: reverse sweep with suffix accumulator ------------------
    # suffix S (1, P): sum over later gaussians of w_j q_j
    def bwd_body(k, S):
        c = n_chunks - 1 - k
        coeff_c = coeff_ref[0, pl.ds(c * B, B), :]
        chan_c = chan_ref[0, pl.ds(c * B, B), :]
        logits = jnp.dot(coeff_c, feats, preferred_element_type=jnp.float32)
        alpha_raw = jnp.exp(jnp.minimum(logits, LOG_ALPHA_MAX))
        alive = jnp.logical_and(alpha_raw >= ALPHA_MIN,
                                logits < LOG_ALPHA_MAX)
        alpha = jnp.where(alpha_raw < ALPHA_MIN, 0.0, alpha_raw)
        lg = jnp.log1p(-alpha)
        cum = jnp.dot(_tril_ones(B), lg,
                      preferred_element_type=jnp.float32)
        log_t_in = carries_ref[pl.ds(c, 1), :]
        t_excl = jnp.exp(log_t_in + cum - lg)                # (B, P)
        w = alpha * t_excl

        q = jnp.dot(chan_c, g_out, preferred_element_type=jnp.float32)  # (B,P)
        a_term = w * q
        # exclusive suffix-from-the-back without reversal:
        # suffix_b = total - inclusive_cumsum_b, then + later-chunk carry S
        cum_a = jnp.dot(_tril_ones(B), a_term,
                        preferred_element_type=jnp.float32)
        suffix = (cum_a[B - 1:B, :] - cum_a) + S             # (B, P)

        inv1m = 1.0 / (1.0 - alpha)
        d_alpha = (q * t_excl - suffix * inv1m
                   - g_logt * t_fin * inv1m)
        # d(1-exp(logT))/d logit path: through alpha only; clamp regions
        d_logit = jnp.where(alive, alpha * d_alpha, 0.0)

        dcoeff_ref[0, pl.ds(c * B, B), :] = jnp.dot(
            d_logit, feats.T, preferred_element_type=jnp.float32)
        dchan_ref[0, pl.ds(c * B, B), :] = jnp.dot(
            w, g_out.T, preferred_element_type=jnp.float32)
        return S + jnp.sum(a_term, axis=0, keepdims=True)

    jax.lax.fori_loop(0, n_chunks, bwd_body, jnp.zeros((1, P), jnp.float32))


def _run_fwd(tile_coeff, tile_chan, counts, *, tiles_x, tile_size, B):
    T, K, _ = tile_coeff.shape
    C = tile_chan.shape[-1]
    P = tile_size * tile_size
    kern = functools.partial(_fwd_kernel, tiles_x=tiles_x,
                             tile_size=tile_size, B=B, K=K, C=C)
    out, logt = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, K, 6), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, K, C), lambda i, c: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, C, P), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, 1, P), lambda i, c: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((T, C, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ],
        interpret=_interpret(),
    )(counts, tile_coeff, tile_chan)
    return out, logt


def _run_bwd(tile_coeff, tile_chan, counts, g_out, g_logt,
             *, tiles_x, tile_size, B):
    T, K, _ = tile_coeff.shape
    C = tile_chan.shape[-1]
    P = tile_size * tile_size
    kern = functools.partial(_bwd_kernel, tiles_x=tiles_x,
                             tile_size=tile_size, B=B, K=K, C=C)
    dcoeff, dchan = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, K, 6), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, K, C), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, C, P), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, 1, P), lambda i, c: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, K, 6), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, K, C), lambda i, c: (i, 0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((K // B, P), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((T, K, 6), jnp.float32),
            jax.ShapeDtypeStruct((T, K, C), jnp.float32),
        ],
        interpret=_interpret(),
    )(counts, tile_coeff, tile_chan, g_out, g_logt)
    return dcoeff, dchan


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pallas_composite(tile_coeff, tile_chan, counts, tiles_x, tile_size, B=128):
    """Fused tile compositing.

    Args:
      tile_coeff: (T, K, 6) per-tile log-alpha coefficients (dead slots must
        carry a -1e10 constant term).
      tile_chan:  (T, K, C) per-tile channel payloads.
      counts:     (T,) int32 number of live entries per tile.
    Returns:
      out:   (T, P, C) composited channels (P = tile_size^2, row-major).
      alpha: (T, P) accumulated opacity.
    """
    out, logt = _run_fwd(tile_coeff, tile_chan, counts,
                         tiles_x=tiles_x, tile_size=tile_size, B=B)
    return (jnp.swapaxes(out, 1, 2),
            1.0 - jnp.exp(logt[:, 0, :]))


def _fwd_rule(tile_coeff, tile_chan, counts, tiles_x, tile_size, B):
    out, logt = _run_fwd(tile_coeff, tile_chan, counts,
                         tiles_x=tiles_x, tile_size=tile_size, B=B)
    res = (tile_coeff, tile_chan, counts)
    return ((jnp.swapaxes(out, 1, 2), 1.0 - jnp.exp(logt[:, 0, :])), res)


def _bwd_rule(tiles_x, tile_size, B, res, g):
    tile_coeff, tile_chan, counts = res
    g_out, g_alpha = g
    # alpha = 1 - exp(logT) -> dL/dlogT = -g_alpha * exp(logT); the kernel
    # folds the exp(logT) factor itself (it has t_fin), so pass -g_alpha.
    g_out_t = jnp.swapaxes(g_out, 1, 2)                      # (T, C, P)
    g_logt = (-g_alpha)[:, None, :]                          # (T, 1, P)
    dcoeff, dchan = _run_bwd(tile_coeff, tile_chan, counts, g_out_t, g_logt,
                             tiles_x=tiles_x, tile_size=tile_size, B=B)
    return dcoeff, dchan, None


pallas_composite.defvjp(_fwd_rule, _bwd_rule)
