"""Monocular-depth alignment: scale/shift fitting against sparse metric
depth.

Behavioral equivalents of the reference's alignment utilities:
- closed-form per-image scale+shift least squares (reference
  dn_splatter/scripts/align_depth.py:188 compute_scale_and_shift and
  utils/metric3dv2_depth_generation.py:17-51 compute_scale_and_offset),
- an iterative gradient-descent refinement with an edge-aware robust loss
  (align_depth.py ColmapToAlignedMonoDepths' SGD stage).

All jitted JAX; batched over images.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def scale_and_shift_lstsq(mono: jax.Array, metric: jax.Array,
                          mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Closed-form (s, t) minimizing ||s*mono + t - metric||^2 over mask.

    Shapes: (..., H, W); returns broadcastable (...,) scale and shift.
    """
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m, axis=(-2, -1)), 1.0)
    sum_x = jnp.sum(mono * m, axis=(-2, -1))
    sum_y = jnp.sum(metric * m, axis=(-2, -1))
    sum_xx = jnp.sum(mono * mono * m, axis=(-2, -1))
    sum_xy = jnp.sum(mono * metric * m, axis=(-2, -1))
    det = n * sum_xx - sum_x * sum_x
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s = (n * sum_xy - sum_x * sum_y) / det
    t = (sum_xx * sum_y - sum_x * sum_xy) / det
    return s, t


@functools.partial(jax.jit, static_argnames=("iters",))
def align_depth_gd(mono: jax.Array, metric: jax.Array, mask: jax.Array,
                   iters: int = 200, lr: float = 0.1):
    """Huber-robust gradient refinement of (s, t) from the lstsq init.

    Returns the aligned depth map s*mono + t and (s, t)."""
    s0, t0 = scale_and_shift_lstsq(mono, metric, mask)
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)

    def loss(st):
        s, t = st
        err = (s * mono + t - metric) * m
        a = jnp.abs(err)
        delta = 0.1
        hub = jnp.where(a < delta, 0.5 * a * a / delta, a - 0.5 * delta)
        return jnp.sum(hub) / n

    def body(i, st):
        g = jax.grad(loss)(st)
        return (st[0] - lr * g[0], st[1] - lr * g[1])

    s, t = jax.lax.fori_loop(0, iters, body, (s0, t0))
    return s * mono + t, (s, t)


def align_mono_depths(mono_depths, metric_depths, tolerance: float = 0.1,
                      iters: int = 200):
    """Batched alignment: (V, H, W) mono depths onto sparse/sensor metric
    depth (invalid where <= tolerance). Returns aligned (V, H, W)."""
    mask = metric_depths > tolerance
    out = []
    for i in range(mono_depths.shape[0]):
        aligned, _ = align_depth_gd(mono_depths[i], metric_depths[i],
                                    mask[i], iters=iters)
        out.append(aligned)
    return jnp.stack(out)
