"""Capacity bucketing: resize the padded store to track the live population.

The static-shape store trades memory/compute for compile stability; a fixed
worst-case capacity wastes both (the bench scene keeps 30k alive Gaussians
in 131k padded slots -> 4x overhead in projection, binning, Adam and
gradients). Instead the trainer resizes between power-of-two buckets at
refinement boundaries:

- grow: pad with dead slots (cheap concat),
- shrink: stable alive-first permutation (argsort of ~alive), slice.

Each bucket size compiles its own XLA executables (jit caches by shape);
a run touches only a handful of buckets. This replaces the reference's
per-step dynamic torch.cat/prune reshapes (dn_model.py:326-451) with a
few discrete recompiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fusionsense_tpu.gaussians.adc import RefineStats
from fusionsense_tpu.gaussians.store import GaussianState
from fusionsense_tpu.train.optim import AdamState


def next_bucket(n: int, minimum: int = 1024) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def pick_capacity(n_alive: int, current: int, maximum: int,
                  minimum: int = 1024) -> int:
    """Target bucket given the live count; hysteresis avoids thrash."""
    want = next_bucket(int(n_alive * 2), minimum)
    want = min(want, maximum)
    if n_alive > 0.8 * current:
        return max(want, min(current * 2, maximum))
    if n_alive < 0.3 * current and want < current:
        return want
    return current


@functools.partial(jax.jit, static_argnames=("new_capacity",))
def resize_train_state(
    gaussians: GaussianState, opt: AdamState, stats: RefineStats,
    new_capacity: int,
):
    """Resize all per-slot arrays. Shrinking keeps alive slots (the caller
    must guarantee new_capacity >= num_alive)."""
    old = gaussians.capacity

    if new_capacity == old:
        return gaussians, opt, stats

    if new_capacity > old:
        pad = new_capacity - old

        def grow(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)

        g = GaussianState(**{k: grow(v) for k, v in dict(gaussians).items()})
        opt2 = AdamState(
            m=jax.tree.map(grow, opt.m), v=jax.tree.map(grow, opt.v),
            acc=jax.tree.map(grow, opt.acc), counts=opt.counts)
        stats2 = RefineStats(**{k: grow(v) for k, v in dict(stats).items()})
        return g, opt2, stats2

    # shrink: alive-first stable permutation, then slice
    perm = jnp.argsort(~gaussians.alive, stable=True)[:new_capacity]
    return _permute_state(gaussians, opt, stats, perm)


def _permute_state(gaussians, opt, stats, perm):
    def take(x):
        return x[perm]

    g = GaussianState(**{k: take(v) for k, v in dict(gaussians).items()})
    opt2 = AdamState(
        m=jax.tree.map(take, opt.m), v=jax.tree.map(take, opt.v),
        acc=jax.tree.map(take, opt.acc), counts=opt.counts)
    stats2 = RefineStats(**{k: take(v) for k, v in dict(stats).items()})
    return g, opt2, stats2


@jax.jit
def compact_train_state(gaussians: GaussianState, opt: AdamState,
                        stats: RefineStats):
    """Stable alive-first permutation at constant capacity.

    Establishes the render-prefix invariant: every alive slot sits in
    [0, num_alive). The trainer re-compacts at each host logging sync, so
    rasterization can run on a sliced [:render_n] prefix instead of the
    full capacity bucket (ADC's `_alloc_free_slots` fills lowest free slots
    first, so the prefix decays only by the net population growth between
    syncs)."""
    perm = jnp.argsort(~gaussians.alive, stable=True)
    return _permute_state(gaussians, opt, stats, perm)


# pow2-and-1.5*pow2 ladder: fine enough to track the population without a
# recompile per refine, coarse enough that a run touches a handful of sizes
def render_bucket(n_alive: int, capacity: int, minimum: int = 1024,
                  margin: float = 1.2) -> int:
    """Static render-prefix length covering n_alive with growth headroom."""
    want = max(int(n_alive * margin), minimum)
    b = minimum
    while b < want:
        b = b + b // 2 if (b & (b - 1)) == 0 else (b // 3) * 4
    return min(b, capacity)
