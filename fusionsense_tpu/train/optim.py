"""Per-group masked Adam with slot-surgery-free state.

The reference uses nerfstudio Optimizers with per-param-group Adam and
performs explicit optimizer-state surgery whenever the Gaussian tensors grow
or shrink (reference dn_splatter/dn_model.py:149-170, 1120-1152, and LRs in
dn_splatter/dn_config.py:36-75). Here the moments are fixed-capacity arrays
alongside the params; densify/cull only *writes slots*, so "surgery" reduces
to the same masked writes applied to m/v — no reshapes, no recompiles.

Implemented directly (not via optax) so the ADC step can permute/zero moment
slots as plain array ops. Supports per-group constant or exponential-decay
LR schedules and per-group gradient accumulation (update every k steps),
mirroring dn_config.py:29's grad-accumulation spec.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import chex
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GroupSpec:
    lr_init: float
    lr_final: float | None = None      # None -> constant LR
    max_steps: int = 15_000
    every_k: int = 1                   # gradient accumulation interval
    eps: float = 1e-15


# Default groups: LRs from the reference method spec (dn_config.py:36-75)
DEFAULT_GROUPS: dict[str, GroupSpec] = {
    "means": GroupSpec(1.6e-4, 1.6e-6, 15_000),
    "features_dc": GroupSpec(2.5e-3, every_k=10),
    "features_rest": GroupSpec(2.5e-3 / 20, every_k=10),
    "logit_opacities": GroupSpec(5e-2),
    "log_scales": GroupSpec(5e-3),
    "quats": GroupSpec(1e-3),
    "normals": GroupSpec(0.0),   # dummy group, like the reference's `normals`
}


def group_lr(spec: GroupSpec, step: jax.Array) -> jax.Array:
    if spec.lr_final is None or spec.lr_final == spec.lr_init:
        return jnp.asarray(spec.lr_init, jnp.float32)
    t = jnp.clip(step.astype(jnp.float32) / spec.max_steps, 0.0, 1.0)
    return spec.lr_init * jnp.power(spec.lr_final / spec.lr_init, t)


@chex.dataclass
class AdamState:
    m: dict      # first moments, same pytree structure as params
    v: dict      # second moments
    acc: dict    # accumulated grads for every_k groups
    counts: dict  # per-group update counters (for bias correction)


def init_adam(params: dict) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(
        m=zeros,
        v=jax.tree.map(jnp.zeros_like, params),
        acc=jax.tree.map(jnp.zeros_like, params),
        counts={k: jnp.zeros((), jnp.int32) for k in params},
    )


def adam_step(
    params: dict,
    grads: dict,
    state: AdamState,
    step: jax.Array,
    alive: jax.Array,
    groups: dict[str, GroupSpec] | None = None,
    b1: float = 0.9,
    b2: float = 0.999,
) -> tuple[dict, AdamState]:
    """One (possibly accumulating) Adam step over all param groups.

    Updates are masked to alive slots; dead slots keep params and moments
    untouched so ADC can rely on them staying zeroed.
    """
    groups = groups or DEFAULT_GROUPS
    new_params, new_m, new_v, new_acc, new_counts = {}, {}, {}, {}, {}
    for k, p in params.items():
        spec = groups[k]
        g_in = grads[k]
        acc = state.acc[k] + g_in
        if spec.every_k > 1:
            do_update = (step + 1) % spec.every_k == 0
        else:
            do_update = jnp.array(True)
        g = acc  # accumulated gradient applied at update time

        cnt = state.counts[k] + do_update.astype(jnp.int32)
        m = b1 * state.m[k] + (1 - b1) * g
        v = b2 * state.v[k] + (1 - b2) * g * g
        t = jnp.maximum(cnt, 1).astype(jnp.float32)
        mhat = m / (1 - b1 ** t)
        vhat = v / (1 - b2 ** t)
        upd = group_lr(spec, step) * mhat / (jnp.sqrt(vhat) + spec.eps)

        mask = alive
        while mask.ndim < p.ndim:
            mask = mask[..., None]
        apply = jnp.logical_and(do_update, mask)

        new_params[k] = jnp.where(apply, p - upd, p)
        new_m[k] = jnp.where(apply, m, state.m[k])
        new_v[k] = jnp.where(apply, v, state.v[k])
        new_acc[k] = jnp.where(do_update, jnp.zeros_like(acc), acc)
        new_counts[k] = cnt
    return new_params, AdamState(m=new_m, v=new_v, acc=new_acc, counts=new_counts)


def surgery(state: AdamState, fn: Callable[[jax.Array], jax.Array]) -> AdamState:
    """Apply the same slot transformation to every moment/accumulator array
    (the static-shape analog of the reference's remove/dup/add_in_all_optim,
    dn_model.py:149-170,1120-1152)."""
    return AdamState(
        m=jax.tree.map(fn, state.m),
        v=jax.tree.map(fn, state.v),
        acc=jax.tree.map(fn, state.acc),
        counts=state.counts,
    )
