"""Adaptive density control (densify / split / dup / cull / opacity-reset)
as pure masked ops over the fixed-capacity store.

Behavioral spec from the reference's refinement_after
(reference dn_splatter/dn_model.py:326-451, with split/dup/cull semantics
inherited from nerfstudio SplatfactoModel, see SURVEY.md §2.4 note):

- every `refine_every` steps after `warmup` until `stop_split_at`:
  * avg screen-grad > densify_grad_thresh -> densify
  * densify & world-scale > densify_size_thresh -> SPLIT into
    n_split samples (original replaced + extra slots), scales /= 1.6
  * densify & small -> DUP (copy into a free slot)
  * cull: opacity < cull_alpha_thresh, or world-scale > cull_scale_thresh
    (after `reset_alpha_every` interval has passed once)
- every `reset_alpha_every * refine_every`: opacities clamped down to
  2 * cull_alpha_thresh and opacity Adam moments zeroed (dn_model.py:428-445)
- frozen (touch-anchored) Gaussians excluded from all of it
  (dn_model.py:366-378)

TPU design: no tensors change shape. Culls clear `alive`; allocations rank
free slots with a cumsum and scatter; Adam moments get the same writes
(zeros for newly-allocated slots).
"""
from __future__ import annotations

import dataclasses

import chex
import jax
import jax.numpy as jnp

from fusionsense_tpu.core.transforms import quat_to_rotmat
from fusionsense_tpu.gaussians.store import GaussianState
from fusionsense_tpu.train.optim import AdamState


@dataclasses.dataclass(frozen=True)
class ADCConfig:
    warmup: int = 500
    refine_every: int = 100
    stop_split_at: int = 10_000
    reset_alpha_every: int = 30           # in units of refine_every
    densify_grad_thresh: float = 0.005
    densify_size_thresh: float = 0.01     # world units (scene-scaled)
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5        # world units
    cull_screen_size: float = 0.15        # fraction of screen
    split_screen_size: float = 0.05       # fraction of screen
    stop_screen_size_at: int = 4000
    n_split_samples: int = 2
    split_scale_shrink: float = 1.6


@chex.dataclass
class RefineStats:
    """Accumulated between refinement steps (reference after_train cb)."""

    grad2d_acc: jax.Array   # (C,) sum of screen-space grad norms
    count: jax.Array        # (C,) visibility counts
    max_radius: jax.Array   # (C,) max screen radius seen (pixels)


def init_stats(capacity: int) -> RefineStats:
    z = jnp.zeros((capacity,))
    return RefineStats(grad2d_acc=z, count=jnp.zeros((capacity,), jnp.int32),
                       max_radius=z)


def accumulate_stats(
    stats: RefineStats, mean2d_grad: jax.Array, radius: jax.Array,
    width: int, height: int,
) -> RefineStats:
    """Fold one step's screen-space gradients into the running stats.

    Convention: pixel-space position-gradient norms scaled by
    0.5*max(H, W), making the statistic roughly resolution-independent
    (the analog of the reference's NDC-grad x image-extent normalization
    in its refinement_after). The default densify_grad_thresh in ADCConfig
    is calibrated for THIS convention, not for gsplat's — and it is
    calibrated at 640x480: because the per-pixel loss mean scales as
    1/(H W) while a splat's footprint scales as H W, the statistic grows
    roughly linearly with resolution, so low-res scenes need a
    proportionally lower densify_grad_thresh (e.g. the 128x96 blob
    fixture uses 0.0008).
    """
    vis = radius > 0
    norm = jnp.linalg.norm(mean2d_grad, axis=-1) * (0.5 * max(width, height))
    return RefineStats(
        grad2d_acc=stats.grad2d_acc + jnp.where(vis, norm, 0.0),
        count=stats.count + vis.astype(jnp.int32),
        max_radius=jnp.maximum(stats.max_radius,
                               jnp.where(vis, radius, 0.0) / max(width, height)),
    )


def _alloc_free_slots(alive: jax.Array, request: jax.Array):
    """Rank free slots; request[i]=True wants one new slot for source i.

    Returns (dest_idx (C,), granted (C,) bool): dest slot for each granted
    request. Requests beyond the free-slot count are dropped (reported by
    the caller via granted count).
    """
    free = ~alive
    num_free = jnp.sum(free)
    # indices of free slots, in slot order (stable sort: free first)
    free_idx = jnp.argsort(~free, stable=True)           # (C,)
    rank = jnp.cumsum(request) - 1                        # rank among requests
    granted = request & (rank < num_free)
    dest = free_idx[jnp.clip(rank, 0, alive.shape[0] - 1)]
    return dest, granted


def _write_slots(arr: jax.Array, dest: jax.Array, granted: jax.Array,
                 values: jax.Array) -> jax.Array:
    """Scatter values[i] -> arr[dest[i]] where granted[i]."""
    c = arr.shape[0]
    safe_dest = jnp.where(granted, dest, c)  # out-of-range drops the write
    return arr.at[safe_dest].set(values, mode="drop")


def refine(
    state: GaussianState,
    opt: AdamState,
    stats: RefineStats,
    key: jax.Array,
    cfg: ADCConfig,
    step: jax.Array,
    scene_scale: float = 1.0,
):
    """One refinement pass. Returns (state, opt, stats, info dict).

    Shape-static and jittable; `step` may be traced. Gating on warmup /
    stop_split_at is done with lax-style masks so one compiled program
    serves every refinement step.
    """
    C = state.capacity
    active = state.alive & ~state.frozen
    can_split = step < cfg.stop_split_at

    avg_grad = stats.grad2d_acc / jnp.maximum(stats.count, 1)
    seen = stats.count > 0
    high = active & seen & (avg_grad > cfg.densify_grad_thresh) & can_split

    scales = jnp.exp(state.log_scales)
    max_scale = jnp.max(scales, axis=-1)
    big_world = max_scale > cfg.densify_size_thresh * scene_scale
    big_screen = stats.max_radius > cfg.split_screen_size
    consider_screen = step < cfg.stop_screen_size_at
    split_mask = high & (big_world | (consider_screen & big_screen))
    dup_mask = high & ~split_mask

    # ---- culling -----------------------------------------------------------
    opacity = jax.nn.sigmoid(state.logit_opacities)
    cull = active & (opacity < cfg.cull_alpha_thresh)
    past_first_reset = step > cfg.warmup + cfg.reset_alpha_every * cfg.refine_every
    cull_big = active & past_first_reset & (
        (max_scale > cfg.cull_scale_thresh * scene_scale)
        | (consider_screen & (stats.max_radius > cfg.cull_screen_size))
    )
    cull = cull | cull_big
    alive = state.alive & ~cull

    # ---- allocation: one new slot per dup, n_split-1 per split -------------
    # (split child 0 overwrites the original slot in place)
    params = state.params()
    info = {}

    orig_params = dict(params)

    def split_child(key):
        """Sample one split child from the *original* flagged Gaussians."""
        local = jax.random.normal(key, (C, 3)) * jnp.exp(orig_params["log_scales"])
        R = quat_to_rotmat(orig_params["quats"])
        offset = jnp.einsum("nij,nj->ni", R, local)
        child = dict(orig_params)
        child["means"] = orig_params["means"] + offset
        child["log_scales"] = orig_params["log_scales"] - jnp.log(cfg.split_scale_shrink)
        return child

    keys = jax.random.split(key, max(cfg.n_split_samples, 2))

    total_granted = jnp.zeros((), jnp.int32)
    total_requested = jnp.sum(dup_mask) + jnp.sum(split_mask) * (cfg.n_split_samples - 1)

    # allocation passes: dups, then each extra split child
    request_passes = [("dup", dup_mask, None)] + [
        (f"split{i}", split_mask, keys[i]) for i in range(1, cfg.n_split_samples)
    ]
    opt_m, opt_v, opt_acc = opt.m, opt.v, opt.acc
    split_granted = split_mask  # tightened below if allocation runs dry
    for name, req, k_i in request_passes:
        dest, granted = _alloc_free_slots(alive, req)
        if k_i is None:
            src_params = orig_params   # dup copies the original unchanged
        else:
            src_params = split_child(k_i)
            split_granted = split_granted & granted
        for pk in params:
            params[pk] = _write_slots(params[pk], dest, granted, src_params[pk])
        # new slots: zero moments (reference zero-extends optimizer state)
        for tree in (opt_m, opt_v, opt_acc):
            for pk in tree:
                tree[pk] = _write_slots(tree[pk], dest, granted,
                                        jnp.zeros_like(tree[pk]))
        alive = alive | (jnp.zeros_like(alive).at[jnp.where(granted, dest, C)]
                         .set(True, mode="drop"))
        total_granted = total_granted + jnp.sum(granted)

    # child 0 replaces the original in place — but ONLY where the extra
    # children were actually allocated; otherwise a full store would keep
    # shrinking originals 1.6x every refine with no children to compensate
    child0 = split_child(keys[0])
    sel = lambda m, a, b: jnp.where(m.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
    params = {k: sel(split_granted, child0[k], params[k]) for k in params}
    # moments of split originals are kept (reference keeps them too)

    # frozen flags for new slots stay False (touch slots are never freed here)
    new_state = state.replace(alive=alive, **params)
    new_opt = AdamState(m=opt_m, v=opt_v, acc=opt_acc, counts=opt.counts)

    # ---- opacity reset -----------------------------------------------------
    refine_idx = (step - cfg.warmup) // cfg.refine_every
    do_reset = (refine_idx > 0) & (refine_idx % cfg.reset_alpha_every == 0) & can_split
    reset_logit = jnp.log(2 * cfg.cull_alpha_thresh / (1 - 2 * cfg.cull_alpha_thresh))
    reset_ops = jnp.minimum(new_state.logit_opacities, reset_logit)
    new_state = new_state.replace(
        logit_opacities=jnp.where(
            do_reset & new_state.alive & ~new_state.frozen,
            reset_ops, new_state.logit_opacities)
    )
    zero_op = lambda x: jnp.where(do_reset, jnp.zeros_like(x), x)
    new_opt = AdamState(
        m={**new_opt.m, "logit_opacities": zero_op(new_opt.m["logit_opacities"])},
        v={**new_opt.v, "logit_opacities": zero_op(new_opt.v["logit_opacities"])},
        acc=new_opt.acc, counts=new_opt.counts,
    )

    info["culled"] = jnp.sum(cull)
    info["split"] = jnp.sum(split_mask)
    info["dupped"] = jnp.sum(dup_mask)
    info["alloc_dropped"] = total_requested - total_granted
    info["opacity_reset"] = do_reset

    fresh = init_stats(C)
    return new_state, new_opt, fresh, info
