"""Touch-patch anchoring: insert frozen Gaussians from tactile patches.

Behavioral spec from the reference's add_touch_patch + touch_pruning
(reference dn_splatter/dn_model.py:1156-1247, 1279-1302):
- at step `add_touch_at`, for every patch: cull existing Gaussians inside
  the patch's oriented bbox, then append the patch points as new Gaussians
  with opacity 1, color = 1-NN color from surviving Gaussians, scale =
  gel_scale (z axis /3), quats rotating +z onto the patch normal,
- the new Gaussians are `frozen`: geometry detached in the forward pass
  (store.activated) and excluded from densify/cull (adc.refine),
- every refinement, `touch_pruning` re-culls non-frozen intruders that
  drifted into any patch bbox.

TPU design: static shapes — patches are concatenated and written into free
slots via the same rank-allocation as ADC; bboxes live in a small stacked
array for the jitted pruning mask.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.core.transforms import rotation_between
from fusionsense_tpu.core.sh import rgb_to_sh0
from fusionsense_tpu.data.tactile import TouchPatch
from fusionsense_tpu.gaussians.store import GaussianState
from fusionsense_tpu.train.optim import AdamState


@dataclasses.dataclass
class TouchBoxes:
    """Stacked oriented bboxes of all patches (host-built, device-resident)."""

    centers: jax.Array   # (B, 3)
    rots: jax.Array      # (B, 3, 3)
    extents: jax.Array   # (B, 3)

    @staticmethod
    def from_patches(patches: list[TouchPatch]) -> "TouchBoxes":
        return TouchBoxes(
            centers=jnp.asarray(np.stack([p.bbox_center for p in patches])),
            rots=jnp.asarray(np.stack([p.bbox_rot for p in patches])),
            extents=jnp.asarray(np.stack([p.bbox_extent for p in patches])),
        )


def in_any_box(points: jax.Array, boxes: TouchBoxes) -> jax.Array:
    """(N, 3) -> (N,) True if inside any patch bbox."""
    local = jnp.einsum("bij,nbj->nbi", boxes.rots,
                       points[:, None, :] - boxes.centers[None, :, :])
    inside = jnp.all(jnp.abs(local) <= boxes.extents[None, :, :], axis=-1)
    return jnp.any(inside, axis=-1)


def add_touch_patches(
    state: GaussianState,
    opt: AdamState,
    patches: list[TouchPatch],
    *,
    gel_scale: float,
    scene_scale: float = 1.0,
) -> tuple[GaussianState, AdamState, TouchBoxes]:
    """Anchor all patches at once (host-side orchestration, device math)."""
    boxes = TouchBoxes.from_patches(patches)

    pts = jnp.asarray(np.concatenate([p.points for p in patches]))
    rgb = jnp.asarray(np.concatenate([p.colors for p in patches]))
    nrm = jnp.asarray(np.concatenate([p.normals for p in patches]))
    P = pts.shape[0]
    C = state.capacity

    # 1. cull existing (non-frozen) Gaussians inside any patch bbox
    intruder = in_any_box(state.means, boxes) & state.alive & ~state.frozen
    alive = state.alive & ~intruder

    # 2. color from 1-NN surviving alive Gaussian (reference takes 1-NN
    #    color from the existing model, dn_model.py:1156-1247)
    d2 = (jnp.sum(pts ** 2, -1)[:, None] - 2 * pts @ state.means.T
          + jnp.sum(state.means ** 2, -1)[None, :])
    d2 = jnp.where(alive[None, :], d2, jnp.inf)
    nn = jnp.argmin(d2, axis=-1)
    has_nn = jnp.isfinite(jnp.min(d2, axis=-1))
    nn_dc = jnp.where(has_nn[:, None], state.features_dc[nn], rgb_to_sh0(rgb))

    # 3. write patch Gaussians into free slots
    free_idx = jnp.argsort(alive, stable=True)  # False (free) slots first
    dest = free_idx[:P]
    ok = jnp.arange(P) < jnp.sum(~alive)

    scale_xy = gel_scale * scene_scale
    new_log_scales = jnp.log(jnp.asarray(
        [scale_xy, scale_xy, scale_xy / 3.0], jnp.float32))
    quats = rotation_between(
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (P, 3)), nrm)

    def put(arr, vals):
        safe = jnp.where(ok, dest, C)
        return arr.at[safe].set(vals, mode="drop")

    state = state.replace(
        means=put(state.means, pts),
        quats=put(state.quats, quats),
        log_scales=put(state.log_scales,
                       jnp.broadcast_to(new_log_scales, (P, 3))),
        logit_opacities=put(state.logit_opacities, jnp.full((P,), 12.0)),
        features_dc=put(state.features_dc, nn_dc),
        features_rest=put(state.features_rest,
                          jnp.zeros((P,) + state.features_rest.shape[1:])),
        normals=put(state.normals, nrm),
        alive=put(alive, jnp.ones((P,), bool)),
        frozen=put(state.frozen, jnp.ones((P,), bool)),
    )
    zero_put = lambda a: put(a, jnp.zeros((P,) + a.shape[1:], a.dtype))
    opt = AdamState(
        m=jax.tree.map(zero_put, opt.m),
        v=jax.tree.map(zero_put, opt.v),
        acc=jax.tree.map(zero_put, opt.acc),
        counts=opt.counts,
    )
    return state, opt, boxes


def touch_prune(state: GaussianState, boxes: TouchBoxes) -> GaussianState:
    """Re-cull non-frozen Gaussians that drifted into a patch bbox
    (reference touch_pruning, dn_model.py:1279-1302). Jittable."""
    intruder = in_any_box(state.means, boxes) & state.alive & ~state.frozen
    return state.replace(alive=state.alive & ~intruder)


def hull_prune(
    state: GaussianState,
    hull_points: jax.Array,           # (M, 3) visual-hull point cloud
    *,
    scene_scale: float = 1.0,
    inner: float = 0.005,
    outer: float = 0.02,
    center_radius_factor: float = 0.2,
) -> GaussianState:
    """Visual-hull shell pruning (reference hull_pruning,
    dn_model.py:1249-1276): Gaussians near the hull center whose distance to
    the nearest hull point falls in (inner, outer]*scale are outliers
    hovering just off the object surface — cull them. Jittable."""
    center = jnp.mean(hull_points, axis=0)
    near_center = jnp.linalg.norm(state.means - center, axis=-1) < (
        center_radius_factor * scene_scale)
    d2 = (jnp.sum(state.means ** 2, -1)[:, None]
          - 2 * state.means @ hull_points.T
          + jnp.sum(hull_points ** 2, -1)[None, :])
    dmin = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
    shell = (dmin > inner * scene_scale) & (dmin <= outer * scene_scale)
    cull = near_center & shell & state.alive & ~state.frozen
    return state.replace(alive=state.alive & ~cull)
