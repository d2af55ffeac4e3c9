"""Visual hull by voxel space carving — jitted JAX, trivially parallel.

Behavioral spec from the reference (reference utils/VisualHull.py:15-200):
- a ~1 m^3 voxel grid (0.005 m voxels) centered on the scene,
- every voxel is projected into every view's binary object mask,
- voxels vote: in-mask projections count; the hull keeps voxels with
  votes >= max_votes - error% (tolerates imperfect masks),
- output: hull point cloud (the reference's foreground_pcd.ply).

The per-view projection + mask gather is one fused XLA program chunked over
voxels; all views accumulate on device.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.core.cameras import Camera


@dataclasses.dataclass(frozen=True)
class VisualHullConfig:
    voxel_size: float = 0.005
    extent: float = 1.0               # cube side length
    error_percent: float = 5.0        # vote tolerance
    chunk: int = 2 ** 17


@functools.partial(jax.jit, static_argnames=("width", "height", "chunk"))
def _vote_view(votes, voxels, mask, viewmat, fx, fy, cx, cy,
               *, width: int, height: int, chunk: int):
    def body(args):
        vox, vt = args
        p = vox @ viewmat[:3, :3].T + viewmat[:3, 3]
        z = jnp.maximum(p[:, 2], 1e-6)
        u = p[:, 0] / z * fx + cx
        v = p[:, 1] / z * fy + cy
        ui = jnp.clip(u.astype(jnp.int32), 0, width - 1)
        vi = jnp.clip(v.astype(jnp.int32), 0, height - 1)
        inside = ((p[:, 2] > 1e-6) & (u >= 0) & (u < width)
                  & (v >= 0) & (v < height))
        hit = inside & (mask[vi, ui] > 0.5)
        return vt + hit.astype(jnp.int32)

    n = voxels.shape[0]
    m = n // chunk
    out = jax.lax.map(body, (voxels.reshape(m, chunk, 3),
                             votes.reshape(m, chunk)))
    return out.reshape(-1)


def visual_hull(
    masks: jax.Array,         # (V, H, W) binary object masks
    cameras: Camera,          # batched over views
    center: np.ndarray | None = None,
    cfg: VisualHullConfig = VisualHullConfig(),
) -> np.ndarray:
    """Carve the hull. Returns (M, 3) hull points (host numpy)."""
    V = masks.shape[0]
    if center is None:
        # look-at heuristic: mean of camera optical axes' closest approach
        # to origin — the reference centers on the mean camera position
        # shifted toward the scene; scene-normalized data centers near 0
        center = np.zeros(3)
    half = cfg.extent / 2
    n_side = int(round(cfg.extent / cfg.voxel_size))
    xs = np.linspace(-half + cfg.voxel_size / 2, half - cfg.voxel_size / 2,
                     n_side)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    voxels = np.stack([gx, gy, gz], -1).reshape(-1, 3) + np.asarray(center)

    n = len(voxels)
    pad = (-n) % cfg.chunk
    if pad:
        voxels = np.concatenate([voxels, np.full((pad, 3), 1e6)], 0)
    voxels_j = jnp.asarray(voxels, jnp.float32)
    votes = jnp.zeros((len(voxels),), jnp.int32)

    for i in range(V):
        votes = _vote_view(
            votes, voxels_j, masks[i], cameras.viewmat[i],
            cameras.fx[i], cameras.fy[i], cameras.cx[i], cameras.cy[i],
            width=cameras.width, height=cameras.height, chunk=cfg.chunk)

    votes = np.asarray(votes)[:n]
    max_votes = votes.max() if n else 0
    thresh = max_votes - int(np.ceil(cfg.error_percent / 100.0 * V))
    keep = votes >= max(thresh, 1)
    return voxels[:n][keep].astype(np.float32)
