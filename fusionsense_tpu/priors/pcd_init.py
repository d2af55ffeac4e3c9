"""Seed point-cloud generation from depth priors + visual hull.

Behavioral spec from the reference (reference utils/generate_pcd.py:15-117):
- backproject each view's (mono/metric) depth map,
- foreground = depth in (0, fg_max], background = (fg_max, bg_max],
- background voxel-downsampled (0.02 m) and merged with the visual hull
  points painted black -> merged_pcd.ply (the 3DGS seed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.core.cameras import Camera, backproject_depth


def voxel_downsample(points: np.ndarray, colors: np.ndarray | None,
                     voxel: float):
    """Keep one point per occupied voxel (first hit)."""
    key = np.floor(points / voxel).astype(np.int64)
    _, first = np.unique(key, axis=0, return_index=True)
    first = np.sort(first)
    return points[first], (colors[first] if colors is not None else None)


def seed_pcd_from_depths(
    depths: jax.Array,         # (V, H, W)
    images: jax.Array,         # (V, H, W, 3)
    cameras: Camera,
    hull_points: np.ndarray | None = None,
    fg_max: float = 0.5,
    bg_max: float = 5.0,
    bg_voxel: float = 0.02,
    stride: int = 2,
):
    """Returns (points (N, 3), colors (N, 3)) — the training seed cloud."""
    V = depths.shape[0]
    bg_pts, bg_cols = [], []
    for i in range(V):
        d = np.asarray(depths[i])[::stride, ::stride]
        img = np.asarray(images[i])[::stride, ::stride]
        cam_i = cameras.index(i)
        # backproject the strided map with adjusted intrinsics
        sub = Camera(
            viewmat=cam_i.viewmat, fx=cam_i.fx / stride, fy=cam_i.fy / stride,
            cx=cam_i.cx / stride, cy=cam_i.cy / stride,
            width=d.shape[1], height=d.shape[0])
        pts = np.asarray(backproject_depth(jnp.asarray(d), sub))
        dd = d.reshape(-1)
        bg = (dd > fg_max) & (dd <= bg_max)
        bg_pts.append(pts[bg])
        bg_cols.append(img.reshape(-1, 3)[bg])

    bg_pts = np.concatenate(bg_pts) if bg_pts else np.zeros((0, 3))
    bg_cols = np.concatenate(bg_cols) if bg_cols else np.zeros((0, 3))
    if len(bg_pts):
        bg_pts, bg_cols = voxel_downsample(bg_pts, bg_cols, bg_voxel)

    if hull_points is not None and len(hull_points):
        # hull painted black, as in the reference (:107-117)
        hull_cols = np.zeros((len(hull_points), 3), np.float32)
        pts = np.concatenate([hull_points.astype(np.float32),
                              bg_pts.astype(np.float32)])
        cols = np.concatenate([hull_cols, bg_cols.astype(np.float32)])
    else:
        pts, cols = bg_pts.astype(np.float32), bg_cols.astype(np.float32)
    return pts, cols
