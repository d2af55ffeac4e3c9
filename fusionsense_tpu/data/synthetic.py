"""Procedural test scenes: ring cameras around a textured sphere.

Stands in for the reference's 9-view transparent_bunny capture
(reference README.md:131-134) in unit/regression tests — the analytic
sphere provides exact GT depth, normals, and geometry for mesh/chamfer
checks without any data download.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.core.cameras import Camera, make_camera


def look_at_w2c(eye: np.ndarray, target: np.ndarray, up=(0, 0, 1)) -> np.ndarray:
    """OpenCV world-to-camera matrix looking from eye at target."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # rows: cam x (right), y (down), z (fwd)
    t = -R @ eye
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    return w2c


def ring_cameras(
    n_views: int = 9, radius: float = 2.0, height: float = 0.8,
    width: int = 128, height_px: int = 96, focal: float = 110.0,
    target=(0.0, 0.0, 0.0),
) -> Camera:
    """Batched Camera: n_views on a ring looking at the target."""
    mats = []
    tgt = np.asarray(target, np.float64)
    for i in range(n_views):
        a = 2 * math.pi * i / n_views
        eye = np.array([radius * math.cos(a), radius * math.sin(a), height])
        mats.append(look_at_w2c(eye, tgt))
    viewmats = jnp.asarray(np.stack(mats), jnp.float32)
    ones = jnp.ones((n_views,), jnp.float32)
    return make_camera(viewmats, focal * ones, focal * ones,
                       (width / 2) * ones, (height_px / 2) * ones,
                       width, height_px)


def sphere_points(n: int = 2000, radius: float = 0.5, seed: int = 0):
    """Fibonacci-sphere points with a procedural color texture + normals."""
    i = np.arange(n, dtype=np.float64)
    phi = math.pi * (3.0 - math.sqrt(5.0))
    y = 1 - 2 * (i + 0.5) / n
    r = np.sqrt(np.maximum(1 - y * y, 0))
    theta = phi * i
    pts = np.stack([r * np.cos(theta), r * np.sin(theta), y], axis=-1)
    normals = pts.copy()
    colors = 0.5 + 0.45 * np.stack(
        [np.sin(4 * pts[:, 0] + 1), np.sin(5 * pts[:, 1]), np.sin(6 * pts[:, 2] + 2)],
        axis=-1,
    )
    return (jnp.asarray(pts * radius, jnp.float32),
            jnp.asarray(np.clip(colors, 0, 1), jnp.float32),
            jnp.asarray(normals, jnp.float32))


def sphere_depth_normals(camera: Camera, center=(0.0, 0.0, 0.0),
                         radius: float = 0.5):
    """Analytic ray-traced z-depth + world normals of the GT sphere for ONE
    camera. Returns (depth (H, W), normal (H, W, 3), mask (H, W))."""
    H, W = camera.height, camera.width
    c2w = camera.camtoworld
    origin = camera.origin
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)
    dirs_cam = jnp.stack(
        [(gx - camera.cx) / camera.fx, (gy - camera.cy) / camera.fy,
         jnp.ones_like(gx)], -1)
    dirs = dirs_cam @ c2w[:3, :3].T
    dn = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    oc = origin - jnp.asarray(center)
    b = jnp.sum(dn * oc, -1)
    c = jnp.sum(oc * oc) - radius ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    hit = hit & (t > 0)
    pts = origin + t[..., None] * dn
    normal = (pts - jnp.asarray(center)) / radius
    # z-depth (not euclidean): project hit point into camera frame
    z = (pts @ camera.viewmat[:3, :3].T + camera.viewmat[:3, 3])[..., 2]
    depth = jnp.where(hit, z, 0.0)
    normal = jnp.where(hit[..., None], normal, 0.0)
    return depth, normal, hit.astype(jnp.float32)
