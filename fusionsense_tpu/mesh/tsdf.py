"""TSDF fusion on a dense voxel grid — jitted JAX, chunked over voxels.

Replaces the reference's vdbfusion VDBVolume integration (reference
dn_splatter/export_mesh.py:786-925: voxel 0.004, trunc 0.012, min_weight 5,
rendered-depth per train camera, hull filtering). A dense grid instead of a
VDB tree: sparse-view object scenes fit a 512^3 f32 grid in HBM, the
projective update is a pure gather -> the whole fusion is one XLA program
per camera, with no host data structure at all.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.core.cameras import Camera


@dataclasses.dataclass(frozen=True)
class TSDFConfig:
    voxel_size: float = 0.004
    truncation: float = 0.012
    min_weight: float = 5.0
    resolution: tuple = (256, 256, 256)
    origin: tuple = (-0.5, -0.5, -0.5)
    chunk: int = 2 ** 18


def voxel_centers(cfg: TSDFConfig) -> jax.Array:
    """(X*Y*Z, 3) voxel center coordinates."""
    X, Y, Z = cfg.resolution
    xs = jnp.arange(X) * cfg.voxel_size + cfg.origin[0] + cfg.voxel_size / 2
    ys = jnp.arange(Y) * cfg.voxel_size + cfg.origin[1] + cfg.voxel_size / 2
    zs = jnp.arange(Z) * cfg.voxel_size + cfg.origin[2] + cfg.voxel_size / 2
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    return jnp.stack([gx, gy, gz], -1).reshape(-1, 3)


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height"))
def integrate_view(
    tsdf: jax.Array,      # (N,) running weighted tsdf
    weight: jax.Array,    # (N,)
    depth: jax.Array,     # (H, W) rendered/sensor z-depth (0 = invalid)
    viewmat: jax.Array, fx, fy, cx, cy,
    *, width: int, height: int, cfg: TSDFConfig,
):
    """Fuse one depth map into the volume (projective TSDF update).

    Guarded to object-scale volumes: the dense sweep is O(X*Y*Z) per view
    and the two f32 grids live in HBM. Room-scale scenes at a fixed voxel
    (the reference's vdbfusion regime, export_mesh.py:803-817) must use
    mesh/tsdf_sparse.py instead.
    """
    assert np.prod(cfg.resolution) <= (1 << 27), (
        f"dense TSDF at {cfg.resolution} needs "
        f"{int(np.prod(cfg.resolution)) * 8 / 1e9:.1f} GB of grids; use "
        "fusionsense_tpu.mesh.tsdf_sparse.SparseTSDF for room-scale scenes")

    def chunk_update(args):
        vox, ts, w = args
        p_cam = vox @ viewmat[:3, :3].T + viewmat[:3, 3]
        z = p_cam[:, 2]
        u = p_cam[:, 0] / jnp.maximum(z, 1e-6) * fx + cx
        v = p_cam[:, 1] / jnp.maximum(z, 1e-6) * fy + cy
        ui = jnp.clip(u.astype(jnp.int32), 0, width - 1)
        vi = jnp.clip(v.astype(jnp.int32), 0, height - 1)
        in_img = (z > 1e-4) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
        d = depth[vi, ui]
        valid = in_img & (d > 1e-4)
        sdf = d - z                              # + in front of surface
        upd = valid & (sdf > -cfg.truncation)
        tsdf_obs = jnp.clip(sdf / cfg.truncation, -1.0, 1.0)
        w_obs = upd.astype(jnp.float32)
        new_w = w + w_obs
        new_ts = (ts * w + tsdf_obs * w_obs) / jnp.maximum(new_w, 1e-8)
        return new_ts, new_w

    vox = voxel_centers(cfg)
    n = vox.shape[0]
    chunk = cfg.chunk
    pad = (-n) % chunk
    if pad:
        vox = jnp.concatenate([vox, jnp.zeros((pad, 3))], 0)
        tsdf = jnp.concatenate([tsdf, jnp.zeros((pad,))], 0)
        weight = jnp.concatenate([weight, jnp.zeros((pad,))], 0)
    m = vox.shape[0] // chunk
    rs = lambda x: x.reshape(m, chunk, -1).squeeze(-1) if x.ndim == 1 else x.reshape(m, chunk, 3)
    new_ts, new_w = jax.lax.map(chunk_update, (rs(vox), rs(tsdf), rs(weight)))
    new_ts = new_ts.reshape(-1)[:n]
    new_w = new_w.reshape(-1)[:n]
    return new_ts, new_w


def fuse_depths(depths, cameras: Camera, cfg: TSDFConfig):
    """Integrate all views. depths (V, H, W). Returns (tsdf, weight) grids
    shaped cfg.resolution."""
    n = int(np.prod(cfg.resolution))
    tsdf = jnp.zeros((n,))
    weight = jnp.zeros((n,))
    V = depths.shape[0]
    for i in range(V):
        tsdf, weight = integrate_view(
            tsdf, weight, depths[i], cameras.viewmat[i],
            cameras.fx[i], cameras.fy[i], cameras.cx[i], cameras.cy[i],
            width=cameras.width, height=cameras.height, cfg=cfg,
        )
    return tsdf.reshape(cfg.resolution), weight.reshape(cfg.resolution)


def extract_mesh(tsdf: jax.Array, weight: jax.Array, cfg: TSDFConfig):
    """Marching-tetrahedra surface of the fused volume (host-side)."""
    from fusionsense_tpu.mesh.marching import marching_tetrahedra

    ts = np.asarray(tsdf)
    w = np.asarray(weight)
    # unobserved / low-confidence voxels -> far outside (positive)
    field = np.where(w >= cfg.min_weight, ts, 1.0)
    # our MT convention: inside = value < iso; tsdf is negative inside
    verts, faces = marching_tetrahedra(
        field, iso=0.0,
        origin=np.asarray(cfg.origin) + cfg.voxel_size / 2,
        spacing=cfg.voxel_size,
    )
    return verts, faces
