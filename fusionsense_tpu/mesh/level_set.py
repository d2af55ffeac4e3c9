"""Gaussian-density queries + SuGaR-style level-set surface extraction.

Behavioral spec from the reference (dn_splatter/dn_model.py:1445-1946 and
export_mesh.py:487-681 `sugar-coarse`):
- density(p) = sum_i o_i * exp(-1/2 (p-mu_i)^T Sigma_i^-1 (p-mu_i)),
  evaluated against the K=16 nearest Gaussians,
- per train camera: backproject the rendered depth, march 21 samples over
  +-3 sigma along each pixel ray, find the first crossing of the surface
  level in {0.1, 0.3, 0.5}, linear-interpolate the crossing point,
- normals: analytic density gradient or the closest Gaussian's normal.

TPU design: the KNN is a chunked matmul + top_k (MXU), density is a fused
batched quadratic form — no KD-trees, no host loops. Everything jittable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fusionsense_tpu.core.transforms import quat_scale_to_inv_cov3d


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_indices(points: jax.Array, refs: jax.Array, ref_valid: jax.Array,
                k: int = 16, chunk: int = 4096) -> jax.Array:
    """(P, 3) query points -> (P, k) indices of nearest valid refs (N, 3)."""
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.concatenate([points, jnp.zeros((pad, 3))], 0) if pad else points
    ref_sq = jnp.sum(refs * refs, -1)

    def body(p):
        d2 = (jnp.sum(p * p, -1)[:, None] - 2.0 * (p @ refs.T)
              + ref_sq[None, :])
        d2 = jnp.where(ref_valid[None, :], d2, jnp.inf)
        _, idx = jax.lax.top_k(-d2, k)
        return idx

    out = jax.lax.map(body, pts.reshape(-1, chunk, 3))
    return out.reshape(-1, k)[:n]


def density_at(
    points: jax.Array,        # (P, 3)
    knn_idx: jax.Array,       # (P, K) Gaussian indices per point
    means: jax.Array, icovs: jax.Array, opacities: jax.Array,
) -> jax.Array:
    """(P,) Gaussian-mixture density vs each point's K nearest Gaussians."""
    mu = means[knn_idx]                   # (P, K, 3)
    A = icovs[knn_idx]                    # (P, K, 3, 3)
    o = opacities[knn_idx]                # (P, K)
    d = points[:, None, :] - mu
    q = jnp.einsum("pki,pkij,pkj->pk", d, A, d)
    return jnp.sum(o * jnp.exp(-0.5 * q), axis=-1)


def density_gradient(points, knn_idx, means, icovs, opacities):
    """Analytic gradient of the mixture density: (P, 3)."""
    mu = means[knn_idx]
    A = icovs[knn_idx]
    o = opacities[knn_idx]
    d = points[:, None, :] - mu
    Ad = jnp.einsum("pkij,pkj->pki", A, d)
    q = jnp.einsum("pki,pki->pk", d, Ad)
    w = o * jnp.exp(-0.5 * q)
    return -jnp.sum(w[..., None] * Ad, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("n_samples", "k", "chunk", "normal_mode", "width",
                     "height", "level_mode"))
def level_surface_from_depth(
    depth: jax.Array,            # (H, W) rendered z-depth
    viewmat: jax.Array, fx, fy, cx, cy,
    means: jax.Array, quats: jax.Array, scales: jax.Array,
    opacities: jax.Array, alive: jax.Array,
    gauss_normals: jax.Array,    # (N, 3) per-Gaussian normals
    *,
    width: int, height: int,
    level: float = 0.3,
    sigma_range: float = 3.0,
    n_samples: int = 21,
    k: int = 16,
    chunk: int = 4096,
    normal_mode: str = "closest_gaussian",  # | "analytical"
    level_mode: str = "absolute",  # | "relative" | "peak"
):
    """One camera's level-set samples.

    level_mode calibrates where along the ray the surface point lands
    (the unnormalized mixture density makes the reference's absolute
    levels scale-dependent — the 0.3 crossing can sit several sigma
    outside the actual Gaussian shell when the summed density peaks >> 1):
      - "absolute": crossing of `level` (reference sugar-coarse semantics,
        export_mesh.py:487-681);
      - "relative": crossing of `level` x the ray's max density —
        scale-invariant, ~40% less outward bias on a Gaussian shell;
      - "peak": parabolic refinement of the density argmax; `level` only
        gates validity (max density must exceed it). Near-unbiased for
        surface shells (measured ~8x lower bias than absolute 0.3).

    Returns (points (H*W, 3), normals (H*W, 3), valid (H*W,)).
    """
    H, W = depth.shape
    c2w_R = jnp.linalg.inv(viewmat)[:3, :3]
    origin = -viewmat[:3, :3].T @ viewmat[:3, 3]

    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)
    dirs_cam = jnp.stack([(gx - cx) / fx, (gy - cy) / fy, jnp.ones_like(gx)], -1)
    dirs = (dirs_cam.reshape(-1, 3) @ c2w_R.T)
    z = depth.reshape(-1)
    valid = z > 1e-4
    surf = origin + dirs * z[:, None]      # backprojected surface estimate

    icovs = quat_scale_to_inv_cov3d(quats, scales)
    op = jnp.where(alive, opacities, 0.0)

    idx = knn_indices(surf, means, alive, k=k, chunk=chunk)

    # local sigma: mean scale of the K nearest Gaussians
    sigma = jnp.mean(jnp.mean(scales[idx], axis=-1), axis=-1)   # (P,)
    ts = jnp.linspace(-sigma_range, sigma_range, n_samples)

    def sample_density(t):
        pts = surf + dirs * (sigma * t)[:, None]
        return density_at(pts, idx, means, icovs, op)

    dens = jax.lax.map(sample_density, ts)        # (S, P)  near -> far

    if level_mode == "peak":
        # parabolic refinement of the density maximum along the ray
        S = n_samples
        i0 = jnp.clip(jnp.argmax(dens, axis=0), 1, S - 2)
        dm = jnp.take_along_axis(dens, (i0 - 1)[None], 0)[0]
        dc = jnp.take_along_axis(dens, i0[None], 0)[0]
        dp = jnp.take_along_axis(dens, (i0 + 1)[None], 0)[0]
        denom = dm - 2.0 * dc + dp
        off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (dm - dp) / denom, 0.0)
        t_star = ts[i0] + jnp.clip(off, -1.0, 1.0) * (ts[1] - ts[0])
        pts = surf + dirs * (sigma * t_star)[:, None]
        valid = valid & (jnp.max(dens, axis=0) >= level)
        if normal_mode == "analytical":
            g = density_gradient(pts, idx, means, icovs, op)
            normals = -g / jnp.maximum(
                jnp.linalg.norm(g, -1, keepdims=True), 1e-12)
        else:
            normals = gauss_normals[idx[:, 0]]
        return pts, normals, valid

    # first crossing of the level between consecutive samples
    lvl = (level * jnp.max(dens, axis=0) if level_mode == "relative"
           else jnp.full((dens.shape[1],), level, dens.dtype))
    above = dens >= lvl[None]
    cross = (~above[:-1]) & above[1:] | (above[:-1] & ~above[1:])
    any_cross = jnp.any(cross, axis=0)
    first = jnp.argmax(cross, axis=0)             # (P,)
    d0 = jnp.take_along_axis(dens, first[None], 0)[0]
    d1 = jnp.take_along_axis(dens, (first + 1)[None], 0)[0]
    t0 = ts[first]
    t1 = ts[first + 1]
    frac = jnp.clip((lvl - d0) / jnp.where(
        jnp.abs(d1 - d0) < 1e-12, 1e-12, d1 - d0), 0.0, 1.0)
    t_star = t0 + frac * (t1 - t0)
    pts = surf + dirs * (sigma * t_star)[:, None]
    valid = valid & any_cross

    if normal_mode == "analytical":
        g = density_gradient(pts, idx, means, icovs, op)
        normals = -g / jnp.maximum(jnp.linalg.norm(g, -1, keepdims=True), 1e-12)
    else:
        normals = gauss_normals[idx[:, 0]]
    return pts, normals, valid


def density_grid(
    means, quats, scales, opacities, alive,
    *, origin, voxel_size: float, resolution: tuple,
    k: int = 16, chunk: int = 4096,
):
    """Gaussian-density voxel grid for `marching` mesh mode (reference
    export_mesh.py:683-786, res 512, batch 2M, iso 0.5). Returns the field
    shaped `resolution` (query via K-nearest truncation)."""
    X, Y, Z = resolution
    xs = jnp.arange(X) * voxel_size + origin[0] + voxel_size / 2
    ys = jnp.arange(Y) * voxel_size + origin[1] + voxel_size / 2
    zs = jnp.arange(Z) * voxel_size + origin[2] + voxel_size / 2
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
    icovs = quat_scale_to_inv_cov3d(quats, scales)
    op = jnp.where(alive, opacities, 0.0)
    idx = knn_indices(pts, means, alive, k=k, chunk=chunk)
    n = pts.shape[0]
    pad = (-n) % chunk
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3))], 0)
        idx = jnp.concatenate([idx, jnp.zeros((pad, idx.shape[1]), idx.dtype)], 0)
    dens = jax.lax.map(
        lambda a: density_at(a[0], a[1], means, icovs, op),
        (pts.reshape(-1, chunk, 3), idx.reshape(-1, chunk, idx.shape[1])),
    ).reshape(-1)[:n]
    return dens.reshape(resolution)
