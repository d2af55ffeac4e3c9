"""SuGaR-style SDF regularization (optional loss).

Behavioral spec from the reference's SuGaR machinery
(reference dn_splatter/dn_model.py:1445-1703, :838-882):
- sample points inside Gaussians, volume-weighted (sample_points_in_gaussians),
- mixture density d(p) against K nearest Gaussians; sdf = sqrt(-2 log d)
  (get_sdf, :1637),
- "ideal" sdf from the rendered depth: reproject each sample into the
  camera, compare its camera depth to the rendered depth along that pixel
  (get_ideal_sdf, :1497),
- loss = weighted |sdf - ideal_sdf| over samples (density std weighting).

Everything jittable; the KNN reuses the matmul top-k from
fusionsense_tpu/mesh/level_set.py.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from fusionsense_tpu.core.cameras import Camera
from fusionsense_tpu.core.transforms import quat_scale_to_inv_cov3d, quat_to_rotmat
from fusionsense_tpu.mesh.level_set import density_at, knn_indices


def sample_points_in_gaussians(
    key: jax.Array,
    means: jax.Array, quats: jax.Array, scales: jax.Array,
    alive: jax.Array, n_samples: int,
):
    """Volume-weighted Gaussian samples: pick Gaussians proportional to
    their volume, then sample from each (reference
    sample_points_in_gaussians, dn_model.py:1445)."""
    k1, k2 = jax.random.split(key)
    vol = jnp.where(alive, jnp.prod(scales, axis=-1), 0.0)
    p = vol / jnp.maximum(jnp.sum(vol), 1e-12)
    idx = jax.random.categorical(k1, jnp.log(jnp.maximum(p, 1e-20)),
                                 shape=(n_samples,))
    local = jax.random.normal(k2, (n_samples, 3)) * scales[idx]
    R = quat_to_rotmat(quats[idx])
    return means[idx] + jnp.einsum("nij,nj->ni", R, local), idx


def sdf_from_density(density: jax.Array, eps: float = 1e-8) -> jax.Array:
    """sdf = sqrt(-2 log d), clamped (reference get_sdf, dn_model.py:1637)."""
    d = jnp.clip(density, eps, 1.0 - 1e-6)
    return jnp.sqrt(-2.0 * jnp.log(d))


def ideal_sdf_from_depth(
    points: jax.Array,        # (S, 3) world samples
    depth: jax.Array,         # (H, W) rendered z-depth
    camera: Camera,
) -> tuple[jax.Array, jax.Array]:
    """Signed distance estimate from the rendered depth along each sample's
    pixel ray (reference get_ideal_sdf, dn_model.py:1497).

    Returns (ideal_sdf (S,), valid (S,))."""
    p_cam = points @ camera.viewmat[:3, :3].T + camera.viewmat[:3, 3]
    z = p_cam[:, 2]
    u = p_cam[:, 0] / jnp.maximum(z, 1e-6) * camera.fx + camera.cx
    v = p_cam[:, 1] / jnp.maximum(z, 1e-6) * camera.fy + camera.cy
    H, W = depth.shape
    ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
    d = depth[vi, ui]
    valid = (z > 1e-4) & (u >= 0) & (u < W) & (v >= 0) & (v < H) & (d > 1e-4)
    return d - z, valid


def sdf_loss(
    key: jax.Array,
    means, quats, scales, opacities, alive,
    depth: jax.Array, camera: Camera,
    n_samples: int = 1024, knn: int = 16,
) -> jax.Array:
    """|mixture sdf - |ideal sdf|| over volume-weighted samples."""
    pts, _ = sample_points_in_gaussians(key, means, quats, scales, alive,
                                        n_samples)
    pts = jax.lax.stop_gradient(pts)
    icovs = quat_scale_to_inv_cov3d(quats, scales)
    op = jnp.where(alive, opacities, 0.0)
    idx = knn_indices(pts, means, alive, k=knn, chunk=min(1024, n_samples))
    dens = density_at(pts, idx, means, icovs, op)
    sdf = sdf_from_density(dens)
    ideal, valid = ideal_sdf_from_depth(pts, jax.lax.stop_gradient(depth),
                                        camera)
    err = jnp.abs(sdf - jnp.abs(ideal))
    return jnp.sum(jnp.where(valid, err, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)
