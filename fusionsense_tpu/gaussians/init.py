"""Seed-point-cloud initialization of the Gaussian store.

Behavioral equivalent of the reference's init-from-pcd
(reference dn_splatter/dn_model.py:250-289): SH0 from RGB, scales from the
mean distance of the 3 nearest neighbors, z-axis squashed 1/10 (flat disc)
when seed normals are present, quats rotating +z onto the seed normal.
KNN is a one-shot O(N^2) jitted matmul — fine for seeds (<= a few 100k) and
it runs on the MXU instead of a host KD-tree.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fusionsense_tpu.core.sh import rgb_to_sh0
from fusionsense_tpu.core.transforms import normalize, rotation_between
from fusionsense_tpu.gaussians.store import GaussianState, new_state


def knn_mean_dist(points: jax.Array, k: int = 3, chunk: int = 4096) -> jax.Array:
    """(N, 3) -> (N,) mean distance to the k nearest neighbors (excl. self)."""
    n_orig = points.shape[0]
    pad = (-n_orig) % chunk
    if pad:  # pad with far-away sentinels so they never enter anyone's top-k
        points = jnp.concatenate([points, jnp.full((pad, 3), 1e6)], 0)
    n = points.shape[0]
    sq = jnp.sum(points * points, axis=-1)

    def chunk_fn(start):
        p = jax.lax.dynamic_slice_in_dim(points, start, chunk, 0)
        psq = jax.lax.dynamic_slice_in_dim(sq, start, chunk, 0)
        d2 = psq[:, None] - 2.0 * (p @ points.T) + sq[None, :]
        row = jax.lax.dynamic_slice_in_dim(
            jnp.arange(n), start, chunk, 0)
        d2 = jnp.where(row[:, None] == jnp.arange(n)[None, :], jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(jnp.sqrt(jnp.maximum(-neg_top, 1e-12)), axis=-1)

    starts = jnp.arange(0, n, chunk)
    out = jax.lax.map(chunk_fn, starts).reshape(-1)
    return out[:n_orig]


def init_from_points(
    points: jax.Array,                  # (N, 3)
    rgb: jax.Array,                     # (N, 3) in [0, 1]
    *,
    capacity: int,
    sh_degree: int = 3,
    seed_normals: Optional[jax.Array] = None,   # (N, 3)
    init_opacity: float = 0.1,
    flat_z_ratio: float = 0.1,
    key: Optional[jax.Array] = None,
) -> GaussianState:
    n = points.shape[0]
    assert n <= capacity, f"seed points {n} exceed capacity {capacity}"
    state = new_state(capacity, sh_degree)

    dist = knn_mean_dist(points)
    scales = jnp.tile(dist[:, None], (1, 3))
    if seed_normals is not None:
        scales = scales.at[:, 2].mul(flat_z_ratio)
        quats = rotation_between(
            jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3)),
            normalize(seed_normals),
        )
        normals = normalize(seed_normals)
    else:
        if key is None:
            key = jax.random.PRNGKey(0)
        from fusionsense_tpu.core.transforms import random_quats

        quats = random_quats(key, n)
        normals = jnp.zeros((n, 3)).at[:, 2].set(1.0)

    logit_op = jnp.log(init_opacity / (1.0 - init_opacity))

    def put(arr, vals):
        return arr.at[:n].set(vals)

    return state.replace(
        means=put(state.means, points),
        quats=put(state.quats, quats),
        log_scales=put(state.log_scales, jnp.log(jnp.maximum(scales, 1e-8))),
        logit_opacities=state.logit_opacities.at[:n].set(logit_op),
        features_dc=put(state.features_dc, rgb_to_sh0(rgb)),
        normals=put(state.normals, normals),
        alive=state.alive.at[:n].set(True),
    )
