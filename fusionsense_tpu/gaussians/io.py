"""Gaussian-splat import/export in the standard 3DGS PLY layout.

Writes the INRIA-convention vertex properties (x y z, nx ny nz, f_dc_*,
f_rest_*, opacity, scale_*, rot_*) so trained models open directly in any
standard splat viewer (supersplat, antimatter15, gsplat viewers) — the
interoperability analog of the reference's nerfstudio checkpoint +
`ns-export gaussian-splat` path.
"""
from __future__ import annotations

import numpy as np

from fusionsense_tpu.gaussians.store import GaussianState
from fusionsense_tpu.utils.ply import read_ply, write_ply


def export_splat_ply(path, state: GaussianState, untransform=None):
    """Write alive Gaussians in standard 3DGS PLY layout. Returns count."""
    alive = np.asarray(state.alive)
    means = np.asarray(state.means)[alive]
    if untransform is not None:
        means = untransform(means)
    n = len(means)
    K = state.features_rest.shape[1] + 1

    f_dc = np.asarray(state.features_dc)[alive]            # (n, 3)
    # standard layout stores rest coefficients channel-major:
    # f_rest_[c*(K-1)+k] = coeff[k, c]
    f_rest = np.asarray(state.features_rest)[alive]        # (n, K-1, 3)
    f_rest_flat = f_rest.transpose(0, 2, 1).reshape(n, -1)

    extra = {}
    for j in range(3):
        extra[f"f_dc_{j}"] = f_dc[:, j]
    for j in range(f_rest_flat.shape[1]):
        extra[f"f_rest_{j}"] = f_rest_flat[:, j]
    extra["opacity"] = np.asarray(state.logit_opacities)[alive]
    log_scales = np.asarray(state.log_scales)[alive]
    for j in range(3):
        extra[f"scale_{j}"] = log_scales[:, j]
    quats = np.asarray(state.quats)[alive]
    quats = quats / np.maximum(
        np.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    for j in range(4):
        extra[f"rot_{j}"] = quats[:, j]

    write_ply(path, means, normals=np.zeros((n, 3), np.float32), extra=extra)
    return n


def import_splat_ply(path, capacity: int | None = None) -> GaussianState:
    """Load a standard 3DGS PLY into a GaussianState."""
    from fusionsense_tpu.gaussians.store import new_state

    import jax.numpy as jnp

    d = read_ply(path)
    pts = d["points"]
    n = len(pts)
    rest_keys = sorted((k for k in d if k.startswith("f_rest_")),
                       key=lambda k: int(k.split("_")[-1]))
    n_rest = len(rest_keys) // 3
    K = n_rest + 1
    deg = int(round(np.sqrt(K))) - 1
    cap = capacity or max(1024, 1 << (n - 1).bit_length())
    state = new_state(cap, sh_degree=deg)

    f_dc = np.stack([d[f"f_dc_{j}"] for j in range(3)], -1)
    if rest_keys:
        flat = np.stack([d[k] for k in rest_keys], -1)      # (n, 3*(K-1))
        f_rest = flat.reshape(n, 3, n_rest).transpose(0, 2, 1)
    else:
        f_rest = np.zeros((n, 0, 3), np.float32)
    quats = np.stack([d[f"rot_{j}"] for j in range(4)], -1)
    log_scales = np.stack([d[f"scale_{j}"] for j in range(3)], -1)

    put = lambda arr, v: arr.at[:n].set(jnp.asarray(v))
    return state.replace(
        means=put(state.means, pts),
        quats=put(state.quats, quats),
        log_scales=put(state.log_scales, log_scales),
        logit_opacities=put(state.logit_opacities, d["opacity"]),
        features_dc=put(state.features_dc, f_dc),
        features_rest=put(state.features_rest, f_rest),
        alive=state.alive.at[:n].set(True),
    )
