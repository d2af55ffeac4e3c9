"""Gaussian projection: 3D means/covariances -> 2D screen conics (EWA splatting).

TPU-native replacement for gsplat's fully_fused_projection CUDA kernel
(the reference consumes it via gsplat.rasterization,
reference dn_splatter/dn_model.py:570-591). Everything is batched dense math
over the padded Gaussian capacity — no per-Gaussian control flow — so it jits
into a handful of fused VPU loops.

Output "coefficient" packing is designed for the matmul compositor
(fusionsense_tpu/render/composite.py): per Gaussian a 6-vector k such that
    log alpha(px, py) = [px^2, px*py, py^2, px, py, 1] . k
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fusionsense_tpu.core.cameras import Camera


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities (all shape (N, ...))."""

    mean2d: jax.Array      # (N, 2) pixel coords
    depth: jax.Array       # (N,) camera z-depth
    conic: jax.Array       # (N, 3) inverse 2D covariance (a, b, c)
    radius: jax.Array      # (N,) screen-space extent in pixels (0 = culled)
    valid: jax.Array       # (N,) bool — survives frustum/size culling
    compensation: jax.Array  # (N,) antialiasing opacity compensation


def project_gaussians(
    means: jax.Array,        # (N, 3) world
    quats: jax.Array,        # (N, 4) wxyz (unnormalized ok)
    scales: jax.Array,       # (N, 3) std-devs
    opacities: jax.Array,    # (N,) in (0, 1)
    camera: Camera,
    near: float = 0.01,
    far: float = 1e10,
    eps2d: float = 0.3,
    antialiased: bool = False,
    radius_clip: float = 0.0,
) -> Projected:
    f32 = jnp.float32
    viewmat = camera.viewmat.astype(f32)
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]

    # camera-frame means
    p_cam = means @ R.T + t                                  # (N, 3)
    tz = p_cam[:, 2]
    in_depth = (tz > near) & (tz < far)
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)

    # 3D covariance in camera frame, fully scalar-expanded: batched (N,3,3)
    # matmuls lay out poorly on the VPU; as 9 flat N-vectors M = R_cam @ R_g
    # and the 6 unique entries of M S^2 M^T are a handful of fused FMAs.
    qn = quats / (jnp.linalg.norm(quats, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    g00 = 1 - 2 * (y * y + z * z)
    g01 = 2 * (x * y - w * z)
    g02 = 2 * (x * z + w * y)
    g10 = 2 * (x * y + w * z)
    g11 = 1 - 2 * (x * x + z * z)
    g12 = 2 * (y * z - w * x)
    g20 = 2 * (x * z - w * y)
    g21 = 2 * (y * z + w * x)
    g22 = 1 - 2 * (x * x + y * y)
    # M = R_cam (constants) @ R_g
    m = [[R[i, 0] * g0 + R[i, 1] * g1 + R[i, 2] * g2
          for (g0, g1, g2) in ((g00, g10, g20), (g01, g11, g21),
                               (g02, g12, g22))] for i in range(3)]
    s2 = scales * scales
    s0, s1, s2_ = s2[:, 0], s2[:, 1], s2[:, 2]

    def cov(i, j):
        return (m[i][0] * s0 * m[j][0] + m[i][1] * s1 * m[j][1]
                + m[i][2] * s2_ * m[j][2])

    c00, c01, c02 = cov(0, 0), cov(0, 1), cov(0, 2)
    c11, c12, c22 = cov(1, 1), cov(1, 2), cov(2, 2)

    # perspective Jacobian (2x3) with gsplat-style frustum clamping of tx/tz
    fx, fy = camera.fx, camera.fy
    W, H = camera.width, camera.height
    lim_x = 1.3 * (0.5 * W / fx)
    lim_y = 1.3 * (0.5 * H / fy)
    txz = jnp.clip(p_cam[:, 0] / tz_safe, -lim_x, lim_x)
    tyz = jnp.clip(p_cam[:, 1] / tz_safe, -lim_y, lim_y)
    inv_z = 1.0 / tz_safe
    # J = [[fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]]
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z

    # cov2d = J cov_cam J^T, expanded to avoid (N,2,3)x(N,3,3) intermediates
    v00 = (j00 * j00 * c00 + 2 * j00 * j02 * c02 + j02 * j02 * c22)
    v11 = (j11 * j11 * c11 + 2 * j11 * j12 * c12 + j12 * j12 * c22)
    v01 = (j00 * j11 * c01 + j00 * j12 * c02
           + j02 * j11 * c12 + j02 * j12 * c22)

    det_orig = v00 * v11 - v01 * v01
    v00 = v00 + eps2d
    v11 = v11 + eps2d
    det = v00 * v11 - v01 * v01
    det_safe = jnp.maximum(det, 1e-10)

    # antialiasing compensation (gsplat "antialiased" rasterize_mode)
    compensation = jnp.sqrt(jnp.maximum(det_orig / det_safe, 0.0))

    inv_det = 1.0 / det_safe
    conic_a = v11 * inv_det
    conic_b = -v01 * inv_det
    conic_c = v00 * inv_det
    conic = jnp.stack([conic_a, conic_b, conic_c], -1)

    # screen mean
    mx = fx * p_cam[:, 0] * inv_z + camera.cx
    my = fy * p_cam[:, 1] * inv_z + camera.cy
    mean2d = jnp.stack([mx, my], -1)

    # 3-sigma screen radius from the larger eigenvalue of cov2d
    mid = 0.5 * (v00 + v11)
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    # cull: behind camera, degenerate covariance, off screen, tiny radius
    valid = in_depth & (det > 0) & (radius > radius_clip)
    valid &= (mx + radius > 0) & (mx - radius < W) & (my + radius > 0) & (my - radius < H)
    radius = jnp.where(valid, radius, 0.0)

    return Projected(
        mean2d=mean2d,
        depth=tz,
        conic=conic,
        radius=radius,
        valid=valid,
        compensation=compensation,
    )


def alpha_coefficients(
    mean2d: jax.Array,     # (N, 2)
    conic: jax.Array,      # (N, 3)
    opacities: jax.Array,  # (N,) in (0, 1), already AA-compensated if desired
    valid: jax.Array,      # (N,) bool
) -> jax.Array:
    """(N, 6) coefficients k with log alpha(p) = [x^2, xy, y^2, x, y, 1] . k.

    Kept separate from projection so the caller can add a zero-valued offset
    to mean2d as a gradient tap (screen-space gradient statistics drive the
    densification schedule, like gsplat's means2d.absgrad consumed at
    reference dn_splatter/dn_model.py:326-451).
    """
    mx, my = mean2d[:, 0], mean2d[:, 1]
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    log_op = jnp.log(jnp.maximum(opacities, 1e-12))
    ka = -0.5 * ca
    kb = -cb
    kc = -0.5 * cc
    kx = ca * mx + cb * my
    ky = cb * mx + cc * my
    k1 = -(0.5 * ca * mx * mx + cb * mx * my + 0.5 * cc * my * my) + log_op
    # culled Gaussians get a hugely negative constant term -> alpha underflows
    # to exactly 0 (finite, not -inf, so backward stays NaN-free)
    k1 = jnp.where(valid, k1, -1e10)
    return jnp.stack([ka, kb, kc, kx, ky, k1], -1)
