"""Spherical-harmonics color evaluation (degrees 0-3), pure JAX.

The reference delegates SH evaluation to the gsplat CUDA rasterizer
(reference dn_splatter/dn_model.py:570-591, sh_degree argument). Here it is
a standalone batched function so it fuses into the projection pass under jit
and runs on the VPU.

Coefficient layout: (..., K, 3) with K = (deg+1)^2, channel-last, matching
the usual 3DGS "features_dc" (K=1 slice) + "features_rest" packing.
"""
from __future__ import annotations

import jax

# Real SH basis constants (same normalization as the 3DGS reference kernels).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(coeffs: jax.Array, dirs: jax.Array, degree: int) -> jax.Array:
    """Evaluate SH color.

    Args:
      coeffs: (..., K, 3) SH coefficients with K >= (degree+1)^2.
      dirs:   (..., 3) unit view directions (Gaussian center - camera origin).
      degree: active degree in [0, 3] (python int, static under jit).

    Returns:
      (..., 3) raw color (caller adds +0.5 and clamps, per 3DGS convention).
    """
    result = _C0 * coeffs[..., 0, :]
    if degree >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (
            result
            - _C1 * y * coeffs[..., 1, :]
            + _C1 * z * coeffs[..., 2, :]
            - _C1 * x * coeffs[..., 3, :]
        )
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (
            result
            + _C2[0] * xy * coeffs[..., 4, :]
            + _C2[1] * yz * coeffs[..., 5, :]
            + _C2[2] * (2.0 * zz - xx - yy) * coeffs[..., 6, :]
            + _C2[3] * xz * coeffs[..., 7, :]
            + _C2[4] * (xx - yy) * coeffs[..., 8, :]
        )
    if degree >= 3:
        result = (
            result
            + _C3[0] * y * (3 * xx - yy) * coeffs[..., 9, :]
            + _C3[1] * xy * z * coeffs[..., 10, :]
            + _C3[2] * y * (4 * zz - xx - yy) * coeffs[..., 11, :]
            + _C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * coeffs[..., 12, :]
            + _C3[4] * x * (4 * zz - xx - yy) * coeffs[..., 13, :]
            + _C3[5] * z * (xx - yy) * coeffs[..., 14, :]
            + _C3[6] * x * (xx - 3 * yy) * coeffs[..., 15, :]
        )
    return result


def rgb_to_sh0(rgb: jax.Array) -> jax.Array:
    """Invert the degree-0 band: color c -> dc coefficient with eval(dc)=c-0.5."""
    return (rgb - 0.5) / _C0


def sh0_to_rgb(dc: jax.Array) -> jax.Array:
    return dc * _C0 + 0.5
