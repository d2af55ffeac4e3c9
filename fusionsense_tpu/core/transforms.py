"""Quaternion / rotation / covariance math (pure JAX, fully batched).

Functional equivalents of the reference's math helpers
(reference dn_splatter/dn_model.py:2035-2163: random_quat_tensor,
rotate_vector_to_vector, matrix_to_quaternion, scale_rot_to_inv_cov3d),
rewritten batched-first so they vmap/jit cleanly on TPU.

Quaternion convention: (w, x, y, z), unnormalized inputs accepted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along the last axis."""
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix."""
    q = normalize(quat)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-free (jnp.where over the four standard cases) so it jits with
    no data-dependent control flow.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # case 0: trace dominant
    s0 = safe_sqrt(tr + 1.0) * 2
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    # case 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    # case 2: m11 dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    # case 3: m22 dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = tr > 0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return normalize(q)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of wxyz quaternions, broadcasting over leading dims."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_invert(q: jax.Array) -> jax.Array:
    """Inverse of a unit wxyz quaternion (conjugate)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def random_quats(key: jax.Array, n: int) -> jax.Array:
    """(n, 4) uniformly random unit quaternions (Shoemake method)."""
    u, v, w = jnp.split(jax.random.uniform(key, (n, 3)), 3, axis=-1)
    u, v, w = u[..., 0], v[..., 0], w[..., 0]
    return jnp.stack(
        [
            jnp.sqrt(1 - u) * jnp.sin(2 * jnp.pi * v),
            jnp.sqrt(1 - u) * jnp.cos(2 * jnp.pi * v),
            jnp.sqrt(u) * jnp.sin(2 * jnp.pi * w),
            jnp.sqrt(u) * jnp.cos(2 * jnp.pi * w),
        ],
        axis=-1,
    )


def rotation_between(a: jax.Array, b: jax.Array) -> jax.Array:
    """Quaternion rotating unit vector(s) a onto b (batched Rodrigues).

    Equivalent behavior to the reference's rotate_vector_to_vector
    (reference dn_splatter/dn_model.py: Rodrigues-formula helper), returned
    as a quaternion so it composes with the Gaussian orientation params.
    Handles the antiparallel case with an arbitrary orthogonal axis.
    """
    a = normalize(a)
    b = normalize(b)
    c = jnp.cross(a, b)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    # generic case: q = [1 + dot, cross], then normalize
    q = jnp.concatenate([1.0 + d, c], axis=-1)
    # antiparallel: rotate 180deg around any axis orthogonal to a
    ortho = jnp.where(
        (jnp.abs(a[..., :1]) < 0.9),
        jnp.cross(a, jnp.array([1.0, 0.0, 0.0], dtype=a.dtype)),
        jnp.cross(a, jnp.array([0.0, 1.0, 0.0], dtype=a.dtype)),
    )
    q_anti = jnp.concatenate([jnp.zeros_like(d), normalize(ortho)], axis=-1)
    q = jnp.where(d < -1.0 + 1e-6, q_anti, q)
    return normalize(q)


def exp_so3(w: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(..., 3) axis-angle -> (..., 3, 3) rotation (Rodrigues, small-angle
    safe). Used by the camera pose optimizer."""
    # theta_sq is smooth at w=0; guard the sqrt branch so the unselected
    # side of each where never produces NaN *gradients* (the where-grad trap)
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    tsq_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(tsq_safe)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / tsq_safe)
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    K = jnp.stack([
        jnp.stack([zero, -wz, wy], -1),
        jnp.stack([wz, zero, -wx], -1),
        jnp.stack([-wy, wx, zero], -1),
    ], -2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None] * K + b[..., None] * (K @ K)


def apply_se3_delta(viewmat: jax.Array, delta: jax.Array) -> jax.Array:
    """Left-compose a small SE3 correction onto a (4, 4) world-to-camera.

    delta = (..., 6): [rotation axis-angle (3), translation (3)]. The
    analog of the reference's SO3xR3 camera optimizer
    (nerfstudio camera_opt consumed at dn_model.py:488)."""
    R = exp_so3(delta[..., :3])
    t = delta[..., 3:]
    Rv = viewmat[..., :3, :3]
    tv = viewmat[..., :3, 3]
    top = jnp.concatenate(
        [R @ Rv, (jnp.einsum("...ij,...j->...i", R, tv) + t)[..., None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], viewmat.dtype),
        top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], -2)


def quat_scale_to_cov3d(quat: jax.Array, scale: jax.Array) -> jax.Array:
    """(..., 4), (..., 3) -> (..., 3, 3) covariance R S S^T R^T.

    `scale` is the standard deviation along each local axis (NOT log-scale).
    """
    R = quat_to_rotmat(quat)
    M = R * scale[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)


def quat_scale_to_inv_cov3d(quat: jax.Array, scale: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Inverse covariance without a matrix solve: R S^-2 R^T."""
    R = quat_to_rotmat(quat)
    inv_s2 = 1.0 / jnp.maximum(scale * scale, eps)
    return (R * inv_s2[..., None, :]) @ jnp.swapaxes(R, -1, -2)
