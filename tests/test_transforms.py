import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionsense_tpu.core import transforms as T


def test_quat_rotmat_roundtrip():
    key = jax.random.PRNGKey(0)
    q = T.random_quats(key, 64)
    R = T.quat_to_rotmat(q)
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
    assert np.allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    # roundtrip (quaternion double-cover: compare rotation matrices)
    q2 = T.rotmat_to_quat(R)
    R2 = T.quat_to_rotmat(q2)
    np.testing.assert_allclose(R, R2, atol=1e-4)


def test_quat_mul_matches_rotmat_product():
    key1, key2 = jax.random.split(jax.random.PRNGKey(1))
    a = T.random_quats(key1, 16)
    b = T.random_quats(key2, 16)
    R_ab = T.quat_to_rotmat(T.quat_mul(a, b))
    R_a, R_b = T.quat_to_rotmat(a), T.quat_to_rotmat(b)
    np.testing.assert_allclose(R_ab, R_a @ R_b, atol=1e-5)


def test_rotation_between():
    key = jax.random.PRNGKey(2)
    a = T.normalize(jax.random.normal(key, (32, 3)))
    b = T.normalize(jax.random.normal(jax.random.PRNGKey(3), (32, 3)))
    q = T.rotation_between(a, b)
    R = T.quat_to_rotmat(q)
    np.testing.assert_allclose(jnp.einsum("nij,nj->ni", R, a), b, atol=1e-5)


def test_rotation_between_antiparallel():
    a = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    b = -a
    q = T.rotation_between(a, b)
    R = T.quat_to_rotmat(q)
    np.testing.assert_allclose(jnp.einsum("nij,nj->ni", R, a), b, atol=1e-5)


def test_cov3d():
    q = T.random_quats(jax.random.PRNGKey(4), 8)
    s = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (8, 3))) + 0.1
    cov = T.quat_scale_to_cov3d(q, s)
    icov = T.quat_scale_to_inv_cov3d(q, s)
    np.testing.assert_allclose(cov @ icov, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-3)
    # eigenvalues of cov are scale^2
    ev = np.sort(np.linalg.eigvalsh(np.asarray(cov)), axis=-1)
    np.testing.assert_allclose(ev, np.sort(np.asarray(s) ** 2, axis=-1), rtol=1e-4)


def test_sh_degree0_constant():
    from fusionsense_tpu.core import sh

    coeffs = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
    dirs = T.normalize(jax.random.normal(jax.random.PRNGKey(6), (5, 3)))
    out = sh.eval_sh(coeffs, dirs, 3)
    np.testing.assert_allclose(out, 0.28209479 * np.ones((5, 3)), atol=1e-6)


def test_sh_rgb_roundtrip():
    from fusionsense_tpu.core import sh

    rgb = jnp.array([[0.2, 0.5, 0.9]])
    dc = sh.rgb_to_sh0(rgb)
    np.testing.assert_allclose(sh.sh0_to_rgb(dc), rgb, atol=1e-6)


def test_camera_roundtrip():
    from fusionsense_tpu.core import cameras

    # camera at origin looking down +z (identity viewmat)
    cam = cameras.make_camera(jnp.eye(4), 100.0, 100.0, 32.0, 24.0, 64, 48)
    pts = jnp.array([[0.0, 0.0, 2.0], [0.1, -0.2, 1.0]])
    pix = cameras.project_points(pts, cam.fx, cam.fy, cam.cx, cam.cy)
    np.testing.assert_allclose(pix[0], [32.0, 24.0], atol=1e-5)
    np.testing.assert_allclose(pix[1], [42.0, 4.0], atol=1e-4)
    np.testing.assert_allclose(cam.origin, jnp.zeros(3), atol=1e-6)


def test_backproject_depth_inverts_projection():
    from fusionsense_tpu.core import cameras

    c2w = jnp.array(
        [[1.0, 0, 0, 0.3], [0, 1.0, 0, -0.1], [0, 0, 1.0, 0.5], [0, 0, 0, 1.0]]
    )
    cam = cameras.make_camera(jnp.linalg.inv(c2w), 50.0, 50.0, 16.0, 12.0, 32, 24)
    depth = jnp.full((24, 32), 2.0)
    pts = cameras.backproject_depth(depth, cam)
    # reproject
    pts_cam = cameras.world_to_cam(pts, cam.viewmat)
    np.testing.assert_allclose(pts_cam[:, 2], 2.0, atol=1e-5)
    pix = cameras.project_points(pts_cam, cam.fx, cam.fy, cam.cx, cam.cy)
    grid = cameras.pixel_centers(32, 24).reshape(-1, 2)
    np.testing.assert_allclose(pix, grid, atol=1e-4)


def test_opengl_conversion():
    from fusionsense_tpu.core import cameras

    # OpenGL camera at +2z looking toward origin (-z forward in GL)
    c2w_gl = jnp.array(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 2.0], [0, 0, 0, 1.0]]
    )
    w2c = cameras.opengl_c2w_to_opencv_w2c(c2w_gl)
    # origin should land at z=+2 in front of the OpenCV camera
    p = cameras.world_to_cam(jnp.zeros((1, 3)), w2c)
    np.testing.assert_allclose(p, [[0.0, 0.0, 2.0]], atol=1e-6)
