"""Camera model: pinhole intrinsics + world-to-camera extrinsics.

Internal convention is OpenCV (x right, y down, z forward), like the CUDA
rasterizer the reference uses. The dataparser converts from transforms.json's
OpenGL camera-to-world convention (reference
dn_splatter/data/normal_nerfstudio.py:317 does the analogous flip).

Cameras are a chex dataclass of stacked arrays so a batch of cameras is just
one Camera with a leading axis — vmap/scan/shard friendly.
"""
from __future__ import annotations

import chex
import jax
import jax.numpy as jnp


@chex.dataclass
class Camera:
    """Pinhole camera(s). All fields may carry a common leading batch shape."""

    viewmat: jax.Array  # (..., 4, 4) world-to-camera (OpenCV)
    fx: jax.Array       # (...,)
    fy: jax.Array       # (...,)
    cx: jax.Array       # (...,)
    cy: jax.Array       # (...,)
    width: int          # static python ints — shapes must be static under jit
    height: int

    @property
    def K(self) -> jax.Array:
        """(..., 3, 3) intrinsics matrix."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    @property
    def camtoworld(self) -> jax.Array:
        return jnp.linalg.inv(self.viewmat)

    @property
    def origin(self) -> jax.Array:
        """(..., 3) camera center in world coordinates."""
        R = self.viewmat[..., :3, :3]
        t = self.viewmat[..., :3, 3]
        return -jnp.einsum("...ji,...j->...i", R, t)

    def index(self, i) -> "Camera":
        """Select camera i from a batched Camera (static or traced index)."""
        take = lambda x: x[i] if isinstance(x, jax.Array) or hasattr(x, "shape") else x
        return Camera(
            viewmat=take(self.viewmat), fx=take(self.fx), fy=take(self.fy),
            cx=take(self.cx), cy=take(self.cy),
            width=self.width, height=self.height,
        )


def make_camera(viewmat, fx, fy, cx, cy, width, height) -> Camera:
    asf = lambda v: jnp.asarray(v, dtype=jnp.float32)
    return Camera(
        viewmat=asf(viewmat), fx=asf(fx), fy=asf(fy), cx=asf(cx), cy=asf(cy),
        width=int(width), height=int(height),
    )


def opengl_c2w_to_opencv_w2c(c2w_gl: jax.Array) -> jax.Array:
    """transforms.json OpenGL camera-to-world -> OpenCV world-to-camera.

    OpenGL cameras look down -z with +y up; OpenCV looks down +z with +y down,
    so flip the y and z camera axes then invert.
    """
    flip = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0], dtype=c2w_gl.dtype))
    c2w_cv = c2w_gl @ flip
    return jnp.linalg.inv(c2w_cv)


def world_to_cam(points: jax.Array, viewmat: jax.Array) -> jax.Array:
    """(N, 3) world points -> (N, 3) camera-frame points."""
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    return points @ R.T + t


def project_points(points_cam: jax.Array, fx, fy, cx, cy, eps: float = 1e-6) -> jax.Array:
    """(N, 3) camera-frame points -> (N, 2) pixel coordinates.

    Equivalent of the reference's project_pix
    (reference dn_splatter/utils/camera_utils.py:147-172).
    """
    z = points_cam[..., 2:3]
    xy = points_cam[..., :2] / jnp.where(jnp.abs(z) < eps, eps, z)
    return xy * jnp.stack([fx, fy], -1) + jnp.stack([cx, cy], -1)


def backproject_depth(depth: jax.Array, camera: Camera) -> jax.Array:
    """(H, W) z-depth map -> (H*W, 3) world points.

    Equivalent of the reference's get_means3d_backproj
    (reference dn_splatter/utils/camera_utils.py:92-144) for a full image.
    """
    H, W = depth.shape
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)
    z = depth.reshape(-1)
    x = (gx.reshape(-1) - camera.cx) / camera.fx * z
    y = (gy.reshape(-1) - camera.cy) / camera.fy * z
    pts_cam = jnp.stack([x, y, z], axis=-1)
    c2w = camera.camtoworld
    return pts_cam @ c2w[:3, :3].T + c2w[:3, 3]


def pixel_centers(width: int, height: int) -> jax.Array:
    """(H, W, 2) pixel-center coordinates (x, y)."""
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)
