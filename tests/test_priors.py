import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.data.synthetic import (
    ring_cameras, sphere_depth_normals, sphere_points,
)
from fusionsense_tpu.priors.frame_select import farthest_point_camera_selection
from fusionsense_tpu.priors.pcd_init import seed_pcd_from_depths, voxel_downsample
from fusionsense_tpu.priors.visual_hull import VisualHullConfig, visual_hull


def test_visual_hull_carves_sphere():
    cams = ring_cameras(n_views=8, width=64, height_px=48, focal=60.0,
                        radius=1.8, height=0.6)
    masks = []
    for i in range(8):
        _, _, m = sphere_depth_normals(cams.index(i), radius=0.3)
        masks.append(m)
    masks = jnp.stack(masks)
    cfg = VisualHullConfig(voxel_size=0.04, extent=1.2, error_percent=5.0,
                           chunk=4096)
    hull = visual_hull(masks, cams, cfg=cfg)
    assert len(hull) > 100
    r = np.linalg.norm(hull, axis=-1)
    # hull contains the sphere and not much more (carving w/ 8 views leaves
    # some excess, but everything must be within ~1.4x radius)
    assert r.max() < 0.45
    assert r.min() < 0.15  # interior voxels survive too (solid hull)


def test_voxel_downsample():
    pts = np.array([[0.0, 0, 0], [0.001, 0, 0], [1.0, 0, 0]])
    cols = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    p2, c2 = voxel_downsample(pts, cols, 0.02)
    assert len(p2) == 2


def test_seed_pcd_from_depths():
    cams = ring_cameras(n_views=4, width=48, height_px=36, focal=45.0,
                        radius=1.5, height=0.4)
    depths, images = [], []
    for i in range(4):
        d, _, m = sphere_depth_normals(cams.index(i), radius=0.3)
        depths.append(d)
        images.append(jnp.ones((36, 48, 3)) * 0.7)
    depths = jnp.stack(depths)
    images = jnp.stack(images)
    hull = np.random.RandomState(0).randn(50, 3).astype(np.float32) * 0.1
    pts, cols = seed_pcd_from_depths(depths, images, cams, hull_points=hull,
                                     fg_max=0.5, bg_max=5.0)
    assert len(pts) >= 50  # hull always included
    # hull points painted black at the front of the array
    np.testing.assert_allclose(cols[:50], 0.0)
    # background points (sphere surface at distance ~1.2-1.8 from cams) exist
    assert len(pts) > 50


def test_farthest_point_selection():
    th = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    origins = np.stack([np.cos(th), np.sin(th), np.zeros(12)], -1)
    sel = farthest_point_camera_selection(origins, 4)
    assert len(sel) == 4
    # roughly uniform spread: successive chosen cameras ~90 degrees apart
    angles = sorted(th[sel])
    gaps = np.diff(angles + [angles[0] + 2 * np.pi] if False else angles)
    assert np.all(np.asarray(gaps) > np.pi / 6)
