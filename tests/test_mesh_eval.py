import numpy as np

from fusionsense_tpu.data.synthetic import (
    ring_cameras, sphere_depth_normals, sphere_points,
)
from fusionsense_tpu.eval.mesh_eval import (
    faro_depth_eval, mesh_eval, sample_mesh_points, visible_mask,
)
from fusionsense_tpu.mesh.marching import marching_tetrahedra


def sphere_mesh(radius=0.4, res=32):
    xs = np.linspace(-0.6, 0.6, res)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.sqrt(gx**2 + gy**2 + gz**2) - radius
    return marching_tetrahedra(sdf, 0.0, (-0.6, -0.6, -0.6), xs[1] - xs[0])


def test_sample_mesh_points_on_surface():
    verts, faces = sphere_mesh()
    pts = sample_mesh_points(verts, faces, 5000)
    r = np.linalg.norm(pts, axis=-1)
    assert abs(np.median(r) - 0.4) < 0.03


def test_mesh_eval_self_chamfer_small():
    verts, faces = sphere_mesh()
    gt, _, _ = sphere_points(n=20000, radius=0.4)
    cams = ring_cameras(n_views=4, width=64, height_px=48, focal=60.0)
    res = mesh_eval(verts, faces, np.asarray(gt), cameras=cams)
    assert res["chamfer_x1e3"] < 5.0
    assert res["completeness"] > 0.95
    assert "culled_chamfer_x1e3" in res


def test_visible_mask():
    cams = ring_cameras(n_views=4, width=64, height_px=48, focal=60.0)
    pts = np.array([[0.0, 0, 0], [100.0, 100, 100]], np.float32)
    vis = visible_mask(pts, cams)
    assert bool(vis[0]) and not bool(vis[1])


def test_depth_cull_mask_occluded_and_floater():
    """go-surf observability cull (reference eval_mesh_vis_cull.py:96-140):
    surface points seen by a camera survive, back-side points occluded in
    EVERY view are culled, and in-frustum points in free space in front of
    the surface (floaters) count as observed — same as the reference."""
    from fusionsense_tpu.eval.mesh_eval import depth_cull_mask

    cams = ring_cameras(n_views=6, width=64, height_px=48, focal=60.0)
    depths = np.stack([
        np.asarray(sphere_depth_normals(cams.index(i), radius=0.4)[0])
        for i in range(6)])

    cam0_dir = np.array([2.0, 0.0, 0.8])
    cam0_dir /= np.linalg.norm(cam0_dir)
    pts = np.array([
        [0.4, 0.0, 0.0],     # on-sphere, equator: front-facing to a cam
        [0.0, 0.0, -0.41],   # bottom pole: behind the surface in all views
        0.42 * cam0_dir,     # hugging floater in front of the surface,
        #                      projecting onto the disc in every view:
        #                      observed (the reference keeps these too)
        [0.46, 0.0, 0.0],    # floater whose side-view projections fall on
        #                      depthless background: invalidated (>70% of
        #                      its observations lack depth)
        [100.0, 0.0, 0.0],   # outside every frustum
    ])
    keep = depth_cull_mask(pts, cams, depths, min_views=1)
    assert bool(keep[0]), "observed surface point must survive"
    assert not bool(keep[1]), "always-occluded back side must be culled"
    assert bool(keep[2]), "near-surface front floater counts as observed"
    assert not bool(keep[3]), "mostly-depthless projections invalidate"
    assert not bool(keep[4]), "out-of-frustum point has zero observations"

    # missing-depth invalidation: zero out the depth maps -> the surface
    # point's observations all land on depthless pixels -> invalid
    keep_nodepth = depth_cull_mask(pts[:1], cams, np.zeros_like(depths))
    assert not bool(keep_nodepth[0])


def test_faro_depth_eval_exact():
    cams = ring_cameras(n_views=3, width=64, height_px=48, focal=60.0)
    import jax.numpy as jnp

    # reference pcd = dense sphere; rendered depth = analytic sphere depth
    ref, _, _ = sphere_points(n=60000, radius=0.4)
    depths = []
    for i in range(3):
        d, _, _ = sphere_depth_normals(cams.index(i), radius=0.4)
        depths.append(np.asarray(d))
    res = faro_depth_eval(np.stack(depths), np.asarray(ref), cams)
    assert res["abs_rel"] < 0.02
    assert res["a1"] > 0.97


def test_mask_image():
    from fusionsense_tpu.eval.mask_render import mask_image

    rgb = np.full((4, 4, 3), 0.5, np.float32)
    mask = np.zeros((4, 4), np.float32)
    mask[1, 1] = 1.0
    out = mask_image(rgb, mask)
    assert out[1, 1, 0] == 0.5
    assert out[0, 0, 0] == 1.0


def _l_shape_cloud(n=4000, seed=0):
    """Asymmetric L-shaped volume cloud (no rotational symmetry)."""
    rng = np.random.RandomState(seed)
    a = rng.rand(n // 2, 3) * [0.4, 0.1, 0.1]
    b = rng.rand(n // 2, 3) * [0.1, 0.25, 0.1]
    return np.concatenate([a, b]).astype(np.float64)


def test_chamfer_global_registration_recovers_90deg():
    """chamfer_eval must align a 90deg-misaligned cloud: trimmed ICP alone
    converges to a wrong basin there; the rotation-search global init is
    the reference's FPFH+RANSAC stage
    (reference eval_utils/chamfer_evaluation.py:117-137)."""
    from fusionsense_tpu.eval.chamfer import chamfer_eval, icp_align
    from fusionsense_tpu.eval.metrics import chamfer_distance

    gt = _l_shape_cloud(seed=0)
    Rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    pred = _l_shape_cloud(seed=1) @ Rz.T + np.array([0.3, -0.2, 0.1])

    # the two independent volume samplings set an inherent chamfer floor;
    # a recovered alignment must land on it (measured ~0.09)
    floor = chamfer_distance(_l_shape_cloud(seed=1), gt)
    res = chamfer_eval(pred, gt)
    assert res["chamfer_x1e3"] < 1.2 * floor, (res, floor)

    # and the global stage is what does it: ICP-only lands in a bad basin
    aligned_noinit, _ = icp_align(pred, gt, global_init=False)
    assert chamfer_distance(aligned_noinit, gt) > 5 * res["chamfer_x1e3"]


def test_chamfer_local_touch_sites():
    """Per-touch-site local chamfer rides the global alignment transform
    (reference local_CD/touch_CD_eval, chamfer_evaluation.py:82-114)."""
    from fusionsense_tpu.eval.chamfer import chamfer_eval, local_chamfer

    gt = _l_shape_cloud(seed=0)
    pred = _l_shape_cloud(seed=1) + np.array([0.05, 0.0, 0.0])
    centers = np.array([[0.2, 0.05, 0.05], [0.05, 0.2, 0.05]])
    res = chamfer_eval(pred, gt, touch_centers=centers - [0.05, 0, 0],
                       touch_radius=0.06)
    assert len(res["local_chamfer_x1e3"]) == 2
    assert np.isfinite(res["local_chamfer_x1e3_mean"])
    assert res["local_chamfer_x1e3_mean"] < 1.0, res

    # exclude_site mode replicates the reference's literal filter
    vals = local_chamfer(gt, gt, centers, radius=0.06, mode="exclude_site")
    assert all(v < 1e-9 for v in vals)
