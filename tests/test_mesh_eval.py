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
