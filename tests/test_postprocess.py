import numpy as np

from fusionsense_tpu.mesh.marching import marching_tetrahedra
from fusionsense_tpu.mesh.postprocess import (
    decimate_vertex_clustering, find_depth_edges, laplacian_smooth,
)


def sphere_mesh(res=24, radius=0.35):
    xs = np.linspace(-0.5, 0.5, res)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.sqrt(gx**2 + gy**2 + gz**2) - radius
    return marching_tetrahedra(sdf, 0.0, (-0.5, -0.5, -0.5), xs[1] - xs[0])


def test_laplacian_smooth_reduces_noise():
    verts, faces = sphere_mesh()
    rng = np.random.RandomState(0)
    noisy = verts + rng.randn(*verts.shape).astype(np.float32) * 0.01
    sm = laplacian_smooth(noisy, faces, iterations=3)
    r_noisy = np.std(np.linalg.norm(noisy, axis=-1))
    r_sm = np.std(np.linalg.norm(sm, axis=-1))
    assert r_sm < r_noisy * 0.7


def test_decimation_reduces_and_preserves_shape():
    verts, faces = sphere_mesh(res=32)
    dv, df = decimate_vertex_clustering(verts, faces, voxel=0.08)
    assert len(dv) < len(verts) * 0.5
    assert len(df) > 20
    r = np.linalg.norm(dv, axis=-1)
    assert abs(np.median(r) - 0.35) < 0.05


def test_find_depth_edges():
    depth = np.full((32, 32), 2.0)
    depth[:, 16:] = 3.0  # step discontinuity
    edges = find_depth_edges(depth, threshold=0.01)
    assert edges[:, 15:18].any(axis=1).all()  # edge detected at the step
    assert not edges[:, 2:10].any()           # flat region clean
