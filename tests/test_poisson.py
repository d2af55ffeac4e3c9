import numpy as np

from fusionsense_tpu.data.synthetic import sphere_points
from fusionsense_tpu.mesh.poisson import PoissonConfig, poisson_reconstruct


def test_poisson_sphere():
    pts, _, normals = sphere_points(n=4000, radius=0.4)
    pts, normals = np.asarray(pts), np.asarray(normals)
    verts, faces = poisson_reconstruct(
        pts, normals, PoissonConfig(resolution=96))
    assert len(verts) > 500
    assert len(faces) > 500
    r = np.linalg.norm(verts, axis=-1)
    # reconstructed surface close to the true radius
    assert abs(np.median(r) - 0.4) < 0.04
    assert np.percentile(np.abs(r - 0.4), 90) < 0.08


def test_poisson_noisy_normals():
    rng = np.random.RandomState(0)
    pts, _, normals = sphere_points(n=3000, radius=0.4)
    pts = np.asarray(pts) + rng.randn(3000, 3) * 0.005
    normals = np.asarray(normals) + rng.randn(3000, 3) * 0.1
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    verts, faces = poisson_reconstruct(
        pts, normals, PoissonConfig(resolution=96))
    assert len(verts) > 500
    r = np.linalg.norm(verts, axis=-1)
    assert abs(np.median(r) - 0.4) < 0.05
