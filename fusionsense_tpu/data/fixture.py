"""Write a complete synthetic capture to disk in the reference data layout.

Produces the exact on-disk contract the pipeline consumes (transforms.json
+ images/ + depths (16-bit mm png) + normals (npy) + masks + seed ply +
optional tactile/gelsight_transform.json) — the test-fixture analog of the
reference's transparent_bunny capture (reference README.md:55-57,131-134).
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from PIL import Image

import jax.numpy as jnp

from fusionsense_tpu.data.synthetic import (
    ring_cameras, sphere_depth_normals, sphere_points,
)
from fusionsense_tpu.gaussians.init import init_from_points
from fusionsense_tpu.gaussians.store import activated
from fusionsense_tpu.render.rasterize import RasterizeConfig, rasterize
from fusionsense_tpu.utils.ply import write_ply, write_pcd


def write_synthetic_scene(
    data_dir,
    n_views: int = 6,
    width: int = 96,
    height: int = 72,
    focal: float = 85.0,
    radius: float = 0.4,
    n_gt: int = 1500,
    with_touches: bool = False,
    seed: int = 0,
):
    """Returns the data_dir. GT = textured sphere rendered with the tiled
    rasterizer; depth/normals/masks analytic."""
    data_dir = Path(data_dir)
    (data_dir / "images").mkdir(parents=True, exist_ok=True)
    for sub in ("depths", "normals", "masks"):
        (data_dir / sub).mkdir(exist_ok=True)

    cams = ring_cameras(n_views=n_views, width=width, height_px=height,
                        focal=focal)
    pts, rgb, normals = sphere_points(n=n_gt, radius=radius, seed=seed)
    gt = init_from_points(pts, rgb, capacity=max(2048, n_gt * 2), sh_degree=1,
                          seed_normals=normals, init_opacity=0.95)
    rcfg = RasterizeConfig(tile_size=16, tile_capacity=128,
                           max_tiles_per_gaussian=16, tile_chunk=16,
                           sh_degree=1)
    m, q, s, o, c = activated(gt)

    # cameras are scene-normalized by construction; write transforms.json in
    # raw/OpenGL convention so the dataparser's conversions are exercised
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    frames = []
    for i in range(n_views):
        cam_i = cams.index(i)
        out = rasterize(m, q, s, o, c, cam_i, rcfg)
        depth, nrm, mask = sphere_depth_normals(cam_i, radius=radius)
        name = f"frame_{i:05d}.png"

        img = np.asarray(jnp.clip(out.rgb, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(data_dir / "images" / name)
        d_mm = (np.asarray(depth) * 1000).astype(np.uint16)
        Image.fromarray(d_mm).save(data_dir / "depths" / name)
        # normals stored in OPENGL camera frame, the reference's convention
        # for mono-normal artifacts (dn_dataset.py:207-217; loader flips
        # GL->CV then lifts to world)
        w2c = np.asarray(cam_i.viewmat)
        n_cam = (np.asarray(nrm) @ w2c[:3, :3].T) * np.array([1, -1, -1.0])
        np.save(data_dir / "normals" / (name + ".npy"), n_cam)
        Image.fromarray((np.asarray(mask) * 255).astype(np.uint8)).save(
            data_dir / "masks" / name)

        c2w_cv = np.linalg.inv(w2c)
        c2w_gl = c2w_cv @ flip
        frames.append({
            "file_path": f"images/{name}",
            "depth_file_path": f"depths/{name}",
            "normal_file_path": f"normals/{name}.npy",
            "mask_file_path": f"masks/{name}",
            "transform_matrix": c2w_gl.tolist(),
            "fl_x": focal, "fl_y": focal,
            "cx": width / 2, "cy": height / 2, "w": width, "h": height,
        })

    # seed pcd: subsampled noisy GT surface
    rng = np.random.RandomState(seed)
    seed_pts = np.asarray(pts)[:: max(1, n_gt // 500)]
    seed_pts = seed_pts + rng.randn(*seed_pts.shape).astype(np.float32) * 0.01
    seed_rgb = np.asarray(rgb)[:: max(1, n_gt // 500)]
    write_ply(data_dir / "seed.ply", seed_pts, colors=seed_rgb)

    meta = {
        "frames": frames,
        "ply_file_path": "seed.ply",
        "train_filenames": [f"images/frame_{i:05d}.png"
                            for i in range(n_views - 1)],
        "test_filenames": [f"images/frame_{n_views - 1:05d}.png"],
    }

    if with_touches:
        tdir = data_dir / "tactile"
        tdir.mkdir(exist_ok=True)
        # one patch on the +x pole of the sphere, in sensor units
        gel_scale = 6.34e-5
        grid = np.stack(np.meshgrid(np.arange(-10, 11), np.arange(-10, 11)),
                        -1).reshape(-1, 2) * 10.0   # sensor units
        zs = np.zeros((len(grid), 1))
        sensor_pts = np.concatenate([grid, zs], -1)
        write_pcd(tdir / "patch_0.pcd", sensor_pts.astype(np.float32),
                  extra={"normal_x": np.zeros(len(grid), np.float32),
                         "normal_y": np.zeros(len(grid), np.float32)})
        T = np.eye(4)
        # sensor -z normal should face outward (+x): rotate z->-x
        T[:3, :3] = np.array([[0, 0, -1.0], [0, 1.0, 0], [1.0, 0, 0]]).T
        T[:3, 3] = [radius, 0.0, 0.0]
        with open(tdir / "gelsight_transform.json", "w") as f:
            json.dump({"gel_scale": gel_scale,
                       "frames": [{"file_path": "patch_0.pcd",
                                   "transform_matrix": T.tolist()}]}, f)

    with open(data_dir / "transforms.json", "w") as f:
        json.dump(meta, f)
    return data_dir


def write_blob_scene(
    data_dir,
    n_views: int = 9,
    width: int = 128,
    height: int = 96,
    focal: float = 110.0,
    base: float = 0.4,
    n_gt: int = 4000,
    depth_noise: float = 0.004,
    with_touches: bool = True,
    seed: int = 0,
    n_seed_pts: int = 600,
):
    """Realistic-capture regression fixture: 9 posed views of a bumpy
    star-convex object with procedural texture, NOISY 16-bit sensor depth,
    masks, a sparse noisy seed pcd, one tactile patch, and the dense GT
    surface points (`gt_points.ply`) for chamfer evaluation — the in-repo
    analog of the reference's canonical transparent_bunny run
    (reference README.md:131-145, scripts/train.py:274-327).
    """
    from fusionsense_tpu.data.synthetic import (
        blob_depth_normals, blob_points,
    )

    data_dir = Path(data_dir)
    (data_dir / "images").mkdir(parents=True, exist_ok=True)
    for sub in ("depths", "normals", "masks"):
        (data_dir / sub).mkdir(exist_ok=True)

    cams = ring_cameras(n_views=n_views, width=width, height_px=height,
                        focal=focal)
    pts, rgb, normals = blob_points(n=n_gt, base=base, seed=seed)
    gt = init_from_points(pts, rgb, capacity=max(4096, n_gt * 2), sh_degree=1,
                          seed_normals=normals, init_opacity=0.97)
    rcfg = RasterizeConfig(tile_size=16, tile_capacity=192,
                           max_tiles_per_gaussian=16, tile_chunk=16,
                           sh_degree=1)
    m, q, s, o, c = activated(gt)

    rng = np.random.RandomState(seed)
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    frames = []
    for i in range(n_views):
        cam_i = cams.index(i)
        out = rasterize(m, q, s, o, c, cam_i, rcfg)
        depth, nrm, mask = blob_depth_normals(cam_i, base=base)
        name = f"frame_{i:05d}.png"

        img = np.asarray(jnp.clip(out.rgb, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(data_dir / "images" / name)
        # sensor-like depth: multiplicative speckle + mm quantization
        d = np.asarray(depth)
        d_noisy = d * (1.0 + depth_noise * rng.randn(*d.shape))
        d_mm = np.clip(d_noisy * 1000, 0, 65535).astype(np.uint16)
        Image.fromarray(d_mm).save(data_dir / "depths" / name)
        w2c = np.asarray(cam_i.viewmat)
        n_cam = (np.asarray(nrm) @ w2c[:3, :3].T) * np.array([1, -1, -1.0])
        np.save(data_dir / "normals" / (name + ".npy"), n_cam)
        Image.fromarray((np.asarray(mask) * 255).astype(np.uint8)).save(
            data_dir / "masks" / name)

        c2w_gl = np.linalg.inv(w2c) @ flip
        frames.append({
            "file_path": f"images/{name}",
            "depth_file_path": f"depths/{name}",
            "normal_file_path": f"normals/{name}.npy",
            "mask_file_path": f"masks/{name}",
            "transform_matrix": c2w_gl.tolist(),
            "fl_x": focal, "fl_y": focal,
            "cx": width / 2, "cy": height / 2, "w": width, "h": height,
        })

    # sparse noisy seed pcd (what a 9-view SfM/backprojection would give)
    step = max(1, n_gt // n_seed_pts)
    seed_pts = np.asarray(pts)[::step]
    seed_pts = seed_pts + rng.randn(*seed_pts.shape).astype(np.float32) * 0.012
    write_ply(data_dir / "seed.ply", seed_pts,
              colors=np.asarray(rgb)[::step])
    # dense GT surface for chamfer regression
    write_ply(data_dir / "gt_points.ply", np.asarray(pts),
              colors=np.asarray(rgb))

    meta = {
        "frames": frames,
        "ply_file_path": "seed.ply",
        "train_filenames": [f"images/frame_{i:05d}.png"
                            for i in range(n_views - 1)],
        "test_filenames": [f"images/frame_{n_views - 1:05d}.png"],
    }

    if with_touches:
        tdir = data_dir / "tactile"
        tdir.mkdir(exist_ok=True)
        gel_scale = 6.34e-5
        grid = np.stack(np.meshgrid(np.arange(-10, 11), np.arange(-10, 11)),
                        -1).reshape(-1, 2) * 10.0
        sensor_pts = np.concatenate([grid, np.zeros((len(grid), 1))], -1)
        write_pcd(tdir / "patch_0.pcd", sensor_pts.astype(np.float32),
                  extra={"normal_x": np.zeros(len(grid), np.float32),
                         "normal_y": np.zeros(len(grid), np.float32)})
        # anchor the patch at the blob's +x surface point
        import jax

        from fusionsense_tpu.data.synthetic import _blob_implicit, _blob_radius

        ux = jnp.asarray([1.0, 0.0, 0.0])
        r_x = float(_blob_radius(ux, base))
        T = np.eye(4)
        T[:3, :3] = np.array([[0, 0, -1.0], [0, 1.0, 0], [1.0, 0, 0]]).T
        T[:3, 3] = [r_x, 0.0, 0.0]
        with open(tdir / "gelsight_transform.json", "w") as f:
            json.dump({"gel_scale": gel_scale,
                       "frames": [{"file_path": "patch_0.pcd",
                                   "transform_matrix": T.tolist()}]}, f)

    with open(data_dir / "transforms.json", "w") as f:
        json.dump(meta, f)
    return data_dir


def _imperfect_mask(mask: np.ndarray, view_idx: int, rng) -> np.ndarray:
    """Real segmentation masks are not pixel-perfect: dilate even views,
    erode odd views (Grounded-SAM-class boundary error), and punch one
    small hole inside the object."""
    m = mask > 0.5
    shift = np.zeros_like(m)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shift |= np.roll(np.roll(m, dy, 0), dx, 1)
    if view_idx % 2 == 0:
        m = shift                              # dilated ~1 px
    else:
        er = np.ones_like(m)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                er &= np.roll(np.roll(m, dy, 0), dx, 1)
        m = er                                 # eroded ~1 px
    ys, xs = np.nonzero(m)
    if len(ys) > 50:
        k = rng.randint(len(ys))
        y0, x0 = ys[k], xs[k]
        m[max(0, y0 - 2):y0 + 2, max(0, x0 - 2):x0 + 2] = False
    return m.astype(np.float32)


def write_hard_scene(
    data_dir,
    n_views: int = 9,
    width: int = 128,
    height: int = 96,
    focal: float = 110.0,
    base: float = 0.4,
    depth_noise: float = 0.004,
    pose_rot_noise: float = 0.005,   # rad (~0.3 deg) — calibration error
    pose_trans_noise: float = 0.002,  # meters (~2 mm)
    seed: int = 0,
    n_seed_pts: int = 700,
):
    """HARD realistic-capture fixture (VERDICT r4 weak #4): a non-convex
    object (torus handle + concave dent), STRONG view-dependent specular
    shading (images are shaded analytically, not splat-rendered),
    checkered background clutter with background depth in the sensor maps,
    IMPERFECT masks (dilated/eroded + holes), noisy 16-bit depth, and
    calibrated pose noise in transforms.json (ground-truth renders use the
    true poses). The regime the reference was built for: reflective
    objects, clutter, imperfect masks, pose error (README.md:14-21).
    """
    import jax

    from fusionsense_tpu.data.synthetic import (
        hard_points, shade_hard_view,
    )

    data_dir = Path(data_dir)
    (data_dir / "images").mkdir(parents=True, exist_ok=True)
    for sub in ("depths", "normals", "masks"):
        (data_dir / sub).mkdir(exist_ok=True)

    cams = ring_cameras(n_views=n_views, width=width, height_px=height,
                        focal=focal)
    rng = np.random.RandomState(seed)
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    frames = []
    shade = jax.jit(lambda vm, fx, fy, cx, cy: shade_hard_view(
        cams.index(0).replace(viewmat=vm, fx=fx, fy=fy, cx=cx, cy=cy),
        base=base))
    from fusionsense_tpu.data.synthetic import hard_depth_normals
    hdn = jax.jit(lambda vm, fx, fy, cx, cy: hard_depth_normals(
        cams.index(0).replace(viewmat=vm, fx=fx, fy=fy, cx=cx, cy=cy),
        base=base))
    for i in range(n_views):
        cam_i = cams.index(i)
        rgb, depth, mask = shade(cam_i.viewmat, cam_i.fx, cam_i.fy,
                                 cam_i.cx, cam_i.cy)
        _, nrm, _ = hdn(cam_i.viewmat, cam_i.fx, cam_i.fy,
                        cam_i.cx, cam_i.cy)
        name = f"frame_{i:05d}.png"
        Image.fromarray(
            np.asarray(jnp.clip(rgb, 0, 1) * 255).astype(np.uint8)
        ).save(data_dir / "images" / name)
        d = np.asarray(depth)
        d_noisy = d * (1.0 + depth_noise * rng.randn(*d.shape))
        Image.fromarray(np.clip(d_noisy * 1000, 0, 65535).astype(np.uint16)
                        ).save(data_dir / "depths" / name)
        w2c = np.asarray(cam_i.viewmat)
        n_cam = (np.asarray(nrm) @ w2c[:3, :3].T) * np.array([1, -1, -1.0])
        np.save(data_dir / "normals" / (name + ".npy"), n_cam)
        m = _imperfect_mask(np.asarray(mask), i, rng)
        Image.fromarray((m * 255).astype(np.uint8)).save(
            data_dir / "masks" / name)

        # calibrated pose error: the poses the PIPELINE sees are slightly
        # wrong relative to the poses the capture was rendered with
        c2w = np.linalg.inv(w2c)
        dr = pose_rot_noise * rng.randn(3)
        K = np.array([[0, -dr[2], dr[1]], [dr[2], 0, -dr[0]],
                      [-dr[1], dr[0], 0]])
        R_noise = np.eye(3) + K + 0.5 * K @ K       # ~exp(K)
        c2w_noisy = c2w.copy()
        c2w_noisy[:3, :3] = R_noise @ c2w[:3, :3]
        c2w_noisy[:3, 3] += pose_trans_noise * rng.randn(3)
        frames.append({
            "file_path": f"images/{name}",
            "depth_file_path": f"depths/{name}",
            "normal_file_path": f"normals/{name}.npy",
            "mask_file_path": f"masks/{name}",
            "transform_matrix": (c2w_noisy @ flip).tolist(),
            "fl_x": focal, "fl_y": focal,
            "cx": width / 2, "cy": height / 2, "w": width, "h": height,
        })

    pts, cols, _ = hard_points(n=6000, base=base, seed=seed)
    pts_np, cols_np = np.asarray(pts), np.asarray(cols)
    k = rng.choice(len(pts_np), size=min(n_seed_pts, len(pts_np)),
                   replace=False)
    seed_pts = pts_np[k] + rng.randn(len(k), 3).astype(np.float32) * 0.012
    write_ply(data_dir / "seed.ply", seed_pts, colors=cols_np[k])
    write_ply(data_dir / "gt_points.ply", pts_np, colors=cols_np)

    meta = {
        "frames": frames,
        "ply_file_path": "seed.ply",
        "train_filenames": [f"images/frame_{i:05d}.png"
                            for i in range(n_views - 1)],
        "test_filenames": [f"images/frame_{n_views - 1:05d}.png"],
    }
    with open(data_dir / "transforms.json", "w") as f:
        json.dump(meta, f)
    return data_dir
