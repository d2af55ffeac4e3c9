import json
import math

import numpy as np
import pytest
from PIL import Image

from fusionsense_tpu.data.dataparser import DataParserConfig
from fusionsense_tpu.data.dataset_variants import parse_dataset


def write_img(path, w=32, h=24):
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(
        (np.random.RandomState(0).rand(h, w, 3) * 255).astype(np.uint8)
    ).save(path)


def write_depth(path, w=32, h=24, val=2000):
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.full((h, w), val, np.uint16)).save(path)


def ring_c2w(n, r=2.0):
    out = []
    for i in range(n):
        a = 2 * math.pi * i / n
        m = np.eye(4)
        m[:3, 3] = [r * math.cos(a), r * math.sin(a), 1.0]
        out.append(m)
    return np.stack(out)


def test_replica_layout(tmp_path):
    d = tmp_path
    poses = ring_c2w(6)
    np.savetxt(d / "traj.txt", poses.reshape(6, 16))
    for i in range(6):
        write_img(d / "results" / f"frame{i:06d}.jpg", 1200 // 20, 680 // 20)
        write_depth(d / "results" / f"depth{i:06d}.png", 1200 // 20, 680 // 20)
    scene = parse_dataset("replica", DataParserConfig(data_dir=str(d)),
                          test_every=3)
    assert scene.cameras.viewmat.shape == (6, 4, 4)
    assert len(scene.train_idx) + len(scene.test_idx) == 6
    assert scene.depth_paths[0] is not None


def test_colmap_layout(tmp_path):
    d = tmp_path
    (d / "sparse/0").mkdir(parents=True)
    with open(d / "sparse/0/cameras.txt", "w") as f:
        f.write("# cameras\n1 PINHOLE 32 24 30.0 30.0 16.0 12.0\n")
    with open(d / "sparse/0/images.txt", "w") as f:
        f.write("# images\n")
        for i, c2w in enumerate(ring_c2w(4)):
            w2c = np.linalg.inv(c2w)
            # rotation -> quaternion (identity rotation here)
            f.write(f"{i+1} 1 0 0 0 "
                    f"{w2c[0,3]} {w2c[1,3]} {w2c[2,3]} 1 img_{i:03d}.png\n")
            f.write("\n")
    with open(d / "sparse/0/points3D.txt", "w") as f:
        f.write("# points\n")
        for i in range(20):
            f.write(f"{i} {i*0.1} 0.0 1.0 128 64 32 0.5\n")
    for i in range(4):
        write_img(d / "images" / f"img_{i:03d}.png")
    scene = parse_dataset("colmap", DataParserConfig(data_dir=str(d)),
                          test_every=4)
    assert scene.cameras.viewmat.shape == (4, 4, 4)
    assert scene.seed_points is not None and len(scene.seed_points) == 20
    np.testing.assert_allclose(np.asarray(scene.seed_colors[0]),
                               [128 / 255, 64 / 255, 32 / 255], atol=1e-6)


def test_sdfstudio_layout(tmp_path):
    d = tmp_path
    frames = []
    for i, c2w in enumerate(ring_c2w(3)):
        name = f"{i:06d}_rgb.png"
        write_img(d / name)
        frames.append({
            "rgb_path": name,
            "camtoworld": c2w.tolist(),
            "intrinsics": [[30.0, 0, 16.0, 0], [0, 30.0, 12.0, 0],
                           [0, 0, 1, 0], [0, 0, 0, 1]],
        })
    with open(d / "meta_data.json", "w") as f:
        json.dump({"frames": frames, "height": 24, "width": 32}, f)
    scene = parse_dataset("sdfstudio", DataParserConfig(data_dir=str(d)),
                          test_every=0)
    assert scene.cameras.viewmat.shape == (3, 4, 4)
    assert float(scene.cameras.fx[0]) == 30.0


def test_unknown_dataset():
    with pytest.raises(ValueError):
        parse_dataset("nope", DataParserConfig())


def _write_colmap_model(model_dir, n, cam_line, names=None):
    model_dir.mkdir(parents=True, exist_ok=True)
    with open(model_dir / "cameras.txt", "w") as f:
        f.write(f"# cameras\n{cam_line}\n")
    with open(model_dir / "images.txt", "w") as f:
        f.write("# images\n")
        for i, c2w in enumerate(ring_c2w(n)):
            w2c = np.linalg.inv(c2w)
            name = names[i] if names else f"img_{i:03d}.png"
            f.write(f"{i + 1} 1 0 0 0 "
                    f"{w2c[0, 3]} {w2c[1, 3]} {w2c[2, 3]} 1 {name}\n\n")


def test_scannetpp_dslr_layout(tmp_path):
    """dslr protocol: undistort_colmap export + train_test_lists.json split
    (reference scannetpp_dataparser.py:95-147)."""
    seq = "acme01"
    base = tmp_path / seq / "dslr"
    inner = base / "undistort_colmap" / seq
    names = [f"DSC{i:05d}.png" for i in range(5)]
    _write_colmap_model(inner / "colmap", 5,
                        "1 PINHOLE 32 24 30.0 30.0 16.0 12.0", names)
    for n in names:
        write_img(inner / "images" / n)
        write_img(inner / "masks" / n)
    with open(base / "train_test_lists.json", "w") as f:
        json.dump({"train": names[:4], "test": names[4:]}, f)

    scene = parse_dataset(
        "scannetpp", DataParserConfig(data_dir=str(tmp_path)),
        sequence=seq, mode="dslr")
    assert scene.cameras.viewmat.shape == (5, 4, 4)
    assert len(scene.train_idx) == 4 and len(scene.test_idx) == 1
    assert scene.mask_paths[0] is not None


def test_scannetpp_iphone_layout_with_distortion(tmp_path):
    """iphone protocol (rgb/ + depth/) with an OPENCV-distorted camera:
    frames must undistort into the cache."""
    seq = "s1"
    base = tmp_path / seq / "iphone"
    _write_colmap_model(base / "colmap", 3,
                        "1 OPENCV 32 24 30.0 30.0 16.0 12.0 0.05 -0.01 0 0")
    for i in range(3):
        write_img(base / "rgb" / f"img_{i:03d}.png")
        write_depth(base / "depth" / f"img_{i:03d}.png")
    scene = parse_dataset(
        "scannetpp", DataParserConfig(data_dir=str(tmp_path)),
        sequence=seq, mode="iphone", test_every=3)
    assert scene.cameras.viewmat.shape == (3, 4, 4)
    assert scene.depth_paths[0] is not None
    # undistorted cache produced and used
    assert "undistorted" in str(scene.image_paths[0])
    assert scene.image_paths[0].exists()


def _write_mushroom_capture(base, n, prefix="long"):
    frames = []
    for i, c2w in enumerate(ring_c2w(n)):
        name = f"{prefix}_{i:03d}.png"
        write_img(base / "images" / name)
        write_depth(base / "depth" / name)
        frames.append({
            "file_path": f"images/{name}",
            "transform_matrix": (c2w @ np.diag([1, -1, -1, 1.0])).tolist(),
            "fl_x": 30.0, "fl_y": 30.0, "cx": 16.0, "cy": 12.0,
            "w": 32, "h": 24,
        })
    base.mkdir(parents=True, exist_ok=True)
    with open(base / "transforms.json", "w") as f:
        json.dump({"frames": frames}, f)


def test_mushroom_eval_protocols(tmp_path):
    """within/with/all eval protocols over long+short captures
    (reference mushroom_dataparser.py:64,278-300)."""
    root = tmp_path / "kinect"
    _write_mushroom_capture(root / "long_capture", 12, "l")
    _write_mushroom_capture(root / "short_capture", 3, "s")

    within = parse_dataset("mushroom", DataParserConfig(data_dir=str(tmp_path)),
                           sensor="kinect", eval_mode="within")
    assert len(within.image_paths) == 12
    assert len(within.test_idx) >= 1
    assert all(i < 12 for i in within.test_idx)

    with_ = parse_dataset("mushroom", DataParserConfig(data_dir=str(tmp_path)),
                          sensor="kinect", eval_mode="with")
    assert len(with_.image_paths) == 15
    assert list(with_.test_idx) == [12, 13, 14]
    assert with_.cameras.viewmat.shape == (15, 4, 4)

    all_ = parse_dataset("mushroom", DataParserConfig(data_dir=str(tmp_path)),
                         sensor="kinect", eval_mode="all")
    assert len(all_.test_idx) == len(within.test_idx) + 3
    # sensor depths resolved for both captures
    assert all(p is not None for p in all_.depth_paths)


def test_mushroom_faro_depth_missing_raises(tmp_path):
    root = tmp_path / "kinect"
    _write_mushroom_capture(root / "long_capture", 4)
    with pytest.raises(FileNotFoundError):
        parse_dataset("mushroom", DataParserConfig(data_dir=str(tmp_path)),
                      sensor="kinect", use_faro_depths=True)


def test_undistort_identity_and_shift():
    from fusionsense_tpu.data.undistort import undistort_image

    rng = np.random.RandomState(0)
    img = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
    K = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]])
    # zero distortion: identity (interior)
    out = undistort_image(img, K, [0.0, 0.0, 0.0, 0.0], "OPENCV")
    np.testing.assert_array_equal(out[2:-2, 2:-2], img[2:-2, 2:-2])
    # nonzero distortion: center pixel fixed, corners move
    out2 = undistort_image(img, K, [0.2, 0.0, 0.0, 0.0], "OPENCV")
    assert not np.array_equal(out2, img)
    np.testing.assert_array_equal(out2[12, 16], img[12, 16])
    # fisheye model runs and keeps the center fixed
    out3 = undistort_image(img, K, [0.1, 0.0, 0.0, 0.0], "OPENCV_FISHEYE")
    np.testing.assert_array_equal(out3[12, 16], img[12, 16])


def test_scannetpp_smoke_train(tmp_path):
    """10-step train smoke on the synthesized scannetpp-iphone sample
    (VERDICT round-1 item 8 done-criterion)."""
    import jax.numpy as jnp

    from fusionsense_tpu.config import (
        ExperimentConfig, LossConfig, ModelConfig, TrainConfig,
    )
    from fusionsense_tpu.data.dataparser import load_train_data
    from fusionsense_tpu.gaussians.init import init_from_points
    from fusionsense_tpu.render.rasterize import RasterizeConfig
    from fusionsense_tpu.train.trainer import Trainer

    seq = "s1"
    base = tmp_path / seq / "iphone"
    _write_colmap_model(base / "colmap", 3,
                        "1 PINHOLE 32 24 30.0 30.0 16.0 12.0")
    for i in range(3):
        write_img(base / "rgb" / f"img_{i:03d}.png")
        write_depth(base / "depth" / f"img_{i:03d}.png")
    cfg = DataParserConfig(data_dir=str(tmp_path))
    scene = parse_dataset("scannetpp", cfg, sequence=seq, mode="iphone",
                          test_every=0)
    cams, data = load_train_data(scene, cfg, "train")
    pts = np.random.RandomState(0).randn(50, 3).astype(np.float32) * 0.1
    g = init_from_points(jnp.asarray(pts), jnp.full((50, 3), 0.5),
                         capacity=128, sh_degree=0)
    rcfg = RasterizeConfig(tile_size=16, tile_capacity=32,
                           max_tiles_per_gaussian=4, tile_chunk=4,
                           sh_degree=0)
    ecfg = ExperimentConfig(
        model=ModelConfig(sh_degree=0, rasterize=rcfg, capacity=128,
                          binary_opacities=False),
        train=TrainConfig(iterations=10, scan_chunk=10, auto_capacity=False),
        loss=LossConfig(normal_lambda=0.0, sensor_depth_lambda=0.2,
                        smooth_lambda=0.0, flatness_lambda=0.0))
    tr = Trainer(ecfg, cams, data, g)
    hist = tr.run(log=None)
    assert np.isfinite(hist[-1]["loss"])
