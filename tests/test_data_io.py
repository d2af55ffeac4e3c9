import json

import numpy as np
import pytest

from fusionsense_tpu.utils.ply import read_pcd, read_ply, write_pcd, write_ply


def test_ply_roundtrip(tmp_path):
    pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    cols = np.random.RandomState(1).rand(100, 3).astype(np.float32)
    nrm = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    p = tmp_path / "x.ply"
    write_ply(p, pts, colors=cols, normals=nrm)
    d = read_ply(p)
    np.testing.assert_allclose(d["points"], pts, atol=1e-6)
    np.testing.assert_allclose(d["normals"], nrm, atol=1e-6)
    np.testing.assert_allclose(d["colors"], cols, atol=1 / 255.0)


def test_ply_mesh_roundtrip(tmp_path):
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    p = tmp_path / "m.ply"
    write_ply(p, pts, faces=faces)
    d = read_ply(p)
    np.testing.assert_array_equal(d["faces"], faces)


def test_pcd_roundtrip(tmp_path):
    pts = np.random.RandomState(0).randn(50, 3).astype(np.float32)
    cols = np.random.RandomState(1).rand(50, 3).astype(np.float32)
    p = tmp_path / "x.pcd"
    write_pcd(p, pts, colors=cols, extra={"rank": np.arange(50, dtype=np.float32)})
    d = read_pcd(p)
    np.testing.assert_allclose(d["points"], pts, atol=1e-5)
    np.testing.assert_allclose(d["colors"], cols, atol=1 / 255.0)
    np.testing.assert_allclose(d["rank"], np.arange(50), atol=1e-4)


@pytest.fixture
def toy_scene_dir(tmp_path):
    """Write a minimal transforms.json scene with 3 frames."""
    from PIL import Image

    d = tmp_path / "scene"
    (d / "images").mkdir(parents=True)
    (d / "depths").mkdir()
    rng = np.random.RandomState(0)
    frames = []
    for i in range(3):
        name = f"frame_{i:03d}.png"
        Image.fromarray((rng.rand(24, 32, 3) * 255).astype(np.uint8)).save(
            d / "images" / name)
        depth_mm = (rng.rand(24, 32) * 3000).astype(np.uint16)
        Image.fromarray(depth_mm, mode="I;16").save(d / "depths" / name)
        c2w = np.eye(4)
        c2w[:3, 3] = [np.cos(i), np.sin(i), 2.0 + i * 0.1]
        frames.append({
            "file_path": f"images/{name}",
            "depth_file_path": f"depths/{name}",
            "transform_matrix": c2w.tolist(),
            "fl_x": 35.0, "fl_y": 35.0, "cx": 16.0, "cy": 12.0,
            "w": 32, "h": 24,
        })
    meta = {
        "frames": frames,
        "train_filenames": ["images/frame_000.png", "images/frame_001.png"],
        "test_filenames": ["images/frame_002.png"],
    }
    # seed pcd
    from fusionsense_tpu.utils.ply import write_ply

    pts = rng.randn(20, 3).astype(np.float32)
    write_ply(d / "seed.ply", pts, colors=rng.rand(20, 3).astype(np.float32))
    meta["ply_file_path"] = "seed.ply"
    with open(d / "transforms.json", "w") as f:
        json.dump(meta, f)
    return d


def test_parse_transforms(toy_scene_dir):
    from fusionsense_tpu.data.dataparser import DataParserConfig, parse_transforms

    cfg = DataParserConfig(data_dir=str(toy_scene_dir))
    scene = parse_transforms(cfg)
    assert scene.cameras.viewmat.shape == (3, 4, 4)
    assert list(scene.train_idx) == [0, 1]
    assert list(scene.test_idx) == [2]
    assert scene.seed_points is not None and scene.seed_points.shape == (20, 3)
    # auto-center/scale: camera origins centered and bounded by 1
    import jax.numpy as jnp

    origins = scene.cameras.origin
    np.testing.assert_allclose(np.mean(np.asarray(origins), 0), 0.0, atol=1e-5)
    assert float(jnp.abs(origins).max()) <= 1.0 + 1e-5


def test_load_train_data(toy_scene_dir):
    from fusionsense_tpu.data.dataparser import (
        DataParserConfig, load_train_data, parse_transforms,
    )

    cfg = DataParserConfig(data_dir=str(toy_scene_dir))
    scene = parse_transforms(cfg)
    cam, data = load_train_data(scene, cfg, "train")
    assert data.images.shape == (2, 24, 32, 3)
    assert data.sensor_depths.shape == (2, 24, 32)
    # depth scaled mm -> m -> scene scale
    assert float(data.sensor_depths.max()) <= 3.0 * scene.scale + 1e-5
    assert data.masks is None


def test_untransform_roundtrip(toy_scene_dir):
    from fusionsense_tpu.data.dataparser import DataParserConfig, parse_transforms

    cfg = DataParserConfig(data_dir=str(toy_scene_dir))
    scene = parse_transforms(cfg)
    raw = np.random.RandomState(3).randn(10, 3)
    scene_pts = (raw + scene.translate) * scene.scale
    back = scene.untransform_points(scene_pts)
    np.testing.assert_allclose(back, raw, atol=1e-6)
