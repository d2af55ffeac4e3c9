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
