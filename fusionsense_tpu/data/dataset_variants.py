"""Benchmark-dataset layout adapters -> ParsedScene.

The reference registers seven dataparser plugins (reference
dn_splatter/__init__.py:1-18: MuSHRoom, Replica, ScanNet++, NRGBD,
CoolerMap, GSDFStudio, plus the main NormalNerfstudio). Here each layout
adapts into the same ParsedScene structure consumed by the trainer, through
one registry:

    scene = parse_dataset("replica", DataParserConfig(data_dir=...))

- "nerfstudio": transforms.json (fusionsense_tpu/data/dataparser.py)
- "replica":   traj.txt (flattened 4x4 c2w per line) + results/frame*.jpg
               + results/depth*.png at scale 1/6553.5 (reference
               replica_dataparser conventions)
- "mushroom":  <sensor>/long_capture/transforms.json + depth dirs
               (reference mushroom_dataparser; kinect/iphone sensors)
- "colmap":    COLMAP text model + images dir (+ optional depths/normals
               dirs) — covers CoolerMap/ScanNet++-style exports
- "sdfstudio": meta_data.json frames with camtoworld/intrinsics entries
               (reference gsdfstudio_dataparser)
- "nrgbd":     trajectory.txt + images/ + depth/ (neural-RGBD layout)
"""
from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np

from fusionsense_tpu.core.cameras import make_camera
from fusionsense_tpu.data.dataparser import (
    DataParserConfig, ParsedScene, natsort_key, parse_transforms,
)

_GL_FLIP = np.diag([1.0, -1.0, -1.0, 1.0])


def _normalize_poses(c2w: np.ndarray, cfg: DataParserConfig):
    origins = c2w[:, :3, 3]
    translate = -origins.mean(axis=0) if cfg.auto_center else np.zeros(3)
    centered = origins + translate
    scale = cfg.scale_factor
    if cfg.auto_scale:
        scale = cfg.scale_factor / max(float(np.abs(centered).max()), 1e-8)
    c2w = c2w.copy()
    c2w[:, :3, 3] = centered * scale
    return c2w, translate, scale


def _build_scene(c2w_cv, fx, fy, cx, cy, width, height, image_paths,
                 depth_paths, cfg, normal_paths=None, mask_paths=None,
                 mono_depth_paths=None, test_every: int = 8):
    c2w_cv, translate, scale = _normalize_poses(np.asarray(c2w_cv), cfg)
    w2c = np.linalg.inv(c2w_cv).astype(np.float32)
    n = len(image_paths)
    ones = np.ones((n,), np.float32)
    cameras = make_camera(w2c, fx * ones, fy * ones, cx * ones, cy * ones,
                          width, height)
    idx = np.arange(n, dtype=np.int32)
    test = idx[::test_every] if test_every else np.array([], np.int32)
    train = np.array([i for i in idx if i not in set(test.tolist())], np.int32)
    none = [None] * n
    return ParsedScene(
        cameras=cameras, image_paths=list(image_paths),
        depth_paths=list(depth_paths) if depth_paths else none,
        mono_depth_paths=list(mono_depth_paths) if mono_depth_paths else none,
        normal_paths=list(normal_paths) if normal_paths else none,
        mask_paths=list(mask_paths) if mask_paths else none,
        train_idx=train, val_idx=test, test_idx=test,
        translate=translate, scale=scale,
    )


# ---------------------------------------------------------------- replica --

REPLICA_FOCAL = dict(fx=600.0, fy=600.0, cx=599.5, cy=339.5, w=1200, h=680)
REPLICA_DEPTH_SCALE = 1.0 / 6553.5


def parse_replica(cfg: DataParserConfig, test_every: int = 8) -> ParsedScene:
    d = Path(cfg.data_dir)
    traj = np.loadtxt(d / "traj.txt").reshape(-1, 4, 4)   # c2w OpenCV
    frames = sorted((d / "results").glob("frame*.jpg"),
                    key=lambda p: natsort_key(p.name))
    depths = sorted((d / "results").glob("depth*.png"),
                    key=lambda p: natsort_key(p.name))
    n = min(len(frames), len(traj))
    fp = REPLICA_FOCAL
    dcfg = DataParserConfig(
        **{**cfg.__dict__, "depth_unit_scale": REPLICA_DEPTH_SCALE})
    return _build_scene(
        traj[:n], fp["fx"], fp["fy"], fp["cx"], fp["cy"], fp["w"], fp["h"],
        frames[:n], depths[:n] if depths else None, dcfg,
        test_every=test_every)


# --------------------------------------------------------------- mushroom --

def parse_mushroom(cfg: DataParserConfig, sensor: str = "kinect",
                   capture: str = "long_capture") -> ParsedScene:
    base = Path(cfg.data_dir) / sensor / capture
    sub = DataParserConfig(**{**cfg.__dict__, "data_dir": str(base)})
    scene = parse_transforms(sub)
    # sensor depth dir convention: depth/ next to images/
    if all(p is None for p in scene.depth_paths):
        depth_dir = base / "depth"
        if depth_dir.exists():
            scene.depth_paths = [
                depth_dir / Path(p).with_suffix(".png").name
                for p in scene.image_paths]
    return scene


# ----------------------------------------------------------------- colmap --

def parse_colmap(cfg: DataParserConfig, images_dir: str = "images",
                 model_dir: str = "sparse/0",
                 test_every: int = 8) -> ParsedScene:
    from fusionsense_tpu.data.colmap import (
        read_cameras_txt, read_images_txt, read_points3d_txt,
    )

    d = Path(cfg.data_dir)
    model = d / model_dir
    cams = read_cameras_txt(model / "cameras.txt")
    images = read_images_txt(model / "images.txt")
    cam0 = cams[images[0]["camera_id"]]
    fx, fy, cx, cy = cam0.intrinsics()
    c2w = np.stack([np.linalg.inv(im["w2c"]) for im in images])
    image_paths = [d / images_dir / im["name"] for im in images]

    scene = _build_scene(c2w, fx, fy, cx, cy, cam0.width, cam0.height,
                         image_paths, None, cfg, test_every=test_every)
    pts_file = model / "points3D.txt"
    if pts_file.exists():
        pts, cols = read_points3d_txt(pts_file)
        scene.seed_points = ((pts + scene.translate) * scene.scale).astype(
            np.float32)
        scene.seed_colors = cols
    return scene


# -------------------------------------------------------------- sdfstudio --

def parse_sdfstudio(cfg: DataParserConfig, test_every: int = 8) -> ParsedScene:
    d = Path(cfg.data_dir)
    with open(d / "meta_data.json") as f:
        meta = json.load(f)
    frames = meta["frames"]
    c2w = []
    image_paths, depth_paths, normal_paths = [], [], []
    K = None
    for fr in frames:
        mat = np.asarray(fr["camtoworld"], np.float64)
        c2w.append(mat)   # sdfstudio stores OpenCV camera-to-world
        K = np.asarray(fr.get("intrinsics", meta.get("intrinsics")))
        image_paths.append(d / fr["rgb_path"])
        depth_paths.append(
            d / fr["sensor_depth_path"] if "sensor_depth_path" in fr else None)
        normal_paths.append(
            d / fr["normal_path"] if "normal_path" in fr else None)
    h = int(meta.get("height", meta.get("h", 0)) or
            np.asarray(__import__("PIL.Image", fromlist=["Image"])
                       .open(image_paths[0])).shape[0])
    w = int(meta.get("width", meta.get("w", 0)) or
            np.asarray(__import__("PIL.Image", fromlist=["Image"])
                       .open(image_paths[0])).shape[1])
    return _build_scene(
        np.stack(c2w), K[0, 0], K[1, 1], K[0, 2], K[1, 2], w, h,
        image_paths, depth_paths if any(depth_paths) else None, cfg,
        normal_paths=normal_paths if any(normal_paths) else None,
        test_every=test_every)


# ------------------------------------------------------------------ nrgbd --

def parse_nrgbd(cfg: DataParserConfig, test_every: int = 8) -> ParsedScene:
    d = Path(cfg.data_dir)
    traj = np.loadtxt(d / "trajectory.txt")
    c2w = traj.reshape(-1, 4, 4)
    images = sorted((d / "images").glob("*.png"),
                    key=lambda p: natsort_key(p.name)) or sorted(
        (d / "images").glob("*.jpg"), key=lambda p: natsort_key(p.name))
    depths = sorted((d / "depth").glob("*.png"),
                    key=lambda p: natsort_key(p.name))
    n = min(len(images), len(c2w))
    from PIL import Image

    w, h = Image.open(images[0]).size
    focal = float(open(d / "focal.txt").read()) if (d / "focal.txt").exists() \
        else 0.5 * w / math.tan(0.5 * math.radians(90.0) / 2) * 0 + 554.26
    # NRGBD captures use OpenGL camera-to-world
    c2w = c2w[:n] @ _GL_FLIP
    return _build_scene(c2w, focal, focal, w / 2, h / 2, w, h,
                        images[:n], depths[:n] if depths else None, cfg,
                        test_every=test_every)


DATASETS = {
    "nerfstudio": lambda cfg, **kw: parse_transforms(cfg),
    "replica": parse_replica,
    "mushroom": parse_mushroom,
    "colmap": parse_colmap,
    "sdfstudio": parse_sdfstudio,
    "nrgbd": parse_nrgbd,
}


def parse_dataset(kind: str, cfg: DataParserConfig, **kw) -> ParsedScene:
    if kind not in DATASETS:
        raise ValueError(f"unknown dataset kind {kind!r}; "
                         f"available: {sorted(DATASETS)}")
    return DATASETS[kind](cfg, **kw)
