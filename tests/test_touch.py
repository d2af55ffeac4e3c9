import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionsense_tpu.data.tactile import (
    TouchPatch, lift_normals_2d, load_touch_patches, oriented_bbox,
    points_in_obb,
)
from fusionsense_tpu.gaussians.init import init_from_points
from fusionsense_tpu.gaussians.touch import (
    add_touch_patches, hull_prune, in_any_box, touch_prune, TouchBoxes,
)
from fusionsense_tpu.train.optim import init_adam
from fusionsense_tpu.utils.ply import write_pcd


def test_lift_normals():
    n = lift_normals_2d(np.array([[0.0, 0.0], [0.6, 0.0]]))
    np.testing.assert_allclose(n[0], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(n[1], [0.6, 0, -0.8], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-6)


def test_oriented_bbox_contains_points():
    rng = np.random.RandomState(0)
    pts = rng.randn(200, 3) * [2.0, 0.5, 0.1]
    # rotate
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    pts = pts @ R.T + 5.0
    c, Rb, e = oriented_bbox(pts)
    assert points_in_obb(pts, c, Rb, e).all()
    # extents ordered: largest axis first
    assert e[0] >= e[1] >= e[2]
    # far point outside
    assert not points_in_obb(np.array([[50.0, 0, 0]]), c, Rb, e)[0]


def make_patch(center, n=50):
    rng = np.random.RandomState(1)
    pts = (rng.rand(n, 3) - 0.5) * [0.02, 0.02, 0.002] + center
    return TouchPatch(
        points=pts.astype(np.float32),
        colors=np.full((n, 3), 0.8, np.float32),
        normals=np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32),
        bbox_center=np.asarray(center, np.float32),
        bbox_rot=np.eye(3, dtype=np.float32),
        bbox_extent=np.array([0.011, 0.011, 0.0015], np.float32),
    )


def test_add_touch_patches_and_prune():
    rng = np.random.RandomState(0)
    seeds = rng.randn(100, 3).astype(np.float32) * 0.3
    # put some seeds exactly inside the future patch bbox
    seeds[:5] = [0.0, 0.0, 0.0]
    state = init_from_points(jnp.asarray(seeds), jnp.full((100, 3), 0.5),
                             capacity=256, sh_degree=1)
    opt = init_adam(state.params())
    opt.m["means"] = jnp.ones_like(opt.m["means"])  # nonzero moments

    patch = make_patch([0.0, 0.0, 0.0])
    state2, opt2, boxes = add_touch_patches(state, opt, [patch],
                                            gel_scale=1.0, scene_scale=1.0)
    # intruders culled, patch points added frozen
    assert int(jnp.sum(state2.frozen)) == 50
    assert int(state2.num_alive) == 100 - 5 + 50
    # frozen slots have opacity ~1
    frozen_ops = jax.nn.sigmoid(state2.logit_opacities[state2.frozen])
    assert float(frozen_ops.min()) > 0.99
    # moments of newly written slots zeroed
    newly = np.asarray(state2.frozen)
    assert float(jnp.abs(opt2.m["means"][newly]).max()) == 0.0

    # drift a live gaussian into the bbox -> touch_prune culls it
    means = state2.means
    live_idx = int(np.nonzero(np.asarray(state2.alive & ~state2.frozen))[0][0])
    state3 = state2.replace(means=means.at[live_idx].set(jnp.zeros(3)))
    state4 = touch_prune(state3, boxes)
    assert not bool(state4.alive[live_idx])
    assert int(jnp.sum(state4.frozen)) == 50  # frozen untouched


def test_hull_prune_shell():
    # hull: dense sphere surface radius 0.1 at origin
    from fusionsense_tpu.data.synthetic import sphere_points

    # dense sampling so nearest-hull-point distance ~ radial offset
    hull, _, _ = sphere_points(n=20000, radius=0.1)
    means = np.zeros((3, 3), np.float32)
    means[0] = [0.1 + 0.01, 0.0, 0.0]   # in shell (0.005, 0.02] -> culled
    means[1] = [0.1 + 0.05, 0.0, 0.0]   # outside shell -> kept
    means[2] = [0.1 + 0.001, 0.0, 0.0]  # inside inner margin -> kept
    state = init_from_points(jnp.asarray(means), jnp.full((3, 3), 0.5),
                             capacity=8, sh_degree=1)
    out = hull_prune(state, jnp.asarray(hull), scene_scale=1.0)
    assert not bool(out.alive[0])
    assert bool(out.alive[1])
    assert bool(out.alive[2])


def test_load_touch_patches_from_disk(tmp_path):
    d = tmp_path / "tactile"
    d.mkdir()
    rng = np.random.RandomState(0)
    pts = rng.rand(250, 3) * [100.0, 100.0, 5.0]  # sensor units
    write_pcd(d / "patch_0.pcd", pts.astype(np.float32),
              extra={"normal_x": np.zeros(250, np.float32),
                     "normal_y": np.zeros(250, np.float32)})
    T = np.eye(4)
    T[:3, 3] = [0.1, 0.2, 0.3]
    meta = {"gel_scale": 6.34e-5,
            "frames": [{"file_path": "patch_0.pcd",
                        "transform_matrix": T.tolist()}]}
    with open(d / "gelsight_transform.json", "w") as f:
        json.dump(meta, f)

    patches = load_touch_patches(d / "gelsight_transform.json")
    assert len(patches) == 1
    p = patches[0]
    assert p.points.shape == (50, 3)   # x5 downsample
    # points near the transform translation (sensor extent ~ 100*6.34e-5)
    assert np.linalg.norm(p.points.mean(0) - [0.1, 0.2, 0.3]) < 0.02
    np.testing.assert_allclose(p.normals, np.tile([0, 0, -1.0], (50, 1)), atol=1e-6)
    assert points_in_obb(p.points, p.bbox_center, p.bbox_rot, p.bbox_extent).all()
