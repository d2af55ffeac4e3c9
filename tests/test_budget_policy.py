"""Unit tests for the trainer's adaptive pair-budget / tile-capacity
policies (no training runs — pure host-side policy checks).

Flat backend: `_maybe_resize_pair_budget` sizes the budget DIRECTLY from
the FlatBins.used telemetry (1.25x headroom, 64/tile granularity, shrink
with 2x hysteresis) and the legacy 1.5x overflow ladder must stay OFF —
letting both fire can overshoot past the direct target and stick there
(shrink needs 2x hysteresis). Dense/pallas backends keep the ladder.
"""
import dataclasses

import jax.numpy as jnp
import pytest

from fusionsense_tpu.config import (
    ExperimentConfig, LossConfig, ModelConfig, TrainConfig,
)
from fusionsense_tpu.data.synthetic import (
    ring_cameras, sphere_depth_normals, sphere_points,
)
from fusionsense_tpu.gaussians.init import init_from_points
from fusionsense_tpu.render.rasterize import RasterizeConfig
from fusionsense_tpu.train.trainer import TrainData, Trainer


def _tiny_trainer(backend="flat", tile_capacity=256, max_tile_capacity=2048):
    cams = ring_cameras(n_views=2, width=64, height_px=48, focal=60.0)
    pts, rgb, normals = sphere_points(n=64, radius=0.5)
    g = init_from_points(pts, rgb, capacity=256, sh_degree=1,
                         seed_normals=normals)
    deps, nms = [], []
    for i in range(2):
        d, n, _ = sphere_depth_normals(cams.index(i))
        deps.append(d)
        nms.append(n)
    data = TrainData(images=jnp.zeros((2, 48, 64, 3)),
                     sensor_depths=jnp.stack(deps), normals=jnp.stack(nms))
    rcfg = RasterizeConfig(tile_size=16, tile_capacity=tile_capacity,
                           max_tiles_per_gaussian=4, tile_chunk=12,
                           sh_degree=1, backend=backend)
    cfg = ExperimentConfig(
        model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=256),
        train=TrainConfig(iterations=1, scan_chunk=1,
                          max_tile_capacity=max_tile_capacity),
        loss=LossConfig())
    return Trainer(cfg, cams, data, g)


def test_flat_budget_grows_to_direct_target():
    tr = _tiny_trainer(tile_capacity=64)
    T = tr._grid_tiles
    used = 300 * T          # live aligned pairs well past the budget
    tr._maybe_resize_pair_budget(used)
    # one jump straight to ceil(1.25 * 300 / 64) * 64 = 384 — no ladder walk
    assert tr.tile_capacity == 384


def test_flat_budget_shrinks_with_hysteresis():
    tr = _tiny_trainer(tile_capacity=1024)
    T = tr._grid_tiles
    # target = 640, but 640 * 2 > 1024 -> hysteresis holds, no resize
    tr._maybe_resize_pair_budget(512 * T)
    assert tr.tile_capacity == 1024
    # target = 384 (ceil(280 * 1.25 / 64) * 64), 384 * 2 <= 1024 -> shrink
    tr._maybe_resize_pair_budget(280 * T)
    assert tr.tile_capacity == 384


def test_flat_budget_clamped_to_max():
    tr = _tiny_trainer(tile_capacity=64, max_tile_capacity=512)
    tr._maybe_resize_pair_budget(10_000 * tr._grid_tiles)
    assert tr.tile_capacity == 512


def test_flat_overflow_ladder_disabled():
    tr = _tiny_trainer(tile_capacity=256)
    tr._maybe_bump_tile_capacity(overflow=10**6)
    assert tr.tile_capacity == 256, (
        "the 1.5x overflow ladder must not fire on the flat backend")


def test_dense_overflow_ladder_still_active():
    tr = _tiny_trainer(backend="pallas", tile_capacity=256)
    tr._maybe_bump_tile_capacity(overflow=10**6)
    assert tr.tile_capacity == 384  # ceil(256 * 1.5 / 128) * 128


def test_resize_noop_for_dense_backend():
    tr = _tiny_trainer(backend="pallas", tile_capacity=256)
    tr._maybe_resize_pair_budget(10_000 * tr._grid_tiles)
    assert tr.tile_capacity == 256


@pytest.mark.parametrize("used", [0, -1])
def test_flat_budget_ignores_empty_telemetry(used):
    tr = _tiny_trainer(tile_capacity=256)
    tr._maybe_resize_pair_budget(used)
    assert tr.tile_capacity == 256
