"""Device-mesh construction and sharding helpers.

The reference's distributed story is single-node torch DDP with NCCL
all-reduce (reference dn_splatter/dn_pipeline.py:161-167 and GLIP's
maskrcnn_benchmark/utils/comm.py — see SURVEY.md §2.8). The TPU-native
replacement is SPMD over a jax.sharding.Mesh:

- axis "data": cameras/views (gradient psum — the DDP analog)
- axis "tile": image-tile sharding inside the rasterizer (the workload's
  analog of sequence parallelism — see SURVEY.md §5)
- axis "gauss": DEPTH-SLICED Gaussian sharding (the model-parallel analog,
  SURVEY.md §7.3 hard-part 5). Alpha compositing does not commute across
  arbitrary Gaussian shards, but it DOES decompose exactly across a
  per-camera depth partition: shard g composites only Gaussians whose view
  depth falls in its log-depth slice, and the slices merge front-to-back
  with out = sum_g T_{<g} * out_g, log T = sum_g log T_g (an all_gather
  over ICI + a tiny weighted combine). No resharding of the store is
  needed — each shard masks to its slice — and each shard contributes its
  own per-tile capacity, so the effective per-tile capacity is G x K.

Gaussian parameters and optimizer moments stay replicated at sparse-view
scale (the store is a few MB); the ZeRO-1 option in parallel/sharded.py
shards the optimizer state along `data` when capacity grows.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None,
              tile: int = 1, gauss: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if data is None:
        data = n // (tile * gauss)
    assert data * tile * gauss == n, \
        f"mesh {data}x{tile}x{gauss} != {n} devices"
    arr = np.asarray(devs[:n]).reshape(data, tile, gauss)
    return Mesh(arr, ("data", "tile", "gauss"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))
