"""Device-mesh construction and sharding helpers.

The reference's distributed story is single-node torch DDP with NCCL
all-reduce (reference dn_splatter/dn_pipeline.py:161-167 and GLIP's
maskrcnn_benchmark/utils/comm.py — see SURVEY.md §2.8). The TPU-native
replacement is SPMD over a jax.sharding.Mesh:

- axis "data": cameras/views (gradient psum — the DDP analog)
- axis "tile": image-tile sharding inside the rasterizer (the workload's
  analog of sequence parallelism — see SURVEY.md §5)

Gaussian parameters and optimizer moments are replicated at sparse-view
scale: the full store is a few MB (65k slots x ~56 B), while the work is
O(pixels x splats-per-pixel) — so tiles x cameras is the axis decomposition
that actually scales this workload. Sharding the Gaussian axis would need a
per-camera depth partition of the store (alpha compositing does not commute
across arbitrary shards) plus an all-to-all reshard each step; it only pays
off at ~10M+ Gaussians (city-scale), far beyond the sparse-view regime.
That path — depth-sliced shards merged with out = out_A + T_A * out_B over
an ICI scan — is documented here as the planned extension, not built.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None,
              tile: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if data is None:
        data = n // tile
    assert data * tile == n, f"mesh {data}x{tile} != {n} devices"
    arr = np.asarray(devs[:n]).reshape(data, tile)
    return Mesh(arr, ("data", "tile"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))
