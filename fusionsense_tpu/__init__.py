"""fusionsense_tpu — TPU-native sparse-view 3D reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ai4ce/FusionSense
(sparse-view RGB-D + tactile 3D Gaussian Splatting with depth/normal priors,
mesh extraction, and active touch selection), designed TPU-first:

- statically-shaped, shardable Gaussian stores (padded capacity + alive mask)
- a fused matmul-formulated tile rasterizer (RGB + expected depth + normal +
  alpha in ONE pass; the reference needs two CUDA rasterizer calls,
  see reference dn_splatter/dn_model.py:570,644)
- masked densify/prune/touch-anchoring that never changes array shapes
- pjit/shard_map parallelism over a jax.sharding.Mesh (tile + gaussian axes)
"""

__version__ = "0.1.0"

from fusionsense_tpu import core, gaussians, render  # noqa: F401
