"""Host-side Depth-Anything predictor implementing the DepthModel protocol.

Preprocessing contract (Depth-Anything-V2 `image2tensor`): resize keeping
aspect so the SHORT side is >= 518 with both sides multiples of 14
(bicubic), ImageNet normalization; the relative inverse-depth output is
resized back to the source resolution (bilinear).

`predict_depth` returns METRIC depth when a sparse/sensor depth is given:
relative inverse depth is converted and scale/shift-aligned per frame with
the closed-form least squares the reference uses for its mono-depth
artifacts (dn_splatter/scripts/depth_from_pretrain.py depth_align /
align_depth.py compute_scale_and_shift).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from fusionsense_tpu.priors.depth_anything.dpt import DAConfig, DepthAnything

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def da_input_size(h: int, w: int, lower: int = 518, patch: int = 14):
    """(h', w') — short side >= lower, aspect kept, both multiples of 14."""
    s = max(lower / h, lower / w)
    rh, rw = max(int(round(h * s)), lower), max(int(round(w * s)), lower)
    rh += (-rh) % patch
    rw += (-rw) % patch
    return rh, rw


class DepthAnythingModel:
    """DepthModel: rgb (H, W, 3) -> (H, W) depth (aligned when possible)."""

    def __init__(self, params, cfg: DAConfig = DAConfig(), lower: int = 518):
        self.params = params
        self.cfg = cfg
        self.lower = lower
        self._fwd = jax.jit(
            lambda p, x: DepthAnything(cfg).apply({"params": p}, x))

    @classmethod
    def from_checkpoint(cls, path: str, cfg: DAConfig = DAConfig()):
        from fusionsense_tpu.priors.depth_anything.convert import (
            convert_torch_checkpoint,
        )

        return cls(convert_torch_checkpoint(path, cfg), cfg)

    def predict_inverse(self, rgb: np.ndarray) -> np.ndarray:
        """(H, W) relative inverse depth at source resolution."""
        h, w = rgb.shape[:2]
        rh, rw = da_input_size(h, w, self.lower, self.cfg.vit.patch)
        x = np.asarray(rgb, np.float32)
        if x.max() > 2.0:
            x = x / 255.0
        x = jax.image.resize(jnp.asarray(x), (rh, rw, 3), method="bicubic")
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        inv = self._fwd(self.params, x)
        inv = jax.image.resize(inv, (h, w), method="bilinear")
        return np.asarray(inv)

    def predict_depth(self, rgb: np.ndarray, fx: float,
                      sensor_depth: np.ndarray | None = None) -> np.ndarray:
        from fusionsense_tpu.priors.depth_align import scale_and_shift_lstsq

        inv = self.predict_inverse(rgb)
        depth = 1.0 / np.maximum(inv, 1e-4)
        if sensor_depth is not None:
            mask = jnp.asarray(sensor_depth > 1e-6)
            s, t = scale_and_shift_lstsq(jnp.asarray(depth),
                                         jnp.asarray(sensor_depth), mask)
            depth = np.asarray(s) * depth + np.asarray(t)
        return depth.astype(np.float32)
