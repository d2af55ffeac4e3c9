"""Host-side DSINE predictor implementing the NormalModel protocol.

Behavioral contract: reference dn_splatter/scripts/dsine/dsine_predictor.py:
zero-pad to /32 (centered), ImageNet normalization, FOV-60 intrinsics when
none given (:31-49), principal-point shift for the padding, crop back.
Returns camera-space normals (H, W, 3) in DSINE's convention.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from fusionsense_tpu.priors.dsine.model import DSINE, DSINEConfig

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def pad_to_32(h: int, w: int) -> tuple[int, int, int, int]:
    """(left, right, top, bottom) centered zero-padding to /32."""
    pw = (-w) % 32
    ph = (-h) % 32
    return pw // 2, pw - pw // 2, ph // 2, ph - ph // 2


def fov_intrinsics(h: int, w: int, fov_deg: float = 60.0) -> np.ndarray:
    f = (max(h, w) / 2.0) / np.tan(np.deg2rad(fov_deg / 2.0))
    return np.array([[f, 0, w / 2.0 - 0.5],
                     [0, f, h / 2.0 - 0.5],
                     [0, 0, 1]], np.float32)


class DSinePredictor:
    """NormalModel: rgb (H, W, 3) uint8/float -> (H, W, 3) normals."""

    def __init__(self, params, cfg: DSINEConfig = DSINEConfig()):
        self.params = params
        self.model = DSINE(cfg)

    @classmethod
    def from_checkpoint(cls, path: str, cfg: DSINEConfig = DSINEConfig()):
        from fusionsense_tpu.priors.dsine.convert import (
            convert_dsine_checkpoint,
        )

        return cls(convert_dsine_checkpoint(path, cfg), cfg)

    @functools.cached_property
    def _run(self):
        @jax.jit
        def run(params, img, K):
            return self.model.apply({"params": params}, img, K)
        return run

    def predict_normals(self, rgb: np.ndarray,
                        K: np.ndarray | None = None) -> np.ndarray:
        img = np.asarray(rgb, np.float32)
        if img.max() > 2.0:
            img = img / 255.0
        h, w = img.shape[:2]
        left, right, top, bottom = pad_to_32(h, w)
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        img = np.pad(img, ((top, bottom), (left, right), (0, 0)))
        if K is None:
            K = fov_intrinsics(h, w)
        K = np.asarray(K, np.float32).copy()
        K[0, 2] += left
        K[1, 2] += top
        out = self._run(self.params, jnp.asarray(img), jnp.asarray(K))
        return np.asarray(out)[top:top + h, left:left + w]
