"""Omnidata normal provider: the reference's `--model-type omnidata`
(low and hd resolutions) as a NormalModel
(reference dn_splatter/scripts/normals_from_pretrain.py:60-101, 149-283).

Weights-gated like the other ports: construct with params from
`convert.convert_omnidata_checkpoint(path)`.
"""
from __future__ import annotations

import dataclasses
from typing import Literal, Optional

import numpy as np

from fusionsense_tpu.priors.omnidata.dpt_hybrid import (
    OmniConfig, OmnidataNormals,
)
from fusionsense_tpu.priors.omnidata.hd_merge import (
    IMAGE_SIZE, crop_grid, merge_patches,
)


def _resize_bilinear(x: np.ndarray, h: int, w: int) -> np.ndarray:
    import jax

    return np.asarray(jax.image.resize(
        np.asarray(x, np.float32), (h, w, x.shape[-1]), method="bilinear"))


@dataclasses.dataclass
class OmnidataPredictor:
    params: dict
    cfg: OmniConfig = OmniConfig()
    resolution: Literal["low", "hd"] = "low"
    _apply: Optional[object] = None

    def _model(self):
        if self._apply is None:
            import jax

            model = OmnidataNormals(self.cfg)
            self._apply = jax.jit(
                lambda p, img: model.apply({"params": p}, img))
        return self._apply

    def _run_patch(self, rgb01: np.ndarray) -> np.ndarray:
        """(S, S, 3) [0,1] -> (3, S, S) unit normals in [-1, 1]
        (the reference decodes the model's [0,1] encoding the same way,
        merge_patches:678-680)."""
        out = np.asarray(self._model()(self.params, rgb01))
        out = np.clip(out, 0.0, 1.0).transpose(2, 0, 1) * 2.0 - 1.0
        return out / (np.linalg.norm(out, axis=0) + 1e-15)[None]

    def predict_normals(self, rgb: np.ndarray) -> np.ndarray:
        """uint8/float RGB (H, W, 3) -> (H, W, 3) camera-space normals in
        [-1, 1]."""
        img = np.asarray(rgb, np.float32)
        if img.max() > 2.0:
            img = img / 255.0
        H, W = img.shape[:2]

        if (self.resolution == "low" or H <= IMAGE_SIZE or W <= IMAGE_SIZE):
            # reference low-res path: resize to 384x384, predict, resize
            # back (run_monocular_normals:201-224)
            small = _resize_bilinear(img, IMAGE_SIZE, IMAGE_SIZE)
            n = self._run_patch(small)                  # (3, S, S)
            n = _resize_bilinear(n.transpose(1, 2, 0), H, W)
            n = n.transpose(2, 0, 1)
            return (n / (np.linalg.norm(n, axis=0) + 1e-15)[None]) \
                .transpose(1, 2, 0).astype(np.float32)

        # HD path: overlapped patches + rotation-aligned merge
        x, y, crops = crop_grid(H, W)
        patches = {}
        for key, (py, px) in crops.items():
            patches[key] = self._run_patch(
                img[py:py + IMAGE_SIZE, px:px + IMAGE_SIZE])
        merged = merge_patches(patches, H, W)
        return merged.transpose(1, 2, 0).astype(np.float32)
