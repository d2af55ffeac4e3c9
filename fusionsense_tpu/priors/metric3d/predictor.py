"""Metric3D predictor: DepthModel-protocol provider wrapping the in-repo
net with the reference's exact generation contract (wrapper.py)."""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from fusionsense_tpu.priors.metric3d.model import M3DConfig, Metric3D
from fusionsense_tpu.priors.metric3d.wrapper import (
    CANONICAL_FOCAL, Metric3DPipeline, postprocess_depth,
    postprocess_normal, prepare_input,
)


@dataclasses.dataclass
class Metric3DPredictor:
    params: dict
    cfg: M3DConfig = M3DConfig()
    # the reference feeds a (720, 1280) canvas; patch-14 nets need
    # multiples of the patch — this predictor snaps the canvas instead
    input_size: tuple = (714, 1274)
    _apply: Optional[object] = None

    @classmethod
    def from_checkpoint(cls, path: str, cfg: M3DConfig = M3DConfig()):
        from fusionsense_tpu.priors.metric3d.convert import (
            convert_metric3d_checkpoint,
        )

        return cls(params=convert_metric3d_checkpoint(path, cfg), cfg=cfg)

    def _model(self):
        if self._apply is None:
            import jax

            model = Metric3D(self.cfg)
            self._apply = jax.jit(
                lambda p, img: model.apply({"params": p}, img))
        return self._apply

    def predict_canonical(self, rgb_normalized: np.ndarray):
        depth, normal, _kappa = self._model()(self.params, rgb_normalized)
        return np.asarray(depth), np.asarray(normal)

    # ---- DepthModel / NormalModel protocols -----------------------------
    def predict_depth(self, rgb: np.ndarray, fx: float) -> np.ndarray:
        inp, pad_info, fx_s = prepare_input(rgb, fx, self.input_size)
        depth_c, _ = self.predict_canonical(inp)
        return postprocess_depth(depth_c, pad_info, fx_s, rgb.shape[:2])

    def predict_normals(self, rgb: np.ndarray) -> np.ndarray:
        inp, pad_info, _ = prepare_input(rgb, CANONICAL_FOCAL,
                                         self.input_size)
        _, normal_c = self.predict_canonical(inp)
        n = postprocess_normal(normal_c, pad_info)
        from fusionsense_tpu.priors.metric3d.wrapper import _resize_bilinear

        n = _resize_bilinear(n, *rgb.shape[:2])
        return (n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-15)) \
            .astype(np.float32)

    def pipeline(self) -> Metric3DPipeline:
        return Metric3DPipeline(model=self)
