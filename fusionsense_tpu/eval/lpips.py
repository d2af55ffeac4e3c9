"""LPIPS perceptual metric — torch-gated adapter.

The reference reports LPIPS via torchmetrics (reference
dn_splatter/metrics.py RGBMetrics). The backbone weights (VGG/AlexNet)
need network access to download, so this wraps whatever implementation is
importable and degrades gracefully:

1. `lpips` package if installed,
2. torchmetrics' LPIPS if installed,
3. else `available() == False` and callers skip the metric (the eval suite
   reports PSNR/SSIM regardless).
"""
from __future__ import annotations

import numpy as np

_net = None
_kind = None


def available() -> bool:
    global _net, _kind
    if _net is not None:
        return True
    try:
        import lpips as _lpips  # type: ignore

        _net = _lpips.LPIPS(net="vgg")
        _kind = "lpips"
        return True
    except Exception:
        pass
    try:
        from torchmetrics.image.lpip import (  # type: ignore
            LearnedPerceptualImagePatchSimilarity,
        )

        _net = LearnedPerceptualImagePatchSimilarity(net_type="vgg")
        _kind = "torchmetrics"
        return True
    except Exception:
        return False


def lpips(pred: np.ndarray, gt: np.ndarray) -> float | None:
    """(H, W, 3) in [0, 1] pair -> LPIPS, or None if no backbone available."""
    if not available():
        return None
    import torch

    def prep(x):
        t = torch.from_numpy(np.asarray(x, np.float32)).permute(2, 0, 1)[None]
        return t * 2.0 - 1.0

    with torch.no_grad():
        if _kind == "lpips":
            return float(_net(prep(pred), prep(gt)))
        return float(_net(prep(pred), prep(gt)))
