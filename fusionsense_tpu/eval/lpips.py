"""LPIPS perceptual metric — weights-gated, JAX-first.

The reference reports LPIPS via torchmetrics (reference
dn_splatter/metrics.py:11 RGBMetrics). Backends, in order:

1. the in-repo JAX VGG-LPIPS (eval/lpips_jax.py) with converted weights —
   set FUSIONSENSE_LPIPS_WEIGHTS to the .npz produced by
   `lpips_jax.save_lpips_params(convert_lpips_weights(...))`, or drop it
   at ~/.cache/fusionsense/lpips_vgg.npz,
2. `lpips` package if installed (torch),
3. torchmetrics' LPIPS if installed (torch),
4. else `available() == False` and callers skip the metric (the eval
   suite reports PSNR/SSIM regardless; PARITY.md documents the gating).

The JAX path's numerics are pinned against a torch replica of the
published architecture by tests/test_parity_lpips.py.
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

_net = None
_kind = None
_params = None


def _jax_weights_path() -> str | None:
    p = os.environ.get("FUSIONSENSE_LPIPS_WEIGHTS")
    if p and Path(p).exists():
        return p
    default = Path.home() / ".cache" / "fusionsense" / "lpips_vgg.npz"
    return str(default) if default.exists() else None


def available() -> bool:
    global _net, _kind, _params
    if _kind is not None:
        return True
    path = _jax_weights_path()
    if path is not None:
        # a corrupt/schema-mismatched weights file must degrade through
        # the fallback chain (lpips -> torchmetrics -> skip), not turn
        # every eval into a raise — smoke-infer on a tiny pair to catch
        # shape mismatches before caching the backend choice
        try:
            from fusionsense_tpu.eval.lpips_jax import (
                load_lpips_params, lpips_pair,
            )

            params = load_lpips_params(path)
            z = np.zeros((16, 16, 3), np.float32)
            float(lpips_pair(params, z, z))
            _params = params
            _kind = "jax"
            return True
        except Exception:
            pass
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
    """(H, W, 3) in [0, 1] pair -> LPIPS, or None if no backend available."""
    if not available():
        return None
    if _kind == "jax":
        from fusionsense_tpu.eval.lpips_jax import lpips_pair

        return float(lpips_pair(_params,
                                np.asarray(pred, np.float32),
                                np.asarray(gt, np.float32)))
    import torch

    def prep(x):
        t = torch.from_numpy(np.asarray(x, np.float32)).permute(2, 0, 1)[None]
        return t * 2.0 - 1.0

    with torch.no_grad():
        return float(_net(prep(pred), prep(gt)))
