"""Evaluation metrics: RGB / depth / normal / point-cloud.

JAX equivalents of the reference's metric suite
(reference dn_splatter/metrics.py:11-183):
- RGBMetrics: PSNR, SSIM (LPIPS optional, torch-gated — heavy net weights
  are not part of the core library)
- DepthMetrics: abs_rel, sq_rel, rmse, rmse_log, a1/a2/a3 (delta < 1.25^k),
  with the reference's 0.1 m validity tolerance
- NormalMetrics: mean angular error (MAE), RMSE, mean, median
- PDMetrics: accuracy (90th-percentile NN distance) and completeness
  (fraction of GT points within 5 cm)
Masked rendering metrics (reference eval_utils/mask_rendering_eval.py:24-114)
are included: PSNR with MSE normalized by mask area, masked SSIM mean.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.train.losses import ssim as _ssim


def psnr(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return -10.0 * jnp.log10(jnp.mean((pred - gt) ** 2) + 1e-12)


def masked_psnr(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """MSE normalized by mask area x channels (reference
    mask_rendering_eval.py:24-27)."""
    m = mask[..., None] if mask.ndim == pred.ndim - 1 else mask
    se = jnp.sum(((pred - gt) * m) ** 2)
    denom = jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)
    return -10.0 * jnp.log10(se / denom + 1e-12)


def ssim(pred, gt):
    return _ssim(pred, gt)


def rgb_metrics(pred, gt, mask=None) -> dict:
    out = {"psnr": psnr(pred, gt), "ssim": ssim(pred, gt)}
    if mask is not None:
        out["masked_psnr"] = masked_psnr(pred, gt, mask)
    return out


def depth_metrics(pred: jax.Array, gt: jax.Array,
                  tolerance: float = 0.1, mask=None) -> dict:
    """Standard monodepth metric battery over valid (gt > tolerance) pixels.

    `mask` (optional, (H, W) {0,1}) restricts the battery to the object —
    the masked-capture protocol: with real sensor maps the background wall
    has valid depth too, but a masked training run never supervises it, so
    scoring it would measure the mask, not the reconstruction (reference
    eval_utils/mask_rendering_eval.py depth_eval applies its masks the
    same way)."""
    valid = gt > tolerance
    if mask is not None:
        valid = valid & (mask > 0.5)
    n = jnp.maximum(jnp.sum(valid), 1)
    p = jnp.where(valid, pred, 1.0)
    g = jnp.where(valid, gt, 1.0)
    p = jnp.maximum(p, 1e-6)
    err = p - g
    mmean = lambda x: jnp.sum(jnp.where(valid, x, 0.0)) / n
    thresh = jnp.maximum(p / g, g / p)
    return {
        "abs_rel": mmean(jnp.abs(err) / g),
        "sq_rel": mmean(err * err / g),
        "rmse": jnp.sqrt(mmean(err * err)),
        "rmse_log": jnp.sqrt(mmean((jnp.log(p) - jnp.log(g)) ** 2)),
        "a1": mmean((thresh < 1.25).astype(jnp.float32)),
        "a2": mmean((thresh < 1.25 ** 2).astype(jnp.float32)),
        "a3": mmean((thresh < 1.25 ** 3).astype(jnp.float32)),
    }


def angular_error_deg(pred_n: jax.Array, gt_n: jax.Array) -> jax.Array:
    """Per-pixel angular error in degrees between unit-normalized normals."""
    pn = pred_n / jnp.maximum(jnp.linalg.norm(pred_n, axis=-1, keepdims=True), 1e-8)
    gn = gt_n / jnp.maximum(jnp.linalg.norm(gt_n, axis=-1, keepdims=True), 1e-8)
    cos = jnp.clip(jnp.sum(pn * gn, -1), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def normal_metrics(pred_n, gt_n, mask=None) -> dict:
    ang = angular_error_deg(pred_n, gt_n)
    if mask is None:
        mask = jnp.ones(ang.shape)
    n = jnp.maximum(jnp.sum(mask), 1)
    mean = jnp.sum(ang * mask) / n
    rmse = jnp.sqrt(jnp.sum(ang * ang * mask) / n)
    med = jnp.median(jnp.where(mask > 0, ang, jnp.nan))
    return {"mae": mean, "rmse": rmse, "mean": mean,
            "median": jnp.nanmedian(jnp.where(mask > 0, ang, jnp.nan))}


def pd_metrics(pred_points: np.ndarray, gt_points: np.ndarray,
               comp_threshold: float = 0.05) -> dict:
    """Point-cloud accuracy/completeness (reference metrics.py PDMetrics:
    90th-percentile pred->gt NN distance; fraction of gt within 5 cm)."""
    from scipy.spatial import cKDTree

    gt_tree = cKDTree(np.asarray(gt_points))
    d_pred, _ = gt_tree.query(np.asarray(pred_points))
    pred_tree = cKDTree(np.asarray(pred_points))
    d_gt, _ = pred_tree.query(np.asarray(gt_points))
    return {
        "accuracy_p90": float(np.percentile(d_pred, 90)),
        "completeness": float(np.mean(d_gt < comp_threshold)),
    }


def chamfer_distance(a: np.ndarray, b: np.ndarray, scale: float = 1e3) -> float:
    """Symmetric squared chamfer x 1e3 (reference
    eval_utils/chamfer_evaluation.py:10-18)."""
    from scipy.spatial import cKDTree

    da, _ = cKDTree(np.asarray(b)).query(np.asarray(a))
    db, _ = cKDTree(np.asarray(a)).query(np.asarray(b))
    return float((np.mean(da ** 2) + np.mean(db ** 2)) * scale)
