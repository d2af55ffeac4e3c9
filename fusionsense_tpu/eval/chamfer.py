"""Mesh-vs-CAD chamfer evaluation with ICP alignment (host numpy/scipy).

Behavioral equivalent of the reference's chamfer eval
(reference eval_utils/chamfer_evaluation.py:10-150): align the extracted
level-set point cloud to a CAD ground truth (mm -> m), then report the
symmetric squared chamfer distance x 1e3. The reference uses FPFH+RANSAC
global registration + point-to-plane ICP via open3d; here: PCA/centroid
global init + point-to-point trimmed ICP (SVD), no open3d.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from fusionsense_tpu.eval.metrics import chamfer_distance


def _umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform src -> dst (Umeyama)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    scale = (np.trace(np.diag(D) @ S) / np.mean(np.sum(xs ** 2, -1))
             if with_scale else 1.0)
    t = mu_d - scale * R @ mu_s
    return scale, R, t


def icp_align(
    src: np.ndarray, dst: np.ndarray,
    iterations: int = 50, trim: float = 0.8, with_scale: bool = False,
    init_scale_from_extent: bool = True,
):
    """Trimmed point-to-point ICP. Returns (aligned_src, (s, R, t))."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)

    # global init: match centroids (+ optional RMS extent scale)
    s0 = 1.0
    if init_scale_from_extent:
        rs = np.sqrt(np.mean(np.sum((src - src.mean(0)) ** 2, -1)))
        rd = np.sqrt(np.mean(np.sum((dst - dst.mean(0)) ** 2, -1)))
        s0 = rd / max(rs, 1e-12)
    cur = (src - src.mean(0)) * s0 + dst.mean(0)
    total_s, total_R, total_t = s0, np.eye(3), dst.mean(0) - s0 * src.mean(0)

    tree = cKDTree(dst)
    for _ in range(iterations):
        d, idx = tree.query(cur)
        keep = d <= np.quantile(d, trim)
        s, R, t = _umeyama(cur[keep], dst[idx[keep]], with_scale)
        cur = (s * (R @ cur.T)).T + t
        total_R = R @ total_R
        total_s = s * total_s
        total_t = s * R @ total_t + t
    return cur, (total_s, total_R, total_t)


def chamfer_eval(
    pred_points: np.ndarray,
    gt_points: np.ndarray,
    gt_unit_scale: float = 1.0,   # e.g. 1e-3 for a CAD file in mm
    sample: int = 100_000,
    seed: int = 0,
) -> dict:
    """ICP-align prediction to GT and report chamfer x 1e3."""
    rng = np.random.RandomState(seed)
    gt = np.asarray(gt_points, np.float64) * gt_unit_scale
    pred = np.asarray(pred_points, np.float64)
    if len(pred) > sample:
        pred = pred[rng.choice(len(pred), sample, replace=False)]
    if len(gt) > sample:
        gt = gt[rng.choice(len(gt), sample, replace=False)]
    aligned, transform = icp_align(pred, gt, with_scale=False)
    return {
        "chamfer_x1e3": chamfer_distance(aligned, gt),
        "transform_scale": float(transform[0]),
    }
