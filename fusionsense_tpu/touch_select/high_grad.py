"""High-gradient Gaussian export: the "visually uncertain regions" signal.

Behavioral spec from the reference (reference dn_splatter/dn_model.py:
1304-1347 high_grad_saving + utils/cluster_high_grad_gs.py:9-86):
- at step stop_split_at - 500, select Gaussians whose accumulated screen
  gradient is high AND that lie near the visual hull (< 0.01 * scene scale),
- un-transform to world/capture coordinates,
- DBSCAN(eps=0.01, min_samples=15) cluster; clusters ranked by mean
  gradient (rank 0 = most uncertain),
- saved as high_grad_pts.pcd with per-point rank attributes — consumed by
  Active Touch Selection (scripts/VLM.py:228-255).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from fusionsense_tpu.gaussians.adc import RefineStats
from fusionsense_tpu.gaussians.store import GaussianState
from fusionsense_tpu.utils.ply import write_pcd


@dataclasses.dataclass(frozen=True)
class HighGradConfig:
    grad_percentile: float = 90.0     # "high" = above this percentile
    hull_dist_max: float = 0.01       # x scene scale
    dbscan_eps: float = 0.01
    dbscan_min_samples: int = 15


def select_high_grad_points(
    state: GaussianState,
    stats: RefineStats,
    hull_points: np.ndarray | None,
    scene_scale: float = 1.0,
    cfg: HighGradConfig = HighGradConfig(),
):
    """Returns (points (M, 3) scene coords, grads (M,)) of uncertain regions."""
    alive = np.asarray(state.alive)
    grads = np.asarray(stats.grad2d_acc) / np.maximum(np.asarray(stats.count), 1)
    means = np.asarray(state.means)

    cand = alive & (np.asarray(stats.count) > 0)
    if not cand.any():
        return np.zeros((0, 3), np.float32), np.zeros((0,), np.float32)
    thresh = np.percentile(grads[cand], cfg.grad_percentile)
    high = cand & (grads >= thresh)

    if hull_points is not None and len(hull_points):
        from scipy.spatial import cKDTree

        d, _ = cKDTree(np.asarray(hull_points)).query(means[high])
        keep = d < cfg.hull_dist_max * scene_scale
        idx = np.nonzero(high)[0][keep]
    else:
        idx = np.nonzero(high)[0]
    return means[idx].astype(np.float32), grads[idx].astype(np.float32)


def cluster_and_rank(
    points: np.ndarray, grads: np.ndarray,
    cfg: HighGradConfig = HighGradConfig(),
):
    """DBSCAN-cluster the uncertain points and rank clusters by mean grad.

    Returns (points, grads, labels, ranks): per-point cluster label (-1 =
    noise, dropped) and rank (0 = highest mean gradient).
    """
    if len(points) == 0:
        return points, grads, np.zeros(0, np.int64), np.zeros(0, np.int64)
    from sklearn.cluster import DBSCAN

    labels = DBSCAN(eps=cfg.dbscan_eps, min_samples=cfg.dbscan_min_samples
                    ).fit_predict(points)
    keep = labels >= 0
    points, grads, labels = points[keep], grads[keep], labels[keep]
    if len(points) == 0:
        return points, grads, labels, np.zeros(0, np.int64)
    cluster_ids = np.unique(labels)
    mean_grads = np.array([grads[labels == c].mean() for c in cluster_ids])
    order = np.argsort(-mean_grads)            # descending
    rank_of = {int(cluster_ids[o]): r for r, o in enumerate(order)}
    ranks = np.array([rank_of[int(l)] for l in labels], np.int64)
    return points, grads, labels, ranks


def export_high_grad_pcd(
    path,
    state: GaussianState,
    stats: RefineStats,
    hull_points: np.ndarray | None,
    untransform=None,                  # scene -> capture coords fn
    scene_scale: float = 1.0,
    cfg: HighGradConfig = HighGradConfig(),
):
    """Full export: select -> cluster -> rank -> write .pcd. Returns count."""
    pts, grads = select_high_grad_points(state, stats, hull_points,
                                         scene_scale, cfg)
    pts, grads, labels, ranks = cluster_and_rank(pts, grads, cfg)
    if untransform is not None and len(pts):
        pts = untransform(pts)
    write_pcd(path, pts, extra={
        "grad": grads, "cluster": labels.astype(np.float32),
        "grad_rank": ranks.astype(np.float32),
    })
    return len(pts)
