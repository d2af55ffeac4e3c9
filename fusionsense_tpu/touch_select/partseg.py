"""Zero-shot 3D part segmentation: render -> detect -> superpoints -> vote.

TPU-native rebuild of the PartSlip pipeline (reference PartSlip/src/:
- normalize_pc (utils.py:5-15): center + unit-normalize,
- render_pc (render_pc.py:14-58): 10 fixed viewpoints through the PyTorch3D
  point rasterizer, keeping per-pixel point indices,
- glip_inference (glip_inference.py:53-77): per-view text-grounded boxes,
- gen_superpoint (gen_superpoint.py:49-72): normals + KNN graph +
  cut-pursuit partition,
- bbox2seg (bbox2seg.py:36-175): superpoint voting — a superpoint belongs
  to a part if >= 50% of its visible pixels fall in that part's boxes.)

Here: the point renderer is a jitted z-buffer splatter (no PyTorch3D); the
detector is a Protocol — an external open-vocab model (GLIP/GroundingDINO
class) plugs in, and tests use a geometric fixture detector. Superpoints
come from the native cut-pursuit solver when built
(fusionsense_tpu/native/cutpursuit) with a region-growing fallback.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Protocol

import jax
import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.data.synthetic import look_at_w2c


# ------------------------------------------------------------ normalize ----

def normalize_pc(points: np.ndarray):
    """Center + scale to unit norm (reference utils.py:5-15).
    Returns (normalized, center, scale)."""
    center = points.mean(axis=0)
    x = points - center
    scale = np.abs(x).max()
    return x / max(scale, 1e-12), center, float(scale)


# --------------------------------------------------------- point render ----

def fixed_viewpoints(n: int = 10, radius: float = 2.2, elevations=(0.35, -0.35)):
    """n cameras on two elevation rings around the normalized cloud."""
    mats = []
    per_ring = (n + 1) // 2
    for e_i, elev in enumerate(elevations):
        for i in range(per_ring):
            if len(mats) >= n:
                break
            a = 2 * math.pi * (i + 0.5 * e_i) / per_ring
            eye = np.array([radius * math.cos(a), radius * math.sin(a),
                            radius * math.sin(elev)])
            mats.append(look_at_w2c(eye, np.zeros(3)))
    return np.stack(mats)


@functools.partial(jax.jit, static_argnames=("size",))
def _zbuffer_render(points, colors, viewmat, focal, *, size: int):
    """Splat points with a z-buffer; returns (rgb, idx_map, depth).

    idx_map[y, x] = index of the nearest point covering the pixel (-1 none).
    Single-pixel splats at `size` resolution (the reference uses 800px
    3-px-radius splats; callers can render at higher size for density).
    """
    n = points.shape[0]
    p = points @ viewmat[:3, :3].T + viewmat[:3, 3]
    z = p[:, 2]
    valid = z > 1e-4
    zs = jnp.where(valid, z, 1e9)
    u = p[:, 0] / zs * focal + size / 2
    v = p[:, 1] / zs * focal + size / 2
    ui = jnp.clip(u.astype(jnp.int32), 0, size - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, size - 1)
    onscreen = valid & (u >= 0) & (u < size) & (v >= 0) & (v < size)
    pix = jnp.where(onscreen, vi * size + ui, size * size)

    # z-buffer via min-scatter of (depth-packed point index)
    order = jnp.argsort(zs)[::-1]                 # far -> near; near wins
    zbuf = jnp.full((size * size + 1,), 1e9).at[pix[order]].set(zs[order])
    idx = jnp.full((size * size + 1,), -1, jnp.int32).at[pix[order]].set(
        order.astype(jnp.int32))
    rgb = jnp.where(
        (idx[:-1] >= 0)[:, None], colors[jnp.maximum(idx[:-1], 0)], 1.0)
    return (rgb.reshape(size, size, 3), idx[:-1].reshape(size, size),
            zbuf[:-1].reshape(size, size))


def render_views(points: np.ndarray, colors: np.ndarray, n_views: int = 10,
                 size: int = 800, focal_ratio: float = 0.9):
    """Render the normalized cloud from fixed viewpoints.

    Returns list of dicts {rgb, idx, depth, viewmat} (host numpy).
    """
    mats = fixed_viewpoints(n_views)
    focal = focal_ratio * size / 2
    out = []
    pts = jnp.asarray(points, jnp.float32)
    cols = jnp.asarray(colors, jnp.float32)
    for m in mats:
        rgb, idx, depth = _zbuffer_render(pts, cols, jnp.asarray(m, jnp.float32),
                                          focal, size=size)
        out.append({"rgb": np.asarray(rgb), "idx": np.asarray(idx),
                    "depth": np.asarray(depth), "viewmat": m, "focal": focal})
    return out


# ----------------------------------------------------------- detector ------

@dataclasses.dataclass
class Detection:
    boxes: np.ndarray      # (B, 4) x0, y0, x1, y1 pixels
    labels: list[int]      # part index per box
    scores: np.ndarray     # (B,)


class Detector(Protocol):
    """Open-vocabulary text-grounded detector (the GLIP slot)."""

    def detect(self, rgb: np.ndarray, part_names: list[str]) -> Detection: ...


# -------------------------------------------------------- superpoints ------

def estimate_normals(points: np.ndarray, k: int = 10) -> np.ndarray:
    """PCA normals from the k-NN neighborhood (host sklearn)."""
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=k).fit(points)
    _, idx = nn.kneighbors(points)
    nbrs = points[idx]                      # (N, k, 3)
    x = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", x, x)
    _, vecs = np.linalg.eigh(cov)
    return vecs[:, :, 0]                    # smallest-eigenvalue direction


def superpoints(points: np.ndarray, k: int = 10, reg: float = 0.05,
                min_size: int = 10) -> np.ndarray:
    """Partition the cloud into geometrically-coherent superpoints.

    Uses the native L0 cut-pursuit solver on (xyz + normal) features when
    the C++ extension is built (the reference's libcp.cutpursuit,
    PartSlip/partition/cut-pursuit); otherwise a normal-similarity
    region-growing fallback on the same 10-NN graph. Returns (N,) labels.
    """
    normals = estimate_normals(points, k)
    feats = np.concatenate([points, 0.5 * normals], axis=1)
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=k + 1).fit(points)
    dist, idx = nn.kneighbors(points)
    src = np.repeat(np.arange(len(points)), k)
    dst = idx[:, 1:].reshape(-1)
    w = np.ones(len(src), np.float32)

    try:
        from fusionsense_tpu.native import cutpursuit as _cutpursuit

        labels = _cutpursuit(feats.astype(np.float32), src, dst,
                             edge_w=w, reg=reg)
    except Exception:
        labels = _region_grow(points, normals, idx[:, 1:],
                              angle_thresh=0.90)

    labels = _merge_small(labels, idx[:, 1:], min_size)
    # compact label ids
    _, labels = np.unique(labels, return_inverse=True)
    return labels


def _region_grow(points, normals, nbr_idx, angle_thresh=0.90):
    """Greedy BFS region growing with normal-coherence gating."""
    n = len(points)
    labels = np.full(n, -1, np.int64)
    cur = 0
    for seed in range(n):
        if labels[seed] >= 0:
            continue
        stack = [seed]
        labels[seed] = cur
        while stack:
            i = stack.pop()
            for j in nbr_idx[i]:
                if labels[j] >= 0:
                    continue
                if abs(float(normals[i] @ normals[j])) >= angle_thresh:
                    labels[j] = cur
                    stack.append(j)
        cur += 1
    return labels


def _merge_small(labels, nbr_idx, min_size):
    """Merge components smaller than min_size into their dominant neighbor
    (reference gen_superpoint.py merges < 10-point components)."""
    labels = labels.copy()
    for _ in range(3):
        ids, counts = np.unique(labels, return_counts=True)
        small = set(ids[counts < min_size].tolist())
        if not small:
            break
        for i in np.nonzero(np.isin(labels, list(small)))[0]:
            nbr_labels = labels[nbr_idx[i]]
            ok = nbr_labels[~np.isin(nbr_labels, list(small))]
            if len(ok):
                labels[i] = np.bincount(ok).argmax()
    return labels


# ------------------------------------------------------------- voting ------

def bbox_vote(
    views: list[dict],                 # from render_views
    detections: list[Detection],       # one per view
    sp_labels: np.ndarray,             # (N,) superpoint label per point
    n_parts: int,
    sem_threshold: float = 0.5,
) -> np.ndarray:
    """Superpoint voting: per-part visible-inside-box fraction >= threshold
    (reference bbox2seg.py:36-175). Returns (N,) part index, -1 unassigned."""
    n_sp = int(sp_labels.max()) + 1 if len(sp_labels) else 0
    in_box = np.zeros((n_sp, n_parts), np.float64)
    visible = np.zeros((n_sp,), np.float64)

    for view, det in zip(views, detections):
        idx_map = view["idx"]
        vis_pts = idx_map[idx_map >= 0]
        ys, xs = np.nonzero(idx_map >= 0)
        sp_of_pix = sp_labels[vis_pts]
        np.add.at(visible, sp_of_pix, 1.0)
        for b in range(len(det.labels)):
            x0, y0, x1, y1 = det.boxes[b]
            inside = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
            np.add.at(in_box[:, det.labels[b]], sp_of_pix[inside], 1.0)

    frac = in_box / np.maximum(visible[:, None], 1.0)
    best = frac.argmax(axis=1)
    assigned = frac.max(axis=1) >= sem_threshold
    sp_part = np.where(assigned, best, -1)
    return sp_part[sp_labels]


def segment_parts(
    points: np.ndarray,
    colors: np.ndarray,
    part_names: list[str],
    detector: Detector,
    n_views: int = 10,
    render_size: int = 800,
    sp_k: int = 10,
) -> np.ndarray:
    """Full pipeline: returns (N,) part index per point (-1 unassigned)."""
    norm_pts, center, scale = normalize_pc(points)
    views = render_views(norm_pts, colors, n_views=n_views, size=render_size)
    detections = [detector.detect(v["rgb"], part_names) for v in views]
    sp = superpoints(norm_pts, k=sp_k)
    return bbox_vote(views, detections, sp, n_parts=len(part_names))
