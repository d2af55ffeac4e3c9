import numpy as np
import pytest

from fusionsense_tpu.native import cutpursuit, fh_segment


def grid_graph_two_regions(side=12):
    """2D grid with a sharp feature boundary down the middle."""
    n = side * side
    feats = np.zeros((n, 3), np.float32)
    for i in range(side):
        for j in range(side):
            feats[i * side + j] = [i * 0.01, j * 0.01,
                                   0.0 if j < side // 2 else 1.0]
    src, dst = [], []
    for i in range(side):
        for j in range(side):
            a = i * side + j
            for di, dj in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                ii, jj = i + di, j + dj
                if 0 <= ii < side and 0 <= jj < side:
                    src.append(a)
                    dst.append(ii * side + jj)
    return feats, np.asarray(src, np.uint32), np.asarray(dst, np.uint32), side


def test_fh_segment_splits_regions():
    feats, src, dst, side = grid_graph_two_regions()
    labels = fh_segment(feats, src, dst, k=0.05, min_size=4)
    left = labels.reshape(side, side)[:, : side // 2].ravel()
    right = labels.reshape(side, side)[:, side // 2:].ravel()
    # each half coherent, halves distinct
    assert len(np.unique(left)) <= 2
    assert len(np.unique(right)) <= 2
    assert not set(left.tolist()) & set(right.tolist())


def test_cutpursuit_splits_regions():
    feats, src, dst, side = grid_graph_two_regions()
    labels = cutpursuit(feats, src, dst, reg=0.001, max_iter=10)
    lab2d = labels.reshape(side, side)
    # the dominant label of each half must differ
    left_dom = np.bincount(lab2d[:, : side // 2].ravel()).argmax()
    right_dom = np.bincount(lab2d[:, side // 2:].ravel()).argmax()
    assert left_dom != right_dom
    # high reg merges everything
    labels_hi = cutpursuit(feats, src, dst, reg=1e6, max_iter=10)
    assert len(np.unique(labels_hi)) == 1


def test_cutpursuit_on_random_blobs():
    rng = np.random.RandomState(0)
    a = rng.randn(100, 3).astype(np.float32) * 0.05
    b = rng.randn(100, 3).astype(np.float32) * 0.05 + 3.0
    feats = np.concatenate([a, b])
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=6).fit(feats)
    _, idx = nn.kneighbors(feats)
    src = np.repeat(np.arange(200), 5).astype(np.uint32)
    dst = idx[:, 1:].reshape(-1).astype(np.uint32)
    labels = cutpursuit(feats, src, dst, reg=0.1)
    assert labels[:100].std() == 0 or len(np.unique(labels[:100])) <= 3
    assert not set(labels[:100].tolist()) & set(labels[100:].tolist())
